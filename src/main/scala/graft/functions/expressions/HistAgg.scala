package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Mergeable integer histogram sketch — the aggregate-expression form of
  * [[graft.stats.Profile.histogramQuantiles]]'s (msb, next-2-bits)
  * bucketing, sharing its EXACT semantics: values `v >= 1` land in bucket
  * `msb*4 + sub` where `msb = floor(log2 v)` and `sub` is the next two
  * bits (0 when `msb < 2`); NULLs and `v < 1` are EXCLUDED (no msb — the
  * q80 contract; shift or clamp upstream if they must count). The state
  * is a fixed 256-long array (msb 0..63 × 4 sub-buckets), so the sketch
  * is pure INTEGER COUNTS: deterministic in any engine, mergeable by
  * elementwise addition (associative, lossless), and — unlike the KMV
  * sketch — exactly RETRACTABLE (counts subtract), which is why a
  * histogram-carrying rollup summary survives the delete-refresh path
  * where sketch groups must recompute.
  *
  * This is what makes QUANTILE dashboards servable from the summary tier
  * ([[graft.plan.Rollup.materialize]]'s `histCols` +
  * [[graft.plan.RollupRewrite]]): a summary-served histogram equals the
  * base-computed one bit for bit, and the q80 lower-bound quantile
  * estimate (relative error ≤ 12.5%) derives from it without touching
  * the base.
  */
case class HistSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hist_sketch requires an integral input, got ${other.sql}")
    }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](HistAgg.Buckets)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val l = v match {
        case x: Long => x
        case x: Int => x.toLong
        case x: Short => x.toLong
        case x: Byte => x.toLong
      }
      if (l >= 1) buffer(HistAgg.bucketOf(l)) += 1
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < HistAgg.Buckets) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] =
    HistAgg.ser(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    HistAgg.de(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HistSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Merge of STORED [[HistSketchAgg]] arrays (elementwise sum) without
  * re-touching the data they summarize — `histMerge(stored histograms) ≡
  * histSketch(full data)` EXACTLY, since bucket counts are plain sums.
  * The [[graft.plan.RollupRewrite]] derivation for histogram queries
  * over a histogram-carrying summary, and [[graft.plan.Rollup.merge]]'s
  * aggregate for `__hist_*` columns. */
case class HistMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hist_merge requires ARRAY<BIGINT> histogram input, got ${other.sql}")
    }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](HistAgg.Buckets)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == HistAgg.Buckets,
        s"hist_merge input must have ${HistAgg.Buckets} buckets, got ${arr.numElements()}")
      var i = 0
      while (i < HistAgg.Buckets) { buffer(i) += arr.getLong(i); i += 1 }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < HistAgg.Buckets) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] =
    HistAgg.ser(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    HistAgg.de(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HistMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HistAgg {

  /** 64 msb values × 4 sub-buckets. */
  val Buckets = 256

  /** Bucket index for `v >= 1`: `msb*4 + sub`, q80 arithmetic. */
  def bucketOf(v: Long): Int = {
    val msb = 63 - java.lang.Long.numberOfLeadingZeros(v)
    val sub = if (msb >= 2) ((v >>> (msb - 2)) & 3L).toInt else 0
    msb * 4 + sub
  }

  /** Lower bound of bucket `b` — the q80 quantile estimate value. */
  def bucketLo(b: Int): Long = {
    val msb = b / 4
    val sub = b % 4
    if (msb >= 2) (1L << msb) + sub.toLong * (1L << (msb - 2)) else 1L << msb
  }

  private[expressions] def ser(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(Buckets * 8)
    var i = 0
    while (i < Buckets) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  private[expressions] def de(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val vs = new Array[Long](Buckets)
    var i = 0
    while (i < Buckets) { vs(i) = bb.getLong(); i += 1 }
    vs
  }

  /** `histSketch(valueCol)` → 256-bucket count array for the group. */
  def histSketch(value: Column): Column =
    ExpressionUtils.column(
      HistSketchAgg(ExpressionUtils.expression(value)).toAggregateExpression())

  /** `histMerge(histCol)` → elementwise sum of stored histograms. */
  def histMerge(hist: Column): Column =
    ExpressionUtils.column(
      HistMergeAgg(ExpressionUtils.expression(hist)).toAggregateExpression())

  /** The q80 LOWER-BOUND quantile estimate from a histogram column: the
    * `lo` of the first bucket whose cumulative count reaches
    * `ceil(p · total)` (NULL on an all-empty histogram). Engine-portable:
    * integer fold + ONE `ceil(double)` whose operand is an exact small
    * integer times the probability literal — the same float surface q80
    * ships (DOUBLE-cast the prob literal in SQL replays). Composed from
    * codegen-planned HOFs over the 256-entry array — this runs on
    * group-cardinality rows (summary output), never on the corpus. */
  def histQuantile(hist: Column, p: Double): Column = {
    import org.apache.spark.sql.functions._
    require(p > 0 && p <= 1, s"prob must lie in (0, 1], got $p")
    val total = aggregate(hist, lit(0L), (acc, x) => acc + x)
    val target = ceil(total.cast("double") * lit(p)).cast("long")
    // fold (cum, answer): first bucket index i with cum + h[i] >= target
    val lob = (0 until Buckets).map(bucketLo)
    val found = aggregate(hist,
      struct(lit(0L).as("cum"), lit(-1).as("idx"), lit(0).as("i")),
      (acc, x) => struct(
        (acc.getField("cum") + x).as("cum"),
        when(acc.getField("idx") >= 0, acc.getField("idx"))
          .otherwise(when(acc.getField("cum") + x >= target, acc.getField("i"))
            .otherwise(lit(-1))).as("idx"),
        (acc.getField("i") + 1).as("i")))
    when(total === 0, lit(null).cast("long"))
      .otherwise(element_at(array(lob.map(lit): _*), found.getField("idx") + 1))
  }
}
