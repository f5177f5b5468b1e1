package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch over a LongType hash
  * column: the k smallest DISTINCT hash values seen. With hashes uniform
  * in [0, 2^60) (the repo's engine-portable md5-prefix convention,
  * [[graft.curate.Curate.hashBucket]]), the classic estimator
  * `(k-1) · 2^60 / kth_min` is an unbiased distinct-count estimate with
  * relative error ≈ 1/√(k−2).
  *
  * Why this instead of HyperLogLog: the sketch is an ORDER STATISTIC, so
  * (a) it is exactly reproducible by any engine that can sort hashes —
  * the DuckDB oracle recomputes the identical k minima with a window —
  * and (b) merging is just "union, keep k smallest", associative and
  * lossless, so map-side partial aggregation and cross-dataset sketch
  * algebra (union estimates, Jaccard via common minima) work exactly.
  * At 100 TB the sketch is the stored-table artifact: one pass computes a
  * per-partition/per-source sketch row, and any later union rolls up
  * without touching the data again. Fixed k·8-byte state; the buffer is a
  * sorted long array (insertion into the k-bounded array is O(log k)
  * search + memmove — k is small by construction).
  */
case class KmvDistinctAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvDistinctAgg.Buffer] {

  // analysis-time type error instead of an executor ClassCastException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch requires BIGINT hash input, got ${other.sql}")
    }

  require(k >= 2, s"k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvDistinctAgg.Buffer =
    new KmvDistinctAgg.Buffer(new Array[Long](k), 0)

  override def update(buffer: KmvDistinctAgg.Buffer, input: InternalRow): KmvDistinctAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvDistinctAgg.Buffer, other: KmvDistinctAgg.Buffer): KmvDistinctAgg.Buffer = {
    var i = 0
    while (i < other.size) { buffer.insert(other.values(i)); i += 1 }
    buffer
  }

  /** Ascending array of the (≤ k) smallest distinct hashes. */
  override def eval(buffer: KmvDistinctAgg.Buffer): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buffer.values, buffer.size))

  override def serialize(buffer: KmvDistinctAgg.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 8)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putLong(buffer.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvDistinctAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val vs = new Array[Long](k)
    var i = 0
    while (i < n) { vs(i) = bb.getLong(); i += 1 }
    new KmvDistinctAgg.Buffer(vs, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Merge of STORED [[KmvDistinctAgg]] sketches (ascending array<long>
  * columns) without re-touching the data they summarize: union, keep the
  * k smallest — associative and LOSSLESS by the order-statistic argument
  * (any global top-k minimum is a top-k minimum of its own source), so
  * `kmvMerge(stored sketches) ≡ kmvSketch(full data)` exactly. This is
  * the aggregate-expression form of q77's explode→re-sketch device,
  * usable wherever an AggregateExpression is required — in particular by
  * [[graft.plan.RollupRewrite]] to answer sketch queries from a
  * sketch-carrying summary table. */
case class KmvMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvDistinctAgg.Buffer] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_merge requires ARRAY<BIGINT> sketch input, got ${other.sql}")
    }

  require(k >= 2, s"k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvDistinctAgg.Buffer =
    new KmvDistinctAgg.Buffer(new Array[Long](k), 0)

  override def update(buffer: KmvDistinctAgg.Buffer, input: InternalRow): KmvDistinctAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) { buffer.insert(arr.getLong(i)); i += 1 }
    }
    buffer
  }

  override def merge(buffer: KmvDistinctAgg.Buffer, other: KmvDistinctAgg.Buffer): KmvDistinctAgg.Buffer = {
    var i = 0
    while (i < other.size) { buffer.insert(other.values(i)); i += 1 }
    buffer
  }

  override def eval(buffer: KmvDistinctAgg.Buffer): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buffer.values, buffer.size))

  override def serialize(buffer: KmvDistinctAgg.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 8)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putLong(buffer.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvDistinctAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val vs = new Array[Long](k)
    var i = 0
    while (i < n) { vs(i) = bb.getLong(); i += 1 }
    new KmvDistinctAgg.Buffer(vs, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvMergeAgg {
  /** `kmvMerge(sketchCol, k)` → the sketch of the union of the groups the
    * input sketches summarize (ascending array<long>, ≤ k values). */
  def kmvMerge(sketch: Column, k: Int): Column =
    ExpressionUtils.column(
      KmvMergeAgg(ExpressionUtils.expression(sketch), k).toAggregateExpression())
}

object KmvDistinctAgg {

  /** Sorted-ascending bounded set of the k smallest distinct longs. */
  final class Buffer(val values: Array[Long], var size: Int) {
    def insert(v: Long): Unit = {
      val k = values.length
      if (size == k && v >= values(size - 1)) return
      var idx = java.util.Arrays.binarySearch(values, 0, size, v)
      if (idx >= 0) return // already present
      idx = -idx - 1
      val last = math.min(size, k - 1)
      System.arraycopy(values, idx, values, idx + 1, last - idx)
      values(idx) = v
      if (size < k) size += 1
    }
  }

  /** `kmvSketch(hashCol, k)` → ascending array<long> of the k smallest
    * distinct hashes of the group. */
  def kmvSketch(hash: Column, k: Int): Column =
    ExpressionUtils.column(
      KmvDistinctAgg(ExpressionUtils.expression(hash), k).toAggregateExpression())

  /** The classic estimator over a [[kmvSketch]] column: `(k−1)·2^60 /
    * kth_min`, falling back to the EXACT stored count when the sketch
    * never filled (fewer than k distinct values — the minima then ARE the
    * value set). Shared by q69/q77 so the Spark side and any SQL replay
    * agree on one formula. */
  def estimateDistinct(mins: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    round(
      when(size(mins) < k, size(mins).cast("double"))
        .otherwise(lit((k - 1).toDouble * (1L << 60).toDouble) /
          element_at(mins, k).cast("double")), 4)
  }
}
