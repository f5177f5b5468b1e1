package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Count-min sketch (Cormode & Muthukrishnan '05): a depth × width grid of
  * counters; each item increments one counter per row (row-specific hash),
  * a point estimate reads the MINIMUM of its depth counters — always an
  * overestimate, off by at most ≈ (e/width)·N with probability
  * 1 − exp(−depth).
  *
  * The at-scale contract mirrors [[KmvDistinctAgg]] and [[MisraGriesAgg]]:
  * counters add elementwise, so partials combine map-side and the exchange
  * carries depth·width longs per group — never the item stream. Unlike
  * Misra-Gries (which keeps only k survivors) the sketch answers point
  * queries for ANY item after the fact, which is what makes it the
  * stored-artifact shape: persist one sketch row per corpus slice, union
  * slices by vector-adding their sketches.
  *
  * Bucket indices are computed OUTSIDE the aggregate as Catalyst columns
  * over the engine-portable md5 hash ([[graft.curate.Curate.portableHash60]]
  * — row j's bucket = hash60(item ∥ ":cmsj") mod width), so a SQL engine
  * can replay the exact grid and the estimates hash-match an oracle.
  */
case class CountMinAgg(
    buckets: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  // analysis-time type error instead of an executor ClassCastException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    buckets.dataType match {
      case ArrayType(LongType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"countmin requires ARRAY<BIGINT> bucket input, got ${other.sql}")
    }

  require(depth >= 1 && width >= 1, "depth and width must be >= 1")
  require(depth.toLong * width <= (1 << 24), "sketch grid too large to broadcast per group")

  override def children: Seq[Expression] = Seq(buckets)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val arr = buckets.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(a.numElements() == depth,
        s"bucket array has ${a.numElements()} elements, sketch depth is $depth")
      // a null ITEM nulls every md5 bucket — skip the row (KmvDistinctAgg
      // convention); without this, getLong on a null slot reads 0 and every
      // null row silently inflates bucket 0 of every grid row
      var j = 0
      var anyNull = false
      while (j < depth && !anyNull) { anyNull = a.isNullAt(j); j += 1 }
      if (!anyNull) {
        j = 0
        while (j < depth) {
          val b = a.getLong(j)
          // a SQL caller that hashed mod a different width would write into
          // the NEXT grid row's counters — corrupt, so reject loudly
          require(b >= 0 && b < width,
            s"bucket $b out of range [0, $width) — grid built with a different width?")
          buffer(j * width + b.toInt) += 1L
          j += 1
        }
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  private lazy val projection = UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buffer: Array[Long]): Array[Byte] =
    projection.apply(InternalRow.apply(new GenericArrayData(buffer))).getBytes

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).toLongArray()
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(buckets = newChildren.head)
}

object CountMinAgg {

  /** Row j's bucket for an item — the portable grid coordinate both the
    * aggregate and [[estimate]] (and any SQL oracle) must agree on. */
  private def bucket(item: Column, width: Int, j: Int): Column =
    graft.curate.Curate.hashBucketDyn(item, width, lit(s":cms$j"))

  /** Column entry point: aggregate an item column into the depth×width
    * counter grid (array<long> of length depth·width, row-major). */
  def countMin(item: Column, depth: Int, width: Int): Column = {
    val idx = array((0 until depth).map(j => bucket(item, width, j)): _*)
    ExpressionUtils.column(
      CountMinAgg(ExpressionUtils.expression(idx), depth, width).toAggregateExpression())
  }

  /** Point estimate for `item` against a [[countMin]] grid: min of its
    * depth counters (1-based element_at; index fits comfortably in int). */
  def estimate(grid: Column, item: Column, depth: Int, width: Int): Column =
    (0 until depth)
      .map(j => element_at(grid, (bucket(item, width, j) + lit(j.toLong * width) + lit(1L)).cast("int")))
      .reduce(least(_, _))
}
