package graft.functions.expressions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** `collect_list` with a hard cap: groups that exceed `cap` elements
  * evaluate to NULL instead of materializing.
  *
  * The point is the memory bound. A plain `collect_list` + post-filter on
  * size still buffers the whole pathological group (a boilerplate-heavy
  * corpus puts millions of near-identical docs in one LSH bucket) before
  * dropping it; this aggregate stops accumulating at cap+1 elements, so the
  * per-group buffer is bounded by construction — on every executor, at any
  * scale. Associative (partial-aggregation safe): merged buffers saturate
  * at cap+1 the same way.
  *
  * Collection order is arrival order and therefore nondeterministic —
  * consumers must be order-insensitive (the dedup bucket-pair generators
  * normalize pairs with least/greatest).
  */
case class CollectListCappedAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]] {

  require(cap >= 1, "cap must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  // buffer saturates at cap+1: one sentinel element past the cap is enough
  // to know the group overflowed, without holding the rest.
  override def update(buffer: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buffer.length <= cap) {
      val v = child.eval(input)
      if (v != null) buffer += InternalRow.copyValue(v)
    }
    buffer
  }

  // long arithmetic: cap = Int.MaxValue (the "no cap" sentinel) must not
  // overflow to a negative room and silently drop other partials
  override def merge(buffer: mutable.ArrayBuffer[Any], other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val room = math.min(cap.toLong + 1L - buffer.length, Int.MaxValue.toLong).toInt
    if (room > 0) buffer ++= other.take(room)
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    if (buffer.length > cap) null else new GenericArrayData(buffer.toArray)

  private lazy val projection =
    UnsafeProjection.create(Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buffer: mutable.ArrayBuffer[Any]): Array[Byte] =
    projection.apply(InternalRow.apply(new GenericArrayData(buffer.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buffer = mutable.ArrayBuffer.empty[Any]
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      buffer += InternalRow.copyValue(arr.get(i, child.dataType))
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectListCappedAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectListCappedAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CollectListCappedAgg {
  /** Column entry point: NULL for groups larger than `cap`. */
  def collectListCapped(e: Column, cap: Int): Column =
    ExpressionUtils.column(
      CollectListCappedAgg(ExpressionUtils.expression(e), cap).toAggregateExpression())
}
