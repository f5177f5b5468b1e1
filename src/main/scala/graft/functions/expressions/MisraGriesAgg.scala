package graft.functions.expressions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter sketch over a string column: at most `k`
  * counters per group, mergeable (Agarwal et al., "Mergeable Summaries",
  * PODS'12), evaluating to the surviving (token, est) pairs sorted by
  * (est DESC, token ASC).
  *
  * The at-scale contract: the full token stream NEVER shuffles — partial
  * sketches of ≤ k counters combine map-side, so the exchange carries
  * O(k · groups) bytes no matter how many tokens were scanned. Every item
  * with true count > n/(k+1) is guaranteed present in the result (est is a
  * lower bound undercounting by at most n/(k+1)); pair it with an exact
  * count of JUST the surviving candidates for exact top-m ≤ k results —
  * the sketch-proposes / exact-verifies shape (see Queries.q63).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  // SQL callers (graft_misra_gries) get an analysis-time type error instead
  // of an executor-side ClassCastException on non-string input
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"misra_gries requires STRING input, got ${other.sql}")
    }

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("tok", StringType), StructField("est", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buffer: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val tok = v.asInstanceOf[UTF8String].toString // copy out of the reused row
      buffer.get(tok) match {
        case Some(c) => buffer.update(tok, c + 1)
        case None if buffer.size < k => buffer.update(tok, 1L)
        case None => decrementAll(buffer, 1L) // classic MG: k full, new item
      }
    }
    buffer
  }

  /** Mergeable-summaries merge: add counts, then if over k counters
    * subtract the (k+1)-th largest count from everything and drop the
    * non-positives — exactly k or fewer survive, error bounds add. */
  override def merge(buffer: mutable.HashMap[String, Long], other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (tok, c) => buffer.update(tok, buffer.getOrElse(tok, 0L) + c) }
    if (buffer.size > k) {
      val counts = buffer.values.toArray
      java.util.Arrays.sort(counts)
      decrementAll(buffer, counts(counts.length - k - 1))
    }
    buffer
  }

  private def decrementAll(buffer: mutable.HashMap[String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    buffer.foreach { case (tok, c) => if (c <= by) dead += tok else buffer.update(tok, c - by) }
    dead.foreach(buffer.remove)
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val sorted = buffer.toArray.sortWith { case ((ta, ca), (tb, cb)) =>
      if (ca != cb) ca > cb else ta < tb
    }
    new GenericArrayData(sorted.map { case (tok, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(tok), c))
    })
  }

  private lazy val projection = UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] =
    projection.apply(InternalRow.apply(new GenericArrayData(
      buffer.toArray.map { case (tok, c) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(tok), c))
      }))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buffer = mutable.HashMap.empty[String, Long]
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val s = arr.getStruct(i, 2)
      buffer.update(s.getUTF8String(0).toString, s.getLong(1))
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** Column entry point: array<struct<tok,est>> of ≤ k heavy-hitter
    * candidates, sorted (est DESC, tok ASC). */
  def misraGries(e: Column, k: Int): Column =
    ExpressionUtils.column(
      MisraGriesAgg(ExpressionUtils.expression(e), k).toAggregateExpression())
}
