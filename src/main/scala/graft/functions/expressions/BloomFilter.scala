package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Blocked-free classic Bloom filter over 64-bit hashes, shared by the
  * building aggregate and the membership expression so both sides agree
  * bit-for-bit.
  *
  * Double hashing (Kirsch–Mitzenmacher): bit_i = (h1 + i·h2) mod m with
  * h1 = x and h2 = splitmix64(x) | 1 — i independent probes from one
  * 64-bit input, no per-probe rehash. m is fixed at build time (bits per
  * element × expected items), so the filter is a plain long[] word array
  * that serializes to m/8 bytes and merges by bitwise OR — associative,
  * hence map-side partial aggregation applies.
  */
object BloomKernels {

  /** Second hash: SplitMix64 finalizer, forced odd — coprime with the
    * power-of-two factor of m (m = 64·words). When words has odd prime
    * factors a stride sharing one cycles a fraction of the bit positions;
    * the spec pins the REALIZED false-positive rate, and false positives
    * only ever cost verify-join input, never correctness. */
  def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z ^ (z >>> 31)) | 1L
  }

  def add(words: Array[Long], numHashes: Int, x: Long): Unit = {
    val m = words.length.toLong * 64L
    val h2 = mix(x)
    var i = 0
    var h = x
    while (i < numHashes) {
      val bit = (h & Long.MaxValue) % m
      words((bit >>> 6).toInt) |= (1L << (bit & 63L))
      h += h2
      i += 1
    }
  }

  def contains(words: Array[Long], numHashes: Int, x: Long): Boolean = {
    val m = words.length.toLong * 64L
    val h2 = mix(x)
    var i = 0
    var h = x
    while (i < numHashes) {
      val bit = (h & Long.MaxValue) % m
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63L))) == 0L) return false
      h += h2
      i += 1
    }
    true
  }

  def toBytes(words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length % 8 == 0, s"bloom byte length ${bytes.length} not a multiple of 8")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  /** Word count for `expectedItems` at `bitsPerItem` (≥ 1024 bits; 16
    * bits/item ≈ 4·10⁻⁴ false-positive rate at numHashes=7). */
  def numWords(expectedItems: Long, bitsPerItem: Int): Int = {
    val bits = math.max(1024L, expectedItems * bitsPerItem)
    math.toIntExact((bits + 63L) / 64L)
  }
}

/** Aggregate: BinaryType Bloom filter over a LongType hash column.
  *
  * `numBits` is rounded up to a multiple of 64. Buffers merge by bitwise
  * OR, so partial aggregation is exact; serialized size is numBits/8
  * regardless of input cardinality — the property that makes the filter
  * broadcastable when the underlying key set is not (10⁸ benchmark grams
  * at 16 bits/elem = 200 MB of bloom vs several GB of hashed strings).
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Long,
    numHashes: Int = 7,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numHashes > 0, "need numBits > 0 and numHashes > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](math.toIntExact((numBits + 63L) / 64L))

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomKernels.add(buffer, numHashes, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = BloomKernels.toBytes(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] = BloomKernels.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BloomKernels.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Membership probe against a DRIVER-HELD filter: the bloom bytes are a
  * constructor parameter (deserialized once, shipped in the task closure as
  * a referenced object), not a per-row child — so the probe is a handful of
  * shifts/ands per row and inlines into whole-stage codegen. This is the
  * scan-side prefilter shape: collect the (small, fixed-size) filter to the
  * driver, then run `bloomContains(hashCol)` inside the corpus scan with no
  * join at all. */
case class BloomContainsExpr(child: Expression, bloomBytes: Array[Byte], numHashes: Int = 7)
    extends UnaryExpression {

  private lazy val words: Array[Long] = BloomKernels.fromBytes(bloomBytes)

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any =
    BloomKernels.contains(words, numHashes, input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, x => {
      val h = ctx.freshName("h")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val bit = ctx.freshName("bit")
      val hit = ctx.freshName("hit")
      val m = ctx.freshName("m")
      s"""
         |boolean $hit = true;
         |long $m = (long) $wordsRef.length * 64L;
         |long $h = $x;
         |long $h2 = graft.functions.expressions.BloomKernels.mix($x);
         |for (int $i = 0; $i < $numHashes; $i++) {
         |  long $bit = ($h & Long.MAX_VALUE) % $m;
         |  if (($wordsRef[(int)($bit >>> 6)] & (1L << ($bit & 63L))) == 0L) { $hit = false; break; }
         |  $h += $h2;
         |}
         |${ev.value} = $hit;
       """.stripMargin
    })
  }

  // bloomBytes is an Array — exclude it from case-class equality semantics
  // Catalyst uses for expression dedup (arrays compare by reference; two
  // probes against different blooms must not be CSE'd as equal, and
  // reference equality guarantees that conservatively).
  override protected def withNewChildInternal(newChild: Expression): BloomContainsExpr =
    copy(child = newChild)
}

object BloomFilterOps {
  /** `bloomAgg(hashCol, numBits)` — aggregate a LongType hash column into a
    * BinaryType Bloom filter of `numBits` bits. */
  def bloomAgg(hash: Column, numBits: Long, numHashes: Int = 7): Column =
    ExpressionUtils.column(
      BloomFilterAgg(ExpressionUtils.expression(hash), numBits, numHashes).toAggregateExpression())

  /** `bloomContains(hashCol, bytes)` — probe a driver-held filter. */
  def bloomContains(hash: Column, bytes: Array[Byte], numHashes: Int = 7): Column =
    ExpressionUtils.column(
      BloomContainsExpr(ExpressionUtils.expression(hash), bytes, numHashes))
}
