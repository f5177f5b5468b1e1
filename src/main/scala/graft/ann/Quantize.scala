package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Symmetric per-vector int8 quantization — the 4× storage/bandwidth
  * compression step of an embedding store (a 100 TB float32 embedding
  * table becomes ~25 TB of int8 codes + one bigint scale per vector, and
  * ANN candidate scoring reads a quarter of the bytes).
  *
  * Determinism: the float component first snaps to [[Ivf.QScale]]'s 1e-6
  * integer grid exactly as [[Ivf.quantize]] does (`floor(x·1e6 + 0.5)` —
  * the portable double op), and EVERYTHING after that is 64-bit integer
  * arithmetic: `scale = max|q|`, `code = sign(q)·⌊(|q|·254 + scale) /
  * (2·scale)⌋` (half-up onto the 127-step grid), and the per-vector audit
  * sums. A different engine replays the whole computation bit-for-bit —
  * which is how the correctness gate oracles it.
  *
  * Scale shape: row-local, zero shuffle; one native codegen-hosted kernel
  * call per row. The audit columns (`err_l1` = Σ|127·q − code·scale| in
  * grid/127 units) make the quantization loss measurable per row, so a
  * pipeline can gate "re-embed vs ship codes" on data, not faith.
  */
object Quantize {

  /** struct<qmax, code_l1, err_l1, codes>: scale, Σ|code|,
    * Σ|127·q − code·qmax|, and the int8 code vector itself. */
  def int8Quant(vec: Column): Column =
    ExpressionUtils.column(Int8QuantExpr(ExpressionUtils.expression(vec)))

  /** Per-vector integer audit summary — the correctness-gate projection
    * (codes dropped; every column bigint, so hashes are portable). */
  def int8Summary(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    graft.dedup.Dedup.ensureParallelism(df)
      .select(col(idCol), int8Quant(col(vecCol)).as("__q"))
      .select(col(idCol), col("__q.qmax").as("qmax"),
        col("__q.code_l1").as("code_l1"), col("__q.err_l1").as("err_l1"))

  /** (id, qmax, codes): what an embedding store would actually persist. */
  def int8Codes(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), int8Quant(col(vecCol)).as("__q"))
      .select(col(idCol), col("__q.qmax").as("qmax"), col("__q.codes").as("codes"))
}

/** `array<float|double>` → struct<qmax:long, code_l1:long, err_l1:long,
  * codes:array<tinyint>>. Single pass; grid snap is the only double op
  * (see [[Quantize]] scaladoc for the exact arithmetic). Codegen hosts
  * the call (NOT CodegenFallback — one fallback expression would eject
  * the whole host operator from whole-stage codegen). */
case class Int8QuantExpr(child: Expression) extends UnaryExpression {

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def dataType: DataType = StructType(Seq(
    StructField("qmax", LongType, nullable = false),
    StructField("code_l1", LongType, nullable = false),
    StructField("err_l1", LongType, nullable = false),
    StructField("codes", ArrayType(ByteType, containsNull = false), nullable = false)))

  def compute(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("int8Quant", this, classOf[Int8QuantExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);"
    })

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val q = new Array[Long](n)
    var qmax = 0L
    var i = 0
    while (i < n) {
      val d = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val qi = math.floor(d * Ivf.QScale + 0.5).toLong
      q(i) = qi
      val abs = math.abs(qi)
      if (abs > qmax) qmax = abs
      i += 1
    }
    val codes = new Array[Byte](n)
    var codeL1 = 0L
    var errL1 = 0L
    if (qmax > 0L) {
      i = 0
      while (i < n) {
        val qi = q(i)
        val mag = (math.abs(qi) * 254L + qmax) / (2L * qmax)
        val code = if (qi >= 0L) mag else -mag
        codes(i) = code.toByte
        codeL1 += mag
        errL1 += math.abs(127L * qi - code * qmax)
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](qmax, codeL1, errL1, new GenericArrayData(codes)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
