package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization (NFC) — the zeroth text-cleaning pass
  * of a multilingual corpus pipeline: the same visible string can arrive
  * as precomposed codepoints or base+combining sequences (`é` vs
  * `e`+U+0301), and every downstream exact operation — dedup hashes,
  * shingles, tokenizer vocab lookups, equality joins — silently treats
  * them as different documents unless the corpus is normalized first.
  *
  * Canonical composition is fully specified by the Unicode standard, so
  * independent implementations (java.text.Normalizer here, utf8proc in
  * DuckDB — which oracles it) produce identical bytes; that portability
  * is what lets NFC sit underneath cross-engine dedup keys.
  *
  * Row-local, zero shuffle; ASCII fast path (the common case for web
  * text) avoids the Normalizer call entirely. Codegen hosts a per-row
  * call (NOT CodegenFallback).
  */
object UnicodeExpressions {
  def nfcNormalize(text: Column): Column =
    ExpressionUtils.column(NfcNormalizeExpr(ExpressionUtils.expression(text)))
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  def compute(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("nfc", this, classOf[NfcNormalizeExpr].getName)
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.compute($c);"
    })

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    // ASCII bytes are NFC by definition — skip the String round-trip
    if (isAscii(u)) u
    else {
      val s = u.toString
      val n = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      if (n eq s) u else UTF8String.fromString(n)
    }
  }

  private def isAscii(u: UTF8String): Boolean = {
    val n = u.numBytes()
    var i = 0
    while (i < n) {
      if ((u.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
