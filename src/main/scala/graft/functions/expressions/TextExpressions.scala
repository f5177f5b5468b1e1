package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style n-gram repetition statistics: array<string> tokens →
  * struct<top_frac double, dup_frac double> where, over the document's
  * n-token word grams,
  *
  *  - `top_frac` = occurrences of the most frequent gram / total grams,
  *  - `dup_frac` = 1 − distinct grams / total grams.
  *
  * Both are the standard repeated-content quality filters for training-data
  * curation (a document whose top bigram covers a third of the text is
  * boilerplate). Fewer than n tokens ⇒ no grams ⇒ (0.0, 0.0).
  *
  * Row-local single pass with a per-row hash map — no shuffle, unlike the
  * naive explode+groupBy formulation, so it scales with input bytes only.
  * One virtual call per row (codegen calls into the expression object —
  * NOT CodegenFallback, which would eject the host operator from
  * whole-stage codegen); the loop itself is primitive.
  */
case class NgramRepetitionExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "gram length must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("top_frac", DoubleType, nullable = false),
    StructField("dup_frac", DoubleType, nullable = false)))

  private val space = UTF8String.fromString(" ")

  def compute(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("ngramRep", this, classOf[NgramRepetitionExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);"
    })

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val total = len - n + 1
    if (total <= 0) new GenericInternalRow(Array[Any](0.0, 0.0))
    else {
      val toks = new Array[UTF8String](len)
      var i = 0
      while (i < len) {
        toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
        i += 1
      }
      val counts = new java.util.HashMap[UTF8String, Integer](total * 2)
      var maxCount = 0
      var s = 0
      while (s < total) {
        val window = new Array[UTF8String](n)
        System.arraycopy(toks, s, window, 0, n)
        val g = UTF8String.concatWs(space, window: _*)
        val prev = counts.get(g)
        val c = if (prev == null) 1 else prev.intValue() + 1
        counts.put(g, Integer.valueOf(c))
        if (c > maxCount) maxCount = c
        s += 1
      }
      new GenericInternalRow(Array[Any](
        maxCount.toDouble / total,
        1.0 - counts.size().toDouble / total))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shannon entropy (bits) of a string's character distribution — the
  * cheap perplexity proxy for corpus quality filtering: binary junk and
  * base64 blobs score high, repeated boilerplate scores low, natural
  * language sits in a recognizable band. Iterates code points (matching
  * SQL engines' character indexing), empty string → 0.0. Row-local,
  * single pass + one pass over the (small) distinct-char map. */
case class CharEntropyExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  def compute(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("charEntropy", this, classOf[CharEntropyExpr].getName)
      s"${ev.value} = ((java.lang.Double) $ref.compute($c)).doubleValue();"
    })

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val counts = new java.util.HashMap[Integer, Array[Int]]()
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1)) else slot(0) += 1
      i += Character.charCount(cp)
      n += 1
    }
    if (n == 0) java.lang.Double.valueOf(0.0)
    else {
      var e = 0.0
      val it = counts.values().iterator()
      while (it.hasNext) {
        val p = it.next()(0).toDouble / n
        e -= p * math.log(p)
      }
      java.lang.Double.valueOf(e / math.log(2.0))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Collapse consecutive duplicate tokens: array<string> → array<string>
  * keeping element i iff i == 0 or tokens(i) ≠ tokens(i−1) — the
  * within-document stutter/boilerplate-run remover behind
  * [[graft.curate.Curate.collapseRepeatTokens]].
  *
  * Native because the obvious HOF formulation,
  * `filter(toks, (t, i) => t =!= element_at(toks, i))`, captures the
  * OUTER tokens expression inside the lambda — Catalyst re-evaluates the
  * captured subtree (a regex tokenizer!) PER ELEMENT, turning a linear
  * pass into O(n²) regex splits per document (measured 20× on q88 once
  * the bench stopped letting count() prune the projection). Here: one
  * linear pass, one virtual call per row, codegen-hosted.
  *
  * NULL-ELEMENT CONTRACT (pinned by TextExpressionsSpec): null tokens
  * compare equal to each other — a run of nulls collapses to ONE null,
  * and a null is KEPT whenever its predecessor is non-null. This
  * deliberately differs from the replaced HOF (`t =!= prev` is null for
  * a null element, so the old filter DROPPED every non-leading null):
  * run-collapsing treats null as a distinct token value rather than
  * silently deleting data. No current caller produces null tokens
  * (`split` never yields them), so the gated queries see no difference;
  * a future caller with null-bearing arrays gets the documented
  * semantics above, not the HOF accident.
  */
case class CollapseRunsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  def compute(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("collapseRuns", this, classOf[CollapseRunsExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);"
    })

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var kept = 0
    var prev: UTF8String = null
    var prevNull = false
    var i = 0
    while (i < n) {
      val isNull = arr.isNullAt(i)
      val t = if (isNull) null else arr.getUTF8String(i)
      // first element always kept; null tokens compare equal to null
      val dup = i > 0 && (if (isNull || prevNull) isNull && prevNull else t == prev)
      if (!dup) { out(kept) = t; kept += 1 }
      prev = t
      prevNull = isNull
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], kept))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Strided token chunks: array<string> tokens → array<string> of
  * space-joined windows `tokens[i·stride, i·stride + chunkLen)` for
  * i in 0 until max(1, ⌈max(n − (chunkLen − stride), 1) / stride⌉) —
  * exactly the `transform(sequence(...), i => concat_ws(" ",
  * slice(toks, i·stride+1, chunkLen)))` arithmetic of the chunk/segment
  * operators (stride = chunkLen ⇒ ⌈n/chunkLen⌉ disjoint segments;
  * stride < chunkLen ⇒ overlapping training chunks). Native for the
  * same reason as [[CollapseRunsExpr]]: the HOF formulation captures
  * the tokenizer expression inside the lambda and re-evaluates it per
  * CHUNK — O(chunks · n) regex splits per document. Empty input yields
  * one empty-string chunk (the callers filter empties out first).
  */
case class TokenChunksExpr(child: Expression, chunkLen: Int, stride: Int)
    extends UnaryExpression {
  import org.apache.spark.unsafe.types.UTF8String

  require(chunkLen >= 1 && stride >= 1 && stride <= chunkLen,
    s"need 1 <= stride <= chunkLen: got chunkLen=$chunkLen stride=$stride")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  def compute(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("tokenChunks", this, classOf[TokenChunksExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);"
    })

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    val overlap = chunkLen - stride
    val eff = math.max(n - overlap, 1)
    val k = math.max(1, (eff + stride - 1) / stride)
    val out = new Array[Any](k)
    var c = 0
    while (c < k) {
      val from = c * stride
      val until = math.min(from + chunkLen, n)
      val window = new Array[UTF8String](math.max(until - from, 0))
      if (until > from) System.arraycopy(toks, from, window, 0, until - from)
      out(c) = UTF8String.concatWs(space, window: _*)
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Stopword-profile language ID: array<string> lowercased tokens →
  * language code. Semantics pinned to the original Column formulation
  * (q26's oracle replays it): hits = token occurrences (WITH
  * multiplicity) in each profile's marker set; winner = max hits,
  * ties → lexicographically GREATEST language code; zero hits → "und".
  * Native because the Column form ran one interpreted HOF filter pass
  * per profile per row; here: one pass over the tokens against a
  * token→profile-bitmask map. */
case class LanguageIdExpr(child: Expression, profiles: Seq[(String, Seq[String])])
    extends UnaryExpression {
  import org.apache.spark.unsafe.types.UTF8String

  require(profiles.nonEmpty && profiles.size <= 62, "1..62 profiles")

  override def dataType: DataType = StringType

  // token → bitmask of profile indices containing it
  private lazy val mask: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long]()
    for (((_, words), p) <- profiles.zipWithIndex; w <- words) {
      val k = UTF8String.fromString(w)
      val prev = m.get(k)
      m.put(k, java.lang.Long.valueOf((if (prev == null) 0L else prev.longValue()) | (1L << p)))
    }
    m
  }
  private lazy val codes = profiles.map(p => UTF8String.fromString(p._1)).toArray
  private val und = UTF8String.fromString("und")

  def compute(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("languageId", this, classOf[LanguageIdExpr].getName)
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.compute($c);"
    })

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val hits = new Array[Int](codes.length)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val m = mask.get(arr.getUTF8String(i))
        if (m != null) {
          var bits = m.longValue()
          while (bits != 0L) {
            val p = java.lang.Long.numberOfTrailingZeros(bits)
            hits(p) += 1
            bits &= bits - 1
          }
        }
      }
      i += 1
    }
    var best = -1
    var p = 0
    while (p < codes.length) {
      // strictly-greater hits win; equal hits → lexicographically
      // greatest code wins (array_max on struct(hits, lang) semantics)
      if (best < 0 || hits(p) > hits(best) ||
        (hits(p) == hits(best) && codes(p).compareTo(codes(best)) > 0)) best = p
      p += 1
    }
    if (hits(best) > 0) codes(best) else und
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points for the text kernels. */
object TextExpressions {
  def ngramRepetition(tokens: Column, n: Int): Column =
    ExpressionUtils.column(NgramRepetitionExpr(ExpressionUtils.expression(tokens), n))

  def charEntropy(text: Column): Column =
    ExpressionUtils.column(CharEntropyExpr(ExpressionUtils.expression(text)))

  def collapseRuns(tokens: Column): Column =
    ExpressionUtils.column(CollapseRunsExpr(ExpressionUtils.expression(tokens)))

  def tokenChunks(tokens: Column, chunkLen: Int, stride: Int): Column =
    ExpressionUtils.column(
      TokenChunksExpr(ExpressionUtils.expression(tokens), chunkLen, stride))

  def languageId(tokens: Column, profiles: Seq[(String, Seq[String])]): Column =
    ExpressionUtils.column(
      LanguageIdExpr(ExpressionUtils.expression(tokens), profiles))
}
