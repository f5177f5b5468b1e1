package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE segmentation under a learned merge table: STRING word →
  * array<string> symbols, applying merges SEQUENTIALLY BY RANK, each
  * greedily left-to-right non-overlapping — exactly the
  * [[graft.curate.Bpe]] training contract (and the DuckDB replace-chain
  * replay the q152/q155 oracles run).
  *
  * Native because the replace-chain formulation
  * (`merges.foldLeft(wrapped)((c, m) => replace(c, ...))`) builds a
  * k-DEEP nested Catalyst expression tree: fine at the gated k=8,
  * analyzer/codegen-pathological at a production tokenizer's 30k–50k
  * merges (ADVICE r7) — a 30k-deep tree overflows the analyzer stack
  * before any row is processed. Here the merge table rides in the
  * expression as data (one plan node at ANY k), and evaluation is
  * k-INDEPENDENT per word: O(L²) hash lookups for a word of L symbols,
  * not O(k·L).
  *
  * The k-independence device: sequential application ≡ "repeatedly fold
  * the SMALLEST rank greater than the last applied rank that is present
  * as an adjacent pair". Each step scans the word's ≤L−1 adjacent pairs
  * against a (lhs, rhs) → ranks map; absent ranks cost nothing. The
  * `rank > rCur` monotonicity is what distinguishes this from the
  * GPT-2-style min-rank encoder loop: a fold can CREATE an adjacency of
  * an earlier rank (when a later merge's symbol string-equals an earlier
  * pair's side), and sequential semantics must NOT merge it —
  * BpePropertySpec pins equivalence against the replace-chain
  * formulation on randomized corpora, BpeSpec at depth.
  *
  * A pair can legitimately appear at SEVERAL ranks (a later merge can
  * re-create a previously exhausted training adjacency), so the map
  * carries every rank and lookup takes the first one > rCur.
  *
  * Module precondition (shared with [[graft.curate.Bpe]]): symbols never
  * contain U+001D — it is the internal pair-key separator here and the
  * repr delimiter there.
  */
case class BpeSegmentExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val Sep = '\u001d'

  // (lhs SEP rhs) -> ascending ranks (1-based); lhs/rhs indexed by rank
  @transient private lazy val lhsByRank: Array[String] = merges.map(_._1).toArray
  @transient private lazy val rhsByRank: Array[String] = merges.map(_._2).toArray
  @transient private lazy val ranksByPair: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
    var i = 0
    while (i < merges.length) {
      val key = merges(i)._1 + Sep + merges(i)._2
      var b = m.get(key)
      if (b == null) { b = scala.collection.mutable.ArrayBuffer.empty[Int]; m.put(key, b) }
      b += (i + 1) // ArrayBuffer append keeps ranks ascending
      i += 1
    }
    val out = new java.util.HashMap[String, Array[Int]](m.size())
    m.forEach((k, v) => out.put(k, v.toArray))
    out
  }

  // code-point symbols — a supplementary char is ONE symbol, exactly as
  // substr/split see it in both engines (the Bpe.toSymbols contract)
  private def toSymbols(w: String): Array[String] = {
    val syms = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      syms += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    syms.toArray
  }

  // greedy left-to-right non-overlapping fold of one merge
  private def foldMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val nb = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    nb += syms(0)
    var i = 1
    while (i < syms.length) {
      if (nb.last == l && syms(i) == r) nb(nb.length - 1) = l + r
      else nb += syms(i)
      i += 1
    }
    nb.toArray
  }

  def compute(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bpeSegment", this, classOf[BpeSegmentExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);"
    })

  override def nullSafeEval(input: Any): Any = {
    var syms = toSymbols(input.asInstanceOf[UTF8String].toString)
    var rCur = 0
    var done = syms.length < 2
    while (!done) {
      // smallest rank > rCur present as an adjacent pair
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val ranks = ranksByPair.get(syms(i) + Sep + syms(i + 1))
        if (ranks != null) {
          var j = 0
          while (j < ranks.length && ranks(j) <= rCur) j += 1
          if (j < ranks.length && ranks(j) < best) best = ranks(j)
        }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        syms = foldMerge(syms, lhsByRank(best - 1), rhsByRank(best - 1))
        rCur = best
        done = syms.length < 2
      }
    }
    new GenericArrayData(
      syms.map(s => UTF8String.fromString(s): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
