package graft.curate

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property pinning [[Bpe]]'s incremental driver trainer
  * (maintained pair counts + lazy-invalidation max-heap, per-merge
  * touch-only-affected-words) BIT-IDENTICAL to the simple recount
  * reference across randomized corpora. The generator is built to stress
  * the bookkeeping the incremental form must get exactly right:
  * tiny alphabets force repeated / overlapping pairs ("aaaa" chains) and
  * frequent count TIES (the code-point tie-break must fire), duplicated
  * words exercise frequency weighting, and deep merge counts run the
  * vocabulary down to pair exhaustion (heap drain + early stop). */
object BpePropertySpec extends Properties("BpeDriverRegimes") {

  private val wordGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 8)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val vocabGen: Gen[Array[(String, Long)]] = for {
    k <- Gen.chooseNum(1, 12)
    ws <- Gen.listOfN(k, wordGen)
    fs <- Gen.listOfN(k, Gen.chooseNum(1L, 5L))
  } yield ws.distinct.zip(fs).toArray

  property("incremental trainer == recount reference, merge for merge") =
    Prop.forAll(vocabGen, Gen.chooseNum(1, 20)) { (vocab, k) =>
      Bpe.driverMerges(vocab, k) == Bpe.driverMergesRecount(vocab, k)
    }

  // ---- BpeSegmentExpr's rank-skip loop vs the DEFINITIONAL semantics ----
  // The native kernel finds "smallest rank > last-applied present as an
  // adjacent pair" instead of iterating every rank; this property pins it
  // against the definition (fold each rank in order) on ADVERSARIAL merge
  // tables: compound symbols (so later merges can re-create earlier
  // pairs, which sequential semantics must NOT merge), duplicate pairs at
  // several ranks, and merges that never apply. Pure JVM — the expression
  // evaluates without a session.

  private def refToSymbols(w: String): Array[String] = {
    val syms = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      syms += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    syms.toArray
  }

  private def refFold(syms: Array[String], l: String, r: String): Array[String] =
    if (syms.length < 2) syms
    else {
      val nb = scala.collection.mutable.ArrayBuffer(syms(0))
      var i = 1
      while (i < syms.length) {
        if (nb.last == l && syms(i) == r) nb(nb.length - 1) = l + r
        else nb += syms(i)
        i += 1
      }
      nb.toArray
    }

  private def refSegments(w: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = refToSymbols(w)
    merges.foreach { case (l, r) => syms = refFold(syms, l, r) }
    syms.toSeq
  }

  private val symGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 3) // compound symbols included
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b'))
  } yield cs.mkString

  private val mergesGen: Gen[Seq[(String, String)]] = for {
    k <- Gen.chooseNum(0, 25)
    ms <- Gen.listOfN(k, Gen.zip(symGen, symGen)) // duplicates allowed
  } yield ms

  property("BpeSegmentExpr == definitional sequential fold") =
    Prop.forAll(Gen.listOf(wordGen), mergesGen) { (words, merges) =>
      val expr = graft.functions.expressions.BpeSegmentExpr(null, merges)
      words.forall { w =>
        val got = expr.nullSafeEval(
            org.apache.spark.unsafe.types.UTF8String.fromString(w))
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val gotSeq = (0 until got.numElements())
          .map(i => got.getUTF8String(i).toString)
        gotSeq == refSegments(w, merges)
      }
    }
}
