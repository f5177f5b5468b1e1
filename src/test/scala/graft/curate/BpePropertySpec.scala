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
}
