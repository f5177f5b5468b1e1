package graft.dedup

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property for the prefix-filter lemma [[Dedup.exactJaccardPairs]]
  * rests on: under ANY total order on shingles (the operator uses corpus
  * rarity; the lemma needs only totality), if J(x, y) ≥ tauNum/tauDen then
  * the first `|s| − ceil(tau·|s|) + 1` order-sorted shingles of x and of y
  * share an element. Tested against a RANDOM total order per sample —
  * strictly stronger than the frequency order the implementation picks —
  * across the full rational-threshold grid including tau = 1 (exact dup)
  * and adversarial small sets where the prefix is a single element.
  * ExactJaccardSpec pins the DataFrame implementation ≡ brute force; this
  * pins the mathematical reason no pair can escape. */
object PrefixFilterPropertySpec extends Properties("PrefixFilter") {

  private def prefixLen(n: Int, tauNum: Int, tauDen: Int): Int =
    n - ((n * tauNum + tauDen - 1) / tauDen) + 1

  private val alphabet = ('a' to 'p').map(_.toString)

  private val setGen: Gen[Set[String]] =
    Gen.chooseNum(1, alphabet.size).flatMap(k => Gen.pick(k, alphabet)).map(_.toSet)

  private val tauGen: Gen[(Int, Int)] =
    Gen.oneOf((1, 2), (3, 5), (7, 10), (4, 5), (9, 10), (19, 20), (1, 1))

  private val orderGen: Gen[Map[String, Int]] =
    Gen.const(alphabet).flatMap(a => Gen.pick(a.size, a.indices).map(r => a.zip(r).toMap))

  property("qualifying pairs always collide in both prefixes, any total order") =
    Prop.forAll(setGen, setGen, tauGen, orderGen) { (x, y, tau, rank) =>
      val (p, q) = tau
      val inter = (x & y).size
      val union = (x | y).size
      val qualifies = inter.toLong * q >= union.toLong * p
      def prefix(s: Set[String]): Set[String] =
        s.toSeq.sortBy(e => (rank(e), e)).take(prefixLen(s.size, p, q)).toSet
      !qualifies || (prefix(x) & prefix(y)).nonEmpty
    }

  property("prefix length is well-formed: 1 <= L <= n, and L = n at tau -> 0 bound") =
    Prop.forAll(Gen.chooseNum(1, 10000), tauGen) { (n, tau) =>
      val (p, q) = tau
      val l = prefixLen(n, p, q)
      l >= 1 && l <= n
    }

  property("the bound is tight: shortening any prefix by one admits an escape") =
    // at tau = 1/2 with x = {a,b}, y = {b,c} under order a<b<c: J = 1/3 < tau
    // is NOT qualifying, but x = y = {a,b} IS and single-element prefixes
    // {a},{a} still collide; the constructed witness below shows a
    // qualifying pair whose ONLY common prefix element sits exactly at
    // position L — so L−1 would lose it (the lemma's minimality).
    Prop.forAll(Gen.chooseNum(3, alphabet.size), Gen.oneOf((1, 2), (3, 5), (7, 10))) { (n, tau) =>
      val (p, q) = tau
      val s = alphabet.take(n).toSet
      val l = prefixLen(n, p, q)
      // x = full set; y = drop x's first l−1 elements (order = alphabet).
      // Then x∩y's minimum is x's l-th element: common iff prefix keeps l.
      val y = alphabet.slice(l - 1, n).toSet
      val inter = (s & y).size
      val union = (s | y).size
      def pref(t: Set[String], keep: Int) = t.toSeq.sorted.take(keep).toSet
      val qualifies = inter.toLong * q >= union.toLong * p
      // when the shrunk pair still qualifies, the full-length prefixes must
      // catch it while (l−1)-length prefixes of x provably cannot
      !qualifies || ((pref(s, l) & pref(y, prefixLen(y.size, p, q))).nonEmpty &&
        (pref(s, l - 1) & y).isEmpty)
    }
}
