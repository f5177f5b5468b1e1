package graft.plan

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties pinning [[LatticeAdvisor]]'s pure HRU greedy
  * against an INDEPENDENTLY-written reference (different data layout —
  * lists of picks folded functionally, no mutable cost buffer) and
  * against the greedy's classic invariants, on randomized lattices:
  * random cardinalities (deliberately NOT monotone in the grain —
  * estimates from the approx pass need not be), random workloads with
  * duplicate grains, budgets past the candidate count, and tiny value
  * ranges that force benefit TIES (the (benefit, ncols, name) order
  * must break them identically in both implementations). */
object LatticeAdvisorPropertySpec extends Properties("LatticeAdvisorGreedy") {

  private val names = Seq("a", "b", "c")

  private case class Lattice(card: Map[Int, Long], qMasks: Seq[Int],
                             n: Long, k: Int)

  private val latticeGen: Gen[Lattice] = for {
    d <- Gen.chooseNum(1, 3)
    // small value range -> frequent exact benefit ties
    cards <- Gen.listOfN(1 << d, Gen.chooseNum(1L, 12L))
    nq <- Gen.chooseNum(1, 5)
    qs <- Gen.listOfN(nq, Gen.chooseNum(0, (1 << d) - 1))
    n <- Gen.chooseNum(12L, 40L)
    k <- Gen.chooseNum(1, (1 << d) + 2) // budgets past the candidate count
  } yield Lattice((0 until (1 << d)).map(m => m -> cards(m)).toMap,
    qs, n, k)

  private def grainOf(mask: Int) =
    names.zipWithIndex.collect { case (nm, i) if (mask & (1 << i)) != 0 => nm }

  /** The reference: fold over rounds, recomputing per-query costs from
    * the PICK LIST each time (no running cost state to get wrong). */
  private def reference(l: Lattice): Seq[LatticeAdvisor.Advice] = {
    def costOf(q: Int, picks: List[Int]): Long =
      (l.n :: picks.collect { case v if (q & v) == q => l.card(v) }).min
    def round(step: Int, picks: List[Int],
              acc: List[LatticeAdvisor.Advice]): List[LatticeAdvisor.Advice] =
      if (step > math.min(l.k, l.card.size)) acc.reverse
      else {
        val options = l.card.keys.toSeq.filterNot(picks.contains).map { v =>
          val ben = l.qMasks.filter(q => (q & v) == q)
            .map(q => math.max(0L, costOf(q, picks) - l.card(v))).sum
          val g = grainOf(v)
          ((-ben, g.size, LatticeAdvisor.grainName(g)), v, ben)
        }
        val (_, v, ben) = options.minBy(_._1)
        round(step + 1, v :: picks,
          LatticeAdvisor.Advice(step, grainOf(v), l.card(v), ben) :: acc)
      }
    round(1, Nil, Nil)
  }

  property("greedy == independent reference, round for round") =
    Prop.forAll(latticeGen) { l =>
      LatticeAdvisor.greedy(l.card, l.qMasks, l.n, l.k, names) == reference(l)
    }

  property("picks are distinct and bounded by the candidate count") =
    Prop.forAll(latticeGen) { l =>
      val out = LatticeAdvisor.greedy(l.card, l.qMasks, l.n, l.k, names)
      val masks = out.map(_.grain.toSet)
      masks.distinct.size == masks.size &&
        out.size == math.min(l.k, l.card.size)
    }

  property("per-round benefits are non-increasing (HRU submodularity)") =
    Prop.forAll(latticeGen) { l =>
      val bens = LatticeAdvisor.greedy(l.card, l.qMasks, l.n, l.k, names)
        .map(_.benefit)
      bens.zip(bens.drop(1)).forall { case (a, b) => a >= b }
    }
}
