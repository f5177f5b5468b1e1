package graft.stats

import graft.SparkSpec

/** Pins [[Drift.psi]]: zero on identical snapshots, symmetry, the
  * empty-bucket smoothing path, and the value-domain exclusions. */
class DriftSpec extends SparkSpec {

  import spark.implicits._

  test("identical snapshots have zero PSI in every bucket") {
    val d = Seq(1L, 2L, 5L, 9L, 100L, 100L).toDF("v")
    val out = Drift.psi(d, d, "v").as[(Int, Long, Long, Double)].collect()
    assert(out.nonEmpty && out.forall(_._4 == 0.0), out.toSeq)
    assert(out.forall(r => r._2 == r._3))
  }

  test("disjoint distributions drift hard and symmetrically") {
    val a = Seq.fill(50)(2L).toDF("v")    // bucket of 2
    val b = Seq.fill(50)(200L).toDF("v")  // far bucket
    val ab = Drift.psi(a, b, "v").as[(Int, Long, Long, Double)].collect()
    val ba = Drift.psi(b, a, "v").as[(Int, Long, Long, Double)].collect()
    val psiAb = ab.map(_._4).sum
    assert(psiAb > 0.25, s"disjoint snapshots must exceed the action threshold: $psiAb")
    // PSI is symmetric: (p-q)ln(p/q) = (q-p)ln(q/p) per bucket
    assert(psiAb == ba.map(_._4).sum)
    // the empty side of each bucket is smoothed, not NaN/Inf
    assert(ab.forall(r => !r._4.isNaN && !r._4.isInfinite))
  }

  test("values below 1 and nulls are excluded from both histograms") {
    val a = Seq(Some(0L), Some(-5L), None, Some(4L)).toDF("v")
    val b = Seq(Some(4L)).toDF("v")
    val out = Drift.psi(a, b, "v").as[(Int, Long, Long, Double)].collect()
    assert(out.length == 1 && out(0)._2 == 1L && out(0)._3 == 1L && out(0)._4 == 0.0)
  }
}
