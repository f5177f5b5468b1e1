package graft.ann

import graft.SparkSpec

class MmrSpec extends SparkSpec {
  import spark.implicits._

  // q = (1,0,0); exact-ratio cosines:
  //   a=(4,3,0): rel .8;  b=(3,4,0): rel .6;  c=(3,0,4): rel .6;  d=(0,0,1): rel 0
  //   sim(a,b)=.96  sim(a,c)=.48  sim(b,c)=.36  sim(c,d)=.8
  private val corpus = Seq(
    (1L, Array(4.0f, 3.0f, 0.0f)),
    (2L, Array(3.0f, 4.0f, 0.0f)),
    (3L, Array(3.0f, 0.0f, 4.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")
  private val q = Array(1.0, 0.0, 0.0)

  test("diverseTopK: diversity term flips the rel4 tie toward the distant candidate") {
    val got = Mmr.diverseTopK(corpus, "vec_id", "embedding", q,
        candidates = 4, k = 3, lambdaNum = 7L, lambdaDen = 10L)
      .as[(Int, Long, Long)].collect().toSeq
    // pick1 = a; pick2: b and c tie at rel4 6000, but obj(c) = 42000-3*4800
    // beats obj(b) = 42000-3*9600 — diversity selects c OVER the smaller-id
    // b; pick3 = b (13200) over d (-24000)
    assert(got == Seq((1, 1L, 8000L), (2, 3L, 6000L), (3, 2L, 6000L)))
  }

  test("diverseTopK: pure relevance (lambda=1) is plain ranked top-k") {
    val got = Mmr.diverseTopK(corpus, "vec_id", "embedding", q,
        candidates = 4, k = 3, lambdaNum = 1L, lambdaDen = 1L)
      .as[(Int, Long, Long)].collect().toSeq
    // no diversity penalty: rel4 desc with id tie-break → a, b, c
    assert(got == Seq((1, 1L, 8000L), (2, 2L, 6000L), (3, 3L, 6000L)))
  }

  test("diverseTopK: candidate pool bounds the result") {
    val got = Mmr.diverseTopK(corpus, "vec_id", "embedding", q,
        candidates = 2, k = 2)
      .as[(Int, Long, Long)].collect().toSeq
    // pool is {a, b} (rel4 ranking with id tie-break); both picked
    assert(got.map(_._2) == Seq(1L, 2L))
  }
  test("diverseTopK == independent reference greedy over 3 seeded random pools") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val dim = 8
      val n = 30
      val vecs = (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() - 0.3f)))
      val df = vecs.toDF("vec_id", "embedding")
      val qv = Array.fill(dim)(rnd.nextDouble() - 0.3)
      val k = 6
      val got = Mmr.diverseTopK(df, "vec_id", "embedding", qv, candidates = n, k = k,
        lambdaNum = 3L, lambdaDen = 5L)
        .as[(Int, Long, Long)].collect().toSeq
      // reference: same quantization, independent greedy over ALL vectors
      def sim4(a: Array[Double], b: Array[Double]): Long = {
        var d = 0.0; var na = 0.0; var nb = 0.0
        for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
        val den = math.sqrt(na) * math.sqrt(nb)
        math.floor((if (den == 0) 0.0 else d / den) * 10000.0 + 0.5).toLong
      }
      val pool = vecs.map { case (id, v) =>
        (id, v.map(_.toDouble), sim4(v.map(_.toDouble), qv)) }
      var sel = List.empty[(Long, Long)]
      var rem = pool
      while (sel.size < k) {
        val best = rem.minBy { case (id, v, rel) =>
          val obj = if (sel.isEmpty) 3L * rel
            else 3L * rel - 2L * sel.map(s => sim4(v, pool(s._1.toInt)._2)).max
          (-obj, id)
        }
        sel = sel :+ ((best._1, best._3)); rem = rem.filterNot(_._1 == best._1)
      }
      val expect = sel.zipWithIndex.map { case ((id, rel), i) => (i + 1, id, rel) }
      assert(got == expect, s"seed $seed: got $got expect $expect")
    }
  }
}
