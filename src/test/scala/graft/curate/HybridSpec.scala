package graft.curate

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HybridSpec extends SparkSpec {
  import spark.implicits._

  test("lcmUnits: exact constant, overflow guarded") {
    assert(Hybrid.lcmUnits(60, 5) === 495593280L)
    assert(Hybrid.lcmUnits(60, 1) === 61L)
    intercept[IllegalArgumentException](Hybrid.lcmUnits(60, 40))
  }

  test("rrfFuse: hand-computed fusion in exact lcm units") {
    // L = lcm(61, 62) = 3782; weights rank1=62, rank2=61
    val a = Seq(("q1", 10L, 1), ("q1", 20L, 2)).toDF("qid", "doc_id", "rank")
    val b = Seq(("q1", 20L, 1), ("q1", 30L, 2)).toDF("qid", "doc_id", "rank")
    val out = Hybrid.rrfFuse(Seq(a, b), "qid", "doc_id", "rank",
        maxRank = 2, topK = 3).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("q1", 1, 20L, 123L), // 61 + 62: in both lists
      ("q1", 2, 10L, 62L),
      ("q1", 3, 30L, 61L)))
  }

  test("rrfFuse: equal scores tie-break on doc id; over-maxRank rows ignored") {
    val a = Seq(("q", 9L, 1), ("q", 4L, 2), ("q", 7L, 3)).toDF("qid", "doc_id", "rank")
    val b = Seq(("q", 4L, 1), ("q", 9L, 2)).toDF("qid", "doc_id", "rank")
    // maxRank=2: a's rank-3 row (doc 7) must not contribute at all
    val out = Hybrid.rrfFuse(Seq(a, b), "qid", "doc_id", "rank",
        maxRank = 2, topK = 3).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    // docs 4 and 9 both get 62+61=123 -> tie broken by id: 4 before 9
    assert(out.toSeq === Seq((1, 4L, 123L), (2, 9L, 123L)))
  }

  test("denseTopK: quantized cosine ranks with id tie-break, self kept") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.6f, 0.8f)),
      (3L, Array(-1.0f, 0.0f)),
      (4L, Array(2.0f, 0.0f)) // same direction as 1 -> cos 1.0, tie with 1
    ).toDF("vec_id", "embedding")
    val qs = Seq((1L, Array(1.0f, 0.0f))).toDF("qid", "qvec")
    val out = Hybrid.denseTopK(corpus, qs, "vec_id", "embedding",
        "qid", "qvec", k = 3).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    // cos4: 1 -> 10000, 4 -> 10000 (tie, id order), 2 -> 6000
    assert(out.toSeq === Seq((1, 1L, 10000L), (2, 4L, 10000L), (3, 2L, 6000L)))
  }

  test("denseTopK ranks through the heap node, never a window sort") {
    import spark.implicits._
    val corpus = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val qs = Seq((1L, Array(1.0f, 0.0f))).toDF("qid", "qvec")
    val plan = Hybrid.denseTopK(corpus, qs, "vec_id", "embedding",
      "qid", "qvec", k = 1).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"heap node missing:\n$plan")
    assert(!plan.contains("Window"), s"window sort crept in:\n$plan")
  }

  test("fusion of a sparse-only query (no dense list) is well-defined") {
    val sparse = Seq(("qa", 1L, 1), ("qb", 2L, 1)).toDF("qid", "doc_id", "rank")
    val dense = Seq(("qa", 1L, 1)).toDF("qid", "doc_id", "rank")
    val out = Hybrid.rrfFuse(Seq(sparse, dense), "qid", "doc_id", "rank",
        maxRank = 5, topK = 5).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSet
    val l = Hybrid.lcmUnits(60, 5)
    assert(out === Set(("qa", 1L, 2 * (l / 61)), ("qb", 2L, l / 61)))
  }
}
