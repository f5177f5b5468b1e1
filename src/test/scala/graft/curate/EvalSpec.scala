package graft.curate

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("retrievalMetrics: recall and scaled MRR, best-ranked hit per query") {
    val results = Seq(
      // q1: relevant doc at rank 2 (and again at 4 — min wins)
      (1L, 1, 900L), (1L, 2, 101L), (1L, 3, 901L), (1L, 4, 101L),
      // q2: miss
      (2L, 1, 900L),
      // q3: hit at rank 1
      (3L, 1, 103L)
    ).toDF("qid", "rank", "doc_id")
    val qrels = Seq((1L, 101L), (2L, 102L), (3L, 103L)).toDF("rq", "rdoc")
    val got = Eval.retrievalMetrics(results, "qid", "doc_id", "rank", qrels, "rq", "rdoc")
      .as[(Long, Long, Long)].collect().head
    // 3 queries, 2 hits, rr = 2520/2 + 2520/1 = 3780
    assert(got == ((3L, 2L, 3780L)))
  }

  test("retrievalMetrics: zero hits yields a zero sum, not null") {
    val results = Seq((1L, 1, 9L)).toDF("qid", "rank", "doc_id")
    val qrels = Seq((1L, 101L)).toDF("rq", "rdoc")
    val got = Eval.retrievalMetrics(results, "qid", "doc_id", "rank", qrels, "rq", "rdoc")
      .as[(Long, Long, Long)].collect().head
    assert(got == ((1L, 0L, 0L)))
  }
}
