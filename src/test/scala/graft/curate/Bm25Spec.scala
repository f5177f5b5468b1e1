package graft.curate

import graft.SparkSpec

/** Pins [[Bm25]] against the Okapi formula computed by hand, the
  * quantized-score tie-break, and the blank-doc exclusion from corpus
  * statistics. */
class Bm25Spec extends SparkSpec {

  import spark.implicits._

  private val k1 = 1.2
  private val b = 0.75

  private def idf(n: Double, df: Double): Double =
    math.log(1 + (n - df + 0.5) / (df + 0.5))

  private def term(n: Double, df: Double, tf: Double, dl: Double, avgdl: Double): Double =
    idf(n, df) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

  test("scores match the hand-computed Okapi formula; blank docs excluded") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "durian durian durian durian"),
      (4L, "   ")). // blank: excluded from N and avgdl
      toDF("doc_id", "text")
    val queries = Seq((100L, "apple banana")).toDF("qid", "qtext")
    val got = Bm25.topK(docs, "doc_id", "text", queries, "qid", "qtext", k = 5)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    val (n, avgdl) = (3.0, 3.0) // three non-blank docs of lengths 3, 2, 4
    val s1 = term(n, 2, 2, 3, avgdl) + term(n, 1, 1, 3, avgdl)
    val s2 = term(n, 2, 1, 2, avgdl)
    val round4 = (x: Double) => BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((100L, 1, 1L), (100L, 2, 2L)), got.toSeq) // d3 never matches
    assert(got(0)._4 == round4(s1) && got(1)._4 == round4(s2), got.toSeq)
  }

  test("identical docs tie on the quantized score and break by doc id") {
    val docs = Seq((10L, "zz yy"), (11L, "zz yy"), (12L, "ww")).toDF("doc_id", "text")
    val queries = Seq((1L, "zz")).toDF("qid", "qtext")
    val got = Bm25.topK(docs, "doc_id", "text", queries, "qid", "qtext", k = 5)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    assert(got.map(r => (r._2, r._3)).toSeq == Seq((1, 10L), (2, 11L)), got.toSeq)
    assert(got(0)._4 == got(1)._4)
  }

  test("empty or all-blank corpus yields an empty result, not a crash") {
    val queries = Seq((1L, "anything")).toDF("qid", "qtext")
    val blank = Seq((1L, "   "), (2L, "")).toDF("doc_id", "text")
    assert(Bm25.scores(blank, "doc_id", "text", queries, "qid", "qtext").count() == 0)
    val out = Bm25.topK(blank.limit(0), "doc_id", "text", queries, "qid", "qtext", k = 3)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("qid", "rank", "doc_id", "score"))
  }

  test("stored index serves identically to the direct path") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "durian durian banana durian")).toDF("doc_id", "text")
    val queries = Seq((100L, "apple banana"), (101L, "cherry")).toDF("qid", "qtext")
    val direct = Bm25.topK(docs, "doc_id", "text", queries, "qid", "qtext", k = 3)
      .as[(Long, Int, Long, Double)].collect().toSet
    val tmp = java.nio.file.Files.createTempDirectory("bm25_idx").toString
    try {
      Bm25.saveIndex(Bm25.buildIndex(docs, "doc_id", "text"), tmp)
      val served = Bm25.topKAgainstIndex(
          Bm25.loadIndex(spark, tmp), queries, "qid", "qtext", k = 3)
        .as[(Long, Int, Long, Double)].collect().toSet
      // doubles round-trip parquet exactly; quantized ranking pins the rest
      assert(served == direct, s"served=$served direct=$direct")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("looped calls leave nothing in the cache manager") {
    spark.catalog.clearCache()
    val docs = Seq((1L, "aa bb"), (2L, "bb cc"), (3L, "cc aa")).toDF("doc_id", "text")
    val queries = Seq((9L, "aa cc")).toDF("qid", "qtext")
    (1 to 3).foreach { _ =>
      assert(Bm25.topK(docs, "doc_id", "text", queries, "qid", "qtext", k = 2)
        .collect().nonEmpty)
    }
    assert(spark.sharedState.cacheManager.isEmpty,
      "Bm25 call left persisted frames behind")
  }

  test("incremental index after appends serves EXACTLY the full rebuild") {
    val all = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "durian durian banana durian"),
      (4L, "cherry apple banana"),
      (5L, "banana banana"),
      (6L, "   "), // blank arrives in an APPEND: must not dilute stats
      (7L, "cherry durian apple")).toDF("doc_id", "text")
    val queries = Seq((100L, "apple banana"), (101L, "cherry durian"))
      .toDF("qid", "qtext")
    val direct = Bm25.topK(all, "doc_id", "text", queries, "qid", "qtext", k = 4)
      .as[(Long, Int, Long, Double)].collect().toSet
    val tmp = java.nio.file.Files.createTempDirectory("bm25_inc").toString
    try {
      Bm25.saveIncIndex(
        Bm25.buildIncIndex(all.filter($"doc_id" <= 2), "doc_id", "text"), tmp)
      Bm25.appendIncIndex(spark, tmp,
        all.filter($"doc_id" > 2 && $"doc_id" <= 5), "doc_id", "text")
      Bm25.appendIncIndex(spark, tmp, all.filter($"doc_id" > 5), "doc_id", "text")
      val served = Bm25.topKAgainstIncIndex(
          Bm25.loadIncIndex(spark, tmp), queries, "qid", "qtext", k = 4)
        .as[(Long, Int, Long, Double)].collect().toSet
      assert(served == direct, s"served=$served direct=$direct")
      // maintenance stats merged exactly: 6 non-blank docs, total dl
      val idx = Bm25.loadIncIndex(spark, tmp)
      assert(idx.nDocs == 6.0 && idx.totalDl == 3 + 2 + 4 + 3 + 2 + 3)
      // an all-blank append is a no-op, not a corruption
      Bm25.appendIncIndex(spark, tmp,
        Seq((8L, "  ")).toDF("doc_id", "text"), "doc_id", "text")
      assert(Bm25.loadIncIndex(spark, tmp).nDocs == 6.0)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("inc-index serving broadcasts the query side; appends leave no cache entries") {
    spark.catalog.clearCache()
    val docs = Seq((1L, "aa bb"), (2L, "bb cc"), (3L, "cc aa")).toDF("doc_id", "text")
    val queries = Seq((9L, "aa cc")).toDF("qid", "qtext")
    val tmp = java.nio.file.Files.createTempDirectory("bm25_inc2").toString
    try {
      Bm25.saveIncIndex(Bm25.buildIncIndex(docs.filter($"doc_id" === 1L), "doc_id", "text"), tmp)
      (2L to 3L).foreach { i =>
        Bm25.appendIncIndex(spark, tmp, docs.filter($"doc_id" === i), "doc_id", "text")
      }
      val served = Bm25.topKAgainstIncIndex(Bm25.loadIncIndex(spark, tmp),
        queries, "qid", "qtext", k = 2)
      val plan = served.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"query terms must broadcast onto the postings:\n$plan")
      assert(served.collect().nonEmpty)
      assert(spark.sharedState.cacheManager.isEmpty,
        "incremental index ops left persisted frames behind")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("top-k truncates per query at k with the heap node") {
    val docs = (1L to 20L).map(i => (i, "common t" + i)).toDF("doc_id", "text")
    val queries = Seq((1L, "common")).toDF("qid", "qtext")
    val got = Bm25.topK(docs, "doc_id", "text", queries, "qid", "qtext", k = 3)
      .as[(Long, Int, Long, Double)].collect()
    assert(got.length == 3 && got.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L))
    val plan = Bm25.topK(docs, "doc_id", "text", queries, "qid", "qtext", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"heap node missing:\n$plan")
  }
}
