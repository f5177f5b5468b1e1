package graft.curate

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("feature extraction = unigrams + bigrams, no sub-2-token bigram quirk") {
    // all-ones weight table turns importance into an exact n-gram count:
    // "a" -> 1 (no bigram for a 1-token doc), "a a" -> 3, "a b c" -> 5
    val ones = spark.range(4096).select(col("id").as("bucket"),
      lit(1L).as("lw_micro"))
    val scored = Dsir.scoreDocs(
      docs((1L, "a"), (2L, "a a"), (3L, "a b c"), (4L, "")),
      "doc_id", "text", ones).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(scored === Map(1L -> 1L, 2L -> 3L, 3L -> 5L, 4L -> 0L))
  }

  test("empty and no-ngram docs keep importance 0 (never vanish)") {
    val t = docs((0L, "target words here"))
    val r = docs((1L, "raw words here"), (2L, ""), (3L, "   "))
    val w = Dsir.fitWeights(t, r, "text")
    val out = Dsir.scoreDocs(r, "doc_id", "text", w).collect()
    assert(out.length === 3)
    val byId = out.map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(byId(2L) === 0L && byId(3L) === 0L)
  }

  test("target-distinctive docs outscore raw-typical docs") {
    val t = docs((0L, "science physics theorem"), (10L, "physics theorem proof"))
    val r = docs(
      (1L, "physics theorem lemma"), // target-like
      (2L, "spam casino pills"), // raw-only vocabulary
      (3L, "spam casino pills spam casino"))
    val w = Dsir.fitWeights(t, r, "text")
    val top = Dsir.selectTopK(
      Dsir.scoreDocs(r, "doc_id", "text", w), "doc_id", 1).collect()
    assert(top(0).getLong(0) === 1L)
    val scores = Dsir.scoreDocs(r, "doc_id", "text", w).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(scores(1L) > scores(2L) && scores(1L) > scores(3L))
  }

  test("selectTopK breaks integer ties by id") {
    val scored = Seq((5L, 100L), (3L, 100L), (9L, 200L), (7L, 100L))
      .toDF("doc_id", "imp_micro")
    val top = Dsir.selectTopK(scored, "doc_id", 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top === Seq((9L, 200L), (3L, 100L), (5L, 100L)))
  }

  test("weight table covers the full bucket spine exactly once") {
    val w = Dsir.fitWeights(docs((0L, "x y")), docs((1L, "p q")), "text",
      buckets = 64)
    assert(w.count() === 64)
    assert(w.select(countDistinct("bucket")).collect()(0).getLong(0) === 64)
  }

  test("an empty (token-free) side yields pure-smoothing weights, not an NPE") {
    val w = Dsir.fitWeights(docs((0L, "")), docs((1L, "some words")), "text",
      buckets = 64)
    assert(w.count() === 64)
    // with nT = 0 every bucket's target term is ln(0.5/32) — defined
    assert(w.select(countDistinct("lw_micro")).collect()(0).getLong(0) >= 1)
  }

  test("fit + score leave nothing in the cache manager") {
    spark.catalog.clearCache()
    val t = docs((0L, "alpha beta gamma"))
    val r = docs((1L, "alpha delta"), (2L, "epsilon zeta"))
    val w = Dsir.fitWeights(t, r, "text")
    Dsir.scoreDocs(r, "doc_id", "text", w).collect()
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
