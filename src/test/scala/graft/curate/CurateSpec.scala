package graft.curate

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurateSpec extends SparkSpec {
  import spark.implicits._

  test("hashBucket matches the cross-engine md5 definition and is stable") {
    // expected values computed independently in DuckDB:
    //   cast(concat('0x', substr(md5(cast(i as varchar)), 1, 15)) as bigint) % 10
    val expected = Map(0L -> 8L, 1L -> 8L, 2L -> 6L, 3L -> 3L, 4L -> 9L)
    val got = spark.range(0, 5)
      .select(col("id"), Curate.hashBucket(col("id"), 10).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("deterministicSplit partitions the dataset disjointly by weight") {
    val df = spark.range(0, 1000).toDF("id")
    val splits = Curate.deterministicSplit(df, "id", Seq("train" -> 8, "val" -> 1, "test" -> 1))
    val counts = splits.map { case (k, v) => k -> v.count() }
    assert(counts.values.sum == 1000)
    // uniform hash: train ≈ 800 within generous tolerance
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("test") > 50)
    // disjoint and reproducible
    val again = Curate.deterministicSplit(df, "id", Seq("train" -> 8, "val" -> 1, "test" -> 1))
    assert(again("val").select("id").as[Long].collect().toSet ==
      splits("val").select("id").as[Long].collect().toSet)
  }

  test("salt derives an independent split from the same ids") {
    val df = spark.range(0, 1000).toDF("id")
    val a = Curate.hashBucket(col("id"), 10)
    val b = Curate.hashBucket(col("id"), 10, salt = "v2")
    val same = df.filter(a === b).count()
    assert(same > 0 && same < 300) // ~10% expected agreement
  }

  test("stratifiedSample keeps per-stratum fractions, default drops") {
    val df = spark.range(0, 2000)
      .select(col("id"), when(col("id") % 2 === 0, "even").otherwise("odd").as("stratum"))
    val sampled = Curate.stratifiedSample(df, "id", "stratum", Map("even" -> 0.5, "odd" -> 0.1))
    val byStratum = sampled.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(byStratum("even") > 400 && byStratum("even") < 600)
    assert(byStratum("odd") > 40 && byStratum("odd") < 160)
    // unknown strata default to 0.0
    val none = Curate.stratifiedSample(df, "id", "stratum", Map("nope" -> 1.0))
    assert(none.count() == 0)
  }

  test("chunkTokens: overlapping windows cover the document") {
    val docs = Seq((1L, "t1 t2 t3 t4 t5 t6"), (2L, "")).toDF("doc_id", "text")
    val chunks = Curate.chunkTokens(docs, "doc_id", "text", maxTokens = 3, overlap = 1)
      .select("id", "chunk_idx", "chunk_text", "n_tokens")
      .as[(Long, Int, String, Int)].collect().sortBy(r => (r._1, r._2)).toSeq
    // stride 2: [t1..t3], [t3..t5], [t5..t6]; empty doc -> no chunks
    assert(chunks == Seq(
      (1L, 0, "t1 t2 t3", 3), (1L, 1, "t3 t4 t5", 3), (1L, 2, "t5 t6", 2)))
  }

  test("bigramLogProb: known tiny corpus") {
    val docs = Seq(
      (1L, "a b"),   // bigram "a b", P = c("a b")/c("a ·") = 1/2
      (2L, "a c"),   // bigram "a c", P = 1/2
      (3L, "x")      // no bigrams -> dropped
    ).toDF("doc_id", "text")
    val out = Curate.bigramLogProb(docs, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(out.keySet == Set(1L, 2L))
    assert(math.abs(out(1L) - math.log(0.5)) < 1e-12)
    assert(math.abs(out(2L) - math.log(0.5)) < 1e-12)
  }

  test("tfidf: exact counts and smoothed idf") {
    val docs = Seq(
      (1L, "spark spark shuffle"),
      (2L, "spark join"),
      (3L, "window")
    ).toDF("doc_id", "text")
    val out = Curate.tfidf(docs, "doc_id", "text")
      .select("id", "term", "tf", "df", "tfidf")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(out((1L, "spark"))._1 == 2L && out((1L, "spark"))._2 == 2L)
    assert(out((3L, "window"))._2 == 1L)
    val expected = 2.0 * (math.log(4.0 / 3.0) + 1.0) // tf=2, N=3, df=2
    assert(math.abs(out((1L, "spark"))._3 - expected) < 1e-9)
  }
}
