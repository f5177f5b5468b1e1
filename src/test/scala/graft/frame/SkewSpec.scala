package graft.frame

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join, rows spread across salt buckets") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i)).toDF("k", "v")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k7", "B")).toDF("k", "tag")
    val plain = big.join(small, Seq("k")).select("k", "v", "tag")
      .as[(String, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(big, small, "k", salt = 8).select("k", "v", "tag")
      .as[(String, Int, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == "hot") == 100)
  }

  test("keyHistogram surfaces the hot key") {
    val big = (1 to 500).map(i => (if (i % 5 == 0) "hot" else s"k$i", i)).toDF("k", "v")
    val top = Skew.keyHistogram(big, "k", topN = 1).as[(String, Long)].collect()(0)
    assert(top == ("hot", 100L))
  }

  test("analyze surfaces heavy keys with exact counts and a sensible salt") {
    // one key holds half the rows: share 0.5 over 8 partitions -> salt 4
    val df = ((1 to 500).map(_ => "hot") ++ (1 to 500).map(i => s"k${i % 100}"))
      .toDF("key")
    val got = Skew.analyze(df, "key", parts = 8, k = 64, topN = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.head == (("hot", 500L, 0.5, 4)))
    // uniform tail keys (5 rows each, share 0.005) need no salting
    assert(got.tail.forall(_._4 == 1))
    // the Misra-Gries guarantee: every key above n/(k+1) must be surfaced
    assert(got.map(_._1).contains("hot"))
  }

  test("capBuckets guard: oversized LSH buckets are excluded from pairs") {
    // 60 identical docs would form a 60²-pair bucket; cap at 10 removes them
    val docs = ((1 to 60).map(i => (i.toLong, "same same same text here repeated again")) ++
      Seq((100L, "a unique document body one"), (101L, "a unique document body one")))
      .toDF("doc_id", "text")
    val capped = graft.dedup.Dedup.minhashPairs(docs, "doc_id", "text",
      threshold = 0.5, maxBucketSize = 10)
    val pairs = capped.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 101L)))
    val uncapped = graft.dedup.Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
    assert(uncapped.count() > 1000) // the 60-doc clique dominates without the cap
  }
}
