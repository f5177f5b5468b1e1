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
