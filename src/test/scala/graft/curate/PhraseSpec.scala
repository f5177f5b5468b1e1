package graft.curate

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PhraseSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a b a"),          // "a b" at 0 and 2 (overlapping runs count)
    (2L, "x a b y"),            // "a b" once
    (3L, "b a b a"),            // "a b" at 1; "a b a" at 1
    (4L, "zz zz zz"),           // no hits
    (5L, "")                    // empty text, no postings at all
  ).toDF("doc_id", "text")

  test("phraseSearch counts every start position, overlaps included") {
    val got = Phrase.phraseSearch(docs, "doc_id", "text", Seq(Seq("a", "b")))
      .select("doc_id", "n_occurrences").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("longer phrases chain position joins; phrase label column set") {
    val got = Phrase.phraseSearch(docs, "doc_id", "text",
        Seq(Seq("a", "b", "a"), Seq("zz", "zz")))
      .select("phrase", "doc_id", "n_occurrences").as[(String, Long, Long)]
      .collect().toSet
    // "a b a": doc 1 at starts 0 and 2, doc 3 at start 1
    // "zz zz": doc 4 at starts 0 and 1
    assert(got == Set(("a b a", 1L, 2L), ("a b a", 3L, 1L), ("zz zz", 4L, 2L)))
  }

  test("phraseHits serves repeated queries from one stored postings frame") {
    val idx = Phrase.positionalPostings(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val p1 = Phrase.phraseHits(idx, Seq(Seq("a", "b")))
        .select("doc_id").as[Long].collect().toSet
      val p2 = Phrase.phraseHits(idx, Seq(Seq("x", "a", "b", "y")))
        .select("doc_id", "n_occurrences").as[(Long, Long)].collect().toSet
      assert(p1 == Set(1L, 2L, 3L))
      assert(p2 == Set((2L, 1L)))
    } finally idx.unpersist()
  }

  test("duplicate terms inside a phrase filter independently per slot") {
    val got = Phrase.phraseSearch(Seq((1L, "a a a")).toDF("doc_id", "text"),
        "doc_id", "text", Seq(Seq("a", "a")))
      .select("n_occurrences").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }
}
