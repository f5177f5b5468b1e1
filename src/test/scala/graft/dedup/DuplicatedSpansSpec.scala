package graft.dedup

import graft.SparkSpec

/** Pins [[Dedup.duplicatedSpans]]'s semantics on constructed corpora:
  * cross-doc and within-doc duplication, the merge-vs-split boundary at a
  * coverage gap of exactly windowLen, and the under-length exclusion. */
class DuplicatedSpansSpec extends SparkSpec {

  import spark.implicits._

  private def toks(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  private def spans(docs: Seq[(Long, String)]): Set[(Long, Int, Int, Int)] =
    Dedup.duplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
      windowLen = 10)
      .as[(Long, Int, Int, Int)].collect().toSet

  test("a 12-token run shared across docs yields one maximal 3-window span") {
    val shared = toks("c", 12)
    val docs = Seq(
      1L -> (toks("a", 7) + " " + shared + " " + toks("b", 5)),
      2L -> (toks("x", 3) + " " + shared))
    // doc 1: duplicated window starts 7,8,9 -> span [7, 19); doc 2: 3,4,5
    assert(spans(docs) == Set((1L, 7, 19, 3), (2L, 3, 15, 3)))
  }

  test("gap of exactly windowLen merges; one more token splits") {
    val w1 = toks("p", 10)
    val w2 = toks("q", 10)
    // helpers duplicate each window; they are full-doc spans themselves
    val helpers = Seq(10L -> w1, 11L -> w2)
    val adjacent = spans((1L -> (w1 + " " + w2)) +: helpers)
    assert(adjacent((1L, 0, 20, 2)), adjacent) // starts 0,10: diff == 10 merges
    val split = spans((1L -> (w1 + " gap0 " + w2)) +: helpers)
    assert(split((1L, 0, 10, 1)) && split((1L, 11, 21, 1)), split)
  }

  test("within-doc repetition marks both occurrences") {
    val s = toks("r", 10)
    val doc = 1L -> (s + " " + toks("f", 5) + " " + s)
    // starts 0 and 15: gap 15 > 10 -> two spans
    val got = spans(Seq(doc)).filter(_._1 == 1L)
    assert(got == Set((1L, 0, 10, 1), (1L, 15, 25, 1)))
  }

  test("docs shorter than the window and unique docs contribute nothing") {
    assert(spans(Seq(
      1L -> toks("s", 9), 2L -> toks("s", 9), // dup but under-length
      3L -> toks("u", 30))).isEmpty) // long but unique
  }
}
