package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => T}

/** [[Dedup.exactJaccardPairs]] claims recall 1.0 by theorem — these tests
  * hold it to that: the output must EQUAL the brute-force O(N²) join, not
  * approximate it, on constructed edge cases and on real testdata. */
class ExactJaccardSpec extends SparkSpec {
  import spark.implicits._

  private def brute(df: DataFrame, tauNum: Int, tauDen: Int,
                    shingleLen: Int = 3): Set[(Long, Long, Int, Int)] = {
    val sets = df
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        array_distinct(T.wordShingles(col("text"), shingleLen)).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      c = (sa & sb).size; u = sa.size + sb.size - c
      if c.toLong * tauDen >= u.toLong * tauNum
    } yield (ia, ib, c, u)).toSet
  }

  private def run(df: DataFrame, tauNum: Int, tauDen: Int): Set[(Long, Long, Int, Int)] =
    Dedup.exactJaccardPairs(df, "doc_id", "text", 3, tauNum, tauDen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSet

  test("equals brute force on edge cases: dups, near-dups, short and empty docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup
      (3L, "the quick brown fox jumps over the lazy dog again and again now"), // near dup
      (4L, "completely different content about spark query engines and shuffles here"),
      (5L, "tiny doc"), // < shingleLen tokens: whole text is the one shingle
      (6L, "tiny doc"), // exact dup of the short doc
      (7L, ""), // empty: excluded on both sides
      (8L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    for ((p, q) <- Seq((9, 10), (4, 5), (1, 2), (1, 1))) {
      val expected = brute(docs, p, q)
      assert(run(docs, p, q) == expected, s"tau=$p/$q")
    }
    // sanity on the fixture itself: the exact dups and the short-doc pair
    // are found at tau=1, the near dup only at lower tau
    assert(run(docs, 1, 1).map(t => (t._1, t._2)) == Set((1L, 2L), (5L, 6L)))
    assert(run(docs, 4, 5).map(t => (t._1, t._2)).contains((1L, 3L)))
  }

  test("auto-routing: discriminative corpus takes the exact path and equals brute force") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val (pairs, regime) = Dedup.jaccardPairsAuto(docs, "doc_id", "text", 3, 9, 10)
    assert(regime.startsWith("exact-prefix"), regime)
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    assert(got == brute(docs, 9, 10))
  }

  test("auto-routing: dense small-vocab corpus routes to LSH with precision 1.0") {
    // 120 docs drawn from a 6-word vocabulary: every shingle's posting is
    // huge (mean posting >> 8), the regime the prefix filter must avoid.
    // Doc i and doc i+60 are exact dups, so LSH banding finds them with
    // certainty (identical signatures share every band).
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val docs = (0 until 120).map { i =>
      val r = new scala.util.Random(i % 60) // i and i+60 generate the same text
      (i.toLong, Seq.fill(30)(words(r.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val (pairs, regime) = Dedup.jaccardPairsAuto(docs, "doc_id", "text", 3, 1, 1)
    assert(regime.startsWith("lsh"), regime)
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    val truth = brute(docs, 1, 1)
    assert(got.subsetOf(truth), "precision must be 1.0 (exact verify)")
    // identical docs are guaranteed found; at tau=1 qualifying pairs are
    // exactly the equal shingle SETS, which hash to identical signatures
    assert(got == truth,
      s"missed=${(truth -- got).size} of ${truth.size} identical-set pairs")
  }

  test("equals brute force on real sf0.001 documents at two thresholds") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    for ((p, q) <- Seq((9, 10), (4, 5))) {
      val expected = brute(docs, p, q)
      val got = run(docs, p, q)
      assert(got == expected,
        s"tau=$p/$q: missed=${(expected -- got).size} extra=${(got -- expected).size}")
      assert(expected.nonEmpty, s"fixture degenerate at tau=$p/$q — no pairs to check")
    }
  }
}
