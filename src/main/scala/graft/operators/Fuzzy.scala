package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance similarity join and entity resolution over string
  * columns — "find every pair of values within k typos, and canonicalize".
  *
  * The scalable shape is prefix filtering from the string-similarity-join
  * literature (SSJoin / ED-Join family): two strings within Levenshtein
  * distance `d` must share at least one q-gram among the `d·q+1` globally
  * rarest q-grams of each (an edit edits at most `q` gram positions, so `d`
  * edits remove at most `d·q` elements from either gram set — pigeonhole on
  * a consistent global gram order does the rest; values with fewer than
  * `d·q+1` distinct grams contribute their whole gram set, which the same
  * argument still covers). So candidate generation is an equi-join on
  * prefix grams — never an all-pairs comparison — and the filter is
  * LOSSLESS: recall 1.0 by theorem, not by tuning (FuzzySpec pins this
  * against brute force on seeded typo'd vocabularies for both the self-join
  * and the two-table join).
  *
  * Scale shape: the join runs on the DISTINCT value vocabulary (entity
  * resolution canonicalizes a dictionary, then maps rows back — rows
  * never pair with rows). One shuffle builds gram document-frequencies,
  * one window ranks each value's grams rarest-first (both vocabulary-
  * sized), and ONE bucket-grouped shuffle on prefix grams streams
  * candidate pairs through the same capped-collect + generator machinery
  * as the LSH dedup tiers ([[graft.dedup.Dedup.bucketPairs]]). Rarest-first
  * prefix selection keeps posting lists short by construction; the cap
  * defaults to the no-cap sentinel because dropping a bucket would break
  * the exactness guarantee. Verification is Spark's codegen'd thresholded
  * `levenshtein` (banded DP, early exit above `maxDist`) after the
  * |length difference| <= d necessary condition prunes survivors.
  *
  * Values too short for the pigeonhole bound (fewer than `d·q+1` grams,
  * i.e. length <= d·q+q-1) can sit within distance `d` of a value while
  * sharing zero grams, so they bypass the gram path: the short vocabulary
  * is alphabet-bounded tiny and rides a broadcast against the length
  * window that could reach it.
  *
  * Reference scope: the reference has no fuzzy matching; this is part of
  * the beyond-reference curation family (entity/near-key reconciliation
  * before joins, the string-side sibling of MinHash document dedup).
  */
object Fuzzy {

  /** Raw (un-normalized) character q-grams of `s` as a distinct array.
    * Deliberately NOT [[graft.functions.TextFunctions.charNgrams]]: the
    * filter must see the exact string `levenshtein` verifies — any
    * normalization here would break the losslessness proof. Interpreted
    * HOF is fine: this runs on the distinct vocabulary, not the corpus. */
  private def rawGrams(s: Column, q: Int): Column =
    array_distinct(transform(sequence(lit(1), length(s) - (q - 1)),
      i => s.substr(i, lit(q))))

  /** Candidate pairs over a tagged vocabulary (`val`, `tag` columns,
    * distinct rows): every pair of rows within `maxDist` edits appears at
    * least once as (xval, xtag, yval, ytag), in arbitrary order and
    * possibly repeatedly — callers normalize/orient, dedupe, and verify. */
  private def candidatePairs(vocab: DataFrame, maxDist: Int, q: Int,
                             maxBucketSize: Int): DataFrame = {
    val shortMaxLen = maxDist * q + q - 1
    val longs = vocab.filter(length(col("val")) > shortMaxLen)
    val shorts = vocab.filter(length(col("val")) <= shortMaxLen)

    val grams = longs.select(col("val"), col("tag"),
      explode(rawGrams(col("val"), q)).as("gram"))
    // document frequency over the long vocabulary — the global rarity order
    val freqs = grams.groupBy("gram").agg(count(lit(1)).as("__f"))
    val prefLen = maxDist * q + 1
    val pref = grams.join(freqs, "gram")
      .withColumn("__r", row_number().over(
        Window.partitionBy("val", "tag").orderBy(col("__f"), col("gram"))))
      .filter(col("__r") <= prefLen)
      .select(col("gram"), col("val"), col("tag"))
    val gramCands = graft.dedup.Dedup.bucketPairs(pref, Seq("gram"), maxBucketSize)
      .select(col("__x.val").as("xval"), col("__x.tag").as("xtag"),
        col("__y.val").as("yval"), col("__y.tag").as("ytag"))

    // short values: every value within |Δlen| <= d of a short one is a
    // candidate; the short set is tiny (bounded by the alphabet at
    // length <= d·q+q-1), so it broadcasts and the vocabulary streams.
    val reachable = vocab.filter(length(col("val")) <= shortMaxLen + maxDist)
    val shortCands = reachable
      .join(broadcast(shorts.select(col("val").as("__s"), col("tag").as("__st"))),
        abs(length(col("val")) - length(col("__s"))) <= maxDist &&
          !(col("val") === col("__s") && col("tag") === col("__st")))
      .select(col("val").as("xval"), col("tag").as("xtag"),
        col("__s").as("yval"), col("__st").as("ytag"))

    gramCands.unionByName(shortCands)
  }

  private def distinctVals(df: DataFrame, valueCol: String): DataFrame =
    graft.dedup.Dedup.ensureParallelism(
        df.select(col(valueCol).cast("string").as("val"))
          .filter(col("val").isNotNull))
      .distinct()

  /** All unordered pairs of DISTINCT non-null values of `valueCol` within
    * Levenshtein distance `maxDist` (>= 1). Returns
    * (val_a, val_b, dist) with val_a < val_b, dist in 1..maxDist. */
  def editDistancePairs(df: DataFrame, valueCol: String, maxDist: Int,
                        q: Int = 2,
                        maxBucketSize: Int = Int.MaxValue): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    require(q >= 2, "q must be >= 2")
    val vocab = distinctVals(df, valueCol).withColumn("tag", lit(0))
    candidatePairs(vocab, maxDist, q, maxBucketSize)
      // length band BEFORE the distinct: pairs that can never verify must
      // not ride the pair-dedup exchange
      .filter(abs(length(col("xval")) - length(col("yval"))) <= maxDist)
      .select(least(col("xval"), col("yval")).as("val_a"),
        greatest(col("xval"), col("yval")).as("val_b"))
      .distinct() // bands of prefix grams can emit the same pair repeatedly
      .withColumn("dist", levenshtein(col("val_a"), col("val_b"), maxDist))
      .filter(col("dist") =!= -1)
  }

  /** Two-table fuzzy equi-join on the distinct vocabularies: every
    * (left value, right value) pair within `maxDist` edits — INCLUDING
    * exact matches (dist 0) — as (left_val, right_val, dist). The
    * entity-linking shape: match dirty strings against a canonical
    * dictionary without an all-pairs comparison; both vocabularies share
    * one gram-frequency order, so the same losslessness proof covers
    * cross-side pairs. */
  def editDistanceJoin(left: DataFrame, leftCol: String,
                       right: DataFrame, rightCol: String, maxDist: Int,
                       q: Int = 2,
                       maxBucketSize: Int = Int.MaxValue): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    require(q >= 2, "q must be >= 2")
    val vocab = distinctVals(left, leftCol).withColumn("tag", lit(0))
      .unionByName(distinctVals(right, rightCol).withColumn("tag", lit(1)))
    candidatePairs(vocab, maxDist, q, maxBucketSize)
      .filter(col("xtag") =!= col("ytag") &&
        abs(length(col("xval")) - length(col("yval"))) <= maxDist)
      .select(
        when(col("xtag") === 0, col("xval")).otherwise(col("yval")).as("left_val"),
        when(col("xtag") === 0, col("yval")).otherwise(col("xval")).as("right_val"))
      .distinct()
      .withColumn("dist", levenshtein(col("left_val"), col("right_val"), maxDist))
      .filter(col("dist") =!= -1)
  }

  /** Cluster the distinct values of `valueCol` at Levenshtein distance
    * <= `maxDist` (transitively — typo chains merge) and map every value
    * to its cluster's minimum value. Returns (val, canonical); values with
    * no fuzzy neighbor map to themselves.
    *
    * Pairs feed the same connected-components engine as document dup
    * clusters ([[graft.dedup.Dedup.duplicateClusters]]) — labels are the
    * string values themselves (min-label propagation is type-generic), so
    * no id assignment and no hash-collision risk. */
  def resolveEntities(df: DataFrame, valueCol: String, maxDist: Int,
                      q: Int = 2): DataFrame = {
    val pairs = editDistancePairs(df, valueCol, maxDist, q)
    val cc = graft.dedup.Dedup.duplicateClusters(
      pairs.select(col("val_a").as("id_a"), col("val_b").as("id_b")))
    val vocab = distinctVals(df, valueCol)
    vocab.join(cc.withColumnRenamed("id", "val"), Seq("val"), "left")
      .select(col("val"), coalesce(col("cluster_id"), col("val")).as("canonical"))
  }
}
