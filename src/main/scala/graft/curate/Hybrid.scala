package graft.curate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{SimilarityFunctions => S}

/** Hybrid retrieval: fuse independent per-query rankings (sparse BM25,
  * dense cosine, ...) by Reciprocal Rank Fusion (Cormack et al. 2009,
  * the industry-standard hybrid-search combiner): score(d) =
  * Σ_lists 1/(k0 + rank_list(d)), missing-from-a-list contributes 0.
  *
  * Determinism device: RRF scores are computed in EXACT INTEGER units of
  * 1/L where L = lcm(k0+1 .. k0+maxRank) — every reciprocal rank is a
  * whole number of units (the q131 MRR device, generalized), so fusion
  * sums, ordering, and the rank cut are pure BIGINT arithmetic with a
  * doc-id tie-break: no float appears anywhere in the fusion itself.
  * Cross-engine determinism of the INPUT rankings is each retriever's
  * contract (BM25 ranks on the 4dp-quantized score, [[denseTopK]] on the
  * 1e-4-quantized cosine, both with id tie-breaks).
  *
  * Scale shape: fusion operates on ranking lists (queries × k rows),
  * never on the corpus — one (q,d) aggregation plus a per-query window
  * over ≤ lists·maxRank candidates, regardless of corpus size.
  */
object Hybrid {

  /** lcm(k0+1 .. k0+maxRank), required to fit a signed 64-bit long.
    * private[graft] so the q154 oracle interpolates the SAME constant —
    * units can never drift between engine and replay. */
  private[graft] def lcmUnits(k0: Int, maxRank: Int): Long = {
    val l = (k0 + 1 to k0 + maxRank)
      .map(BigInt(_)).foldLeft(BigInt(1))((a, b) => a * b / a.gcd(b))
    require(l.isValidLong,
      s"lcm($k0+1..$k0+$maxRank) = $l exceeds 64-bit range — lower maxRank")
    l.toLong
  }

  /** Fuse rankings (each with columns qCol, dCol, rankCol where rank is
    * 1-based) into (qCol, rank INT, dCol, rrf_units BIGINT): top `topK`
    * per query by (rrf desc, doc asc). Rows with rank > maxRank are
    * ignored (documented cut — lists may be longer than the fusion
    * window). */
  def rrfFuse(rankings: Seq[DataFrame], qCol: String, dCol: String,
              rankCol: String, maxRank: Int, topK: Int,
              k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val l = lcmUnits(k0, maxRank)
    val contribs = rankings.map { r =>
      r.select(col(qCol), col(dCol), col(rankCol).cast("long").as("__rk"))
        .filter(col("__rk") >= 1 && col("__rk") <= maxRank)
        .select(col(qCol), col(dCol),
          // `div`, not `/`: Column./ is DOUBLE division; L is divisible
          // by every (k0+rank) by construction, so div is exact
          expr(s"${l}L div (${k0}L + __rk)").as("__w"))
    }.reduce(_ unionByName _)
    val fused = contribs.groupBy(col(qCol), col(dCol))
      .agg(sum("__w").as("rrf_units"))
    val w = Window.partitionBy(qCol).orderBy(col("rrf_units").desc, col(dCol))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col(qCol), col("rank"), col(dCol), col("rrf_units"))
  }

  /** Exact dense top-k with CROSS-ENGINE-DETERMINISTIC ranks: corpus
    * streamed against broadcast queries (zero corpus shuffle), ranked on
    * the 1e-4-QUANTIZED cosine (⌊cos·10⁴+½⌋ BIGINT) with id tie-break —
    * the q129 device, so a SQL oracle reproduces every rank bit-for-bit
    * provided the quantization margins are probed. Self-matches are kept
    * (a retrieval corpus legitimately contains the query's source). */
  def denseTopK(corpus: DataFrame, queries: DataFrame,
                corpusId: String, corpusVec: String,
                queryId: String, queryVec: String, k: Int): DataFrame = {
    val c = corpus.select(col(corpusId).as("__nid"), col(corpusVec).as("__nvec"))
    val qs = queries.select(col(queryId).as("__qid"), col(queryVec).as("__qvec"))
    val scored = graft.dedup.Dedup.ensureParallelism(c)
      .crossJoin(broadcast(qs))
      .select(col("__qid"), col("__nid"),
        floor(S.cosine(col("__qvec"), col("__nvec")) * lit(10000.0) + lit(0.5))
          .cast("long").as("cos4"))
    // heap top-k node, not a window: a window would sort the whole
    // corpus per query; the heap keeps k rows per query map-side
    graft.plan.TopKPerGroup(scored, Seq(col("__qid")),
        Seq(col("cos4").desc, col("__nid").asc), k, rankName = "rank")
      .select(col("__qid").as(queryId), col("rank"),
        col("__nid").as(corpusId), col("cos4"))
  }
}
