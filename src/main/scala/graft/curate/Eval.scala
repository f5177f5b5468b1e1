package graft.curate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval evaluation — the measurement half of the BM25/ANN/MMR
  * stack: given ranked results and a relevance-judgment table (qrels),
  * report recall@k and MRR so retrieval changes are gated on numbers.
  *
  * Integer-exact MRR device: reciprocal ranks are rationals, and summed
  * doubles invite cross-engine ulp drift — so the sum is reported in
  * 1/2520 units (2520 = lcm(1..10): every reciprocal of a rank ≤ 10 is
  * an exact multiple), as a BIGINT. `mrr = rr2520_sum / (2520·n)` when a
  * real number is wanted; the gate hashes the integers.
  *
  * Scale shape: one join of results against qrels on (query, doc) — the
  * qrels side is judgment-sized and broadcasts; one result-sized
  * aggregation. Nothing corpus-sized moves.
  */
object Eval {

  /** One-row summary: distinct queries in `results`, queries whose
    * relevant doc appears (n_hit — recall@k numerator for whatever k
    * produced `results`), and the scaled reciprocal-rank sum of the
    * BEST-ranked hit per query. Ranks must be ≤ 10 (the 2520 scale).  */
  def retrievalMetrics(results: DataFrame, qidCol: String, docCol: String,
                       rankCol: String, qrels: DataFrame,
                       qrelQidCol: String, qrelDocCol: String): DataFrame = {
    val hits = results
      .join(broadcast(qrels),
        results(qidCol) === qrels(qrelQidCol) && results(docCol) === qrels(qrelDocCol))
      .groupBy(results(qidCol))
      .agg(min(results(rankCol)).as("hit_rank"))
    // enforce the documented rank ≤ 10 precondition IN the plan: a hit at
    // rank 11+ would make `2520 div rank` silently inexact — the one
    // thing the 2520 scaling exists to prevent — so it errors instead
    val rr = when(col("hit_rank").isNull, lit(null)) // miss: no contribution
      .when(col("hit_rank") <= 10, expr("2520 div hit_rank"))
      .otherwise(raise_error(concat(
        lit("retrievalMetrics: hit rank > 10 breaks the 1/2520 exactness "),
        col("hit_rank").cast("string"))))
    results.select(col(qidCol)).distinct()
      .join(hits, Seq(qidCol), "left")
      .agg(count(lit(1)).as("n_queries"),
        count(col("hit_rank")).as("n_hit"),
        coalesce(sum(rr), lit(0)).cast("long").as("rr2520_sum"))
  }
}
