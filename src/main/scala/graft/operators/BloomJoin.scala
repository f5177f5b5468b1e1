package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered semi join — the manual form of a runtime filter
  * (DPP/runtime-filter's portable cousin): build a Bloom filter over the
  * small side's join keys, drop non-matching big-side rows AT THE SCAN
  * (codegen'd probe, before any exchange), then run the exact semi join
  * on the survivors. False positives are removed by the exact join, so
  * the result is IDENTICAL to the plain semi join — the bloom only
  * shrinks what shuffles.
  *
  * At 100 TB this is the difference between shuffling the full fact
  * table and shuffling the ~matching fraction: with a 1% match rate and
  * 16 bits/key (FP ≈ 0.04%), the exchange carries ~1/100th of the
  * bytes. The filter itself is one small-side aggregation broadcast as
  * plan state (same mechanism as [[graft.dedup.Dedup.bloomDecontaminate]],
  * which is the ANTI-join dual).
  */
object BloomJoin {

  /** Rows of `big` whose `bigKey` appears in `small.smallKey` —
    * left-semi semantics (null keys never match). */
  def semiJoin(big: DataFrame, bigKey: String, small: DataFrame, smallKey: String,
               bitsPerKey: Int = 16, numHashes: Int = 7): DataFrame = {
    import graft.functions.expressions.{BloomFilterOps => B, BloomKernels}
    // by-contract-small key set; three consumers (count, bloom, join) —
    // materialize once
    val keys = small.select(col(smallKey).as(bigKey))
      .filter(col(bigKey).isNotNull).distinct().localCheckpoint(true)
      .transform(graft.plan.Checkpoints.track) // escapes via the semi join
    val n = keys.count()
    if (n == 0) return big.limit(0)
    val numBits = 64L * BloomKernels.numWords(n, bitsPerKey)
    val bloom = keys
      .select(B.bloomAgg(xxhash64(col(bigKey)), numBits, numHashes).as("bf"))
      .head().getAs[Array[Byte]](0)
    big.filter(B.bloomContains(xxhash64(col(bigKey)), bloom, numHashes))
      .join(keys, Seq(bigKey), "left_semi")
  }
}
