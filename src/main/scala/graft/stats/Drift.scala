package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two snapshots of a corpus — the
  * "did this crawl/rebuild shift the data" gate a pipeline runs before
  * promoting a new snapshot (the distributional sibling of
  * [[Expectations]]' per-rule bounds and [[Profile]]'s one-pass summary).
  *
  * Population Stability Index over the SAME integer-exact msb+2-sub-bit
  * buckets as [[Profile.histogramQuantiles]] (floor(log2) via
  * `length(bin(v))` — both engines agree bit-for-bit, so the bucket
  * HISTOGRAM is exact and only the final PSI terms are floats). Add-half
  * smoothing keeps empty buckets defined: p = (n + 0.5) / (N + K/2) with
  * K = buckets observed in either snapshot.
  *
  * Scale shape: each snapshot aggregates once to its (bucket, count)
  * histogram — the value stream shuffles once as bucket ids — and
  * everything after the full-outer histogram join runs on ≤ a few hundred
  * rows (the single-partition window is histogram-sized, never
  * data-sized). Conventional read: PSI < 0.1 stable, 0.1-0.25 moderate
  * drift, > 0.25 action. */
object Drift {

  private def histogram(df: DataFrame, valueCol: String): DataFrame =
    df.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v") >= 1) // v <= 0 has no msb; also drops NULLs
      .withColumn("__msb", (length(bin(col("__v"))) - 1).cast("int"))
      .withColumn("__sub",
        when(col("__msb") >= 2,
          expr("shiftright(__v, __msb - 2)").bitwiseAND(lit(3L)))
          .otherwise(lit(0L)).cast("int"))
      .groupBy((col("__msb") * 4 + col("__sub")).as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Per-bucket PSI decomposition between snapshots A and B of
    * `valueCol`: (bucket, n_a, n_b, psi_term) with the term rounded to
    * `decimals`. Σ psi_term is the PSI. Values < 1 and NULLs are excluded
    * from both histograms (shift upstream if they must count). */
  def psi(dfA: DataFrame, dfB: DataFrame, valueCol: String,
          decimals: Int = 4): DataFrame = {
    val j = histogram(dfA, valueCol).withColumnRenamed("n", "n_a")
      .join(histogram(dfB, valueCol).withColumnRenamed("n", "n_b"),
        Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    // histogram-sized totals: ≤ a few hundred rows, so one unpartitioned
    // window beats re-scanning both corpora for a scalar aggregate
    val all = Window.orderBy("bucket").rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val pa = (col("n_a") + lit(0.5)) /
      (sum(col("n_a")).over(all) + count(lit(1)).over(all) * lit(0.5))
    val pb = (col("n_b") + lit(0.5)) /
      (sum(col("n_b")).over(all) + count(lit(1)).over(all) * lit(0.5))
    j.select(col("bucket"), col("n_a"), col("n_b"),
      round((pa - pb) * log(pa / pb), decimals).as("psi_term"))
  }
}
