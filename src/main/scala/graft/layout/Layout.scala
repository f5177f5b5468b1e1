package graft.layout

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering so that
  * range predicates on ANY of the clustered columns prune files, not just
  * the first sort key.
  *
  * A lexicographic sort on (a, b) gives perfect file pruning on `a` and
  * none on `b`; sorting by the interleaved-bit z-value gives every
  * clustered column locality proportional to its share of the bits — the
  * property parquet min/max file skipping (and any engine's scan pruning)
  * turns into IO savings. This is the same layout idea Delta/Iceberg
  * OPTIMIZE ZORDER applies, built from plain Spark primitives:
  * `repartitionByRange` on the z-value (range exchange = one pass,
  * sampled bounds) + `sortWithinPartitions` + per-partition files whose
  * z-ranges don't overlap.
  */
object Layout {

  /** Interleaved-bit (Morton) z-value of the given columns' low `bits`
    * bits: column c's bit i lands at output position i·ncols + c. Inputs
    * must already lie in [0, 2^bits) — clamp with `pmod`/bucketing first
    * (the battery query uses pmod; a production caller quantile-ranks
    * skewed columns before interleaving). Pure bit arithmetic composed
    * from codegen'd primitives (shiftright/bitwiseAND/shiftleft/OR), so
    * the whole kernel stays inside whole-stage codegen; total width
    * bits·ncols ≤ 63 keeps the value a positive long under ANSI. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits*ncols must fit a positive long, got $bits*${cols.size}")
    val n = cols.size
    val terms = for {
      i <- 0 until bits
      (c, ci) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + ci)
    terms.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-clustered on `cols` into `numFiles` parquet files whose
    * z-value ranges are pairwise disjoint (range partitioning guarantees
    * it; the within-partition sort tightens EVERY column's per-file
    * min/max, which is what the scan pruner reads). One range exchange —
    * the same shuffle count as any global sort — then a map-side sort. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], bits: Int,
                    numFiles: Int, path: String): Unit = {
    val z = zValue(cols.map(col), bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file min/max manifest for `cols` over a parquet directory — the
    * scan index a lake table format keeps in its metadata layer. Built
    * with ONE distributed scan (the ANALYZE-shaped one-time cost); the
    * result is file-count-sized, so it persists as a tiny table and every
    * subsequent selective query consults it instead of the data. */
  def fileStats(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fileStats needs at least one column")
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(cols.head)).as(s"${cols.head}_min"),
        (max(col(cols.head)).as(s"${cols.head}_max") +:
          cols.tail.flatMap(c =>
            Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))): _*)
  }

  /** Scan only the files whose [min, max] range for `c` intersects
    * [lo, hi], then apply the row-level filter on top — semantically
    * identical to a full filtered scan, but I/O-proportional to the
    * files that can match (file skipping, the point of [[writeZOrdered]]
    * / range layout). Returns (frame, filesKept, filesTotal) so callers
    * can assert skipping actually happened. The manifest collect is
    * file-count-sized by construction (a production layout keeps it as a
    * stored table and broadcasts the surviving file list the same way). */
  def prunedScan(spark: SparkSession, path: String, manifest: DataFrame,
                 c: String, lo: Long, hi: Long): (DataFrame, Int, Int) = {
    require(lo <= hi, s"empty range [$lo, $hi]")
    val rows = manifest.select(col("file"),
        col(s"${c}_min").cast("long"), col(s"${c}_max").cast("long"))
      .collect()
    // a file whose column is entirely NULL has NULL min/max stats; its
    // rows can never satisfy the range filter, so it prunes (a naive
    // getLong would NPE on exactly those files)
    val kept = rows.collect {
      case r if !r.isNullAt(1) && !r.isNullAt(2) &&
        r.getLong(2) >= lo && r.getLong(1) <= hi => r.getString(0)
    }
    val base =
      if (kept.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(kept: _*)
    (base.filter(col(c) >= lo && col(c) <= hi), kept.length, rows.length)
  }
}
