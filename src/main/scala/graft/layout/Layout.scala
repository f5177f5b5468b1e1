package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
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
}
