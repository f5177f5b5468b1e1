package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity auditing — the governance gate of a training-data
  * release: a row is re-identifiable when its quasi-identifier
  * combination (the "equivalence class") is shared by fewer than k rows,
  * so before publishing, the pipeline measures how much of the dataset
  * sits in small classes and generalizes (bins, truncates, suppresses)
  * until the audit passes.
  *
  * Pure counting — integer-exact and engine-replayable by construction.
  * Scale shape: one hash aggregation on the quasi-identifier tuple (the
  * class-size table), then a class-count-sized rollup; the corpus moves
  * once and row text never moves at all.
  */
object Privacy {

  /** One-row audit summary over the given quasi-identifier columns:
    * total classes, classes smaller than k, rows in those classes (the
    * re-identifiable population), and the smallest class size. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[Column], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, "k-anonymity below 2 is vacuous")
    df.groupBy(quasiCols: _*)
      .agg(count(lit(1)).as("__sz"))
      .agg(
        count(lit(1)).as("n_classes"),
        sum(when(col("__sz") < k, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("__sz") < k, col("__sz")).otherwise(0L)).as("rows_at_risk"),
        min(col("__sz")).as("min_class_size"))
  }

  /** Width-`binWidth` generalization of a numeric quasi-identifier —
    * floor-bin in integer arithmetic (cast first: CAST(double AS
    * BIGINT) truncation differs between engines; callers bin values
    * that are already integral, e.g. cents or whole amounts). */
  def generalizeBin(c: Column, binWidth: Long): Column = {
    require(binWidth > 0, "binWidth must be positive")
    (c.cast("long") - pmod(c.cast("long"), lit(binWidth))).as("bin")
  }
}
