package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust (outlier-resistant) statistics, all in the integer-exact
  * discipline of [[Anomaly]]: weighted medians via prefix sums (no
  * division — the "≥ half the total weight" test cross-multiplies) and
  * winsorized sums that clamp to scaled integer percentile bounds.
  * Every output is a bigint; nothing can flip on float summation order.
  */
object Robust {

  /** Lower weighted median per group: the smallest value v (on the cent
    * grid) whose cumulative weight reaches half the group total
    * (2·cumw(v) ≥ W — the standard lower-median convention, integer
    * exact). Weights must be non-negative integers after rounding
    * (`⌊w + 0.5⌋`); zero-weight rows cannot be the median unless tied
    * with positive-weight mass at the same value.
    *
    * Scale shape: one group shuffle + in-partition sort (the exact-
    * percentile price); everything after the cumulative window is
    * group-sized. Returns (group, total_w, med_cents). */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
                     weightCol: String): DataFrame = {
    // enforce the non-negative-weight precondition IN the plan (a
    // negative weight makes the cumulative sum non-monotone and the
    // half-crossing meaningless — error, never nonsense)
    val w0 = floor(col(weightCol) + lit(0.5)).cast("long")
    val base = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .select(col(groupCol).as("__g"),
        floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long").as("__c"),
        when(w0 >= 0, w0).otherwise(raise_error(concat(
          lit("weightedMedian: negative weight "), w0.cast("string")))).as("__w"))
    val byG = Window.partitionBy(col("__g"))
    val cum = base
      .withColumn("__cum", sum(col("__w")).over(byG.orderBy(col("__c"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tot", sum(col("__w")).over(byG))
    cum.filter(col("__cum") * 2 >= col("__tot"))
      .groupBy(col("__g"))
      .agg(max(col("__tot")).as("total_w"), min(col("__c")).as("med_cents"))
      .withColumnRenamed("__g", groupCol)
  }

  /** Winsorized sum per group: values clamp to the [pLo, pHi] type-7
    * percentile bounds before summing — the robust total that a single
    * corrupted reading cannot drag. Bounds come from [[Anomaly]]'s
    * integer t_num arithmetic (scaled by `pDen`), so the clamped sum is
    * reported in cents·pDen units (`wsum_num`; divide by 100·pDen for
    * dollars). Returns (group, n, lo_num, hi_num, wsum_num) — all
    * bigint, all engine-replayable.
    *
    * Scale shape: the same one-sort-per-group as every exact percentile,
    * then a broadcast-back second pass for the clamped sum. */
  def winsorizedSum(df: DataFrame, groupCol: String, valueCol: String,
                    loNum: Int, hiNum: Int, pDen: Int = 100): DataFrame = {
    require(0 <= loNum && loNum <= hiNum && hiNum <= pDen,
      s"need 0 <= lo <= hi <= den, got $loNum/$hiNum/$pDen")
    val base = Anomaly.centsBase(df, groupCol, valueCol)
    // ONE group pass computes BOTH bounds — the t_num formula itself is
    // Anomaly.t7BoundAgg, defined exactly once for operator and siblings
    val bounds = Anomaly.rankedBase(base)
      .groupBy(col("__g"))
      .agg(Anomaly.t7BoundAgg(loNum, pDen).as("lo_num"),
        Anomaly.t7BoundAgg(hiNum, pDen).as("hi_num"))
    Anomaly.joinBackNullSafe(base, bounds)
      .groupBy(col("__g"), col("lo_num"), col("hi_num"))
      .agg(count(lit(1)).as("n"),
        sum(greatest(col("lo_num"),
          least(col("hi_num"), col("__c") * lit(pDen.toLong)))).as("wsum_num"))
      .select(col("__g").as(groupCol), col("n"), col("lo_num"),
        col("hi_num"), col("wsum_num"))
  }
}
