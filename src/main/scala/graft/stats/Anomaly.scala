package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group percentile-threshold anomaly counting — "how many events
  * sit above this group's p99?", the standard tail-monitoring primitive
  * (latency SLOs, spend spikes, abuse scoring), computed EXACTLY and
  * engine-portably.
  *
  * The float trap: a type-7 interpolated percentile is a double, and
  * `value > threshold` flips between engines when summation/rounding
  * noise moves either side across the boundary. Everything here is
  * therefore integer arithmetic on the value's cent grid
  * (`⌊x·100 + 0.5⌋` — the one portable double op):
  * for group size n and percentile p = num/den,
  *   h = num·(n−1),  k = h div den,  r = h mod den,
  *   t_num = x_(k)·(den − r) + x_(k+1)·r      (x ascending, 0-indexed)
  * is the type-7 threshold scaled by 100·den — exact in bigints — and a
  * row is "above" iff cents·den > t_num. No doubles ever compared.
  *
  * Scale shape: one shuffle on the group key with an in-partition sort
  * (what any exact percentile costs — the mergeable approximate
  * counterpart is [[Profile]]'s histogram sketch); the group-sized
  * threshold frame broadcasts back onto a second pass of the slim
  * (group, cents) projection. Corpus values move once.
  */
object Anomaly {

  /** The slim (group `__g`, integer `__c`) projection every operator
    * here starts from. NULL values drop (they have no rank). */
  private[stats] def centsBase(df: DataFrame, groupCol: String,
                               valueCol: String): DataFrame = df
    .filter(col(valueCol).isNotNull)
    .select(col(groupCol).as("__g"),
      floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long").as("__c"))

  /** `base` ranked within each group by `__c`, with group size `__n` —
    * the shared precursor of every type-7 computation. */
  private[stats] def rankedBase(base: DataFrame): DataFrame = {
    val byGroup = Window.partitionBy(col("__g"))
    base
      .withColumn("__rn", row_number().over(byGroup.orderBy(col("__c"))))
      .withColumn("__n", count(lit(1)).over(byGroup))
  }

  /** Aggregate expression computing the scaled integer type-7 bound
    * t_num = x_(k)·(den−r) + x_(k+1)·r for percentile num/den over a
    * ranked group (columns `__c`, `__rn`, `__n`) — THE formula; defined
    * once so [[thresholdCounts]] and [[Robust.winsorizedSum]] (and their
    * two oracle replays) can never drift apart. */
  private[stats] def t7BoundAgg(num: Int, den: Int): org.apache.spark.sql.Column = {
    val k = expr(s"($num * (__n - 1)) div $den")
    val r = expr(s"($num * (__n - 1)) % $den")
    val xk = max(when(col("__rn") === k + 1, col("__c")))
    val xk1 = max(when(col("__rn") === k + 2, col("__c")))
    xk * (lit(den.toLong) - max(r)) + coalesce(xk1, xk) * max(r)
  }

  /** Broadcast `groupFrame` (group-sized, keyed `__g`) back onto `base`
    * with NULL-SAFE key equality — a plain equi-join would silently drop
    * the null group the aggregation formed (SQL GROUP BY groups nulls;
    * join `=` never matches them). */
  private[stats] def joinBackNullSafe(base: DataFrame,
                                      groupFrame: DataFrame): DataFrame =
    base.join(broadcast(groupFrame.withColumnRenamed("__g", "__g2")),
      col("__g") <=> col("__g2")).drop("__g2")

  /** (group, n, t_num, n_above): group size, the scaled integer
    * threshold (divide by 100·`pDen` for the real-valued percentile),
    * and the count strictly above it. NULL values are excluded (they
    * have no rank); NULL groups form their own group as in SQL GROUP BY. */
  def thresholdCounts(df: DataFrame, groupCol: String, valueCol: String,
                      pNum: Int = 99, pDen: Int = 100): DataFrame = {
    require(pNum >= 0 && pDen > 0 && pNum <= pDen, s"bad percentile $pNum/$pDen")
    val base = centsBase(df, groupCol, valueCol)
    val thresholds = rankedBase(base)
      .groupBy(col("__g"))
      .agg(max(col("__n")).as("n"), t7BoundAgg(pNum, pDen).as("t_num"))
    joinBackNullSafe(base, thresholds)
      .groupBy(col("__g"), col("n"), col("t_num"))
      .agg(sum(when(col("__c") * lit(pDen.toLong) > col("t_num"), 1L)
        .otherwise(0L)).as("n_above"))
      .withColumnRenamed("__g", groupCol)
  }

  /** Integer-exact z-score outlier counts — "how many values sit more
    * than z standard deviations from their group's mean?", with the
    * whole test performed in bigint arithmetic: on the cent grid,
    *   (x − μ)² > z²·σ²  ⟺  (n·c − S₁)² > z²·(n·S₂ − S₁²)
    * where S₁ = Σc, S₂ = Σc² — both exact group sums. No mean, no
    * variance, no division, no float is ever materialized, so the count
    * can never flip on summation order and any engine replays it.
    *
    * Magnitude contract (64-bit): |n·c − S₁| and z²·(n·S₂ − S₁²) must
    * fit a signed long — holds for groups up to ~10⁵ rows of ≤5-digit
    * cent values (the battery regime); beyond that, lift the two sides
    * into DECIMAL(38,0)/int128 — the inequality itself is unchanged.
    *
    * Scale shape: one grouped aggregation (map-side partial) for the
    * sums; the group-sized moment frame broadcasts back onto a second
    * pass of the slim (group, cents) projection. */
  def zOutlierCounts(df: DataFrame, groupCol: String, valueCol: String,
                     z: Long = 2L): DataFrame = {
    require(z >= 1, "z must be >= 1")
    val base = centsBase(df, groupCol, valueCol)
    val moments = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), sum(col("__c")).as("s1"),
        sum(col("__c") * col("__c")).as("s2"))
    joinBackNullSafe(base, moments)
      .groupBy(col("__g"), col("n"), col("s1"), col("s2"))
      .agg(sum(when(
        (col("n") * col("__c") - col("s1")) * (col("n") * col("__c") - col("s1")) >
          lit(z * z) * (col("n") * col("s2") - col("s1") * col("s1")), 1L)
        .otherwise(0L)).as("n_out"))
      .withColumnRenamed("__g", groupCol)
  }

  /** Exact rolling median over the last `window` events per entity — the
    * smoothed baseline a spike detector compares against, kept
    * engine-exact the same way as [[thresholdCounts]]: cents-grid values
    * and a ×2-scaled integer median (odd frame → 2·mid, even frame →
    * lower+upper), so no double is ever produced, let alone compared.
    *
    * `orderCols` must totally order each entity's rows (include an id
    * tie-breaker) — then the frame CONTENT at every row is deterministic
    * and the sorted-frame median is a pure function of the data. The
    * frame materializes per row (window·8 bytes — bounded, small by
    * construction: rolling windows are 10s-100s, not millions); the cost
    * shape is the usual entity-key shuffle + in-partition sort. Returns
    * the input's entity/order identity plus (m, med2): frame size and
    * the scaled median. NULL values drop BEFORE framing (a kept null
    * would shrink Spark's collect_list frame while a SQL replay's
    * windowed list() counts it — the frames would diverge). */
  def rollingMedian(df: DataFrame, entityCol: String, valueCol: String,
                    orderCols: Seq[org.apache.spark.sql.Column],
                    window: Int, idCol: String): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val ord = orderCols.indices.map(i => col(s"__ord$i"))
    val w = Window.partitionBy(col(entityCol)).orderBy(ord: _*)
      .rowsBetween(-(window - 1), 0)
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(entityCol) +: col(idCol) +:
      floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long").as("__c") +:
      orderCols.zipWithIndex.map { case (c, i) => c.as(s"__ord$i") }: _*)
    val fr = sort_array(collect_list(col("__c")).over(w))
    base
      .withColumn("__fr", fr)
      .withColumn("m", size(col("__fr")))
      .select(col(entityCol), col(idCol), col("m"),
        when(col("m") % 2 === 1,
          element_at(col("__fr"), expr("cast((m + 1) div 2 as int)")) * 2)
          .otherwise(element_at(col("__fr"), expr("cast(m div 2 as int)")) +
            element_at(col("__fr"), expr("cast(m div 2 + 1 as int)")))
          .as("med2"))
  }
}
