package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.curate.Curate
import graft.functions.expressions.KmvDistinctAgg

/** Data-profiling operators: ONE pass over the table, engine-portable
  * results. The design constraint is the same one the sketch aggregates
  * obey — at 100 TB a profiler must never expand the corpus (Catalyst
  * plans multi-column `countDistinct` as an Expand: #columns copies of
  * every row through the shuffle), so distinct counts come from per-column
  * KMV sketches (k·8 bytes each, map-side partials), and every statistic
  * is exactly replayable in SQL (the profile itself is driver-verifiable,
  * not just spot-checked).
  */
object Profile {

  /** Per-column profile in long format: `(col_name, n, n_nulls,
    * est_distinct, min_num, max_num)` — one row per requested column, ONE
    * aggregation job, no Expand. `est_distinct` is the KMV estimate
    * ([[KmvDistinctAgg.estimateDistinct]], exact below k); `min_num` /
    * `max_num` are populated for integral/floating columns and NULL for
    * the rest (string min/max would hash-differently across engines'
    * collations — deliberately out of the contract). */
  def summarize(df: DataFrame, cols: Seq[String], k: Int = 64): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val missing = cols.filterNot(types.contains)
    require(missing.isEmpty, // exact-name lookup: fail with the schema, not a bare Map error
      s"columns ${missing.mkString(", ")} not in schema [${df.columns.mkString(", ")}]")
    def isNum(n: String) = types(n) match {
      case _: NumericType => true
      case _ => false
    }
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        KmvDistinctAgg.kmvSketch(Curate.portableHash60(col(c)), k).as(s"__mins_$c")) ++
        (if (isNum(c))
          Seq(min(col(c)).cast("double").as(s"__min_$c"),
            max(col(c)).cast("double").as(s"__max_$c"))
        else Nil)
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // reshape the 1-row aggregate into long format map-side
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n"),
        col(s"__nulls_$c").as("n_nulls"),
        KmvDistinctAgg.estimateDistinct(col(s"__mins_$c"), k).as("est_distinct"),
        (if (isNum(c)) col(s"__min_$c") else lit(null).cast("double")).as("min_num"),
        (if (isNum(c)) col(s"__max_$c") else lit(null).cast("double")).as("max_num"))
    }
    row.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }

  /** Approximate per-group quantiles from an integer-exact histogram:
    * values bucket by (most-significant-bit, next-2-bits) — pure integer
    * arithmetic both Spark and any SQL engine reproduce bit-for-bit,
    * unlike log-based bucketing whose float boundary cases diverge. The
    * estimate for probability p is the LOWER BOUND of the first bucket
    * whose cumulative count reaches ⌈p·n⌉ — deterministic, mergeable
    * (bucket counts are sums), relative error bounded by the bucket width
    * (≤ 12.5% with 2 sub-bits). Rows with a NULL value or a value < 1 are
    * EXCLUDED from the histogram (enforced by the filter below — shift or
    * clamp upstream if they must count): v ≤ 0 has no msb, and a NULL
    * bucket row would even order differently across engines (Spark
    * windows sort nulls first, SQL's default is last).
    *
    * One aggregation (group×bucket) + one window over the tiny histogram
    * — the value stream shuffles once as (group, bucket) pairs. */
  def histogramQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                         probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      "probs must lie in (0, 1]")
    // msb = length(bin(v)) - 1: integer-exact floor(log2) on both engines.
    // Column-valued shift amounts need the SQL ShiftLeft/ShiftRight forms
    // (the Scala helpers only take literal bit counts).
    val hist = df
      .select(col(groupCol).as("grp"), col(valueCol).as("__v"))
      .filter(col("__v") >= 1) // also drops NULLs (null-valued predicate)
      .withColumn("__msb", (length(bin(col("__v"))) - 1).cast("int"))
      .withColumn("__sub",
        when(col("__msb") >= 2,
          expr("shiftright(__v, __msb - 2)").bitwiseAND(lit(3L)))
          .otherwise(lit(0L)).cast("int"))
      .select(col("grp"),
        (col("__msb") * 4 + col("__sub")).as("bucket"),
        when(col("__msb") >= 2,
          expr("shiftleft(1L, __msb) + __sub * shiftleft(1L, __msb - 2)"))
          .otherwise(expr("shiftleft(1L, __msb)")).as("lo"))
      .groupBy(col("grp"), col("bucket"), col("lo"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("bucket")
    val cum = hist.select(col("grp"), col("bucket"), col("lo"), col("cnt"),
      sum(col("cnt")).over(w).as("cum"),
      sum(col("cnt")).over(w.rangeBetween(Long.MinValue, Long.MaxValue)).as("total"))
    probs.map { p =>
      cum.filter(col("cum") >= ceil(col("total") * lit(p)))
        .groupBy(col("grp"))
        .agg(min(col("lo")).as("q"))
        .select(col("grp"), lit(p).as("prob"), col("q"))
    }.reduce(_ unionAll _)
  }
}
