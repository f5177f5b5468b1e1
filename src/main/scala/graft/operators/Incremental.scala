package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: the day-N ETL pattern where a stored
  * rollup table absorbs a delta WITHOUT rescanning historical raw data.
  * Works for any decomposable aggregate kept as a partial (counts, sums —
  * including exact decimal sums; avg must be stored as sum+count), the
  * same algebra Spark's own partial aggregation uses between map and
  * reduce, lifted to table level: merge(stored, delta) ≡ recompute(full)
  * exactly, which is what the battery oracle asserts (q79).
  *
  * At 100 TB this is the difference between touching one day of raw data
  * and touching ten years of it; the merge itself shuffles only aggregate
  * rows (groups, not events).
  */
object Incremental {

  /** Merge two partial-aggregate tables sharing `keys`: all non-key
    * columns are summed (they must be decomposable partials — sums or
    * counts). Schemas must agree by name. */
  def mergeAggregates(stored: DataFrame, delta: DataFrame,
                      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "mergeAggregates needs at least one key")
    val storedCols = stored.columns.toSeq
    require(storedCols.toSet == delta.columns.toSet,
      s"schema mismatch: ${storedCols.mkString(",")} vs ${delta.columns.mkString(",")}")
    val measures = storedCols.filterNot(keys.contains)
    require(measures.nonEmpty, "no measure columns to merge")
    stored.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(measures.head)).as(measures.head),
        measures.tail.map(m => sum(col(m)).as(m)): _*)
  }
}
