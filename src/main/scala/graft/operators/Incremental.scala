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

  /** Merge two partial-aggregate tables sharing `keys`: measure columns
    * are summed (they must be decomposable partials — sums or counts;
    * store avg as sum+count, never merge a max/avg column through here).
    * Schemas must agree by name.
    *
    * `measures` defaults to every non-key column; pass it EXPLICITLY when
    * the rollup carries any column that is not a summable partial — the
    * call is then rejected if a non-key column is neither key nor listed
    * measure, instead of silently summing something non-decomposable into
    * garbage (the failure mode of the exact "merge ≡ recompute" guarantee
    * this operator exists for). */
  def mergeAggregates(stored: DataFrame, delta: DataFrame, keys: Seq[String],
                      measures: Seq[String] = Seq.empty): DataFrame = {
    require(keys.nonEmpty, "mergeAggregates needs at least one key")
    val storedCols = stored.columns.toSeq
    require(storedCols.toSet == delta.columns.toSet,
      s"schema mismatch: ${storedCols.mkString(",")} vs ${delta.columns.mkString(",")}")
    val ms = if (measures.nonEmpty) measures else storedCols.filterNot(keys.contains)
    require(ms.nonEmpty, "no measure columns to merge")
    require(ms.forall(storedCols.contains),
      s"measures ${ms.filterNot(storedCols.contains).mkString(",")} not in schema")
    val unaccounted = storedCols.filterNot(c => keys.contains(c) || ms.contains(c))
    require(unaccounted.isEmpty,
      s"columns ${unaccounted.mkString(",")} are neither keys nor declared measures — " +
        "summing them blindly would corrupt non-decomposable aggregates")
    stored.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(ms.head)).as(ms.head),
        ms.tail.map(m => sum(col(m)).as(m)): _*)
  }

  /** Retraction counterpart of [[mergeAggregates]]: remove late-arriving
    * DELETES from a stored rollup without recomputing it. `retract` is an
    * aggregate (same keys, same measure definitions) of exactly the base
    * rows being retracted; its measures are negated and merged, and
    * groups whose `countCol` reaches zero — every contributing row
    * retracted — are dropped, so the result equals the full recompute on
    * the reduced base row-for-row (exact when sums are carried as
    * DECIMAL, the q79 discipline).
    *
    * Scale shape: identical to [[mergeAggregates]] — one rollup-sized
    * merge aggregation; the base table is never rescanned. */
  def retractAggregates(stored: DataFrame, retract: DataFrame, keys: Seq[String],
                        countCol: String, measures: Seq[String] = Seq.empty): DataFrame = {
    val ms = if (measures.nonEmpty) measures
             else stored.columns.toSeq.filterNot(keys.contains)
    require(ms.contains(countCol),
      s"countCol $countCol must be one of the merged measures (${ms.mkString(",")})")
    val negated = retract.select(
      (keys.map(col) ++ ms.map(m => (-col(m)).as(m))): _*)
    mergeAggregates(stored, negated, keys, ms).filter(col(countCol) > 0)
  }

  /** Incremental equi-join maintenance for append-only inputs: with a
    * stored result `stored` = A₀ ⋈ B₀ and deltas ΔA, ΔB,
    *
    *   (A₀∪ΔA) ⋈ (B₀∪ΔB) = stored ∪ ΔA⋈(B₀∪ΔB) ∪ A₀⋈ΔB
    *
    * — so the new result is the stored rows plus two DELTA-DRIVEN joins.
    * Both deltas are broadcast (a day's delta vs years of history): the
    * big sides A₀ and B₀ stream map-side with NO shuffle and the stored
    * result is appended, never rebuilt — at 100 TB this is the difference
    * between moving two tables through an exchange and moving one day's
    * rows through a broadcast (the join twin of [[mergeAggregates]];
    * delta-join plans are pinned broadcast-only in IncrementalSpec).
    * Requires append-only semantics (no updates/deletes) and `stored`
    * computed with the same projection this returns: every column of
    * aBase/aDelta plus the non-key columns of bBase/bDelta. */
  def mergeJoin(stored: DataFrame,
                aBase: DataFrame, aDelta: DataFrame,
                bBase: DataFrame, bDelta: DataFrame,
                keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "mergeJoin needs at least one key")
    require(aBase.columns.toSet == aDelta.columns.toSet,
      "A-side schema mismatch between base and delta")
    require(bBase.columns.toSet == bDelta.columns.toSet,
      "B-side schema mismatch between base and delta")
    val newA = broadcast(aDelta).join(bBase.unionByName(bDelta), keys)
    val newB = aBase.join(broadcast(bDelta), keys)
    stored.unionByName(newA.unionByName(newB))
  }
}
