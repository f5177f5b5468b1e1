package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for.
  *
  * [[asofJoin]] is the union+window formulation — the ONLY shape that
  * survives scale: tag both sides, union, one shuffle on the key, and a
  * running `last(right_payload, ignoreNulls)` over (ts, side) ordering
  * picks each left row's latest right row. A naive range join
  * (`l.k = r.k AND r.ts <= l.ts` + argmax) explodes to the full
  * per-key cross product before pruning — quadratic in rows-per-key —
  * and an exploded-interval join needs a second dedup shuffle. This is
  * one exchange, zero expansion, and whole-stage-codegen throughout.
  */
object Temporal {

  /** For every left row, attach the single latest right row with
    * `right.tsCol <= left.tsCol` (or strictly `<` with `strict = true`),
    * per join key. Right columns arrive prefixed (`asof_` by default,
    * including `asof_<tsCol>`); left rows with no prior right row keep
    * nulls — left-outer semantics, exactly DuckDB/kdb ASOF JOIN.
    *
    * Ties are deterministic: when several right rows share the winning
    * timestamp, the one with the greatest payload (lexicographic over
    * `rightCols` order, then `tsCol`) wins — the window orders by the
    * payload struct after (ts, side), so re-runs and engine comparisons
    * can't disagree on which tied row was picked.
    *
    * NULL keys follow SQL join equality: right rows with any null key
    * are dropped (they can never match), and left rows with a null key
    * keep left-outer nulls rather than matching other null-key rows.
    *
    * Rows-per-key skew note: the window is per-key sequential (as-of is
    * inherently ordered), so a pathologically hot key serializes — the
    * same bound any as-of implementation has; salt upstream if one key
    * dominates. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, rightCols: Seq[String],
               prefix: String = "asof_", strict: Boolean = false): DataFrame =
    asofImpl(left, right, keys, tsCol, rightCols, prefix, strict, forward = false)

  /** Shared union+window machinery for both as-of directions. The four
    * direction-specific knobs, derived from (forward, strict):
    *  - side literals: a right row tied on ts is ELIGIBLE iff non-strict;
    *    eligibility means sorting on the frame side of the left row, so
    *    (leftSide, rightSide) = (0, 1) iff forward XOR strict;
    *  - frame: trailing (unboundedPreceding..current) vs leading
    *    (current..unboundedFollowing);
    *  - aggregate: last() (max payload wins ties) vs first() (min wins);
    *  - output prefix. Everything else — NULL-key drops, payload-struct
    *    consistency, schema alignment, tie determinism — is one copy. */
  private def asofImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
                       tsCol: String, rightCols: Seq[String],
                       prefix: String, strict: Boolean,
                       forward: Boolean): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(c => c.startsWith("__asof")),
      "left side may not contain __asof* columns")
    // consistent payload: take one struct so all right columns come from
    // the SAME matched row even under ties
    val payload = struct((rightCols :+ tsCol).distinct.map(col): _*)
    val (leftSide, rightSide) = if (forward ^ strict) (0, 1) else (1, 0)
    val l = left.select(
      (leftCols.map(col) :+
        lit(leftSide).as("__asof_side") :+
        lit(null).cast(right.select(payload).schema.head.dataType).as("__asof_p")): _*)
    val r = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _)) // SQL: NULL keys never match
      .select(
        (keys.map(col) :+ col(tsCol) :+
          lit(rightSide).as("__asof_side") :+
          payload.as("__asof_p")): _*)
    // align schemas: right lacks the non-key left columns
    val rAligned = leftCols.foldLeft(r) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null))
    }.select(l.columns.toIndexedSeq.map(col): _*)
    // among right rows tied on ts, last()/first() over the payload-asc
    // order picks the max/min payload struct — deterministic either way
    // (left rows all carry a null payload, so their relative order is moot)
    val wBase = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__asof_side").asc, col("__asof_p").asc_nulls_first)
    val w =
      if (forward) wBase.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isLeft = col("__asof_side") === leftSide
    val rightPayload = when(!isLeft, col("__asof_p"))
    val matched =
      if (forward) first(rightPayload, ignoreNulls = true).over(w)
      else last(rightPayload, ignoreNulls = true).over(w)
    val joined = l.unionByName(rAligned)
      .withColumn("__asof_m", when(isLeft, matched))
      .filter(isLeft)
    val out = (rightCols :+ tsCol).distinct.foldLeft(joined) { (d, c) =>
      d.withColumn(s"$prefix$c", col(s"__asof_m.$c"))
    }
    out.drop("__asof_side", "__asof_p", "__asof_m")
  }

  /** Forward as-of: for every left row, attach the single EARLIEST right
    * row with `right.tsCol >= left.tsCol` (strictly `>` with
    * `strict = true`), per join key — the conversion-funnel / next-event
    * shape ("first purchase after this signup"). Same union+window
    * formulation, scale notes, and NULL-key semantics as [[asofJoin]],
    * with the frame reversed (currentRow → unboundedFollowing) and
    * `first()` instead of `last()`. Ties on the winning timestamp pick
    * the SMALLEST payload struct — deterministic, engine-reproducible. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      tsCol: String, rightCols: Seq[String],
                      prefix: String = "next_",
                      strict: Boolean = false): DataFrame =
    asofImpl(left, right, keys, tsCol, rightCols, prefix, strict, forward = true)

  /** Point-in-interval join: rows of `points` matched to every row of
    * `intervals` whose `[startCol, endCol]` contains the point, per key —
    * inner semantics, each matching pair emitted exactly once.
    *
    * Catalyst plans a raw `p.k = i.k AND s <= pt AND pt <= e` as a
    * broadcast-nested-loop or a per-key cross product — quadratic in
    * rows-per-key. This is the binned formulation instead: every interval
    * explodes to the `binWidth`-sized bins it covers (map-side, bounded by
    * interval length / binWidth), a point lives in exactly ONE bin, and
    * the join is a plain equi-join on (key, bin) with an exact range
    * filter after — one shuffle, no expansion beyond the bin fan-out, and
    * no dedup pass (one bin per point ⇒ at most one match per pair).
    * Choose `binWidth` near the typical interval length: shorter bins
    * fan out intervals further; longer bins widen the filtered-out
    * candidate set. Point/start/end are numeric (epoch micros for time). */
  def intervalJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                   ptCol: String, startCol: String, endCol: String,
                   binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(ptCol) / binWidth))
    val i = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("__bin",
        explode(sequence(floor(col(startCol) / binWidth), floor(col(endCol) / binWidth))))
    p.join(i, keys :+ "__bin")
      .filter(col(startCol) <= col(ptCol) && col(ptCol) <= col(endCol))
      .drop("__bin")
  }

  /** Regular-grid resampling with forward fill (last observation carried
    * forward) — the time-series regularization step that turns an
    * irregular event stream into the fixed-step grid feature pipelines
    * and dashboards consume. Every entity gets every bucket of the
    * GLOBAL [min, max] span; bucket b carries the latest value with
    * `ts <= b·step` (NULL before an entity's first event — left-outer
    * as-of semantics).
    *
    * Ties at the same (entity, ts) instant collapse to max(value) FIRST,
    * so the as-of lookup is over unique instants and its result is
    * engine-unambiguous (DuckDB's native ASOF JOIN oracles it directly —
    * an independent implementation of the same operator).
    *
    * Scale shape: bounds come from one 1-row aggregate; the spine is
    * entities × buckets (callers pick `stepMicros` so that's
    * corpus-sized, the usual resampling contract), and the fill is
    * [[asofJoin]]'s single union+window shuffle — no per-bucket probing,
    * no range join. Returns (entity, bucket, value). */
  def resampleForwardFill(events: DataFrame, entityCol: String,
                          tsMicrosCol: String, valueCol: String,
                          stepMicros: Long): DataFrame = {
    require(stepMicros > 0, "stepMicros must be positive")
    val bounds = events.agg(min(col(tsMicrosCol)), max(col(tsMicrosCol))).collect()(0)
    require(!bounds.isNullAt(0), "resampleForwardFill: no events")
    val b0 = Math.floorDiv(bounds.getLong(0), stepMicros)
    val b1 = Math.floorDiv(bounds.getLong(1), stepMicros)
    val spine = events.select(col(entityCol)).distinct()
      .withColumn("bucket", explode(sequence(lit(b0), lit(b1))))
      .withColumn(tsMicrosCol, col("bucket") * stepMicros)
    val uniq = events.groupBy(col(entityCol), col(tsMicrosCol))
      .agg(max(col(valueCol)).as(valueCol))
    asofJoin(spine, uniq, Seq(entityCol), tsMicrosCol, Seq(valueCol))
      .select(col(entityCol), col("bucket"), col(s"asof_$valueCol").as(valueCol))
  }

  /** First-order state-transition counts — the Markov edge list of user
    * behavior ((prev_state, state) → n), feeding funnel diagnosis,
    * next-event prediction baselines, and bot detection (bots have
    * near-deterministic transition rows).
    *
    * Per entity, events order by `orderCols` (pass a tie-breaker — e.g.
    * (ts, event_id) — or equal-time rows make the lag nondeterministic);
    * each consecutive pair contributes one edge; entities' first events
    * contribute none. One shuffle on the entity key with an in-partition
    * sort (the as-of cost shape), then a partial-aggregated count whose
    * result is at most |states|² rows — the corpus never moves twice. */
  def transitionCounts(df: DataFrame, entityCol: String, stateCol: String,
                       orderCols: Seq[Column]): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    // alias order EXPRESSIONS (e.g. unix_micros(ts)) into the projection
    // so the window can reference them after the source columns are gone
    val ord = orderCols.indices.map(i => col(s"__ord$i"))
    val w = Window.partitionBy(col(entityCol)).orderBy(ord: _*)
    df.select(col(entityCol) +: col(stateCol) +:
        orderCols.zipWithIndex.map { case (c, i) => c.as(s"__ord$i") }: _*)
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_state"), col(stateCol).as("state"))
      .agg(count(lit(1)).as("n"))
  }
}
