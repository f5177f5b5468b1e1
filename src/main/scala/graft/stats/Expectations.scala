package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A named data-quality rule: `measured` is any aggregate expression over
  * the table (count, null fraction, min/max, a KMV distinct estimate, …);
  * the rule passes when the ROUNDED measurement (4 decimals — the repo's
  * cross-engine float convention) lies in [lo, hi]. Keep bounds ≥ 1e-4
  * away from plausible measurements, same as every threshold in the
  * battery. */
final case class Expectation(name: String, measured: Column, lo: Double, hi: Double)

/** Declarative data-quality gates — the Glue Data Quality / expectations
  * idea expressed engine-side: ALL rules evaluate in ONE aggregation pass
  * over the table (the [[Profile]] design constraint: never scan per
  * rule), results come back as data (`(rule, measured, lo, hi, passed)`),
  * and [[Expectations.enforce]] turns failures into the same fail-fast
  * contract as `DynFrame.assertErrorThreshold`. */
object Expectations {

  /** Evaluate every rule in one pass; long-format result, one row per
    * rule, deterministic (measurements rounded to 4 decimals before both
    * display and comparison, so a SQL replay agrees bit-for-bit). */
  def run(df: DataFrame, checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "no expectations to run")
    require(checks.map(_.name).distinct.size == checks.size,
      "expectation names must be unique")
    val aggs = checks.map(c => round(c.measured.cast("double"), 4).as(s"__m_${c.name}"))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = checks.map { c =>
      val m = col(s"__m_${c.name}")
      struct(lit(c.name).as("rule"), m.as("measured"),
        lit(c.lo).as("lo"), lit(c.hi).as("hi"),
        // NULL measurement (empty table / all-NULL column) = violation:
        // a data-quality gate must fail closed, not vanish from enforce()
        coalesce(m >= c.lo && m <= c.hi, lit(false)).as("passed"))
    }
    row.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }

  /** Fail-fast gate: throws listing every violated rule (name, measured,
    * bounds), the batch-job twin of the error-threshold contract. */
  def enforce(df: DataFrame, checks: Seq[Expectation]): Unit = {
    val fails = run(df, checks).filter(!col("passed")).collect()
    require(fails.isEmpty,
      "expectations violated: " + fails.map(r =>
        s"${r.getString(0)}=${r.get(1)} not in [${r.getDouble(2)}, ${r.getDouble(3)}]")
        .mkString("; "))
  }
  /** Referential-integrity audit — the cross-TABLE expectation
    * ([[Expectation]]s are single-table by design): orphan rows/keys in
    * `child.childKey` with no match in `parent.parentKey`, as data.
    * Null child keys count as orphans (they reference nothing), matching
    * LEFT JOIN ... IS NULL semantics — the NOT IN null trap avoided.
    * `n_orphan_keys` counts the null key as ONE distinct orphan key (a
    * bare countDistinct would silently drop it while its rows still
    * landed in `n_orphan_rows`).
    *
    * Scale shape: one anti-join per relation on the key (broadcast when
    * the parent key set is small, shuffle otherwise — Catalyst's choice),
    * over key-only projections; a 1-row aggregate comes back. Chain
    * several relations with unionByName for a whole-schema audit. */
  def fkOrphans(child: DataFrame, childKey: String,
                parent: DataFrame, parentKey: String, relation: String): DataFrame =
    child.select(col(childKey).as("__k"))
      .join(parent.select(col(parentKey).as("__k")).distinct(), Seq("__k"), "left_anti")
      .agg(count(lit(1)).as("n_orphan_rows"),
        // +1 for the null key when any null orphan row exists (coalesce:
        // max over an EMPTY frame is null, and 0+null must stay 0)
        (countDistinct(col("__k")) +
          coalesce(max(when(col("__k").isNull, lit(1L)).otherwise(lit(0L))), lit(0L)))
          .as("n_orphan_keys"))
      .select(lit(relation).as("relation"),
        col("n_orphan_rows"), col("n_orphan_keys"))
}
