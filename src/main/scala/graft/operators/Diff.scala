package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot comparison for keyed tables: classify every key as
  * `added` / `removed` / `changed` / `unchanged` between two versions —
  * the table-diff a pipeline needs for regression gates, incremental
  * re-publish decisions, and "what did this rebuild touch" audits when
  * there is no CDC feed to consume.
  *
  * Scale shape: ONE full-outer sort-merge join co-partitioned on the key
  * columns — each side shuffles exactly once, payload comparison is a
  * codegen'd conjunction of per-column null-safe equalities (`<=>`, no
  * JSON serialization, no hashing pass), and nothing touches the driver.
  * Callers filtering `change_type != 'unchanged'` still stream the full
  * join, but the filter runs inside the join's stage — no extra exchange.
  */
object Diff {

  /** Diff `newDf` against `oldDf` on `keys`. Both sides must have
    * identical column sets; rows are compared on every non-key column
    * with null-safe equality (null == null counts as unchanged).
    * Returns the key columns + `change_type`. Contract: `keys` must
    * uniquely identify a row WITHIN each snapshot (the usual snapshot-key
    * contract) — duplicate keys fan out through the full-outer join and
    * yield one classification row per old×new combination; null keys
    * never join and classify as one `removed` plus one `added`. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"column sets differ: ${oldDf.columns.mkString(",")} vs ${newDf.columns.mkString(",")}")
    val nonKeys = oldDf.columns.filterNot(keys.contains).toIndexedSeq
    val o = oldDf.select(keys.map(col) ++
      nonKeys.map(c => col(c).as(s"__o_$c")) :+ lit(1).as("__o_present"): _*)
    val n = newDf.select(keys.map(col) ++
      nonKeys.map(c => col(c).as(s"__n_$c")) :+ lit(1).as("__n_present"): _*)
    val same = nonKeys.map(c => col(s"__o_$c") <=> col(s"__n_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, keys, "full_outer")
      .select(keys.map(col) :+
        when(col("__o_present").isNull, lit("added"))
          .when(col("__n_present").isNull, lit("removed"))
          .when(!same, lit("changed"))
          .otherwise(lit("unchanged")).as("change_type"): _*)
  }
  /** Schema drift between two frames — the metadata-level diff that
    * gates a pipeline BEFORE the data-level [[snapshotDiff]] runs:
    * columns added, removed, or type-changed between a producer's new
    * output and the contract the consumers compiled against. Pure
    * metadata (plan schemas — zero jobs, nothing scanned); the result is
    * a tiny frame so it drops into the same gates as every other check.
    * Output: (column, change, from_type, to_type), change ∈
    * added | removed | type_changed, ordered by column name. */
  def schemaDiff(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val spark = oldDf.sparkSession
    import spark.implicits._
    // duplicate column names (legal in Spark after e.g. a both-sides join)
    // make a by-name diff ill-defined — refuse loudly rather than compare
    // an arbitrary survivor per name and misreport drift
    for ((df, side) <- Seq(oldDf -> "old", newDf -> "new")) {
      val dups = df.schema.fieldNames.groupBy(identity).collect {
        case (name, hits) if hits.length > 1 => name }
      require(dups.isEmpty,
        s"schemaDiff: $side frame has duplicate column names ${dups.mkString(", ")}")
    }
    val o = oldDf.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val n = newDf.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val rows =
      (n.keySet -- o.keySet).toSeq.map(c => (c, "added", null: String, n(c))) ++
      (o.keySet -- n.keySet).toSeq.map(c => (c, "removed", o(c), null: String)) ++
      (o.keySet & n.keySet).toSeq.collect {
        case c if o(c) != n(c) => (c, "type_changed", o(c), n(c))
      }
    rows.sortBy(_._1).toDF("column", "change", "from_type", "to_type")
  }
}
