package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator family from SURVEY.md §2
  * (or a training-data-pipeline operator) through the graft library; each
  * SQL-expressible entry has a DuckDB oracle in [[oracleSql]]. Hash-based or
  * approximate operators (minhash/simhash/LSH top-k) are deliberately
  * oracle-free → rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's fact query shape — 3 agg CTEs, 2 cumulative windows,
    * 5-way join — on the testdata star schema. */
  def entry(spark: SparkSession): DataFrame =
    queries("q27_fact_snapshot")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Queries.oracles
}
