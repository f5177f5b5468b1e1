package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: print the executed physical plan of named battery
  * queries (condensed to the exchange/join/scan skeleton by default) so
  * the shuffle count and join strategies of a query can be reviewed
  * without wiring a notebook.
  *
  * Usage: `sbt "runMain graft.tools.ExplainQueries q106_phrase_search,q109_index_dedup [sfDir] [full]"`
  */
object ExplainQueries {
  private val keep = Seq("Exchange", "Scan", "Join", "Aggregate", "Generate",
    "Filter", "Broadcast", "Window", "Sort", "TopK", "Expand")

  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val full = args.lift(2).contains("full")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = if (names.nonEmpty) names else graft.queries.Queries.all.keys.toSeq.sorted
    qs.foreach { name =>
      println(s"===== $name")
      val df = graft.queries.Queries.all(name)(spark, sfDir)
      // materialize so AQE settles on the final plan, then print that
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      if (full) println(plan)
      else plan.linesIterator
        .filter(l => keep.exists(l.contains)).map(_.take(170)).foreach(println)
      spark.catalog.clearCache()
    }
  }
}
