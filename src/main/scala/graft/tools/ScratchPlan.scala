package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScratchPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    val R = graft.plan.RollupRewrite
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("scratch").toString
    try {
      graft.plan.Rollup.materializeExpr(orders,
          Seq("om" -> month(col("o_orderdate"))), Seq("o_totalprice"))
        .write.mode("overwrite").parquet(s"$tmp/msum")
      R.register(orders, spark.read.parquet(s"$tmp/msum"), Seq("om"),
        Seq("o_totalprice"),
        groupExprOf = Map("om" -> month(col("o_orderdate"))))
      R.enable(spark)
      def q1() = orders.groupBy(month(col("o_orderdate")).as("om"))
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"),
          min("o_totalprice").as("mn"))
      def q2() = orders.filter(month(col("o_orderdate")) === 3)
        .agg(count(lit(1)).as("n"), max("o_totalprice").as("mx"))
      def q3() = orders.filter(col("o_orderdate") >= "1995-06-01")
        .groupBy(month(col("o_orderdate")).as("om")).agg(count(lit(1)).as("n"))
      val e1 = q1(); val e2 = q2(); val e3 = q3()
      println(s"q1 scans: ${R.scanRootPaths(e1)}")
      println(s"q2 scans: ${R.scanRootPaths(e2)}")
      println(s"q3 scans: ${R.scanRootPaths(e3)} (must be base)")
      println("q1 plan:\n" + e1.queryExecution.optimizedPlan.treeString)
      R.disable(spark)
      val w1 = q1().collect().map(_.toSeq).toSet
      val w2 = q2().collect().map(_.toSeq).toSet
      val w3 = q3().collect().map(_.toSeq).toSet
      R.enable(spark)
      val g1 = e1.collect().map(_.toSeq).toSet
      val g2 = e2.collect().map(_.toSeq).toSet
      val g3 = e3.collect().map(_.toSeq).toSet
      println(s"q1 match: ${g1 == w1} (${g1.size} rows)")
      println(s"q2 match: ${g2 == w2}")
      println(s"q3 match: ${g3 == w3}")
    } finally {
      R.disable(spark); R.clear()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      spark.stop()
    }
  }
}
