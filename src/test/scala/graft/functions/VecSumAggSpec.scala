package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.VecSumAgg.vecSum

class VecSumAggSpec extends SparkSpec {
  import spark.implicits._

  test("elementwise sums per group, float input promoted to double") {
    val df = Seq(
      (1, Seq(1.0f, 2.0f, 3.0f)),
      (1, Seq(0.5f, 0.5f, 0.5f)),
      (2, Seq(10.0f, 0.0f, -1.0f))
    ).toDF("g", "v")
    val out = df.groupBy("g").agg(vecSum(col("v"), 3).as("s"))
      .as[(Int, Seq[Double])].collect().toMap
    assert(out(1) == Seq(1.5, 2.5, 3.5))
    assert(out(2) == Seq(10.0, 0.0, -1.0))
  }

  test("partial aggregation across many partitions matches the single-partition sum") {
    val df = spark.range(0, 1000)
      .select((col("id") % 4).as("g"),
        array(col("id").cast("double"), lit(1.0)).as("v"))
    val many = df.repartition(16).groupBy("g").agg(vecSum(col("v"), 2).as("s"))
      .as[(Long, Seq[Double])].collect().toMap
    val one = df.coalesce(1).groupBy("g").agg(vecSum(col("v"), 2).as("s"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(many == one)
    assert(many(0)(1) == 250.0) // 250 rows in each group
  }
}
