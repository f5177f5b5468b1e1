package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.CollectListCappedAgg.collectListCapped

class CollectListCappedAggSpec extends SparkSpec {
  import spark.implicits._

  test("groups within the cap collect fully; groups over it evaluate to NULL") {
    val df = Seq.tabulate(20)(i => (i % 3, i.toLong)).toDF("g", "v")
    // group sizes: g=0 → 7, g=1 → 7, g=2 → 6; cap 6 kills the two 7s
    val out = df.groupBy("g").agg(collectListCapped(col("v"), 6).as("m"))
      .select(col("g"), col("m")).as[(Int, Option[Seq[Long]])].collect().toMap
    assert(out(0).isEmpty && out(1).isEmpty)
    assert(out(2).isDefined && out(2).get.sorted == Seq(2L, 5L, 8L, 11L, 14L, 17L))
  }

  test("partial aggregation (many input partitions) saturates identically") {
    val df = spark.range(0, 1000).repartition(16)
      .select((col("id") % 2).as("g"), col("id").as("v"))
    val out = df.groupBy("g").agg(collectListCapped(col("v"), 100).as("m"))
    assert(out.filter(col("m").isNotNull).count() == 0) // both groups are 500 > 100
    val small = df.filter(col("v") < 50).groupBy("g")
      .agg(collectListCapped(col("v"), 100).as("m"))
      .select(size(col("m"))).as[Int].collect().sorted
    assert(small.toSeq == Seq(25, 25))
  }

  test("cap = Int.MaxValue (no-cap sentinel) collects everything across partials") {
    val out = spark.range(0, 500).repartition(16)
      .select(lit(1).as("g"), col("id").as("v"))
      .groupBy("g").agg(collectListCapped(col("v"), Int.MaxValue).as("m"))
      .select(size(col("m"))).as[Int].collect()
    assert(out.toSeq == Seq(500))
  }

  test("struct payloads round-trip through serialize/deserialize") {
    val df = spark.range(0, 100).repartition(8)
      .select(lit(1).as("g"), struct(col("id"), concat(lit("s"), col("id")).as("s")).as("v"))
    val m = df.groupBy("g").agg(collectListCapped(col("v"), 200).as("m"))
      .select(explode(col("m")).as("e")).select(col("e.id"), col("e.s"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(m.length == 100 && m(42) == ((42L, "s42")))
  }
}
