package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.MisraGriesAgg.misraGries

class MisraGriesAggSpec extends SparkSpec {
  import spark.implicits._

  test("heavy hitters survive a real distributed merge tree") {
    // 3 hot tokens among 600 noise tokens, scattered over 7 partitions:
    // every token above n/(k+1) must appear in the merged sketch
    val items = Seq.fill(200)("hot1") ++ Seq.fill(150)("hot2") ++ Seq.fill(90)("hot3") ++
      (1 to 600).map("noise" + _)
    val k = 8
    val out = items.toDF("tok")
      .repartition(7)
      .agg(misraGries(col("tok"), k).as("mg"))
      .select(explode(col("mg.tok")).as("tok"))
      .as[String].collect().toSet
    val n = items.size.toLong
    val mustHave = items.groupBy(identity).collect {
      case (tok, occ) if occ.size.toLong * (k + 1) > n => tok
    }.toSet
    assert(mustHave == Set("hot1", "hot2"), "fixture sanity: hot3 is below the bound")
    assert(mustHave.subsetOf(out), s"missing heavy hitters: ${mustHave -- out} in $out")
    assert(out.size <= k)
  }

  test("estimates are lower bounds within the additive n/(k+1) error") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ (1 to 60).map("x" + _)
    val k = 8
    val est = items.toDF("tok").repartition(5)
      .agg(misraGries(col("tok"), k).as("mg"))
      .select(explode(col("mg")).as("c"))
      .select(col("c.tok"), col("c.est")).as[(String, Long)].collect().toMap
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = items.size.toLong / (k + 1) + 1
    est.foreach { case (tok, e) =>
      assert(e <= truth(tok), s"$tok overestimated: $e > ${truth(tok)}")
      assert(truth(tok) - e <= bound, s"$tok undercounted past the bound")
    }
    assert(est.contains("a") && est.contains("b"))
  }

  test("result is sorted (est DESC, tok ASC) and capped at k") {
    val items = Seq.fill(9)("z") ++ Seq.fill(9)("a") ++ Seq.fill(4)("m") ++ Seq("q")
    val out = items.toDF("tok").coalesce(1)
      .agg(misraGries(col("tok"), 3).as("mg"))
      .select(explode(col("mg")).as("c"))
      .select(col("c.tok"), col("c.est")).as[(String, Long)].collect().toSeq
    assert(out.size <= 3)
    assert(out == out.sortBy { case (t, e) => (-e, t) }, s"unsorted: $out")
    assert(out.take(2).map(_._1) == Seq("a", "z"), s"ties must break token-ascending: $out")
  }

  test("partial aggregation appears in the plan (map-side combine)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val agg = docs.filter(length(trim(col("text"))) > 0)
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy("source").agg(misraGries(col("tok"), 16).as("mg"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial"), s"no partial aggregation in:\n$plan")
    assert(agg.count() > 0)
  }
}
