package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private val big = (0L until 1000L).map(i => (i, i % 7)).toDF("k", "v")
  private val small = Seq(Some(3L), Some(500L), Some(999L), None).toDF("pk")

  test("semiJoin == plain left-semi join (false positives die in the join)") {
    val got = BloomJoin.semiJoin(big, "k", small, "pk")
      .as[(Long, Long)].collect().toSet
    val expect = big.join(small.filter(col("pk").isNotNull)
        .withColumnRenamed("pk", "k"), Seq("k"), "left_semi")
      .as[(Long, Long)].collect().toSet
    assert(got == expect && got.map(_._1) == Set(3L, 500L, 999L))
  }

  test("semiJoin: empty small side yields empty with big's schema") {
    val none = BloomJoin.semiJoin(big, "k", small.filter(col("pk") < 0), "pk")
    assert(none.count() == 0 && none.columns.toSeq == Seq("k", "v"))
  }

  test("bloom probe sits in the plan as a filter BEFORE the join") {
    // spark.range (not a LocalRelation): ConvertToLocalRelation would
    // constant-fold a filter over local test data right out of the plan
    val bigR = spark.range(0, 1000).select(col("id").as("k"))
    val q = BloomJoin.semiJoin(bigR, "k", small, "pk")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("bloom"),
      s"bloom probe missing from the scan filter:\n$plan")
  }
}
