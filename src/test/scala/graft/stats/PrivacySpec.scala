package graft.stats

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymityAudit: hand-computed class sizes") {
    // classes: (a,0)x3, (a,1000)x1, (b,0)x2 → with k=3: 2 violating, 3 rows
    val df = Seq(
      ("a", 100.0), ("a", 900.0), ("a", 0.0), ("a", 1500.0),
      ("b", 10.0), ("b", 999.0)
    ).toDF("seg", "bal")
    val got = Privacy.kAnonymityAudit(df,
        Seq(col("seg"), Privacy.generalizeBin(floor(col("bal")), 1000L)), k = 3)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((3L, 2L, 3L, 1L)))
  }

  test("generalizeBin floors toward -inf for negative values (pmod form)") {
    val got = Seq(-7L, -5L, 0L, 7L).toDF("x")
      .select(Privacy.generalizeBin(col("x"), 5L)).as[Long].collect().toSeq
    assert(got == Seq(-10L, -5L, 0L, 5L))
  }
}
