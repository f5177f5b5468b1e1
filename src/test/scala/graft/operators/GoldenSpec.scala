package graft.operators

import graft.SparkSpec

class GoldenSpec extends SparkSpec {
  import spark.implicits._

  test("goldenRecords: latest non-null per field, all-null stays null") {
    val df = Seq(
      // cluster 1: name latest non-null at seq 3; bal latest at seq 1 (2,3 null)
      (1L, 1L, Some("a1"), Some(10.0)),
      (1L, 2L, Some("a2"), None),
      (1L, 3L, Some("a3"), None),
      // cluster 2: name all null
      (2L, 1L, None, Some(5.0)),
      (2L, 2L, None, Some(7.0))
    ).toDF("cluster", "seq", "name", "bal")
    val got = Golden.goldenRecords(df, "cluster", "seq", Seq("name", "bal"))
      .as[(Long, Option[String], Option[Double])].collect().toSet
    assert(got == Set((1L, Some("a3"), Some(10.0)), (2L, None, Some(7.0))))
  }

  test("goldenRecords is partitioning-invariant (partial-aggregatable max)") {
    val df = Seq((1L, 1L, Some("x")), (1L, 9L, None), (1L, 5L, Some("y")))
      .toDF("cluster", "seq", "name")
    val a = Golden.goldenRecords(df, "cluster", "seq", Seq("name"))
      .as[(Long, Option[String])].collect().toSet
    val b = Golden.goldenRecords(df.repartition(7), "cluster", "seq", Seq("name"))
      .as[(Long, Option[String])].collect().toSet
    assert(a == b && a == Set((1L, Some("y"))))
  }
}
