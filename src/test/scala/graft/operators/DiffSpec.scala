package graft.operators

import graft.SparkSpec

/** Pins [[Diff.snapshotDiff]]: the four classes, null-safe payload
  * comparison (null==null is unchanged, null→value is changed), multi-key
  * grouping, and the identical-columns contract. */
class DiffSpec extends SparkSpec {

  import spark.implicits._

  test("classifies added / removed / changed / unchanged") {
    val old = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "s", "v")
    val neu = Seq((2L, "b", 20), (3L, "c", 99), (4L, "d", 40)).toDF("k", "s", "v")
    val got = Diff.snapshotDiff(old, neu, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("null payloads compare null-safe") {
    val old = Seq((1L, Option("x")), (2L, Option.empty[String]),
      (3L, Option("y"))).toDF("k", "s")
    val neu = Seq((1L, Option("x")), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("k", "s")
    val got = Diff.snapshotDiff(old, neu, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "unchanged", 3L -> "changed"))
  }

  test("multi-column keys join as a unit") {
    val old = Seq((1L, "p", 5), (1L, "q", 6)).toDF("k1", "k2", "v")
    val neu = Seq((1L, "p", 5), (2L, "q", 6)).toDF("k1", "k2", "v")
    val got = Diff.snapshotDiff(old, neu, Seq("k1", "k2"))
      .as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "p", "unchanged"), (1L, "q", "removed"),
      (2L, "q", "added")))
  }

  test("key-only tables diff on existence alone") {
    val old = Seq(1L, 2L).toDF("k")
    val neu = Seq(2L, 3L).toDF("k")
    val got = Diff.snapshotDiff(old, neu, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "added"))
  }

  test("mismatched column sets are rejected") {
    val old = Seq((1L, "a")).toDF("k", "s")
    val neu = Seq((1L, 2)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Diff.snapshotDiff(old, neu, Seq("k"))
    }
  }
  test("schemaDiff: added/removed/type_changed, metadata only") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val a = Seq((1L, "x", 0.5)).toDF("id", "name", "score")
    val b = a.drop("score").withColumn("id", col("id").cast("int"))
      .withColumn("tag", lit("t"))
    val got = Diff.schemaDiff(a, b)
      .as[(String, String, Option[String], Option[String])].collect().toSeq
    assert(got == Seq(
      ("id", "type_changed", Some("bigint"), Some("int")),
      ("score", "removed", Some("double"), None),
      ("tag", "added", None, Some("string"))))
    assert(Diff.schemaDiff(a, a).count() == 0)
  }
}
