package graft.stats

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq((1L, Some("a"), 10.0), (2L, None, 20.0), (3L, Some("c"), 30.0))
    .toDF("id", "tag", "x")

  test("all rules evaluate in one pass with correct pass/fail") {
    val out = Expectations.run(df, Seq(
      Expectation("row_count", count(lit(1)), 1, 10),
      Expectation("tag_null_fraction", avg(col("tag").isNull.cast("int")), 0, 0.1),
      Expectation("x_max", max(col("x")), 0, 100)))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(4)))).toMap
    assert(out("row_count") == ((3.0, true)))
    assert(out("tag_null_fraction") == ((0.3333, false))) // 1/3 nulls > 0.1
    assert(out("x_max") == ((30.0, true)))
  }

  test("run scans the table exactly once, without Expand") {
    val big = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Expectations.run(big, Seq(
      Expectation("n", count(lit(1)), 0, 1e9),
      Expectation("chars_min", min(col("n_chars")), 1, 1e9)))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("FileScan")) == 1)
    assert(!plan.contains("Expand"))
  }

  test("enforce throws listing every violated rule") {
    val e = intercept[IllegalArgumentException] {
      Expectations.enforce(df, Seq(
        Expectation("row_count", count(lit(1)), 100, 200),
        Expectation("x_min", min(col("x")), 0, 100)))
    }
    assert(e.getMessage.contains("row_count") && !e.getMessage.contains("x_min"))
  }

  test("NULL measurement fails closed (empty input violates min/avg rules)") {
    val empty = df.filter(col("id") < 0)
    val out = Expectations.run(empty, Seq(
      Expectation("x_min", min(col("x")), 0, 100),       // NULL on empty ⇒ fail
      Expectation("row_count", count(lit(1)), 0, 10)))   // 0 is in [0,10] ⇒ pass
      .collect().map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(out("x_min") == false)
    assert(out("row_count") == true)
    // and enforce() must SEE the violation, not drop the NULL row
    val e = intercept[IllegalArgumentException] {
      Expectations.enforce(empty, Seq(Expectation("x_min", min(col("x")), 0, 100)))
    }
    assert(e.getMessage.contains("x_min"))
  }

  test("duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      Expectations.run(df, Seq(
        Expectation("a", count(lit(1)), 0, 1),
        Expectation("a", max(col("x")), 0, 1)))
    }
  }
  test("fkOrphans: orphan and null child keys counted, clean FK is zero") {
    import org.apache.spark.sql.functions.col
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), Some(9L), None).toDF("fk")
    val got = Expectations.fkOrphans(child, "fk", parent, "pk", "c->p")
      .as[(String, Long, Long)].collect().head
    // orphans: two 9s + one null row = 3 rows; keys = {9, null} = 2
    assert(got == (("c->p", 3L, 2L)))
    val clean = Expectations.fkOrphans(parent, "pk", parent, "pk", "self")
      .as[(String, Long, Long)].collect().head
    assert(clean == (("self", 0L, 0L)))
  }
}
