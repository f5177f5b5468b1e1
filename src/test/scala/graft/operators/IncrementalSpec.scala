package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def raw = Seq(
    ("a", 1, 10L, BigDecimal("1.5")), ("a", 1, 5L, BigDecimal("2.25")),
    ("a", 2, 7L, BigDecimal("0.5")), ("b", 1, 3L, BigDecimal("4.0")),
    ("b", 2, 2L, BigDecimal("1.0"))
  ).toDF("k1", "k2", "n", "amt")

  private def rollup(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("k1", "k2").agg(sum("n").as("n"), sum("amt").as("amt"))

  test("merge(stored, delta) equals full recompute exactly") {
    val stored = rollup(raw.filter(col("k2") === 1))
    val delta = rollup(raw.filter(col("k2") =!= 1))
    val merged = Incremental.mergeAggregates(stored, delta, Seq("k1", "k2"))
      .select("k1", "k2", "n", "amt")
    val full = rollup(raw).select("k1", "k2", "n", "amt")
    assert(merged.collect().toSet == full.collect().toSet)
  }

  test("keys absent from one side survive with the other side's values") {
    val stored = rollup(raw.filter(col("k1") === "a"))
    val delta = rollup(raw.filter(col("k1") === "b"))
    val merged = Incremental.mergeAggregates(stored, delta, Seq("k1", "k2"))
    assert(merged.count() == 4)
    assert(merged.collect().toSet == rollup(raw).collect().toSet)
  }

  test("undeclared non-measure columns are rejected instead of blindly summed") {
    // a rollup with a max column: summing it would silently corrupt the
    // merge, so an explicit measure list must reject the leftover column
    val withMax = raw.groupBy("k1", "k2")
      .agg(sum("n").as("n"), max("amt").as("max_amt"))
    val e = intercept[IllegalArgumentException] {
      Incremental.mergeAggregates(withMax, withMax, Seq("k1", "k2"), measures = Seq("n"))
    }
    assert(e.getMessage.contains("max_amt"))
    // declaring only the summable measures with a pruned frame still works
    val ok = Incremental.mergeAggregates(
      withMax.drop("max_amt"), withMax.drop("max_amt"), Seq("k1", "k2"), measures = Seq("n"))
    assert(ok.count() == 4)
  }

  test("schema mismatch and missing measures are rejected") {
    val a = rollup(raw)
    intercept[IllegalArgumentException] {
      Incremental.mergeAggregates(a, a.drop("amt"), Seq("k1", "k2"))
    }
    intercept[IllegalArgumentException] {
      Incremental.mergeAggregates(a.select("k1", "k2"), a.select("k1", "k2"), Seq("k1", "k2"))
    }
  }
}
