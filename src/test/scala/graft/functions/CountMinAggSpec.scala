package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.CountMinAgg.{countMin, estimate}

class CountMinAggSpec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val W = 64

  test("point estimates are exact when the grid is sparse") {
    val items = Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val df = items.toDF("tok")
    val grid = df.agg(countMin(col("tok"), D, W).as("cms"))
    val got = Seq("alpha", "beta", "gamma").toDF("probe")
      .crossJoin(grid)
      .select(col("probe"), estimate(col("cms"), col("probe"), D, W).as("est"))
      .as[(String, Long)].collect().toMap
    // 3 distinct items in a 4x64 grid: collisions across all 4 rows are
    // effectively impossible, so the min over rows is the exact count
    assert(got == Map("alpha" -> 7L, "beta" -> 3L, "gamma" -> 1L))
  }

  test("estimates never undercount and the grid total is conserved per row") {
    val df = spark.range(0, 5000)
      .select(concat(lit("t"), (col("id") % 300).cast("string")).as("tok"))
    val grid = df.agg(countMin(col("tok"), D, W).as("cms"))
      .as[Seq[Long]].head()
    // every row of the grid holds the full stream count
    (0 until D).foreach { j =>
      assert(grid.slice(j * W, (j + 1) * W).sum == 5000L)
    }
    val exact = df.groupBy("tok").agg(count(lit(1)).as("n"))
    val checked = exact
      .crossJoin(df.agg(countMin(col("tok"), D, W).as("cms")))
      .select(col("tok"), col("n"), estimate(col("cms"), col("tok"), D, W).as("est"))
      .filter(col("est") < col("n"))
      .count()
    assert(checked == 0L, "count-min must never underestimate")
  }

  test("null items are skipped, not counted into bucket 0") {
    val df = (Seq.fill(5)(Some("alpha")) ++ Seq.fill(3)(Option.empty[String]))
      .toDF("tok")
    val grid = df.agg(countMin(col("tok"), D, W)).as[Seq[Long]].head()
    (0 until D).foreach { j =>
      assert(grid.slice(j * W, (j + 1) * W).sum == 5L,
        s"row $j counted null rows")
    }
  }

  test("a bucket array built with the wrong width is rejected, not mis-written") {
    import graft.functions.expressions.CountMinAgg
    import org.apache.spark.sql.{GraftColumnBridge => EU}
    // buckets hashed mod 2*W but grid width W: values >= W must throw,
    // not overflow into the next grid row
    val bad = EU.column(CountMinAgg(
      EU.expression(array(lit((W + 3).toLong), lit(0L))), 2, W).toAggregateExpression())
    val e = intercept[Exception] {
      Seq("x").toDF("tok").agg(bad).collect()
    }
    assert(e.getMessage != null)
  }

  test("sketch is partition-invariant (elementwise merge)") {
    val df = spark.range(0, 2000)
      .select(concat(lit("w"), (col("id") % 97).cast("string")).as("tok"))
    val one = df.repartition(1).agg(countMin(col("tok"), D, W)).as[Seq[Long]].head()
    val many = df.repartition(16).agg(countMin(col("tok"), D, W)).as[Seq[Long]].head()
    assert(one == many)
  }
}
