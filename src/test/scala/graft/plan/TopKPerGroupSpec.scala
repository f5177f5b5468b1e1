package graft.plan

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  // 40 groups × 50 rows, order values with deliberate duplicates but a
  // total order via the tiebreak id; some null order values
  private def sampleDf(s: org.apache.spark.sql.SparkSession = spark) = {
    import s.implicits._
    val rows = for (g <- 0 until 40; i <- 0 until 50) yield
      (g, g.toLong * 1000 + i, if ((g + i) % 17 == 0) None else Some((i * 7919 % 13).toDouble))
    rows.toDF("grp", "id", "score")
  }

  private def windowTop(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id").asc)
    df.select(col("grp"), col("id"), col("score"), row_number().over(w).as("rk"))
      .filter(col("rk") <= k)
  }

  test("explicit API matches the window formulation exactly (nulls, ties, ranks)") {
    val df = sampleDf()
    val got = TopKPerGroup(df, Seq(col("grp")),
        Seq(col("score").desc, col("id").asc), k = 5)
      .select("grp", "id", "score", "rk")
      .as[(Int, Long, Option[Double], Int)].collect().toSet
    val exp = windowTop(df, 5)
      .as[(Int, Long, Option[Double], Int)].collect().toSet
    assert(got == exp)
    assert(got.size == 200) // 40 groups × 5
  }

  test("plan shape: partial heap below the exchange, final above it") {
    val df = sampleDf()
    val q = TopKPerGroup(df, Seq(col("grp")), Seq(col("score").desc, col("id").asc), 5)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopK"), s"no partial pass:\n$plan")
    assert(plan.contains("TopKPerGroupExec") || plan.contains("TopKPerGroup"), plan)
    val partialIdx = plan.indexOf("PartialTopK")
    val exchangeIdx = plan.indexOf("Exchange")
    assert(exchangeIdx >= 0 && exchangeIdx < partialIdx,
      s"partial pass must sit below the exchange:\n$plan")
  }

  test("global top-k (empty grouping) works via AllTuples") {
    val got = TopKPerGroup(sampleDf(), Seq.empty, Seq(col("id").desc), 3)
      .select("id").as[Long].collect().toSet
    assert(got == Set(39049L, 39048L, 39047L))
  }

  test("rewrite rule turns row_number window filters into the heap operator") {
    val s2 = spark.newSession()
    TopKPerGroup.install(s2)
    val df = sampleDf(s2)
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id").asc)
    val q = df.select(col("grp"), col("id"), col("score"), row_number().over(w).as("rk"))
      .filter(col("rk") <= 4)
    assert(q.queryExecution.optimizedPlan.toString.contains("TopKPerGroupNode"),
      s"window pattern not rewritten:\n${q.queryExecution.optimizedPlan}")
    val got = q.as[(Int, Long, Option[Double], Int)].collect().toSet
    val exp = windowTop(sampleDf(), 4).as[(Int, Long, Option[Double], Int)].collect().toSet
    assert(got == exp)
  }

  test("rewrite keeps residual conjuncts and skips non-rewritable shapes") {
    val s2 = spark.newSession()
    TopKPerGroup.install(s2)
    val df = sampleDf(s2)
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id").asc)
    val ranked = df.select(col("grp"), col("id"), col("score"), row_number().over(w).as("rk"))
    // rk <= 3 AND grp % 2 = 0: bound consumed, residual kept
    val mixed = ranked.filter(col("rk") <= 3 && col("grp") % 2 === 0)
    assert(mixed.queryExecution.optimizedPlan.toString.contains("TopKPerGroupNode"))
    val got = mixed.as[(Int, Long, Option[Double], Int)].collect().toSet
    val exp = windowTop(sampleDf(), 3).filter(col("grp") % 2 === 0)
      .as[(Int, Long, Option[Double], Int)].collect().toSet
    assert(got == exp)
    // rank = 1 (argmax shorthand) rewrites with k = 1
    val argmax = ranked.filter(col("rk") === 1)
    assert(argmax.queryExecution.optimizedPlan.toString.contains("TopKPerGroupNode"))
    assert(argmax.count() == 40)
    // a lower bound alone must NOT rewrite (it is not a top-k)
    val lower = ranked.filter(col("rk") > 2)
    assert(!lower.queryExecution.optimizedPlan.toString.contains("TopKPerGroupNode"))
    // k beyond the heap-safety cap stays on the window path
    val huge = ranked.filter(col("rk") <= TopKPerGroup.MaxK + 1)
    assert(!huge.queryExecution.optimizedPlan.toString.contains("TopKPerGroupNode"))
  }

  test("groups larger than one partial side and k larger than some groups") {
    val df = Seq((1, 1L, 1.0), (1, 2L, 2.0), (2, 3L, 3.0)).toDF("grp", "id", "score")
      .repartition(8)
    val got = TopKPerGroup(df, Seq(col("grp")), Seq(col("score").desc, col("id").asc), 10)
      .select("grp", "id", "rk").as[(Int, Long, Int)].collect().toSet
    assert(got == Set((1, 2L, 1), (1, 1L, 2), (2, 3L, 1)))
  }
}
