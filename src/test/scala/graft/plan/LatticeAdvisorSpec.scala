package graft.plan

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LatticeAdvisorSpec extends SparkSpec {
  import spark.implicits._
  import LatticeAdvisor._

  // 12 rows, 2 dims; a NULL dim VALUE must count as its own grain tuple
  private def df = Seq(
    ("a", 1), ("a", 1), ("a", 2), ("b", 1), ("b", 2), ("b", 2),
    ("b", 3), ("c", 1), ("c", 1), ("c", 1), (null, 1), (null, 2)
  ).toDF("x", "y")

  private val dims = Seq("x" -> col("x"), "y" -> col("y"))

  test("grainCardinalities from one cube pass equal direct distinct counts") {
    val card = grainCardinalities(df, dims)
    assert(card(0) == 1) // apex
    assert(card(1) == df.select("x").distinct().count())  // {x} incl. NULL
    assert(card(2) == df.select("y").distinct().count())  // {y}
    assert(card(3) == df.select("x", "y").distinct().count())
    assert(card(1) == 4 && card(2) == 3 && card(3) == 8)
  }

  test("advise replays the HRU greedy") {
    // workload: {x}, {y}, {x,y}; base cost 12 each; |x|=4 |y|=3 |xy|=8.
    // round 1: full grain benefits all three: 3*(12-8)=12; {x}: 8;
    //   {y}: 9 -> full picked.
    // round 2: all costs 8; {x}: 8-4=4; {y}: 8-3=5 -> {y} picked.
    // round 3: costs x=8, y=3, xy=8; {x}: 4 -> {x} picked.
    val advice = advise(df, dims, Seq(Set("x"), Set("y"), Set("x", "y")), 3)
    assert(advice.map(a => (a.step, grainName(a.grain), a.rows, a.benefit)) ==
      Seq((1, "x,y", 8L, 12L), (2, "y", 3L, 5L), (3, "x", 4L, 4L)))
  }

  test("benefit ties break toward fewer grain columns") {
    // y is functionally determined by x, so |x| = |x,y| = 3 and both
    // candidates tie at benefit 4-3=1 for workload {x}: the 1-column
    // grain must win (the oracle's ORDER BY ben DESC, ncols ASC, v ASC)
    val tied = Seq(("a", 1), ("a", 1), ("b", 2), ("c", 3)).toDF("x", "y")
    val advice = advise(tied, dims, Seq(Set("x")), 1)
    assert(advice.map(a => (grainName(a.grain), a.rows, a.benefit)) ==
      Seq(("x", 3L, 1L)))
  }

  test("approx cardinalities: exact below the sketch size, deterministic above it") {
    // every grain here has < 256 distinct tuples, so the sketches never
    // fill and the estimates ARE the exact counts -> approx advice must
    // equal exact advice bit-for-bit
    assert(grainCardinalitiesApprox(df, dims, sketchK = 256) ==
      grainCardinalities(df, dims))
    assert(advise(df, dims, Seq(Set("x"), Set("y"), Set("x", "y")), 3,
        sketchK = Some(256)) ==
      advise(df, dims, Seq(Set("x"), Set("y"), Set("x", "y")), 3))
    // above the sketch size: estimates are partition-invariant and close
    val big = spark.range(0, 20000)
      .selectExpr("CAST(id % 5000 AS STRING) AS x", "CAST(id % 7 AS INT) AS y")
    val est = grainCardinalitiesApprox(big, dims, sketchK = 64)
    assert(est == grainCardinalitiesApprox(big.repartition(11), dims, 64))
    assert(est(0) == 1 && est(2) == 7) // apex; |y| = 7 < 64 stays exact
    assert(math.abs(est(1) - 5000) < 1500, s"|x| estimate ${est(1)} far off 5000")
    assert(math.abs(est(3) - 20000) < 6000, s"|x,y| estimate ${est(3)} far off 20000")
  }

  test("advise is deterministic under repartitioning") {
    val a = advise(df.repartition(7), dims, Seq(Set("x"), Set("x", "y")), 2)
    val b = advise(df.coalesce(1), dims, Seq(Set("x"), Set("x", "y")), 2)
    assert(a == b)
  }

  test("approx advice flags sketch-noise-sensitive margins, exact mode never does (VERDICT r10 #7)") {
    val names = Seq("x", "y")
    val wl = Seq(1, 2) // masks for workload grains {x}, {y}
    // near-tied ESTIMATED candidates: benefit margin 1 sits far inside
    // the ±1/sqrt(k) band scaled by the estimated rows → flagged, but
    // the pick itself stays deterministic (higher benefit wins)
    val close = Map(1 -> 500L, 2 -> 501L)
    val f = LatticeAdvisor.greedy(close, wl, 10000L, 1, names,
      Some(1.0 / 16), estimated = Set(1, 2))
    assert(f.head.marginFlagged && f.head.grain == Seq("x"))
    // a wide margin (4500 vs band ~344) is trustworthy
    val wide = Map(1 -> 500L, 2 -> 5000L)
    assert(!LatticeAdvisor.greedy(wide, wl, 10000L, 1, names,
      Some(1.0 / 16), estimated = Set(1, 2)).head.marginFlagged)
    // the same near-tie over EXACT cardinalities (unfilled sketches)
    // carries a zero band: no flag even in approx mode
    assert(!LatticeAdvisor.greedy(close, wl, 10000L, 1, names,
      Some(1.0 / 16)).head.marginFlagged)
    // exact mode never flags
    assert(!LatticeAdvisor.greedy(close, wl, 10000L, 1, names).head.marginFlagged)
  }

  test("advisor loop with a COMPUTED dimension: advise over month() on the raw fact, materializeExpr, serve") {
    // r11 closes q185's prepared-base workaround: the advisor's dims can
    // BE expressions (cardinalities project them), the advised grain
    // materializes via materializeExpr, registers with groupExprOf, and
    // the month()-grouped query on the RAW fact rides the summary — the
    // full capture→advise→materialize→serve loop with no prepared table.
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val dims = Seq("om" -> month(col("o_orderdate")),
      "st" -> col("o_orderstatus"))
    val advice = LatticeAdvisor.advise(orders, dims,
      Seq(Set("om"), Set("om", "st")), k = 2)
    assert(advice.nonEmpty && advice.forall(_.benefit > 0))
    val dir = java.nio.file.Files.createTempDirectory("advexpr").toString
    try {
      advice.filter(_.grain.nonEmpty).foreach { a =>
        val exprs = a.grain.map(g => g -> dims.find(_._1 == g).get._2)
        Rollup.materializeExpr(orders, exprs, Seq("o_totalprice"))
          .write.mode("overwrite").parquet(s"$dir/${a.grain.mkString("_")}")
        // every advised dim here is an EXPRESSION grain (om computes
        // month; st renames a column — also not a base column name)
        RollupRewrite.register(orders,
          spark.read.parquet(s"$dir/${a.grain.mkString("_")}"),
          a.grain, Seq("o_totalprice"), groupExprOf = exprs.toMap)
      }
      RollupRewrite.enable(spark)
      def q(src: org.apache.spark.sql.DataFrame) =
        src.groupBy(month(col("o_orderdate")).as("m"))
          .agg(count(lit(1)).as("n"), min("o_totalprice").as("mn"))
      val served = q(orders)
      val scans = served.queryExecution.optimizedPlan.collect {
        case org.apache.spark.sql.execution.datasources.LogicalRelation(
            fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) => fs.location.rootPaths.map(_.toString)
      }.flatten
      assert(scans.nonEmpty && scans.forall(_.contains(dir)),
        s"advised computed grain did not serve:\n${served.queryExecution.optimizedPlan}")
      RollupRewrite.disable(spark)
      val want = q(orders).collect().map(_.toSeq).toSet
      RollupRewrite.enable(spark)
      assert(served.collect().map(_.toSeq).toSet == want && want.nonEmpty)
    } finally {
      RollupRewrite.disable(spark)
      RollupRewrite.clear()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("workload grains must use declared dim names") {
    intercept[IllegalArgumentException] {
      advise(df, dims, Seq(Set("z")), 1)
    }
  }

  test("filter-aware advice: a WHERE-heavy workload picks the filter-compatible grain (VERDICT r11 #7)") {
    val dir = java.nio.file.Files.createTempDirectory("latfilter").toString
    try {
      // a: 50 values, b: 2 values — grain {b} is tiny (2 rows) but cannot
      // serve `WHERE a = .. GROUP BY b`; the filter-aware greedy must pay
      // for {a, b} (100 rows, still 100x under the base) instead
      spark.range(0, 10000).select((col("id") % 50).as("a"),
          (col("id") % 2).as("b"), col("id").as("m"))
        .write.parquet(s"$dir/base")
      val base = spark.read.parquet(s"$dir/base")
      val fdims = Seq("a" -> col("a"), "b" -> col("b"))
      // capture real traffic: the grouping AND its filter columns
      RollupRewrite.enable(spark)
      RollupRewrite.startWorkloadCapture()
      base.filter(col("a") === 7).groupBy("b").agg(count(lit(1))).collect()
      RollupRewrite.stopWorkloadCapture()
      val wl = RollupRewrite.capturedWorkloadWithFilters(
        RollupRewrite.scanRootPaths(base.select("a")))
      assert(wl.contains((Set("b"), Set("a"))),
        s"capture must record grouping AND filter columns: $wl")
      // grain-only advice over-values the coarse {b}; filter-aware
      // advice zeroes {b}'s benefit for this query and picks {a, b}
      val plain = advise(base, fdims, wl.map(_._1), k = 1)
      val aware = adviseFiltered(base, fdims, wl, k = 1)
      assert(plain.head.grain == Seq("b"),
        s"grain-only advice should have picked the coarse grain: $plain")
      assert(aware.head.grain == Seq("a", "b"),
        s"filter-aware advice must pick the servable grain: $aware")
      // and the picked grain actually SERVES the captured query
      graft.plan.Rollup.materialize(base, aware.head.grain, Seq("m"))
        .write.mode("overwrite").parquet(s"$dir/sum")
      RollupRewrite.register(base, spark.read.parquet(s"$dir/sum"),
        aware.head.grain, Seq("m"))
      val served = base.filter(col("a") === 7).groupBy("b")
        .agg(count(lit(1)).as("n"))
      assert(RollupRewrite.scanRootPaths(served).forall(_.contains("sum")),
        s"advised grain must serve:\n${served.queryExecution.optimizedPlan}")
      // id % 50 == 7 ⇒ id odd ⇒ b = 1 always: one group of 200
      assert(served.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        == Map(1L -> 200L))
    } finally {
      RollupRewrite.resetWorkloadCapture()
      RollupRewrite.disable(spark)
      RollupRewrite.clear()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
