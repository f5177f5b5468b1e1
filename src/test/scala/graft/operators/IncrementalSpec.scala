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

  test("retractAggregates equals recompute on the reduced base; emptied groups vanish") {
    val stored = rollup(raw)
    // retract ALL of group (b, 2) and part of (a, 1)
    val gone = raw.filter((col("k1") === "b" && col("k2") === 2) ||
      (col("k1") === "a" && col("k2") === 1 && col("n") === 5L))
    val out = Incremental.retractAggregates(stored, rollup(gone),
        Seq("k1", "k2"), countCol = "n")
      .select("k1", "k2", "n", "amt")
    val expect = rollup(raw.exceptAll(gone)).select("k1", "k2", "n", "amt")
    assert(out.collect().toSet == expect.collect().toSet)
    assert(!out.collect().exists(r => r.getString(0) == "b" && r.getInt(1) == 2))
  }

  test("retractAggregates ≡ reduced-base recompute on seeded random retraction subsets") {
    val rnd = new scala.util.Random(5)
    (1 to 5).foreach { round =>
      val base = (1 to 200).map { i =>
        (s"k${rnd.nextInt(6)}", rnd.nextInt(3), 1L,
          BigDecimal(rnd.nextInt(100000)) / 100)
      }.toDF("k1", "k2", "n", "amt")
      // deterministic retraction subset: fixed local partitioning makes
      // the row index stable across the two filter evaluations
      val flagged = base.withColumn("__r", monotonically_increasing_id() % 3 === 0)
      val gone = flagged.filter(col("__r")).drop("__r")
      val kept = flagged.filter(!col("__r")).drop("__r")
      val out = Incremental.retractAggregates(rollup(base), rollup(gone),
          Seq("k1", "k2"), countCol = "n")
        .select("k1", "k2", "n", "amt").collect().toSet
      val expect = rollup(kept).select("k1", "k2", "n", "amt").collect().toSet
      assert(out == expect, s"random retraction round $round diverged")
    }
  }

  test("retractAggregates rejects a countCol outside the merged measures") {
    val stored = rollup(raw)
    intercept[IllegalArgumentException] {
      Incremental.retractAggregates(stored, stored, Seq("k1", "k2"), countCol = "k1")
    }
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

  private def joinFixture = {
    val a = Seq((1L, "x1"), (2L, "x2"), (2L, "x3"), (3L, "x4"), (4L, "x5"))
      .toDF("k", "av")
    val b = Seq((1L, "y1"), (2L, "y2"), (3L, "y3"), (5L, "y4")).toDF("k", "bv")
    (a, b)
  }

  test("mergeJoin equals the full join recompute, including delta×delta") {
    val (a, b) = joinFixture
    // splits chosen so every term is non-empty: ΔA row k=2 matches both
    // B₀ (k=2) and ΔB... and ΔA k=4 matches only ΔB? b has no 4 — use k=3
    val (a0, da) = (a.filter(col("av") =!= "x3" && col("av") =!= "x4"),
      a.filter(col("av") === "x3" || col("av") === "x4"))
    val (b0, db) = (b.filter(col("k") =!= 3), b.filter(col("k") === 3))
    val stored = a0.join(b0, Seq("k"))
    val merged = Incremental.mergeJoin(stored, a0, da, b0, db, Seq("k"))
    val full = a.join(b, Seq("k"))
    assert(merged.collect().toSet == full.collect().toSet)
    assert(merged.count() == full.count()) // no double-counted pairs either
  }

  test("mergeJoin with one empty delta degrades to a single delta join") {
    val (a, b) = joinFixture
    val da = a.limit(0)
    val merged = Incremental.mergeJoin(a.join(b, Seq("k")), a, da, b, b.limit(0), Seq("k"))
    assert(merged.collect().toSet == a.join(b, Seq("k")).collect().toSet)
  }

  test("chained multi-day folds: 3 sequential deltas ≡ full recompute after EVERY fold") {
    // single-step checks can't catch state-accumulation bugs (a merge that
    // is exact once but drifts when its own output is the next stored
    // input) — fold 3 days through BOTH operators, comparing each day.
    // mergeAggregates: decimal amounts stress exactness across re-merges.
    val days = Seq(
      Seq(("a", 1, 10L, BigDecimal("1.50")), ("b", 1, 3L, BigDecimal("4.00")),
        ("a", 2, 7L, BigDecimal("0.25"))),
      Seq(("a", 1, 5L, BigDecimal("2.25")), ("c", 1, 1L, BigDecimal("9.75")),
        ("b", 2, 2L, BigDecimal("1.00"))),
      Seq(("a", 2, 4L, BigDecimal("3.10")), ("c", 1, 6L, BigDecimal("0.15")),
        ("b", 1, 8L, BigDecimal("2.05"))))
    var aggState = rollup(days.head.toDF("k1", "k2", "n", "amt"))
    var seen = days.head
    for (day <- days.tail) {
      aggState = Incremental.mergeAggregates(
        aggState, rollup(day.toDF("k1", "k2", "n", "amt")), Seq("k1", "k2"))
      seen = seen ++ day
      val full = rollup(seen.toDF("k1", "k2", "n", "amt"))
      assert(aggState.select("k1", "k2", "n", "amt").collect().toSet ==
        full.select("k1", "k2", "n", "amt").collect().toSet,
        s"aggregate state diverged after folding ${seen.size} rows")
    }

    // mergeJoin: bases grow day over day; delta keys overlap old AND new
    val aDays = Seq(
      Seq((1L, "a1"), (2L, "a2")),
      Seq((2L, "a3"), (3L, "a4")),
      Seq((1L, "a5"), (4L, "a6")))
    val bDays = Seq(
      Seq((1L, "b1"), (3L, "b2")),
      Seq((2L, "b3"), (1L, "b4")),
      Seq((4L, "b5"), (3L, "b6")))
    var aBase = aDays.head.toDF("k", "av")
    var bBase = bDays.head.toDF("k", "bv")
    var joinState = aBase.join(bBase, Seq("k"))
    for ((da, db) <- aDays.tail.zip(bDays.tail)) {
      val (daDf, dbDf) = (da.toDF("k", "av"), db.toDF("k", "bv"))
      joinState = Incremental.mergeJoin(joinState, aBase, daDf, bBase, dbDf, Seq("k"))
      aBase = aBase.unionByName(daDf)
      bBase = bBase.unionByName(dbDf)
      val full = aBase.join(bBase, Seq("k"))
      assert(joinState.collect().toSet == full.collect().toSet,
        "join state diverged from recompute")
      assert(joinState.count() == full.count(), "duplicated or lost pairs")
    }
  }

  test("mergeJoin maintenance joins are broadcast — the base sides never shuffle") {
    val (a, b) = joinFixture
    val stored = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[org.apache.spark.sql.Row]),
      a.join(b, Seq("k")).schema) // pre-materialized stored: no join inside
    val merged = Incremental.mergeJoin(stored, a, a.limit(1), b, b.limit(1), Seq("k"))
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"maintenance must not shuffle the base sides:\n$plan")
  }
}
