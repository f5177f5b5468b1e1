package graft.plan

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import org.apache.spark.sql.functions._

import graft.SparkSpec

class EagerAggregationSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def aggsBelowJoin(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case j: Join => j.children.map(_.collect { case a: Aggregate => a }.size).sum
    }.sum

  private def withRule[A](body: => A): A = {
    EagerAggregation.enable(spark)
    try body finally EagerAggregation.disable(spark)
  }

  private def withTemp[A](body: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("eageragg").toString
    try body(dir)
    finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("pushes the partial below the join and matches the direct answer exactly") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    def q() = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("o_custkey").as("s_int"),
        avg("o_custkey").as("a_int"),
        min("o_totalprice").as("mn"), max("o_totalprice").as("mx"),
        sum("o_totalprice").as("s_f"))
    val direct = q()
    assert(aggsBelowJoin(direct) == 0)
    val rows = direct.orderBy("c_mktsegment").collect()
    withRule {
      val eager = q()
      assert(EagerAggregation.partialAggBelowJoin(eager),
        s"not pushed:\n${eager.queryExecution.optimizedPlan}")
      assert(aggsBelowJoin(eager) == 1, "exactly one pre-aggregation")
      val got = eager.orderBy("c_mktsegment").collect()
      assert(got.length == rows.length && rows.nonEmpty)
      got.zip(rows).foreach { case (a, b) =>
        assert(a.getString(0) == b.getString(0))
        assert(a.getLong(1) == b.getLong(1))     // count(*)
        assert(a.getLong(2) == b.getLong(2))     // sum(long): exact
        assert(a.getDouble(3) == b.getDouble(3)) // avg(long): exact sums, one divide
        assert(a.getDouble(4) == b.getDouble(4)) // min
        assert(a.getDouble(5) == b.getDouble(5)) // max
        assert(math.abs(a.getDouble(6) - b.getDouble(6)) < 1e-6) // float sum: order
      }
    }
  }

  test("duplicate dim keys and null fact keys keep join multiplicity semantics") {
    withTemp { dir =>
      Seq((Some(1L), 10.0), (Some(1L), 20.0), (Some(2L), 5.0),
          (None: Option[Long], 99.0), (Some(3L), 7.0))
        .toDF("k", "m").write.parquet(s"$dir/fact")
      Seq((Some(1L), "a"), (Some(1L), "a2"), (Some(2L), "b"),
          (None: Option[Long], "z"), (Some(4L), "c"))
        .toDF("k", "g").write.parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim")
      def q() = fact.join(dim, fact("k") === dim("k"))
        .groupBy("g").agg(count(lit(1)).as("n"), sum("m").as("s"),
          min("m").as("mn"), max("m").as("mx"))
      val want = q().collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).toSet
      withRule {
        val eager = q()
        assert(EagerAggregation.partialAggBelowJoin(eager))
        val got = eager.collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
            r.getDouble(3), r.getDouble(4))).toSet
        assert(got == want)
        // the duplicate dim key must appear twice with identical partials
        assert(got.map(_._1) == Set("a", "a2", "b"))
        assert(got.count(t => t._2 == 2 && t._3 == 30.0) == 2)
      }
    }
  }

  test("sum(decimal) re-sums partials and casts back to the original type") {
    withTemp { dir =>
      Seq((1L, "1.25"), (1L, "2.75"), (2L, "0.50"))
        .toDF("k", "ms")
        .select(col("k"), col("ms").cast("decimal(10,2)").as("m"))
        .write.parquet(s"$dir/fact")
      Seq((1L, "a"), (2L, "b")).toDF("k", "g").write.parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim")
      def q() = fact.join(dim, fact("k") === dim("k"))
        .groupBy("g").agg(sum("m").as("s"))
      val direct = q()
      withRule {
        val eager = q()
        assert(EagerAggregation.partialAggBelowJoin(eager))
        assert(eager.schema == direct.schema,
          s"decimal sum type drifted: ${eager.schema} vs ${direct.schema}")
        assert(eager.collect().map(r => (r.getString(0), r.getDecimal(1))).toSet
          == direct.collect().map(r => (r.getString(0), r.getDecimal(1))).toSet)
      }
    }
  }

  // --- outer joins (VERDICT r9 #3): Yan-Larson outer variant ---

  private def outerData[A](body: (DataFrame, DataFrame) => A): A = withTemp { dir =>
    // fact: keys 1 (x2), 2, null-key, 5-unmatched; m null once on key 1
    Seq((Some(1L), Some(10.0)), (Some(1L), None: Option[Double]),
        (Some(2L), Some(5.0)), (None: Option[Long], Some(99.0)),
        (Some(5L), Some(7.0)))
      .toDF("k", "m").write.parquet(s"$dir/fact")
    // dim: key 1 duplicated, 2, null key, 4-unmatched-by-fact
    Seq((Some(1L), "a"), (Some(1L), "a2"), (Some(2L), "b"),
        (None: Option[Long], "z"), (Some(4L), "c"))
      .toDF("k", "g").write.parquet(s"$dir/dim")
    body(spark.read.parquet(s"$dir/fact"), spark.read.parquet(s"$dir/dim"))
  }

  private def collectAgg(df: DataFrame): Set[(Option[String], Long, Long,
      Option[Double], Option[Double], Option[Double])] =
    df.collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
      Option(r.get(3)).map(_.asInstanceOf[Double]),
      Option(r.get(4)).map(_.asInstanceOf[Double]),
      Option(r.get(5)).map(_.asInstanceOf[Double]))).toSet

  test("left outer, fact preserved: unmatched fact partials null-extend with full weight") {
    outerData { (fact, dim) =>
      def q() = fact.join(dim, fact("k") === dim("k"), "left")
        .groupBy("g").agg(count(lit(1)).as("n"), count(col("m")).as("c"),
          sum("m").as("s"), min("m").as("mn"), max("m").as("mx"))
      val want = collectAgg(q())
      // raw semantics sanity: null dim group holds fact keys null and 5
      assert(want.contains((None, 2L, 2L, Some(106.0), Some(7.0), Some(99.0))))
      withRule {
        val eager = q()
        assert(EagerAggregation.partialAggBelowJoin(eager),
          s"left-outer preserved-fact not pushed:\n${eager.queryExecution.optimizedPlan}")
        assert(collectAgg(eager) == want)
      }
    }
  }

  test("left outer, fact null-extended: count(*) keeps the count-bug rows") {
    outerData { (fact, dim) =>
      // dim LEFT JOIN fact, aggregates over fact ⇒ fact is null-extended
      def q() = dim.join(fact, dim("k") === fact("k"), "left")
        .groupBy("g").agg(count(lit(1)).as("n"), count(col("m")).as("c"),
          sum("m").as("s"), min("m").as("mn"), max("m").as("mx"))
      val want = collectAgg(q())
      // the count-bug rows: unmatched dim keys still count 1 in count(*)
      assert(want.contains((Some("c"), 1L, 0L, None, None, None)))
      assert(want.contains((Some("z"), 1L, 0L, None, None, None)))
      withRule {
        val eager = q()
        assert(EagerAggregation.partialAggBelowJoin(eager),
          s"left-outer null-extended-fact not pushed:\n${eager.queryExecution.optimizedPlan}")
        assert(collectAgg(eager) == want)
      }
    }
  }

  test("right outer mirrors both orientations; full outer pushes with both obligations") {
    outerData { (fact, dim) =>
      def qPreserved() = dim.join(fact, dim("k") === fact("k"), "right")
        .groupBy("g").agg(count(lit(1)).as("n"), count(col("m")).as("c"),
          sum("m").as("s"), min("m").as("mn"), max("m").as("mx"))
      def qNullExt() = fact.join(dim, fact("k") === dim("k"), "right")
        .groupBy("g").agg(count(lit(1)).as("n"), count(col("m")).as("c"),
          sum("m").as("s"), min("m").as("mn"), max("m").as("mx"))
      // FULL OUTER (VERDICT r9 #5): unmatched fact rows (null key, key 5)
      // null-extend once under the NULL g group with full partial weight;
      // unmatched dim rows ("c", "z") keep their count-bug count(*) row.
      def qFull() = fact.join(dim, fact("k") === dim("k"), "full")
        .groupBy("g").agg(count(lit(1)).as("n"), count(col("m")).as("c"),
          sum("m").as("s"), min("m").as("mn"), max("m").as("mx"))
      val wantP = collectAgg(qPreserved())
      val wantN = collectAgg(qNullExt())
      val wantF = collectAgg(qFull())
      // raw full-outer sanity: both unmatched directions present
      assert(wantF.contains((None, 2L, 2L, Some(106.0), Some(7.0), Some(99.0))))
      assert(wantF.contains((Some("c"), 1L, 0L, None, None, None)))
      assert(wantF.contains((Some("z"), 1L, 0L, None, None, None)))
      withRule {
        val p = qPreserved(); val n = qNullExt(); val f = qFull()
        assert(EagerAggregation.partialAggBelowJoin(p))
        assert(EagerAggregation.partialAggBelowJoin(n))
        assert(EagerAggregation.partialAggBelowJoin(f),
          s"full outer with plain-attr args must push:\n${f.queryExecution.optimizedPlan}")
        assert(collectAgg(p) == wantP)
        assert(collectAgg(n) == wantN)
        assert(collectAgg(f) == wantF)
      }
    }
  }

  test("null-extended fact bails on non-null-rejecting expression args (ADVICE r10)") {
    outerData { (fact, dim) =>
      // dim LEFT JOIN fact: fact is null-extended. coalesce(m, 0) reads 0
      // on every null-extended raw row — a pushed partial has NO row
      // there, so the rewrite would silently drop those contributions.
      def qCoalesce() = dim.join(fact, dim("k") === fact("k"), "left")
        .groupBy("g").agg(min(coalesce(col("m"), lit(0.0))).as("mn"),
          sum(col("m") * lit(2.0)).as("s2"))
      // full outer with an expression arg must bail for the same reason
      def qFullExpr() = fact.join(dim, fact("k") === dim("k"), "full")
        .groupBy("g").agg(sum(coalesce(col("m"), lit(1.0))).as("s"))
      // fact PRESERVED: expression args stay allowed (the pre-aggregation
      // evaluates them on exactly the raw fact rows)
      def qPreservedExpr() = fact.join(dim, fact("k") === dim("k"), "left")
        .groupBy("g").agg(sum(coalesce(col("m"), lit(100.0))).as("s"))
      val wantC = qCoalesce().collect()
        .map(r => (Option(r.getString(0)), r.getDouble(1))).toSet
      val wantF = qFullExpr().collect()
        .map(r => (Option(r.getString(0)), Option(r.get(1)))).toSet
      val wantP = qPreservedExpr().collect()
        .map(r => (Option(r.getString(0)), Option(r.get(1)))).toSet
      // the trap must be armed: unmatched dim rows see coalesce's 0
      assert(wantC.exists(t => t._1 == Some("c") && t._2 == 0.0))
      withRule {
        val c = qCoalesce(); val f = qFullExpr(); val p = qPreservedExpr()
        assert(!EagerAggregation.partialAggBelowJoin(c),
          "null-extended fact with expression arg must bail")
        assert(!EagerAggregation.partialAggBelowJoin(f),
          "full outer with expression arg must bail")
        assert(EagerAggregation.partialAggBelowJoin(p),
          s"fact-preserved expression arg must still push:\n${p.queryExecution.optimizedPlan}")
        assert(c.collect().map(r => (Option(r.getString(0)), r.getDouble(1))).toSet == wantC)
        assert(f.collect().map(r => (Option(r.getString(0)), Option(r.get(1)))).toSet == wantF)
        assert(p.collect().map(r => (Option(r.getString(0)), Option(r.get(1)))).toSet == wantP)
      }
    }
  }

  test("empty inner join: global count coalesces to 0, not NULL (ADVICE r9)") {
    withTemp { dir =>
      Seq((1L, 10.0), (2L, 5.0)).toDF("k", "m").write.parquet(s"$dir/fact")
      Seq((100L, "a")).toDF("k", "g").write.parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim")
      def q() = fact.join(dim, fact("k") === dim("k"))
        .agg(count(lit(1)).as("n"), count(col("m")).as("c"), sum("m").as("s"))
      val direct = q().collect().head
      assert(direct.getLong(0) == 0L && direct.getLong(1) == 0L && direct.isNullAt(2))
      withRule {
        val eager = q()
        assert(EagerAggregation.partialAggBelowJoin(eager))
        val got = eager.collect().head
        assert(got.getLong(0) == 0L, "count(*) must be 0, not NULL")
        assert(got.getLong(1) == 0L, "count(m) must be 0, not NULL")
        assert(got.isNullAt(2), "sum stays NULL on empty input")
      }
    }
  }

  test("count(a,b) and count(a,c) keep distinct partials (ADVICE r9)") {
    withTemp { dir =>
      Seq((1L, Some(1), Some(1), None: Option[Int]),
          (1L, Some(2), None: Option[Int], Some(3)),
          (1L, Some(4), None: Option[Int], Some(5)),
          (2L, Some(6), Some(7), Some(8)))
        .toDF("k", "a", "b", "c").write.parquet(s"$dir/fact")
      Seq((1L, "x"), (2L, "y")).toDF("k", "g").write.parquet(s"$dir/dim")
      spark.read.parquet(s"$dir/fact").createOrReplaceTempView("ea_fact")
      spark.read.parquet(s"$dir/dim").createOrReplaceTempView("ea_dim")
      def q() = spark.sql(
        """SELECT g, count(a, b) AS nab, count(a, c) AS nac
          |FROM ea_fact JOIN ea_dim ON ea_fact.k = ea_dim.k GROUP BY g""".stripMargin)
      val want = q().collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(want == Set(("x", 1L, 2L), ("y", 1L, 1L)),
        "test data must make the two counts differ")
      withRule {
        val eager = q()
        assert(EagerAggregation.partialAggBelowJoin(eager))
        val got = eager.collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
        assert(got == want, "multi-arg counts sharing a first argument collapsed")
      }
    }
  }

  test("fires for count(*)-only and for fact-side grouping columns") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    def qCount() = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    // grouping includes a FACT column: it must join the pre-agg keys
    def qFactGroup() = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderstatus")
      .agg(sum("o_custkey").as("s"))
    val wantCount = qCount().collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val wantFg = qFactGroup().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    withRule {
      assert(EagerAggregation.partialAggBelowJoin(qCount()))
      assert(qCount().collect().map(r => (r.getString(0), r.getLong(1))).toSet
        == wantCount)
      assert(EagerAggregation.partialAggBelowJoin(qFactGroup()))
      assert(qFactGroup().collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet == wantFg)
    }
  }

  test("cascades through a multi-join chain in one pass") {
    // Aggregate over Join(Join(fact, dim1), dim2): the rule first treats
    // Join(fact, dim1) as the fact side of the OUTER join and pushes a
    // partial below it; transformDown then visits that new pre-agg —
    // Aggregate over Join(fact, dim1) — and pushes again below the
    // INNER join. Two pre-aggregations, one optimizer pass, fact rows
    // never cross either join at full size.
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    def q() = orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"))
    val want = q().collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val wantS = q().collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    withRule {
      val eager = q()
      assert(aggsBelowJoin(eager) >= 2,
        s"expected a cascaded double push:\n${eager.queryExecution.optimizedPlan}")
      val got = eager.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want && want.nonEmpty)
      eager.collect().foreach { r =>
        assert(math.abs(r.getDouble(2) - wantS(r.getString(0))) < 1e-6)
      }
    }
  }

  test("composes with RollupRewrite: the pushed partial redirects to a summary (no fact scan)") {
    // AGGREGATE NAVIGATION: iteration 1 of the extraOptimizations
    // fixpoint pushes the partial below the join (this rule), iteration
    // 2 redirects that pushed partial to the registered custkey-grain
    // summary (RollupRewrite) — the join query then never scans the
    // fact table at all.
    val dir = java.nio.file.Files.createTempDirectory("aggnav").toString
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    try {
      Rollup.materialize(orders, Seq("o_custkey"), Seq("o_totalprice"))
        .write.mode("overwrite").parquet(s"$dir/summary")
      RollupRewrite.register(orders, spark.read.parquet(s"$dir/summary"),
        Seq("o_custkey"), Seq("o_totalprice"))
      def q() = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"),
          min("o_totalprice").as("mn"))
      val want = q().collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toSet
      val wantSums = q().collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      RollupRewrite.enable(spark)
      EagerAggregation.enable(spark)
      try {
        val composed = q()
        val scans = RollupRewrite.scanRootPaths(composed)
        assert(scans.exists(_.contains("summary")) &&
          !scans.exists(_.contains("orders.parquet")),
          s"fact must not be scanned — scans $scans:\n${composed.queryExecution.optimizedPlan}")
        assert(EagerAggregation.partialAggBelowJoin(composed))
        val got = composed.collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toSet
        assert(got == want)
        composed.collect().foreach { r =>
          assert(math.abs(r.getDouble(2) - wantSums(r.getString(0))) < 1e-6)
        }
      } finally {
        EagerAggregation.disable(spark)
        RollupRewrite.disable(spark)
        RollupRewrite.clear()
      }
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("bails on unsupported shapes, leaving the plan untouched") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val customer = spark.read.parquet(s"$sf/customer.parquet")
    withRule {
      val bails = Seq(
        // distinct aggregate
        orders.join(customer, col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment").agg(countDistinct("o_orderstatus").as("n")),
        // full outer with a non-null-rejecting expression arg (plain-attr
        // full outer IS supported since VERDICT r9 #5 / ADVICE r10)
        orders.join(customer, col("o_custkey") === col("c_custkey"), "full")
          .groupBy("c_mktsegment")
          .agg(sum(coalesce(col("o_custkey"), lit(0L))).as("s")),
        // aggregate referencing BOTH sides
        orders.join(customer, col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(sum(col("o_custkey") + col("c_nationkey")).as("s")),
        // non-equi condition
        orders.join(customer, col("o_custkey") < col("c_custkey"))
          .groupBy("c_mktsegment").agg(sum("o_custkey").as("s")))
      bails.foreach { df =>
        assert(aggsBelowJoin(df) == 0,
          s"should NOT push:\n${df.queryExecution.optimizedPlan}")
        assert(df.collect() != null)
      }
    }
  }

  test("cost guard: analyzed near-unique keys auto-bail; reducing keys fire; unknown bases unchanged (VERDICT r11 #1)") {
    withTemp { dir =>
      // near-unique: one fact row per key (the spill regime)
      spark.range(0, 5000).select(col("id").as("k"), (col("id") % 7).as("m"))
        .write.parquet(s"$dir/factU")
      // reducing: 50 rows per key (the regime the rule exists for)
      spark.range(0, 5000).select((col("id") % 100).as("k"), (col("id") % 7).as("m"))
        .write.parquet(s"$dir/factR")
      // never analyzed: estimate-free behavior must stay "fire"
      spark.range(0, 5000).select(col("id").as("k"), (col("id") % 7).as("m"))
        .write.parquet(s"$dir/factX")
      val dim = spark.range(0, 6000).select(col("id").as("dk"),
        (col("id") % 5).cast("string").as("g"))
      def q(fact: DataFrame) = fact.join(dim, col("k") === col("dk"))
        .groupBy("g").agg(sum("m").as("s"), count(lit(1)).as("n"))
      def rows(df: DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      try {
        val su = EagerAggregation.analyzeKeys(
          spark.read.parquet(s"$dir/factU"), Seq("k"))
        val sr = EagerAggregation.analyzeKeys(
          spark.read.parquet(s"$dir/factR"), Seq("k"))
        assert(su.rows == 5000 && su.distinctByCol("k") > 4000,
          s"near-unique estimate off: $su")
        assert(sr.distinctByCol("k") == 100, // < sketch k ⇒ exact
          s"reducing estimate off: $sr")
        val wantU = rows(q(spark.read.parquet(s"$dir/factU")))
        val wantR = rows(q(spark.read.parquet(s"$dir/factR")))
        withRule {
          val qu = q(spark.read.parquet(s"$dir/factU"))
          assert(!EagerAggregation.partialAggBelowJoin(qu),
            s"near-unique keys must auto-bail:\n${qu.queryExecution.optimizedPlan}")
          val qr = q(spark.read.parquet(s"$dir/factR"))
          assert(EagerAggregation.partialAggBelowJoin(qr),
            s"reducing keys must still fire:\n${qr.queryExecution.optimizedPlan}")
          assert(rows(qu) == wantU && rows(qr) == wantR)
          // un-analyzed base: no estimate ⇒ fire (status quo preserved)
          val qx = q(spark.read.parquet(s"$dir/factX"))
          assert(EagerAggregation.partialAggBelowJoin(qx),
            s"estimate-free base must keep firing:\n${qx.queryExecution.optimizedPlan}")
          // the knob: 0 disables the guard entirely
          EagerAggregation.setMinReduction(0)
          assert(EagerAggregation.partialAggBelowJoin(
            q(spark.read.parquet(s"$dir/factU"))))
          EagerAggregation.setMinReduction(4.0)
        }
      } finally {
        EagerAggregation.clearKeyStats()
        EagerAggregation.setMinReduction(4.0)
      }
    }
  }

  test("cost guard: a near-unique fact GROUPING column bails too (tuple distinct ≥ max per-column)") {
    withTemp { dir =>
      // join key reduces 50:1, but the fact-side grouping column is
      // near-unique — the pre-agg keys on BOTH, so the tuple is
      // near-unique and the guard must see through the reducing join key
      spark.range(0, 5000).select((col("id") % 100).as("k"),
          col("id").as("u"), (col("id") % 7).as("m"))
        .write.parquet(s"$dir/fact")
      val dim = spark.range(0, 6000).select(col("id").as("dk"),
        (col("id") % 5).cast("string").as("g"))
      def q(fact: DataFrame) = fact.join(dim, col("k") === col("dk"))
        .groupBy(col("g"), col("u")).agg(sum("m").as("s"))
      try {
        EagerAggregation.analyzeKeys(
          spark.read.parquet(s"$dir/fact"), Seq("k", "u"))
        withRule {
          val df = q(spark.read.parquet(s"$dir/fact"))
          assert(!EagerAggregation.partialAggBelowJoin(df),
            s"near-unique grouping col must bail:\n${df.queryExecution.optimizedPlan}")
        }
      } finally {
        EagerAggregation.clearKeyStats()
        EagerAggregation.setMinReduction(4.0)
      }
    }
  }
}
