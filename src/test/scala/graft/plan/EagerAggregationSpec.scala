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
        // outer join
        orders.join(customer, col("o_custkey") === col("c_custkey"), "left")
          .groupBy("c_mktsegment").agg(sum("o_custkey").as("s")),
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
}
