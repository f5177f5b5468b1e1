package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-shape guards for the round-5 curation operators: the properties
  * that make them 100 TB-shaped are invisible to the hash-match gate (a
  * window fallback returns identical rows), so pin them in the plan. */
class NewOpPlanSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 200L)
    .map(i => (i, s"g${i % 5}", i % 97 + 1))
    .toDF("id", "g", "w")

  test("capPerGroup plans through the heap exec, not a Window sort") {
    val q = graft.curate.Curate.capPerGroup(docs, "g", "id", n = 3, salt = "s")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"heap exec missing:\n$plan")
    assert(!plan.contains("Window"), s"fell back to a window sort:\n$plan")
  }

  test("tokenBudget never plans a global (single-partition) window") {
    val q = graft.curate.Curate.tokenBudget(docs, "id", "w",
      budget = 500, salt = "s", buckets = 16)
    val plan = q.queryExecution.executedPlan.toString
    // the window must be partitioned by the hash bucket — a global window
    // would show an empty partition spec (windowspecdefinition with no
    // partitioning keys collapses the corpus onto one partition)
    assert(plan.contains("Window"), s"expected per-bucket windows:\n$plan")
    assert(plan.contains("__bkt"), s"window lost its bucket partitioning:\n$plan")
  }

  test("collapseRepeatTokens is pure map-side: zero exchanges") {
    val q = graft.curate.Curate.collapseRepeatTokens(
      docs.select(col("id"), concat_ws(" ", lit("a"), lit("a"), col("g")).as("text")),
      "id", "text")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"map-side op grew a shuffle:\n$plan")
  }

  test("vocabCoverage scores map-side: no second explode, no corpus shuffle") {
    val q = graft.curate.Curate.vocabCoverage(
      docs.select(col("id"), concat_ws(" ", lit("a"), col("g")).as("text")),
      "id", "text", topK = 3)
    val plan = q.queryExecution.executedPlan.toString
    // the vocabulary was collected up front; the scoring pass itself must
    // not explode or shuffle the corpus again
    assert(!plan.contains("Exchange"), s"scoring pass grew a shuffle:\n$plan")
    assert(!plan.contains("Generate"), s"scoring pass re-exploded the corpus:\n$plan")
  }

  test("stripDuplicatedSegments has no window and no cartesian join") {
    val q = graft.dedup.Dedup.stripDuplicatedSegments(
      docs.select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 12).map(i => concat(lit("t"), col("id") * 12 + i)): _*).as("text")),
      "doc_id", "text")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    assert(!plan.contains("Cartesian"), s"unexpected cartesian:\n$plan")
  }

  test("duplicatedSpans: island window and span agg share ONE doc-keyed exchange") {
    val q = graft.dedup.Dedup.duplicatedSpans(
      docs.select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 12).map(i => concat(lit("t"), col("id") * 12 + i)): _*).as("text")),
      "doc_id", "text")
    val plan = q.queryExecution.executedPlan.toString
    // the span aggregation's ClusteredDistribution on (id, __isl) must be
    // satisfied by the window's hashpartitioning(id) — a second doc-keyed
    // exchange means the shared partitioning broke
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning(id#")) == 1,
      s"expected exactly one doc-keyed exchange:\n$plan")
    // the duplicate count is a window over ONE hash-keyed exchange — a
    // groupBy branch would re-tokenize the corpus and add a third exchange
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2,
      s"expected exactly two exchanges (h, id):\n$plan")
  }

  test("matchDistribution never shuffles the corpus (broadcast count join only)") {
    val q = graft.curate.Curate.matchDistribution(
      docs.select(col("id"), col("g").as("source")), "source", "id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"count join not broadcast:\n$plan")
    // "Exchange hashpartitioning" is how Spark actually prints a shuffle
    // (there is no node named "ShuffleExchange" in plan strings), and a
    // ShuffledHashJoin would shuffle without any SortMergeJoin appearing
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus shuffled for the keep filter:\n$plan")
  }

  test("Cdc.applyChanges windows only the change log, never the base") {
    val base = docs.select(col("id"), col("g"), col("w"))
    val changes = base.limit(10).withColumn("op", lit("U")).withColumn("seq", lit(1L))
    val q = graft.operators.Cdc.applyChanges(base, changes, Seq("id"), "op", "seq")
    val planStr = q.queryExecution.executedPlan.toString
    // count Window NODES (the header "Window ["), not substring hits —
    // windowspecdefinition strings also contain "Window"
    assert("Window \\[".r.findAllIn(planStr).size == 1,
      s"expected exactly one window node (on the changes subtree):\n$planStr")
  }

  test("goldenRecords is one aggregation: no window, partial aggregation present") {
    val q = graft.operators.Golden.goldenRecords(
      docs.select(col("g").as("cluster"), col("id").as("seq"), col("w")),
      "cluster", "seq", Seq("w"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"survivorship fell back to a window:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"no aggregation found:\n$plan")
  }
}
