package graft.queries

import graft.SparkSpec

/** Physical-plan guards: these assert the *shape* Catalyst produces, so a
  * refactor that silently loses filter pushdown, column pruning, a
  * broadcast, or partial aggregation fails the build — at 100 TB each of
  * these is the difference between a scan of gigabytes and a scan of
  * terabytes. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Queries.rawAll(name)(spark, sf).queryExecution.executedPlan.toString

  /** Plan after execution — under AQE the final plan (with codegen stage
    * markers) only exists once the query has run. */
  private def executedPlan(name: String): String = {
    val df = Queries.rawAll(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q01: filter and projection reach the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushdown in:\n$p")
    // column pruning: the scan must not read l_orderkey and friends
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
  }

  test("q01: partial aggregation before the shuffle") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("HashAggregate") && p.contains("partial"))
  }

  test("q02: small dims broadcast, big join shuffles") {
    val p = plan("q02_market_share")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
  }

  test("q24: query side is broadcast — corpus never shuffles") {
    val p = plan("q24_cosine_pairs")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q04: semi join stays a join, not a distinct+inner rewrite") {
    val p = plan("q04_semi_join")
    assert(p.contains("LeftSemi"))
  }

  test("whole-stage codegen covers the scan->agg path of q01") {
    val p = executedPlan("q01_pricing_summary")
    // codegen stages print as "*(n) Operator" in the final AQE plan
    assert(p.contains("*(1)") && p.contains("*(2)"), s"no codegen stage in:\n$p")
  }

  test("partitioned writes prune partitions at the scan (PartitionFilters)") {
    val out = java.nio.file.Files.createTempDirectory("ppart").toString
    spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("status", org.apache.spark.sql.functions.col("o_orderstatus"))
      .write.partitionBy("status").parquet(s"$out/t")
    val q = spark.read.parquet(s"$out/t")
      .filter(org.apache.spark.sql.functions.col("status") === "F")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(status"), s"no partition pruning in:\n$plan")
    assert(q.count() > 0)
  }

  test("q40 top-k: one exchange feeds the ranking window") {
    val p = plan("q40_topk_per_group")
    assert(p.contains("Window"), s"no window in:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange")) == 1,
      s"expected exactly one exchange in:\n$p")
  }

  test("q41 repetition kernel is map-side only — no exchange") {
    val p = plan("q41_repetition")
    assert(!p.contains("Exchange"), s"unexpected shuffle in:\n$p")
  }

  test("q42 decontamination: benchmark gram set broadcasts, corpus join never sort-merges") {
    val p = plan("q42_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus side shuffled for the join:\n$p")
  }

  test("q43 hash split is map-side only — no exchange") {
    val p = plan("q43_hash_split")
    assert(!p.contains("Exchange"), s"unexpected shuffle in:\n$p")
  }

  test("q49 bigram LM: corpus tokenize+explode executes once (exchange reuse)") {
    // under AQE the plan string appends the pre-execution "Initial Plan";
    // only the final plan reflects what actually executed
    val p = executedPlan("q49_bigram_lm").split("== Initial Plan ==")(0)
    assert(p.contains("ReusedExchange"),
      s"model and scoring sides no longer share the gram-count exchange:\n$p")
    assert(p.linesIterator.count(_.contains("Generate")) == 1,
      s"expected exactly one executed explode of the corpus in:\n$p")
  }

  test("native text kernels keep their operators inside whole-stage codegen") {
    // a CodegenFallback expression ejects its host operator from WSCG;
    // these kernels implement doGenCode precisely so that doesn't happen
    for (q <- Seq("q48_char_entropy", "q41_repetition")) {
      val p = executedPlan(q)
      val projects = p.linesIterator.filter(_.contains("Project")).toSeq
      assert(projects.nonEmpty && projects.forall(_.contains("*(")),
        s"$q: kernel Project fell out of whole-stage codegen:\n$p")
    }
  }

  test("q09 splitRows: comparator predicate is pushed to the scan") {
    val p = plan("q09_split_rows")
    assert(p.contains("PushedFilters: [IsNotNull(l_discount), IsNotNull(l_quantity), LessThanOrEqual(l_discount,0.02)"))
  }

  test("q58 rollup: grouping sets expand once, aggregation stays partial") {
    val p = plan("q58_rollup")
    assert(p.contains("Expand"), s"no grouping-set expand in:\n$p")
    assert(p.contains("partial"), s"no partial aggregation in:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange")) == 1,
      s"rollup must be a single shuffle:\n$p")
  }

  test("q59 pivot with explicit values: both aggregation levels stay partial") {
    // Dataset.pivot plans as groupBy(source,lang).count -> pivotfirst on
    // source: two exchanges by construction. With explicit values there is
    // no eager distinct-scan job at .pivot() time; the guard pins that both
    // levels keep map-side partials (the at-scale requirement).
    val p = plan("q59_pivot")
    assert(p.linesIterator.count(_.contains("Exchange")) == 2,
      s"expected the two pivot aggregation exchanges:\n$p")
    assert(p.contains("partial_pivotfirst") && p.contains("partial_count"),
      s"pivot aggregation lost its map-side partials:\n$p")
  }

  test("q60 unpivot: expand is map-side; only the 4-group agg shuffles") {
    val p = plan("q60_unpivot")
    assert(p.contains("Expand"), s"unpivot should plan as Expand in:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange")) == 1,
      s"expected exactly one exchange in:\n$p")
  }

  test("q61 lag window is partitioned — no global single-partition sort") {
    val p = plan("q61_lag_delta")
    assert(p.contains("Window"), s"no window in:\n$p")
    assert(!p.contains("SinglePartition"), s"window collapsed to one partition:\n$p")
  }

  test("q64 bloom decontamination: in-scan probe stays codegen'd, verify join broadcasts") {
    // judge the FINAL adaptive plan only — the "Initial Plan" section keeps
    // the pre-AQE sort-merge join that AQE flips to broadcast
    val p = executedPlan("q64_bloom_decontaminate").split("== Initial Plan ==")(0)
    // the bloom probe is a Filter expression — its host must carry the
    // codegen star (a CodegenFallback would strip the whole stage)
    val probeLine = p.linesIterator.find(_.contains("bloomcontainsexpr")).get
    assert(probeLine.contains("*("), s"bloom probe fell out of codegen:\n$p")
    // the exact verify join against the gram set is a broadcast, and the
    // final keep is an anti join — the corpus is never sort-merge joined
    assert(p.contains("BroadcastHashJoin"), s"verify join lost its broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-side sort-merge crept in:\n$p")
  }

  test("q70 cube: all four grouping sets from ONE scan, aggregation stays partial") {
    val p = plan("q70_cube_agg")
    assert(p.contains("Expand"), s"no grouping-set expand in:\n$p")
    assert(p.linesIterator.count(_.contains("FileScan")) == 1,
      s"cube must not rescan the table per grouping set:\n$p")
    assert(p.contains("partial"), s"no partial aggregation in:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange")) == 1,
      s"cube must be a single shuffle:\n$p")
  }

  test("q71 rank windows share one partitioned sort — no single-partition collapse") {
    val p = plan("q71_rank_windows")
    assert(p.contains("Window"), s"no window in:\n$p")
    assert(!p.contains("SinglePartition"), s"window collapsed to one partition:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange")) == 1,
      s"all four rank functions must share one exchange:\n$p")
  }

  test("q72 intersect plans as distinct + left-semi, filters pushed to both scans") {
    val p = plan("q72_intersect")
    assert(p.contains("LeftSemi"), s"intersect lost its semi join:\n$p")
    assert(p.linesIterator.count(_.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus")) == 2,
      s"status filters must reach both parquet scans:\n$p")
  }

  test("q74 count-min: grid aggregation is partial; 1-row grid broadcasts") {
    val p = plan("q74_cms_estimate")
    assert(p.toLowerCase.contains("partial_countminagg"),
      s"sketch partials lost — the token stream would shuffle:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"1-row grid side must broadcast:\n$p")
  }

  test("q75 z-order: bit interleave is map-side; only the bucket agg shuffles") {
    val p = plan("q75_zorder_stats")
    assert(p.linesIterator.count(_.contains("Exchange")) == 1,
      s"expected exactly one exchange in:\n$p")
    val proj = executedPlan("q75_zorder_stats").split("== Initial Plan ==")(0)
      .linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(proj.nonEmpty && proj.forall(_.contains("*(")),
      s"interleave/agg path fell out of whole-stage codegen:\n$proj")
  }

  test("q79 incremental merge: every aggregation level keeps map-side partials") {
    val p = plan("q79_incremental_rollup")
    // three aggregations (stored rollup, delta rollup, merge) — each must
    // partial-aggregate before its exchange or the merge shuffles raw rows
    assert(p.linesIterator.count(l => l.contains("HashAggregate") && l.contains("partial")) >= 3,
      s"an aggregation level lost its partials:\n$p")
    assert(p.contains("Union"), s"merge should union the partial tables:\n$p")
  }

  test("q82 skew diagnosis: the exact verify join broadcasts the candidates") {
    val p = executedPlan("q82_skew_analyze").split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"candidate semi-join must broadcast, not shuffle the key stream:\n$p")
    assert(!p.contains("SortMergeJoin"), s"key stream shuffled for the verify:\n$p")
  }

  test("q67 heap top-k: partial pass below the exchange bounds shuffle volume") {
    val p = executedPlan("q67_topk_heap")
    val partialIdx = p.indexOf("PartialTopK")
    val exchangeIdx = p.indexOf("Exchange")
    assert(partialIdx >= 0 && p.contains("TopKPerGroup"), s"custom operator missing:\n$p")
    assert(exchangeIdx >= 0 && exchangeIdx < partialIdx,
      s"partial heap pass must run BEFORE the shuffle:\n$p")
    assert(!p.contains("WindowExec") && !p.contains(" Window"),
      s"query fell back to the sort-based window path:\n$p")
  }
}
