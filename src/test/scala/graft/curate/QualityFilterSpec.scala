package graft.curate

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityFilterSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic corpus: doc i has (i%5)+1 "good"s and
  // (i%7) "bad"s plus shared filler; teacher = more good than bad
  private def corpus = (0L until 120L).map { i =>
    val good = Seq.fill((i % 5).toInt + 1)("good")
    val bad = Seq.fill((i % 7).toInt)("bad")
    val filler = Seq("the", "quick", "fox") ++ Seq.fill((i % 3).toInt)("pad")
    (i, (good ++ bad ++ filler).mkString(" "))
  }.toDF("doc_id", "text")

  private def labels = corpus.select(col("doc_id"),
    (col("doc_id") % 5 + 1 > col("doc_id") % 7).cast("int").as("y"))

  test("hashedFeatures: counts partition the tokens; one bias row per doc") {
    val ft = QualityFilter.hashedFeatures(corpus, "doc_id", "text", 64, 32L)
    val bias = ft.filter(col("bucket") === 64)
    assert(bias.count() == 120 &&
      bias.filter(col("cnt") =!= 32L).count() == 0)
    val perDoc = ft.filter(col("bucket") < 64)
      .groupBy("doc_id").agg(sum("cnt").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc i has (i%5)+1 + (i%7) + 3 + (i%3) tokens
    (0L until 120L).foreach { i =>
      assert(perDoc(i) == (i % 5) + 1 + (i % 7) + 3 + (i % 3))
    }
    assert(ft.filter(col("bucket") < 0 || col("bucket") > 64).count() == 0)
  }

  test("trainLogistic learns a separable teacher and is partition-invariant") {
    // small counts (1-7 per word) need a hotter schedule than the q183
    // corpus: bias 4 / lrScale 4 reads ~93% on this teacher (prototyped)
    val ft = QualityFilter.hashedFeatures(corpus, "doc_id", "text", 64, 4L)
    def weights(f: org.apache.spark.sql.DataFrame) =
      QualityFilter.trainLogistic(spark, f, labels, 64, epochs = 6,
          lrScale = 4L)
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val w = weights(ft)
    // integer-exact: identical under re-run and under any partitioning
    assert(weights(ft) == w)
    assert(weights(ft.repartition(13)) == w)
    val wdf = w.toDF("bucket", "w")
    val scored = QualityFilter.score(ft, wdf).join(labels, Seq("doc_id"))
    val acc = scored.filter((col("score_micro") > 0).cast("int") === col("y"))
      .count().toDouble / 120
    assert(acc >= 0.9, s"learned filter accuracy $acc below 0.9")
    // keep is exactly the strict > 0 rule
    assert(scored.filter(col("keep") =!=
      (col("score_micro") > 0).cast("int")).count() == 0)
  }

  test("update division truncates toward zero, matching DuckDB //") {
    // DuckDB's // is NOT floor division (probed: -7 // 2 = -3): the
    // contract is TRUNCATING division on both sides — Scala Long./ is,
    // Math.floorDiv is not (it gives -4 here and diverged the oracle)
    assert(-7L / 2L == -3L && Math.floorDiv(-7L, 2L) == -4L)
    assert(7L / 2L == 3L)
  }

  test("selectTopRate equals the naive global window, ties and partitioning included") {
    import org.apache.spark.sql.expressions.Window
    // scores with heavy ties (i % 17) so the id tie-break matters, and a
    // spread component so bucketing actually splits
    val scored = (0L until 3000L).map(i => (i, (i % 17) * 1000 + (i % 7)))
      .toDF("doc_id", "score_micro")
    def naive(k: Long) = scored.withColumn("__r", row_number().over(
        Window.orderBy(col("score_micro").desc, col("doc_id").asc)))
      .filter(col("__r") <= k).drop("__r")
      .as[(Long, Long)].collect().toSet
    for ((num, den) <- Seq((1L, 4L), (1L, 3L), (2L, 3L), (1L, 1L))) {
      val k = (3000L * num + den - 1) / den
      val got = QualityFilter.selectTopRate(scored.repartition(13),
        "doc_id", "score_micro", num, den, buckets = 16)
        .as[(Long, Long)].collect()
      assert(got.length == k, s"rate $num/$den: ${got.length} != $k")
      assert(got.toSet == naive(k), s"rate $num/$den diverges from the window")
    }
    // degenerate: all scores equal -> pure id order
    val flat = (0L until 100L).map(i => (i, 42L)).toDF("doc_id", "score_micro")
    assert(QualityFilter.selectTopRate(flat, "doc_id", "score_micro", 1, 4)
      .as[(Long, Long)].collect().map(_._1).sorted.toSeq == (0L until 25L))
    // rate 0 keeps nothing; empty input stays empty
    assert(QualityFilter.selectTopRate(scored, "doc_id", "score_micro", 0, 4)
      .count() == 0)
    assert(QualityFilter.selectTopRate(scored.limit(0), "doc_id",
      "score_micro", 1, 2).count() == 0)
  }

  test("bigram features: grams = unigrams + space-joined pairs; no collision with unigrams") {
    val docs = Seq((1L, "a b c"), (2L, "solo"), (3L, "x x")).toDF("doc_id", "text")
    val uni = QualityFilter.hashedFeatures(docs, "doc_id", "text", 64, 1L)
    val big = QualityFilter.hashedFeatures(docs, "doc_id", "text", 64, 1L,
      bigrams = true)
    def gramCount(ft: org.apache.spark.sql.DataFrame) =
      ft.filter(col("bucket") < 64).groupBy("doc_id")
        .agg(sum("cnt").as("n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: 3 unigrams + 2 bigrams; doc 2: 1 + 0 (sub-2-token docs emit
    // no bigrams); doc 3: 2 + 1
    assert(gramCount(uni) == Map(1L -> 3L, 2L -> 1L, 3L -> 2L))
    assert(gramCount(big) == Map(1L -> 5L, 2L -> 1L, 3L -> 3L))
    // the bigram "x x" must hash to a DIFFERENT bucket than unigram "x"
    // (space-joined ⇒ distinct gram string) — doc 3 carries both
    val d3 = big.filter(col("doc_id") === 3 && col("bucket") < 64).collect()
    assert(d3.map(_.getAs[Long]("cnt")).sorted.toSeq == Seq(1L, 2L))
  }

  test("holdoutEval + confusionStats: exact integer confusion and basis-point accuracy") {
    val ft = QualityFilter.hashedFeatures(corpus, "doc_id", "text", 64, 4L,
      bigrams = true)
    val train = labels.filter(col("doc_id") % 4 =!= 1)
    val held = labels.filter(col("doc_id") % 4 === 1)
    val w = QualityFilter.trainLogistic(spark, ft, train, 64, epochs = 6,
      lrScale = 4L)
    val eval = QualityFilter.holdoutEval(ft, w, held)
    assert(eval.count() == held.count())
    val c = QualityFilter.confusionStats(eval).collect()(0)
    val (tp, fp, fn, tn) = (c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3))
    assert(tp + fp + fn + tn == held.count())
    // acc_bp is TRUNCATING integer division (matches DuckDB //)
    assert(c.getAs[Long]("acc_bp") == (tp + tn) * 10000L / (tp + fp + fn + tn))
    // confusion counts re-derive from the eval rows exactly
    val re = eval.collect().map(r => (r.getLong(1), r.getAs[Int]("keep")))
    assert(re.count(t => t._1 == 1 && t._2 == 1).toLong == tp)
    assert(re.count(t => t._1 == 0 && t._2 == 1).toLong == fp)
  }

  test("selectTopRate materializes the scored frame once (VERDICT r10 #4)") {
    // the input lineage carries a non-deterministic marker: if any of the
    // four passes recomputed it instead of reading the checkpoint, the
    // selected set would be internally inconsistent / the accumulator
    // would read > 1 pass
    val acc = spark.sparkContext.longAccumulator("scans")
    val base = (0L until 2000L).map(i => (i, (i % 23) * 100 + (i % 5)))
      .toDF("doc_id", "score_micro")
    val marked = base.as[(Long, Long)].mapPartitions { it =>
      acc.add(1L); it
    }.toDF("doc_id", "score_micro")
    val parts = marked.rdd.getNumPartitions
    acc.reset()
    val out = QualityFilter.selectTopRate(marked, "doc_id", "score_micro",
      1, 4, buckets = 8)
    val n = out.count()
    assert(n == 500)
    assert(acc.value <= parts,
      s"scored frame computed ${acc.value} partition-passes for $parts partitions — not checkpointed")
  }

  test("zero score keeps nothing (strict inequality both engines)") {
    val ft = Seq((1L, 0L, 2L), (1L, 64L, 32L)).toDF("doc_id", "bucket", "cnt")
    val w = Seq((0L, 16L), (64L, -1L)).toDF("bucket", "w") // 2*16 - 32 = 0
    val out = QualityFilter.score(ft, w).collect()
    assert(out.length == 1 && out(0).getAs[Long]("score_micro") == 0L &&
      out(0).getAs[Int]("keep") == 0)
  }

  test("confusionStats on an EMPTY eval yields NULL acc_bp, not DIVIDE_BY_ZERO (ADVICE r11)") {
    // ANSI mode is on project-wide: an unguarded `div n` with n = 0
    // throws at runtime; the stat row must instead carry NULLs
    val empty = Seq.empty[(Long, Long, Long, Int)]
      .toDF("doc_id", "y", "score_micro", "keep")
    val row = QualityFilter.confusionStats(empty).collect()(0)
    assert(row.isNullAt(row.fieldIndex("acc_bp")))
    assert(row.isNullAt(row.fieldIndex("tp")))
  }

  test("selectTopRate at rate 0 short-circuits: empty result, NO checkpoint paid (ADVICE r11)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val scored = Seq((1L, 10L), (2L, 5L)).toDF("doc_id", "score_micro")
    val out = QualityFilter.selectTopRate(scored, "doc_id", "score_micro", 0L, 10L)
    assert(out.count() == 0)
    assert(sc.getPersistentRDDs.keySet == before,
      "zero rate must not materialize (no persisted RDDs added)")
  }

  test("selectTopRate registers its escaping checkpoint with Checkpoints; release() reclaims it") {
    val sc = spark.sparkContext
    graft.plan.Checkpoints.release() // drain residue from other suites
    val before = sc.getPersistentRDDs.keySet
    val scored = (1L to 100L).map(i => (i, i % 17)).toDF("doc_id", "score_micro")
    val out = QualityFilter.selectTopRate(scored, "doc_id", "score_micro", 1L, 4L)
    assert(out.count() == 25)
    assert(graft.plan.Checkpoints.liveCount >= 1,
      "the escaping localCheckpoint must be tracked")
    graft.plan.Checkpoints.release()
    assert(graft.plan.Checkpoints.liveCount == 0)
    assert(sc.getPersistentRDDs.keySet.diff(before).isEmpty,
      "release() must blocking-unpersist the tracked checkpoint")
  }
}
