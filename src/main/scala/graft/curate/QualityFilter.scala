package graft.curate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Learned quality filter: a logistic scorer over hashed unigram
  * features, trained IN-ENGINE by batch gradient descent — the standard
  * LLM-curation stage that replaces hand-weighted heuristics
  * ([[graft.functions.TextFunctions]].qualityScore) with a model fit to
  * labels (in production: human ratings or a teacher model's verdicts;
  * the q183 gate distills a deterministic teacher rule). The fastText /
  * CCNet-style linear classifier, re-expressed for exact distributed
  * replay.
  *
  * EXACTNESS DESIGN (the q153/q116 integer device, one step further):
  * weights live on the 1e-6 BIGINT grid, so every per-doc dot product
  * `Σ cnt·w` is an exact integer in micro-units — any summation order,
  * any partitioning, any engine. The ONLY float per epoch is the
  * per-doc sigmoid residual `(y − σ(s/1e6))`, a pure function of one
  * exact integer, immediately re-quantized per doc with
  * `floor(x·1e6 + 0.5)` (identical IEEE ops both engines — never
  * `round(double)`, whose boundary rule differs). The gradient is then
  * `Σ residual·cnt` — exact BIGINT again — and the update divides by
  * the integer learning-rate schedule with TRUNCATING division (Scala
  * `Long./` ≡ DuckDB `//` — both toward zero; DuckDB's `//` is NOT a
  * floor division, probed: `-7 // 2 = -3`, so `Math.floorDiv` on the
  * Scala side would diverge on every negative gradient — the r10
  * first-ship bug, caught by the oracle). Cross-engine risk reduces
  * to a 1-ulp `exp` difference flipping a residual's floor — probed:
  * min distance of `(y−σ)·1e6 + 0.5` to an integer over every
  * (doc, epoch) is ~1e-4 at both scales (tools/probe_qf.py), 6 orders
  * above ulp noise.
  *
  * Scale shape: features hash map-side (one groupBy on (doc, bucket));
  * per epoch, one broadcast join + doc-grouped aggregation scores the
  * train slice and one more aggregates the gradient — the weight table
  * is (buckets+1)-sized and rides the driver↔broadcast path like
  * [[Dsir]]'s bucket weights. Nothing corpus-sized ever collects.
  *
  * Learning-rate schedule: lr_i = 1/(lrScale·n_train·i) — normalized by
  * the TRAIN-SLICE SIZE (the batch gradient grows linearly with it, so
  * an unnormalized schedule that converges at one scale oscillates at
  * 10×; measured: the un-normalized first cut read 96% at sf0.01 and
  * 70% at sf0.1, the normalized one 96% at both) with the 1/i decay
  * that makes batch GD converge instead of oscillate. The bias feature
  * carries value `biasValue` (not 1) so the intercept moves at a
  * comparable rate to the count features (measured: 32 takes the
  * compound-teacher gate from chance to ~96%).
  */
object QualityFilter {

  /** Micro-unit scale: weights/residuals/scores are BIGINTs in 1e-6. */
  val Micro = 1000000L

  private val T = graft.functions.TextFunctions

  /** Hashed n-gram count features + one bias row per doc:
    * (doc_id, bucket ∈ [0, buckets], cnt). Bucket `buckets` IS the bias
    * (value `biasValue` for every doc). Docs with no tokens drop out.
    * `bigrams = true` adds space-joined token bigrams as features (the
    * [[Dsir]] feature space — VERDICT r10 #6), hashed with the same salt
    * into the same bucket range: a bigram string contains a space, which
    * no whitespace-split unigram can, so the gram spaces never collide
    * by construction. Sub-2-token docs emit no bigrams (the shingle
    * kernel's len<n whole-text fallback would duplicate the unigram). */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
                     buckets: Int, biasValue: Long,
                     bigrams: Boolean = false): DataFrame = {
    val toks = tokFrame(docs, idCol, textCol)
    toks.select(col("doc_id"), explode(gramsOf(bigrams)).as("term"))
      .groupBy(col("doc_id"),
        Curate.hashBucketDyn(col("term"), buckets, lit(":qf")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .unionByName(toks.select(col("doc_id"),
        lit(buckets.toLong).as("bucket"), lit(biasValue).as("cnt")))
  }

  private def tokFrame(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol).as("doc_id"), T.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)

  private def gramsOf(bigrams: Boolean) =
    if (!bigrams) col("__toks")
    else concat(col("__toks"), when(size(col("__toks")) >= 2,
      graft.functions.expressions.SimilarityExpressions
        .wordShingles(col("__toks"), 2))
      .otherwise(array().cast("array<string>")))

  /** The (doc_id, term) gram stream [[hashedFeatures]] buckets — exposed
    * so [[deriveBuckets]] estimates vocabulary over EXACTLY the feature
    * grams (unigrams, optionally + bigrams). */
  def gramStream(docs: DataFrame, idCol: String, textCol: String,
                 bigrams: Boolean = false): DataFrame =
    tokFrame(docs, idCol, textCol)
      .select(col("doc_id"), explode(gramsOf(bigrams)).as("term"))

  /** VOCABULARY-ADAPTIVE feature-space sizing (VERDICT r11 #4): the
    * fixed-bucket filter SATURATES when vocabulary outgrows its feature
    * space (measured: 256 buckets tripped the q193 learning floor at 10×
    * grow-vocab BY CONSTRUCTION). Derive the bucket count at train time
    * instead: one KMV pass (k smallest portable-md5 hashes of the
    * DISTINCT grams — the q69 estimator) estimates the vocabulary, and
    * the bucket count is the smallest power of two ≥ the estimate,
    * clamped to [minBuckets, maxBuckets]. Deterministic and
    * ENGINE-REPLAYABLE: the hash set is md5-exact, the single float op
    * (the estimator division) has bit-identical IEEE operands on any
    * engine, and its floor feeds only INTEGER comparisons against the
    * power-of-two ladder — so a DuckDB replay derives the same count
    * (the q195 oracle does exactly that). */
  def deriveBuckets(docs: DataFrame, idCol: String, textCol: String,
                    bigrams: Boolean = false, k: Int = 1024,
                    minBuckets: Int = 256, maxBuckets: Int = 1 << 20): Int = {
    require(Integer.bitCount(minBuckets) == 1 && Integer.bitCount(maxBuckets) == 1
      && minBuckets <= maxBuckets, "bucket bounds must be powers of two")
    val arr = gramStream(docs, idCol, textCol, bigrams)
      .select(graft.functions.expressions.KmvDistinctAgg.kmvSketch(
        Curate.portableHash60(col("term")), k).as("s"))
      .collect()(0).getSeq[Long](0)
    val est: Long =
      if (arr.length < k) arr.length.toLong
      else ((k - 1).toDouble * (1L << 60).toDouble / arr(k - 1).toDouble).toLong
    var b = minBuckets
    while (b < maxBuckets && b < est) b <<= 1
    b
  }

  /** Held-out evaluation rows: per labeled doc, its exact integer score,
    * the keep verdict, and the label — feed [[confusionStats]] or gate
    * directly. `labels` must be the HELD-OUT slice (disjoint from the
    * training slice by construction of the split). */
  def holdoutEval(features: DataFrame, weights: DataFrame,
                  labels: DataFrame): DataFrame =
    score(features, weights)
      .join(labels.select(col("doc_id"), col("y").cast("long").as("y")),
        Seq("doc_id"))
      .select(col("doc_id"), col("y"), col("score_micro"), col("keep"))

  /** One-row exact confusion over [[holdoutEval]] output: integer
    * tp/fp/fn/tn and accuracy in BASIS POINTS via truncating integer
    * division (the q131 integer-rational device — no float boundary, any
    * engine agrees). An EMPTY eval input yields NULL counts and a NULL
    * acc_bp (guarded — ANSI mode is on project-wide, so a bare `div n`
    * would throw DIVIDE_BY_ZERO at runtime; ADVICE r11). */
  def confusionStats(eval: DataFrame): DataFrame =
    eval.agg(
        sum(when(col("keep") === 1 && col("y") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("keep") === 1 && col("y") === 0, 1L).otherwise(0L)).as("fp"),
        sum(when(col("keep") === 0 && col("y") === 1, 1L).otherwise(0L)).as("fn"),
        sum(when(col("keep") === 0 && col("y") === 0, 1L).otherwise(0L)).as("tn"),
        count(lit(1)).as("n"))
      .selectExpr("tp", "fp", "fn", "tn",
        "CASE WHEN n = 0 THEN NULL ELSE (tp + tn) * 10000L div n END AS acc_bp")

  /** One training epoch's residuals are exact BIGINTs; see the object
    * scaladoc. `features` = [[hashedFeatures]] output restricted to the
    * labeled slice is joined in here via `labels` (doc_id, y ∈ {0,1}).
    * Returns the weight table (bucket, w) in micro-units, every value
    * identical under any partitioning. */
  def trainLogistic(spark: SparkSession, features: DataFrame,
                    labels: DataFrame, buckets: Int, epochs: Int,
                    lrScale: Long = 27L): DataFrame = {
    import spark.implicits._
    val lb = labels.select(col("doc_id"), col("y").cast("long").as("y"))
    val nTrain = lb.count()
    require(nTrain > 0, "trainLogistic needs a non-empty labeled slice " +
      "(the learning-rate schedule divides by the train-slice size)")
    // Size the persisted frame's partitioning to the TRAIN-SLICE SIZE
    // before caching: the feature join inherits the hash-aggregate's
    // session-wide shuffle width, AQE cannot re-partition a cached plan
    // (canChangeCachedPlanOutputPartitioning is off), and every epoch
    // then re-pays one near-empty task per cached partition — measured
    // as ~0.4 s/epoch of pure task-launch overhead on a 150k-row frame.
    // ~50k docs/partition ≈ 2M feature rows ≈ tens of MB; coalesce is a
    // narrow dependency (the tokenize/hash map side keeps its
    // parallelism, only the post-shuffle reduce side merges) and the
    // training arithmetic is partitioning-invariant by design (exact
    // BIGINT sums — see the object scaladoc), so the weights are
    // bit-identical.
    val epochParts = math.max(1L, nTrain / 50000L).toInt
    val ft = features.join(lb, Seq("doc_id"))
      .coalesce(epochParts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val w = Array.fill(buckets + 1)(0L)
      for (i <- 1 to epochs) {
        val wdf = w.zipWithIndex
          .map { case (v, b) => (b.toLong, v) }.toSeq.toDF("bucket", "w")
        val resid = ft
          .join(broadcast(wdf), Seq("bucket"))
          .groupBy("doc_id")
          .agg(sum(col("cnt") * col("w")).as("s"), first(col("y")).as("y"))
          .select(col("doc_id"),
            // floor(x*1e6 + 0.5), both engines' IEEE ops verbatim
            floor((col("y").cast("double") -
                lit(1.0) / (lit(1.0) + exp(-(col("s").cast("double") / lit(1.0e6))))) *
              lit(1.0e6) + lit(0.5)).as("r"))
        val grad = ft.join(resid, Seq("doc_id"))
          .groupBy("bucket").agg(sum(col("cnt") * col("r")).as("g"))
          .collect() // (buckets+1)-sized
        grad.foreach { row =>
          val b = row.getAs[Number]("bucket").intValue()
          // truncating division, matching DuckDB's // (NOT floorDiv)
          w(b) += row.getAs[Long]("g") / (lrScale * nTrain * i)
        }
      }
      w.zipWithIndex.map { case (v, b) => (b.toLong, v) }.toSeq.toDF("bucket", "w")
    } finally { ft.unpersist(); () }
  }

  /** Map-side scoring: exact integer micro-unit score per doc and the
    * keep decision (score strictly > 0 — deterministic even at 0). */
  def score(features: DataFrame, weights: DataFrame): DataFrame =
    features.join(broadcast(weights), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum(col("cnt") * col("w")).as("score_micro"))
      .withColumn("keep", (col("score_micro") > 0).cast("int"))

  /** Keep EXACTLY ceil(N·rateNum/rateDen) rows with the HIGHEST scores
    * (ties → lower id) — the production form of the keep decision:
    * filters run at a retention budget, not at the sign of the score.
    * Semantically `row_number() OVER (ORDER BY score DESC, id) ≤ k`,
    * computed scale-shaped with NO global window (the q86
    * bucketed-prefix device re-keyed to the score order):
    *
    *  1. one aggregation gets (N, min, max) → k and an order-preserving
    *     integer bucket of the score (equal scores share a bucket, so
    *     the id tie-break never crosses buckets);
    *  2. per-bucket counts collect (`buckets` rows) and a driver prefix
    *     locates the boundary bucket b*: earlier buckets are kept
    *     VERBATIM (no ordering paid), later ones are dropped unseen;
    *  3. only bucket b* — ~1/buckets of the data — pays a
    *     (score DESC, id) window for its remaining slots.
    *
    * Integer-only arithmetic; bit-identical to the naive global window
    * (spec-pinned) and SQL-replayable as a plain row_number.
    *
    * RESOURCE CONTRACT (ADVICE r11): the returned frame READS the
    * localCheckpoint blocks (lineage is truncated — they cannot be
    * recomputed), so this operator cannot unpersist before returning.
    * The checkpoint is registered with [[graft.plan.Checkpoints]];
    * callers release it AFTER materializing the result via
    * `Checkpoints.release()` (queries do this in their gate code; Bench
    * additionally sweeps between queries as a backstop). A zero rate
    * short-circuits BEFORE the checkpoint — no materialization is paid
    * for an empty result. */
  def selectTopRate(scored: DataFrame, idCol: String, scoreCol: String,
                    rateNum: Long, rateDen: Long,
                    buckets: Int = 1024): DataFrame = {
    require(rateDen > 0 && rateNum >= 0 && rateNum <= rateDen,
      "rate must be a fraction in [0, 1]")
    if (rateNum == 0) return scored.limit(0) // k = ceil(0·n/d) = 0 always
    import org.apache.spark.sql.expressions.Window
    // ONE materialization for all four passes (stats, bucket counts, the
    // two filter branches): at scale `scored` is a join output that would
    // otherwise recompute per pass (VERDICT r10 #4). localCheckpoint
    // truncates the lineage onto persisted blocks; released by the caller
    // through the Checkpoints registry (see the resource contract above).
    val snap = graft.plan.Checkpoints.track(scored.localCheckpoint(true))
    val st = snap.agg(count(lit(1)), min(col(scoreCol).cast("long")),
      max(col(scoreCol).cast("long"))).collect()(0)
    val n = st.getLong(0)
    val k = if (n == 0) 0L else (n * rateNum + rateDen - 1) / rateDen
    if (k == 0) return snap.limit(0)
    val (lo, hi) = (st.getLong(1), st.getLong(2))
    require(hi - lo < Long.MaxValue / buckets,
      s"score range ${hi - lo} too wide for $buckets-way bucketing")
    val span = hi - lo + 1
    val withB = snap.withColumn("__bkt",
      expr(s"((${hi}L - CAST($scoreCol AS BIGINT)) * $buckets) div ${span}L")
        .cast("int"))
    val counts = withB.groupBy("__bkt").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val prefix = (0 until buckets).map(b => counts.getOrElse(b, 0L))
      .scanLeft(0L)(_ + _)
    val bStar = prefix.indexWhere(_ >= k) - 1 // prefix(buckets) = n >= k
    val wb = Window.partitionBy(col("__bkt"))
      .orderBy(col(scoreCol).cast("long").desc, col(idCol).asc)
    withB.filter(col("__bkt") < bStar).drop("__bkt")
      .unionByName(withB.filter(col("__bkt") === bStar)
        .withColumn("__rk", row_number().over(wb))
        .filter(col("__rk") <= k - prefix(bStar))
        .drop("__rk", "__bkt"))
  }
}
