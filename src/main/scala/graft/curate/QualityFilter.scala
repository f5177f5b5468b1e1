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

  /** Hashed unigram count features + one bias row per doc:
    * (doc_id, bucket ∈ [0, buckets], cnt). Bucket `buckets` IS the bias
    * (value `biasValue` for every doc). Docs with no tokens drop out. */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
                     buckets: Int, biasValue: Long): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), T.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
    toks.select(col("doc_id"), explode(col("__toks")).as("term"))
      .groupBy(col("doc_id"),
        Curate.hashBucketDyn(col("term"), buckets, lit(":qf")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .unionByName(toks.select(col("doc_id"),
        lit(buckets.toLong).as("bucket"), lit(biasValue).as("cnt")))
  }

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
    val ft = features.join(lb, Seq("doc_id"))
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
}
