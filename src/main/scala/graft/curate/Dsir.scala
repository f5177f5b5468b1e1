package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}
import graft.functions.expressions.SimilarityExpressions

/** DSIR-style data selection with importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * every raw document by how target-like its hashed n-gram distribution
  * is, then keep the highest-importance slice. The standard recipe for
  * steering a 100 TB crawl toward a quality/domain target corpus.
  *
  * Features are hashed unigrams + bigrams (the paper's), bucketed by the
  * repo's engine-portable 60-bit md5 hash ([[Curate.portableHash60]]) so a
  * SQL oracle replays the bucketing bit-for-bit. Per-bucket weight =
  * log((c_T(b)+½)/(N_T+B/2)) − log((c_R(b)+½)/(N_R+B/2)) (add-half
  * smoothing, so never-seen buckets are defined), QUANTIZED to integer
  * micro-units (⌊lw·10⁶+½⌋ as BIGINT). That quantization is the
  * determinism device: per-document importance becomes an exact integer
  * sum — order-independent, overflow-safe under ANSI (|lw_micro| ≲ 2·10⁷,
  * so ~4·10¹¹ tokens/doc before overflow), and rank boundaries tie-break
  * on doc id with NO float epsilon anywhere. The only float surface is
  * the per-bucket `ln` itself (B values, not corpus-sized);
  * tools/probe_dsir.py probes every bucket's distance from its rounding
  * boundary at both scales (libm last-ulp noise is ~10⁻⁹ on this scale,
  * so margins ≥ 10⁻⁴ are conclusive).
  *
  * Scale shape: fitting = one tokenize+bucket-histogram pass per side
  * (map-side partial agg, output ≤ `buckets` rows, eagerly checkpointed
  * so totals and the weight join never re-tokenize); scoring = one corpus
  * pass joining the BROADCAST (buckets-row) weight table, then a per-doc
  * integer sum. Nothing corpus-sized ever shuffles twice, nothing sits in
  * the cache manager afterwards.
  */
object Dsir {

  /** (id, bucket) rows: one per unigram and bigram instance. Bigrams use
    * the native word-shingle kernel, guarded so sub-2-token docs emit
    * none (the kernel's len<n whole-text fallback would duplicate the
    * unigram). */
  private def ngramBuckets(df: DataFrame, idCol: String, textCol: String,
                           buckets: Int): DataFrame = {
    val toks = col("__t")
    val bigrams = when(size(toks) >= 2, SimilarityExpressions.wordShingles(toks, 2))
      .otherwise(array().cast("array<string>"))
    // scatter below the tokenizer (r14, guide §2.3): a single-file corpus
    // otherwise tokenizes+explodes as ONE task (measured 1.1 s serial in
    // q153's fit pass). Keyless — the fitting path calls this with a
    // CONSTANT id, which a keyed scatter would collapse to one partition.
    // Bucket histograms and per-doc sums are partitioning-invariant.
    graft.dedup.Dedup.ensureParallelism(df)
      .select(col(idCol).as("__id"), T.tokens(col(textCol)).as("__t"))
      .select(col("__id"), explode(concat(toks, bigrams)).as("__g"))
      .select(col("__id"),
        pmod(Curate.portableHash60(col("__g")), lit(buckets.toLong)).as("bucket"))
  }

  /** Fit the quantized bucket-weight table: (bucket BIGINT,
    * lw_micro BIGINT), one row per bucket (a full spine — unseen buckets
    * carry the pure-smoothing weight). */
  def fitWeights(target: DataFrame, raw: DataFrame, textCol: String,
                 buckets: Int = 4096): DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    val spark = target.sparkSession
    // bucket histograms are <= `buckets` rows: checkpoint eagerly so the
    // totals aggregate and the spine join don't each re-tokenize a corpus
    val ht = withIdLess(target, textCol, buckets)
      .groupBy("bucket").agg(count(lit(1)).as("__ct")).localCheckpoint(true).transform(graft.plan.Checkpoints.track)
    val hr = withIdLess(raw, textCol, buckets)
      .groupBy("bucket").agg(count(lit(1)).as("__cr")).localCheckpoint(true).transform(graft.plan.Checkpoints.track)
    // coalesce: sum over an EMPTY histogram is null (a token-free corpus
    // must yield the pure-smoothing weights, not an NPE)
    val nT = ht.agg(coalesce(sum("__ct"), lit(0L))).collect()(0).getLong(0)
    val nR = hr.agg(coalesce(sum("__cr"), lit(0L))).collect()(0).getLong(0)
    val half = buckets / 2.0
    val spine = spark.range(buckets).select(col("id").as("bucket"))
    spine.join(ht, Seq("bucket"), "left").join(hr, Seq("bucket"), "left")
      .select(col("bucket"),
        floor((log((coalesce(col("__ct"), lit(0L)) + lit(0.5)) / lit(nT + half)) -
               log((coalesce(col("__cr"), lit(0L)) + lit(0.5)) / lit(nR + half)))
          * lit(1000000.0) + lit(0.5)).cast("long").as("lw_micro"))
  }

  // histogram fitting needs no id — a constant key keeps the explode lean
  private def withIdLess(df: DataFrame, textCol: String, buckets: Int): DataFrame =
    ngramBuckets(df.select(lit(0L).as("__one"), col(textCol)), "__one", textCol, buckets)
      .select("bucket")

  /** Per-document importance: (idCol, imp_micro BIGINT). Exact integer
    * sum of the broadcast bucket weights; documents with no n-grams score
    * 0 (explicit left join — they must not vanish). The bucket count is
    * DERIVED from the weights frame (a full spine by [[fitWeights]]
    * construction, one row per bucket) — a separate parameter could
    * silently disagree with the fitted bucketing and score every document
    * against the wrong weights. The one count() job is spine-sized. */
  def scoreDocs(df: DataFrame, idCol: String, textCol: String,
                weights: DataFrame): DataFrame = {
    val buckets = weights.count().toInt
    require(buckets >= 2, "weights must be a full fitWeights spine")
    val sums = ngramBuckets(df, idCol, textCol, buckets)
      .join(broadcast(weights), Seq("bucket"))
      .groupBy("__id").agg(sum("lw_micro").as("imp_micro"))
    df.select(col(idCol)).join(
        sums.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("imp_micro"), lit(0L)).as("imp_micro"))
  }

  /** Deterministic selection: top-k by (importance desc, id) —
    * TakeOrdered, no global sort; integer scores make the rank boundary
    * exact with id as the total-order tie-break. */
  def selectTopK(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored.orderBy(col("imp_micro").desc, col(idCol)).limit(k)
}
