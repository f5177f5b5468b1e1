package graft.curate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** BM25 retrieval over an inverted-index join — the mining/retrieval
  * primitive of a training-data pipeline (mine a corpus for documents
  * relevant to seed queries; score near-duplicate candidates lexically;
  * build hard negatives for retrieval training).
  *
  * Okapi BM25: score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) /
  * (tf + k1·(1 − b + b·dl/avgdl)), idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
  *
  * Scale shape: the corpus tokenizes ONCE into a (term, doc_id, dl, tf,
  * df) postings index (one corpus-sized shuffle; document frequency is
  * folded into the postings at build time on the SAME term partitioning,
  * so query-time scoring never re-aggregates it); the query term set
  * rides a BROADCAST onto the postings (queries are seed-sized — the
  * corpus never shuffles for them), and the per-(query, doc) sum is one
  * candidate-sized aggregation. Top-k per query runs on the heap plan
  * node ([[graft.plan.TopKPerGroup]]) — shuffle bounded at partitions ×
  * queries × k, no per-query sort of the candidate set.
  *
  * Lifecycle: [[buildIndex]] materializes the index eagerly (via
  * localCheckpoint — block-manager blocks released by GC when the index
  * goes unreferenced, never an entry in the cache manager), so nothing a
  * one-shot [[scores]]/[[topK]] call caches outlives the call. For the
  * at-scale reuse path, [[saveIndex]]/[[loadIndex]] persist the index as
  * a table: build once, score every later query batch against storage
  * without rescanning or re-tokenizing the corpus.
  */
object Bm25 {

  /** A built inverted index: `postings` is (term, doc_id, dl, tf, df) —
    * document frequency pre-joined — plus the corpus stats the score
    * formula needs. `nDocs`/`avgdl` count only docs with ≥1 token (blank
    * docs can match nothing and must not dilute avgdl). */
  final case class Index(postings: DataFrame, nDocs: Double, avgdl: Double)

  /** Tokenize the corpus once and materialize the enriched postings.
    * The raw (doc, term, tf) frame has two consumers (the df aggregation
    * and the df join), so it persists for the build and unpersists before
    * returning; the returned postings are an EAGER localCheckpoint —
    * scoring reads materialized blocks, and no cache entry survives. An
    * empty/all-blank corpus yields an empty index (nDocs = 0), which
    * scores to an empty result downstream. */
  def buildIndex(docs: DataFrame, docId: String, docText: String): Index = {
    val corpus = docs
      .select(col(docId).as("doc_id"), T.tokens(col(docText)).as("__toks"))
      .filter(size(col("__toks")) > 0)
    val tfs = corpus
      .select(col("doc_id"), size(col("__toks")).cast("double").as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 1-row bounded collect: corpus doc count + mean length, computed from
    // the slim cached index (doc_id is unique per (doc_id, dl) pair);
    // doubles as the cache materialization
    val statsRow = tfs.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).cast("double"), avg(col("dl"))).collect()(0)
    if (statsRow.isNullAt(1)) { // empty/all-blank corpus: avg(dl) is NULL
      val empty = tfs.limit(0).withColumn("df", lit(0.0)).localCheckpoint(true)
      tfs.unpersist()
      Index(empty, 0.0, 1.0) // avgdl unused at nDocs = 0; 1.0 avoids 0/0
    } else {
      val dfs = tfs.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
      // same term partitioning as the tf groupBy — co-partitioned join
      val enriched = tfs.join(dfs, Seq("term")).localCheckpoint(true)
      tfs.unpersist()
      Index(enriched, statsRow.getDouble(0), statsRow.getDouble(1))
    }
  }

  /** Persist an index: postings as a parquet table, stats as a 1-row
    * sidecar. Doubles round-trip parquet exactly, so a loaded index
    * scores bit-identically to the in-memory one. */
  def saveIndex(index: Index, path: String): Unit = {
    index.postings.write.mode("overwrite").parquet(s"$path/postings")
    val spark = index.postings.sparkSession
    import spark.implicits._
    Seq((index.nDocs, index.avgdl)).toDF("n_docs", "avgdl")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Load an index persisted by [[saveIndex]]. The postings frame is a
    * plain storage-backed scan — nothing cached, serving-safe in a loop. */
  def loadIndex(spark: SparkSession, path: String): Index = {
    val st = spark.read.parquet(s"$path/stats")
      .select(col("n_docs").cast("double"), col("avgdl").cast("double"))
      .collect()(0)
    Index(spark.read.parquet(s"$path/postings"), st.getDouble(0), st.getDouble(1))
  }

  /** Raw BM25 scores against a built/loaded index for every (query, doc)
    * pair sharing at least one term: (qid, doc_id, score) — unrounded
    * doubles. The corpus side is never shuffled: query terms broadcast
    * onto the postings and only matching rows enter the aggregation. */
  def scoresAgainstIndex(index: Index, queries: DataFrame,
                         queryId: String, queryText: String,
                         k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qterms = queries
      .select(col(queryId).as("qid"),
        explode(array_distinct(T.tokens(col(queryText)))).as("term"))
    val idf = log(lit(1.0) +
      (lit(index.nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val termScore = idf * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(index.avgdl)))
    index.postings
      .join(broadcast(qterms), Seq("term"))
      .select(col("qid"), col("doc_id"), termScore.as("__s"))
      .groupBy("qid", "doc_id")
      .agg(sum(col("__s")).as("score"))
  }

  /** One-shot scores: build an ephemeral index, score against it. Docs
    * with no tokens are excluded from the corpus statistics (they can
    * match nothing). Leaves nothing cached — repeated calls in a
    * long-lived session must not accumulate state (Bm25Spec pins the
    * cache manager empty after looped calls). */
  def scores(docs: DataFrame, docId: String, docText: String,
             queries: DataFrame, queryId: String, queryText: String,
             k1: Double = 1.2, b: Double = 0.75): DataFrame =
    scoresAgainstIndex(buildIndex(docs, docId, docText),
      queries, queryId, queryText, k1, b)

  /** Top `k` docs per query by BM25, with the score QUANTIZED to
    * `scoreDecimals` before ranking and ties broken by ascending doc id.
    * Quantization is the cross-engine determinism device: raw double sums
    * differ by ulps between engines/summation orders, so ranking on the
    * rounded score + id makes the result exactly reproducible (probe that
    * real scores sit far from the rounding boundary — q96 does).
    * Returns (qid, rank, doc_id, score). */
  def topK(docs: DataFrame, docId: String, docText: String,
           queries: DataFrame, queryId: String, queryText: String,
           k: Int, k1: Double = 1.2, b: Double = 0.75,
           scoreDecimals: Int = 4): DataFrame =
    topKFromScores(
      scores(docs, docId, docText, queries, queryId, queryText, k1, b),
      k, scoreDecimals)

  /** [[topK]] served from a built/loaded index — the stored-artifact
    * path: build once, save, then every query batch ranks against the
    * index table without touching corpus text. */
  def topKAgainstIndex(index: Index, queries: DataFrame,
                       queryId: String, queryText: String,
                       k: Int, k1: Double = 1.2, b: Double = 0.75,
                       scoreDecimals: Int = 4): DataFrame =
    topKFromScores(
      scoresAgainstIndex(index, queries, queryId, queryText, k1, b),
      k, scoreDecimals)

  private def topKFromScores(sc: DataFrame, k: Int, scoreDecimals: Int): DataFrame =
    graft.plan.TopKPerGroup(
        sc.withColumn("score", round(col("score"), scoreDecimals)),
        Seq(col("qid")),
        Seq(col("score").desc, col("doc_id").asc), k, rankName = "rank")
      .select(col("qid"), col("rank"), col("doc_id"), col("score"))
}
