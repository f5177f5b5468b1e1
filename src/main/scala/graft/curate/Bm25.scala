package graft.curate

import org.apache.spark.sql.DataFrame
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
  * Scale shape: the corpus tokenizes ONCE into a (doc, term, tf) postings
  * frame (one corpus-sized shuffle); document-frequency joins postings on
  * the SAME term partitioning (co-partitioned, no extra exchange class);
  * the query term set rides a BROADCAST onto the postings (queries are
  * seed-sized — the corpus never shuffles for them), and the per-(query,
  * doc) sum is one candidate-sized aggregation. Top-k per query runs on
  * the heap plan node ([[graft.plan.TopKPerGroup]]) — shuffle bounded at
  * partitions × queries × k, no per-query sort of the candidate set.
  */
object Bm25 {

  /** Raw BM25 scores for every (query, doc) pair sharing at least one
    * term: (qid, doc_id, score) — unrounded doubles. Docs with no tokens
    * are excluded from the corpus statistics (they can match nothing).
    *
    * The postings frame is the inverted index and has two consumers (the
    * df aggregation and the scoring join), so it persists — the corpus
    * tokenizes ONCE, not per branch (the q92 review lesson). The corpus
    * stats (N, avgdl) are a bounded 1-row collect that doubles as the
    * cache materialization; at 100 TB the persisted frame is exactly what
    * you'd write as a stored index table instead.
    *
    * CACHE CONTRACT: the postings cache must outlive the (lazy) returned
    * frame, so this method cannot unpersist it — after materializing the
    * result, long-lived sessions should `spark.catalog.clearCache()` (or
    * persist the postings as a stored index table and score against that)
    * or repeated calls will accumulate cached postings until memory/disk
    * pressure. Verify/Bench already clear the cache per query. */
  def scores(docs: DataFrame, docId: String, docText: String,
             queries: DataFrame, queryId: String, queryText: String,
             k1: Double = 1.2, b: Double = 0.75): DataFrame = {
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
    // the slim cached index (doc_id is unique per (doc_id, dl) pair)
    val statsRow = tfs.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).cast("double"), avg(col("dl"))).collect()(0)
    if (statsRow.isNullAt(1)) { // empty/all-blank corpus: avg(dl) is NULL
      tfs.unpersist()
      return docs.sparkSession.emptyDataFrame
        .select(lit(null).cast(queries.schema(queryId).dataType).as("qid"),
          lit(null).cast(docs.schema(docId).dataType).as("doc_id"),
          lit(null).cast("double").as("score"))
    }
    val (n, avgdl) = (statsRow.getDouble(0), statsRow.getDouble(1))
    val dfs = tfs.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val qterms = queries
      .select(col(queryId).as("qid"),
        explode(array_distinct(T.tokens(col(queryText)))).as("term"))
    val idf = log(lit(1.0) + (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val termScore = idf * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    tfs
      .join(dfs, Seq("term")) // same term partitioning as the tf groupBy
      .join(broadcast(qterms), Seq("term"))
      .select(col("qid"), col("doc_id"), termScore.as("__s"))
      .groupBy("qid", "doc_id")
      .agg(sum(col("__s")).as("score"))
  }

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
           scoreDecimals: Int = 4): DataFrame = {
    val sc = scores(docs, docId, docText, queries, queryId, queryText, k1, b)
      .withColumn("score", round(col("score"), scoreDecimals))
    graft.plan.TopKPerGroup(sc, Seq(col("qid")),
        Seq(col("score").desc, col("doc_id").asc), k, rankName = "rank")
      .select(col("qid"), col("rank"), col("doc_id"), col("score"))
  }
}
