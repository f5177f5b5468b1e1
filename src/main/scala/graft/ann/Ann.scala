package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{SimilarityFunctions => S}

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two tiers:
  *  - [[bruteForceTopK]] — exact: broadcast the (small) query set against the
  *    corpus; one pass, no shuffle of the corpus. The baseline and the
  *    verifier for the approximate paths.
  *  - [[lshTopK]] — random-hyperplane LSH: corpus and queries are bucketed
  *    by sign-pattern signature; ranking happens within buckets only. At
  *    100 TB this is the scale path: the corpus is hashed once (linear),
  *    the join key is the bucket id, and no corpus row is compared against
  *    more than its bucket's queries.
  */
object Ann {

  /** Sign-pattern signature of a vector against `planes` fixed hyperplanes:
    * bit p is set iff dot(vec, plane_p) > 0. Cosine-similar vectors agree on
    * most sign bits, so they land in the same bucket with high probability.
    * Plane components are fixed hash-derived constants — signatures are
    * stable across runs, which incremental indexing at scale requires.
    * Native kernel: see [[graft.functions.expressions.HyperplaneSigExpr]]. */
  def hyperplaneSignature(vec: Column, dim: Int, planes: Int, planeOffset: Int = 0): Column =
    graft.functions.expressions.SimilarityExpressions.hyperplaneSignature(vec, dim, planes, planeOffset)

  /** Exact top-k by cosine: each query row against the full corpus.
    * `queries` is expected to be small (it is broadcast); the corpus is
    * streamed — no corpus shuffle, one window partition per query. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     corpusId: String, corpusVec: String,
                     queryId: String, queryVec: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(corpusId).as("nid"), col(corpusVec).as("nvec"))
    val qs = queries.select(col(queryId).as("qid"), col(queryVec).as("qvec"))
    val joined = c.crossJoin(broadcast(qs))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), S.cosine(col("qvec"), col("nvec")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Approximate top-k: bucket corpus and queries by hyperplane signatures
    * across `numTables` independent hash tables (the standard recall knob —
    * each table is `planes` fixed hyperplanes; a corpus row is a candidate
    * if it shares any table's bucket with the query). Multi-probe: each
    * query also probes the buckets at Hamming distance 1 from its
    * signature in every table. Recall rises with numTables and falls with
    * planes; compute does the opposite — tune both to the corpus's
    * neighbor density. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              corpusId: String, corpusVec: String,
              queryId: String, queryVec: String,
              k: Int, dim: Int = 64, planes: Int = 6, numTables: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // corpus: one (table, bucket) row per hash table, signatures computed in
    // a single projection. The 100 TB shape is "hash the corpus once, store
    // the index" — the caller materializes this frame as a table for reuse;
    // the one-shot query path streams it (a persist here would only add a
    // materialization pass for a single consumer).
    val csigCols = (0 until numTables).map(t =>
      hyperplaneSignature(col("nvec"), dim, planes, planeOffset = t * planes).as(s"sig$t"))
    val csig = graft.dedup.Dedup.ensureParallelism(
        corpus.select(col(corpusId).as("nid"), col(corpusVec).as("nvec")))
      .select((col("nid") +: col("nvec") +: csigCols): _*)
      .select(col("nid"), col("nvec"), posexplode(array((0 until numTables).map(t => col(s"sig$t")): _*)).as(Seq("table", "bucket")))
    // queries: signature per table, multi-probe with all 1-bit flips.
    // Signatures land in columns first so the probe arrays XOR cheap column
    // references instead of replicating the signature expression tree.
    val qsigCols = (0 until numTables).map(t =>
      hyperplaneSignature(col(queryVec), dim, planes, planeOffset = t * planes).as(s"sig$t"))
    val qbase = queries.select((col(queryId).as("qid") +: col(queryVec).as("qvec") +: qsigCols): _*)
    val probeStructs = (0 until numTables).flatMap { t =>
      val sig = col(s"sig$t")
      (sig +: (0 until planes).map(p => sig.bitwiseXOR(lit(1L << p))))
        .map(b => struct(lit(t).as("table"), b.as("bucket")))
    }
    val qsig = qbase
      .select(col("qid"), col("qvec"), explode(array(probeStructs: _*)).as("probe"))
      .select(col("qid"), col("qvec"), col("probe.table").as("table"), col("probe.bucket").as("bucket"))
    val scored = csig.join(broadcast(qsig), Seq("table", "bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), S.cosine(col("qvec"), col("nvec")).as("cos"))
      .groupBy("qid", "nid").agg(max("cos").as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
