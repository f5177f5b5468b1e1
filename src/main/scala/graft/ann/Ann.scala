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

  /** Deterministic pseudo-random hyperplanes: component c of plane p is a
    * fixed hash-derived value in [-1, 1]. Same constants every run, so
    * signatures are stable across jobs — required for incremental
    * indexing at scale. */
  private def planeComponent(p: Int, c: Int): Double = {
    var z = (p.toLong << 32 | c.toLong) * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z ^ (z >>> 31)) & 0xFFFFFFL).toDouble / 0x7FFFFFL.toDouble - 1.0
  }

  /** Sign-pattern signature of a vector against `planes` fixed hyperplanes:
    * bit p is set iff dot(vec, plane_p) > 0. Cosine-similar vectors agree on
    * most sign bits, so they land in the same bucket with high probability.
    *
    * Shaped as a single pass with flat constant arrays (component-major
    * plane matrix): a per-plane reduce over element_at builds a 512-node
    * expression tree that blows up Catalyst's optimizer time. */
  def hyperplaneSignature(vec: Column, dim: Int, planes: Int): Column = {
    // planeMatrix(c) = [planeComponent(0,c), …, planeComponent(planes-1,c)]
    val planeMatrix = array((0 until dim).map { c =>
      array((0 until planes).map(p => lit(planeComponent(p, c))): _*)
    }: _*)
    val partials = zip_with(vec, planeMatrix, (x, ps) => transform(ps, p => x.cast("double") * p))
    val dots = aggregate(partials, array_repeat(lit(0.0), planes),
      (acc, arr) => zip_with(acc, arr, _ + _))
    val masks = array((0 until planes).map(p => lit(1L << p)): _*)
    aggregate(zip_with(dots, masks, (d, m) => when(d > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Exact top-k by cosine: each query row against the full corpus.
    * `queries` is expected to be small (it is broadcast); the corpus is
    * streamed — no corpus shuffle, one window partition per query. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     corpusId: String, corpusVec: String,
                     queryId: String, queryVec: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = corpus.crossJoin(broadcast(queries))
      .filter(col(queryId) =!= col(corpusId))
      .select(col(queryId).as("qid"), col(corpusId).as("nid"),
        S.cosine(col(queryVec), col(corpusVec)).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Approximate top-k: bucket corpus and queries by hyperplane signature,
    * rank within buckets. Recall is tuned by `planes` (fewer planes ⇒
    * bigger buckets ⇒ higher recall, more compute). Multi-probe: each query
    * also probes the buckets at Hamming distance 1 from its signature. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              corpusId: String, corpusVec: String,
              queryId: String, queryVec: String,
              k: Int, dim: Int = 64, planes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val csig = corpus.select(col(corpusId).as("nid"), col(corpusVec).as("nvec"),
      hyperplaneSignature(col(corpusVec), dim, planes).as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // multi-probe: query signature plus all 1-bit flips. Signature is
    // materialized into a column first so the probe array XORs a cheap
    // column reference instead of replicating the signature tree 9×.
    val qbase = queries.select(col(queryId).as("qid"), col(queryVec).as("qvec"),
      hyperplaneSignature(col(queryVec), dim, planes).as("sig0"))
    val probes = array((col("sig0") +: (0 until planes).map(p => col("sig0").bitwiseXOR(lit(1L << p)))): _*)
    val qsig = qbase.select(col("qid"), col("qvec"), explode(probes).as("bucket"))
    val scored = csig.join(broadcast(qsig), Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), S.cosine(col("qvec"), col("nvec")).as("cos"))
      .groupBy("qid", "nid").agg(max("cos").as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
