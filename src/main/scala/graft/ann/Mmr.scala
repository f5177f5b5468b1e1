package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{SimilarityFunctions => S}

/** Maximal Marginal Relevance — the diversity-aware re-ranking step of a
  * retrieval pipeline: instead of the k most query-similar documents
  * (which are typically near-duplicates of each other), greedily pick
  * argmax of λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s), trading
  * relevance against redundancy.
  *
  * Determinism device: every cosine quantizes to the 4-decimal grid
  * (`⌊cos·1e4 + 0.5⌋` — margins probed ≫ cross-engine float noise, the
  * q96/q116 discipline) and λ enters as a rational (num/den), so the
  * greedy objective `num·rel4 − (den−num)·maxsim4` is a BIGINT and ties
  * break on id — the whole selection is integer-deterministic and a SQL
  * engine replays it as k unrolled argmax steps.
  *
  * Scale shape (the standard serving decomposition): relevance scoring
  * is one distributed corpus pass (codegen'd cosine kernel); the
  * candidate pool comes off the heap top-k plan node (shuffle carries
  * partitions×`candidates` rows, never the corpus); only the
  * `candidates`-sized pool — bounded by construction — reaches the
  * driver for the inherently sequential greedy, whose cost is
  * O(candidates·k) tiny-vector cosines. At 100 TB the corpus pass would
  * come from a stored index ([[Ivf.topKAgainstIndex]]) instead; the
  * greedy stage is unchanged.
  */
object Mmr {

  /** Top `k` diverse rows: (rank, <idCol>, rel4). `idCol` must be a
    * non-null bigint id (the tie-break); `candidates` bounds the pool
    * (and the driver collect) and must be ≥ k. */
  def diverseTopK(corpus: DataFrame, idCol: String, vecCol: String,
                  queryVec: Array[Double], candidates: Int, k: Int,
                  lambdaNum: Long = 7L, lambdaDen: Long = 10L): DataFrame = {
    require(k >= 1 && candidates >= k, s"need candidates >= k >= 1, got $candidates/$k")
    require(lambdaDen > 0 && lambdaNum >= 0 && lambdaNum <= lambdaDen,
      s"lambda must be a rational in [0,1], got $lambdaNum/$lambdaDen")
    val spark = corpus.sparkSession
    val qlit = array(queryVec.map(lit(_)): _*)
    val rel4 = floor(S.cosine(col(vecCol), qlit) * lit(10000.0) + lit(0.5)).cast("long")
    val cand = graft.plan.TopKPerGroup(
      graft.dedup.Dedup.ensureParallelism(corpus)
        .select(col(idCol), col(vecCol), rel4.as("rel4")),
      Seq(lit(1)), Seq(col("rel4").desc, col(idCol).asc), candidates, "__rk")
      .drop("__rk")
    // bounded collect: exactly `candidates` rows by construction
    val pool = cand.collect().map { r =>
      val vec: Array[Double] = r.get(1) match {
        case s: scala.collection.Seq[_] => s.map {
          case f: java.lang.Float  => f.toDouble
          case d: java.lang.Double => d.doubleValue()
        }.toArray
        case other => sys.error(s"unexpected vector representation: ${other.getClass}")
      }
      (r.getLong(0), r.getLong(2), vec)
    }
    // the same left-to-right dot/norm loop the codegen'd kernel (and
    // DuckDB's list_cosine_similarity) computes — quantized identically
    def sim4(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val denom = math.sqrt(na) * math.sqrt(nb)
      math.floor((if (denom == 0.0) 0.0 else dot / denom) * 10000.0 + 0.5).toLong
    }
    val remaining = scala.collection.mutable.ArrayBuffer.from(pool)
    val picked = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val pickedVecs = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    while (picked.size < k && remaining.nonEmpty) {
      val best = remaining.minBy { case (id, rel, vec) =>
        val obj =
          if (pickedVecs.isEmpty) lambdaNum * rel
          else lambdaNum * rel - (lambdaDen - lambdaNum) * pickedVecs.map(sim4(vec, _)).max
        (-obj, id) // max objective, ties to the smaller id
      }
      picked += ((best._1, best._2))
      pickedVecs += best._3
      remaining -= best
    }
    import spark.implicits._
    picked.zipWithIndex
      .map { case ((id, rel), i) => (i + 1, id, rel) }.toSeq
      .toDF("rank", idCol, "rel4")
  }
}
