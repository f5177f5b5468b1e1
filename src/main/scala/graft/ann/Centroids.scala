package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{SimilarityFunctions => S}
import graft.functions.expressions.VecSumLongAgg

/** Per-group embedding centroids and outlier scoring — the embedding-
  * quality diagnostic of a curation pipeline (a document whose vector
  * points away from its group's centroid is a labeling/extraction
  * suspect; per-source centroid drift flags pipeline changes).
  *
  * Determinism: centroid math runs in [[Ivf]]'s quantized integer space —
  * vectors snap to the 1e-6 grid and group sums are EXACT bigint
  * elementwise sums ([[VecSumLongAgg]]), a pure function of the group's
  * row SET. Cosine is scale-invariant, so the UNNORMALIZED sum vector
  * serves as the centroid direction — no division, no float drift, and
  * another engine can replay the whole computation bit-for-bit.
  *
  * Scale shape: one map-side-partial aggregation over the corpus
  * (dim-long buffer per group); the group-count-sized centroid frame
  * broadcasts back onto the corpus join. Corpus vectors move once.
  */
object Centroids {

  /** (id, group, centroid_cos): each row's cosine against its group's
    * quantized-exact centroid direction. Unrounded doubles — round at the
    * call site per the battery's 4-decimal discipline. */
  def groupCosines(df: DataFrame, idCol: String, vecCol: String,
                   groupCol: String, dim: Int): DataFrame = {
    val sums = df
      .groupBy(col(groupCol))
      .agg(VecSumLongAgg.vecSumLong(Ivf.quantize(col(vecCol)), dim).as("__qsum"))
      // group-sized frame: cast to double HERE, not per corpus row
      .select(col(groupCol),
        transform(col("__qsum"), c => c.cast("double")).as("__centroid"))
    df.select(col(idCol), col(groupCol), col(vecCol))
      .join(broadcast(sums), Seq(groupCol))
      .select(col(idCol), col(groupCol),
        S.cosine(col(vecCol), col("__centroid")).as("centroid_cos"))
  }
}
