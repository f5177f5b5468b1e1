package graft.frame

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew tools. AQE's runtime skew-join split covers most cases;
  * salting is the manual control for keys so hot that even split shuffle
  * partitions overwhelm one executor (the classic power-law customer at
  * 100 TB).
  */
object Skew {

  /** Salted equi-join: the skewed (big) side scatters each row into one of
    * `salt` sub-keys via a deterministic row hash; the small side is
    * replicated `salt` times. Result is exactly `big ⋈ small` on `key`,
    * with the hot key's rows spread across `salt` shuffle partitions.
    * The small side grows ×salt — keep salt modest (8–32). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salt)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Per-key frequency — the diagnostic for picking salt targets. */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n")).orderBy(desc("n")).limit(topN)
}
