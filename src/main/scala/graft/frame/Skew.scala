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

  /** Heavy-key diagnosis at corpus scale, feeding [[saltedJoin]]'s salt
    * choice: a Misra-Gries sketch proposes candidates WITHOUT shuffling
    * the key stream (mergeable k-counter partials — [[keyHistogram]]'s
    * full groupBy shuffles every key), an exact count verifies ONLY the
    * candidates, and each of the top keys gets
    * `salt = ceil(share × parts)` clamped to [1, maxSalt] — the factor by
    * which the key overflows one average shuffle partition, which is
    * precisely how many sub-keys spread it back to average.
    *
    * The sketch only guarantees surfacing keys with share > 1/(k+1), and a
    * key needs salting whenever share > 1/parts — so the EFFECTIVE counter
    * budget is raised to `max(k, parts − 1)`; with fewer counters a key
    * needing salt 2-3 could be evicted and silently missed. NULL keys are
    * excluded by construction (MG skips them, the verify join can't match
    * them) — semantically right for salting, whose target is an EQUI-join
    * shuffle that drops null keys anyway; count nulls separately if they
    * matter. Total row count rides the same single-pass aggregation as the
    * sketch. Returns `(key, n, share, salt)` for the top `topN`. */
  def analyze(df: DataFrame, key: String, parts: Int,
              k: Int = 64, topN: Int = 10, maxSalt: Int = 32): DataFrame = {
    import graft.functions.expressions.MisraGriesAgg.misraGries
    require(parts >= 1 && maxSalt >= 1, "parts and maxSalt must be >= 1")
    val kEff = math.max(k, parts - 1)
    val keyed = df.select(col(key).cast("string").as("__k"))
    // ONE corpus pass for sketch + total (not a dedicated count() job)
    val row = keyed
      .agg(count(lit(1)).as("__n"), misraGries(col("__k"), kEff).as("mg"))
      .collect()(0)
    val total = row.getLong(0)
    val spark = df.sparkSession
    import spark.implicits._
    val cands = row.getSeq[org.apache.spark.sql.Row](1)
      .map(_.getString(0)).toDF("__k")
    keyed.join(broadcast(cands), Seq("__k"), "left_semi")
      .groupBy(col("__k")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("__k").asc).limit(topN) // TakeOrdered
      .select(col("__k").as("key"), col("n"),
        round(col("n") / lit(total.toDouble), 4).as("share"),
        least(greatest(ceil(col("n") * lit(parts) / lit(total.toDouble)), lit(1L)),
          lit(maxSalt.toLong)).cast("int").as("salt"))
  }
}
