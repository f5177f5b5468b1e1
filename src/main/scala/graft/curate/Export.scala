package graft.curate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Last-mile training-data export: sharded JSONL, the lingua franca of
  * tokenizer/training pipelines.
  *
  * Shard assignment is CONTENT-ADDRESSED — the engine-portable md5 bucket
  * of the record id ([[Curate.hashBucket]]), not whatever partitioning the
  * upstream plan happened to have — so a re-run over the same rows lands
  * every record in the same shard file regardless of cluster size, AQE
  * decisions, or input splits. That is what makes incremental re-exports
  * diffable and downstream dataloader order reproducible.
  */
object Export {

  /** Write `df` as `numShards` JSONL shards (`__shard=N/part-*.json`, ONE
    * file per shard: the single repartition below hash-clusters each
    * shard's rows into one task) plus a `<path>_manifest` JSON of per-shard
    * row counts. Returns the manifest frame `(shard, n_rows)`. */
  def writeJsonlShards(df: DataFrame, idCol: String, path: String,
                       numShards: Int): DataFrame = {
    require(numShards >= 1, "numShards must be >= 1")
    val sharded = df.withColumn("__shard",
      Curate.hashBucket(col(idCol), numShards).cast("int"))
    sharded
      .repartition(numShards, col("__shard"))
      .write.partitionBy("__shard").mode("overwrite").json(path)
    val manifest = sharded
      .groupBy(col("__shard").as("shard")).agg(count(lit(1)).as("n_rows"))
    manifest.coalesce(1).write.mode("overwrite").json(s"${path}_manifest")
    manifest
  }
}
