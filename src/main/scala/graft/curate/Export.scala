package graft.curate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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

  /** Write `df` as JSONL shards (`__shard=N/part-*.json`, one file per
    * NON-EMPTY shard: the single repartition below hash-clusters each
    * shard's rows into one task) plus a `<path>_manifest` JSON enumerating
    * EVERY shard id 0..numShards−1 with its row count — zero rows
    * included, so dataloaders iterate the manifest, never a directory
    * listing that silently misses empty shards. Rows with a NULL id are
    * rejected up front (they would otherwise land in a Hive default
    * partition outside the shard space). The upstream plan is evaluated
    * ONCE (persisted across the null-check, the write and the manifest).
    * Returns the manifest `(shard, n_rows)`, pinned so later use doesn't
    * recompute the pipeline. */
  def writeJsonlShards(df: DataFrame, idCol: String, path: String,
                       numShards: Int): DataFrame = {
    require(numShards >= 1, "numShards must be >= 1")
    val sharded = df.withColumn("__shard",
        Curate.hashBucket(col(idCol), numShards).cast("int"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nullIds = sharded.filter(col("__shard").isNull).count()
      require(nullIds == 0L,
        s"$nullIds rows carry a NULL $idCol — refusing to export them into a default partition")
      sharded
        .repartition(numShards, col("__shard"))
        .write.partitionBy("__shard").mode("overwrite").json(path)
      val spark = df.sparkSession
      val spine = spark.range(0, numShards).select(col("id").cast("int").as("shard"))
      val manifest = spine
        .join(sharded.groupBy(col("__shard").as("shard")).agg(count(lit(1)).as("n_rows")),
          Seq("shard"), "left")
        .select(col("shard"), coalesce(col("n_rows"), lit(0L)).as("n_rows"))
      manifest.coalesce(1).write.mode("overwrite").json(s"${path}_manifest")
      manifest.localCheckpoint(true)
        .transform(graft.plan.Checkpoints.track)
    } finally {
      sharded.unpersist(blocking = false)
    }
  }
}
