package graft.curate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.sources.Snapshots

/** SNAPSHOT-VERSIONED incremental BM25 index — the serving-isolation layer
  * [[Bm25.appendIncIndex]]'s scaladoc defers to ("version the index
  * directory with Snapshots when serving must be isolated from
  * maintenance"), made concrete:
  *
  * {{{
  * root/
  *   pool/bNNNNN/   immutable postings batch dirs (never rewritten)
  *   meta/          a graft.sources.Snapshots table: one row-set per version
  * }}}
  *
  * Each version's metadata is ONE published snapshot frame holding the
  * postings MANIFEST (which pool batches are in this version), the
  * vocabulary-sized df table, the scalar stats, and the tombstone set —
  * so a maintenance op is: write a new pool batch (append/compact) or
  * nothing (delete), then ONE `Snapshots.publish` whose pointer swap is
  * the atomic commit. Readers resolve a version once and keep serving it
  * while maintenance publishes away (`Snapshots.readLatest` semantics);
  * `Snapshots.pin`/`readVersion` on `root/meta` give long-readers and
  * time travel over the INDEX as a whole. Crash model: stronger than the
  * unversioned format's repair story — a crash before publish leaves only
  * an unreferenced pool/meta orphan (the committed version is untouched),
  * so there is nothing to repair, only to vacuum.
  *
  * Scale shape: identical to [[Bm25.IncIndex]] (this produces one — all
  * serving goes through `scoresAgainstIncIndex`): appends are
  * O(batch + vocabulary), deletes are tombstones + integer decrements
  * (exactly rebuild-equal on the reduced corpus), stored postings never
  * shuffle, and each version's meta costs one vocab-sized write — the
  * same cost the unversioned `swapWrite(dfs)` already paid, now buying an
  * atomic commit. The manifest-over-shared-immutable-files design is the
  * standard public table-format shape (Iceberg/Delta snapshots).
  *
  * Single-writer maintenance, like the unversioned ops. */
object Bm25Versioned {

  private def metaDir(root: String) = s"$root/meta"
  private def poolPath(root: String, batch: String) = s"$root/pool/$batch"

  /** Next batch name, aligned with the meta version Snapshots will
    * allocate (max version DIRECTORY present + 1 — matching publish's own
    * rule, so crash-orphaned attempts never collide with a committed
    * batch; a retried attempt overwrites only its own orphan). */
  private def nextBatch(spark: SparkSession, root: String): String =
    f"b${Snapshots.versions(spark, metaDir(root)).lastOption.getOrElse(0) + 1}%05d"

  /** Build the single meta frame for one version and publish it. */
  private def publishMeta(spark: SparkSession, root: String,
                          batches: Seq[String], dfs: DataFrame,
                          nDocs: Double, totalDl: Double,
                          tombstones: Option[DataFrame],
                          idType: DataType): Int = {
    import spark.implicits._
    val nullId = lit(null).cast(idType).as("doc_id")
    val batchRows = batches.toDF("key").select(lit("batch").as("kind"),
      col("key"), lit(null).cast("double").as("num"), nullId)
    val dfRows = dfs.select(lit("df").as("kind"), col("term").as("key"),
      col("df").cast("double").as("num"), nullId)
    val nTs = tombstones.fold(0.0)(_ => -1.0) // -1 marks "count from rows"
    val statRows = Seq(("n_docs", nDocs), ("total_dl", totalDl),
        ("has_tombstones", nTs))
      .toDF("key", "num").select(lit("stat").as("kind"), col("key"),
        col("num"), nullId)
    val tsRows = tombstones.map(_.select(lit("tombstone").as("kind"),
      lit(null).cast("string").as("key"), lit(null).cast("double").as("num"),
      col("doc_id")))
    val meta = tsRows.foldLeft(batchRows.unionByName(dfRows).unionByName(statRows))(
      _.unionByName(_))
    Snapshots.publish(spark, metaDir(root), meta)
  }

  /** Create version 1 from an initial corpus. The batch dir is written
    * even for an empty corpus so every version's manifest is non-empty
    * (the postings schema always loads). */
  def init(spark: SparkSession, root: String, docs: DataFrame,
           docId: String, docText: String): Int = {
    require(Snapshots.versions(spark, metaDir(root)).isEmpty,
      s"versioned index already exists under $root — use append/delete")
    val idx = Bm25.buildIncIndex(docs, docId, docText)
    val batch = nextBatch(spark, root)
    idx.postings.write.mode("overwrite").parquet(poolPath(root, batch))
    publishMeta(spark, root, Seq(batch), idx.dfs, idx.nDocs, idx.totalDl,
      None, idx.postings.schema("doc_id").dataType)
  }

  /** Load a version (default: the committed latest) as a servable
    * [[Bm25.IncIndex]] — postings are the manifest's pool batches read
    * together; dfs/tombstones are vocab-/takedown-sized filters of the
    * meta frame. The version is resolved HERE: the returned index keeps
    * serving it even while later versions publish. */
  def load(spark: SparkSession, root: String,
           version: Option[Int] = None): Bm25.IncIndex = {
    val meta = version.fold(Snapshots.readLatest(spark, metaDir(root)))(
      v => Snapshots.readVersion(spark, metaDir(root), v))
    val batches = meta.filter(col("kind") === "batch")
      .select("key").collect().map(_.getString(0)).sorted
    val stats = meta.filter(col("kind") === "stat")
      .select("key", "num").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val postings = spark.read.parquet(
      batches.map(poolPath(root, _)).toIndexedSeq: _*)
    val dfs = meta.filter(col("kind") === "df")
      .select(col("key").as("term"), col("num").as("df"))
    val ts = if (stats("has_tombstones") == 0.0) None
      else Some(meta.filter(col("kind") === "tombstone").select("doc_id"))
    Bm25.IncIndex(postings, dfs, stats("n_docs"), stats("total_dl"), ts)
  }

  /** Append a document batch as a new version — one new pool batch dir +
    * one meta publish; the committed version is untouched until the
    * pointer swap. Returns the new version (or the current one for an
    * all-blank no-op batch). `rejectDuplicateIds` as in
    * [[Bm25.appendIncIndex]] (tombstoned ids count as present — revival
    * requires a compact first). */
  def append(spark: SparkSession, root: String, newDocs: DataFrame,
             docId: String, docText: String,
             rejectDuplicateIds: Boolean = false): Int = {
    val delta = Bm25.buildIncIndex(newDocs, docId, docText)
    val cur = load(spark, root)
    if (delta.nDocs == 0.0)
      return Snapshots.latestVersion(spark, metaDir(root)).get
    if (rejectDuplicateIds) {
      val dup = cur.postings
        .join(broadcast(delta.postings.select("doc_id").distinct()),
          Seq("doc_id"), "left_semi")
        .select("doc_id").limit(1).collect()
      require(dup.isEmpty, s"versioned append: batch re-adds doc id " +
        s"${dup.head.get(0)} already present under $root — a re-add " +
        "double-counts df/tf (compact + delete first, or fix the batch)")
    }
    val batch = nextBatch(spark, root)
    delta.postings.write.mode("overwrite").parquet(poolPath(root, batch))
    val mergedDfs = cur.dfs.unionByName(delta.dfs)
      .groupBy("term").agg(sum(col("df")).as("df"))
    publishMeta(spark, root, manifestOf(spark, root) :+ batch, mergedDfs,
      cur.nDocs + delta.nDocs, cur.totalDl + delta.totalDl, cur.tombstones,
      delta.postings.schema("doc_id").dataType)
  }

  /** Remove documents as a new version — NO pool write at all: the new
    * meta carries the grown tombstone set and the integer-decremented
    * df/stats (serving is exactly rebuild-equal on the reduced corpus,
    * the q159/q162 contract). Already-tombstoned and absent ids are
    * no-ops. Returns the new version (or the current one if nothing was
    * present to remove). */
  def delete(spark: SparkSession, root: String, ids: DataFrame,
             idCol: String): Int = {
    val cur = load(spark, root)
    val req = cur.tombstones.foldLeft(
      ids.select(col(idCol).as("doc_id")).distinct())(
      (r, ts) => r.join(ts, Seq("doc_id"), "left_anti"))
    val removed = cur.postings.join(broadcast(req), Seq("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val st = removed.select(col("doc_id"), col("dl")).distinct()
        .agg(count(lit(1)).cast("double"), sum(col("dl"))).collect()(0)
      if (st.isNullAt(1))
        return Snapshots.latestVersion(spark, metaDir(root)).get
      val dec = removed.groupBy("term")
        .agg(count(lit(1)).cast("double").as("__dec"))
      val newDfs = cur.dfs.join(dec, Seq("term"), "left")
        .select(col("term"),
          (col("df") - coalesce(col("__dec"), lit(0.0))).as("df"))
        .filter(col("df") > 0)
      val newTs = removed.select("doc_id").distinct()
      publishMeta(spark, root, manifestOf(spark, root),
        newDfs, cur.nDocs - st.getDouble(0), cur.totalDl - st.getDouble(1),
        Some(cur.tombstones.fold(newTs)(_.unionByName(newTs))),
        cur.postings.schema("doc_id").dataType)
    } finally removed.unpersist()
  }

  /** Fold the current version into ONE fresh pool batch with tombstones
    * applied — the deliberate rewrite, as a new version: older versions
    * (and pinned readers) keep resolving the old batches until
    * [[vacuum]]. Returns the new version (or the current one when there
    * is nothing to fold). */
  def compact(spark: SparkSession, root: String): Int = {
    val cur = load(spark, root)
    val manifest = manifestOf(spark, root)
    if (cur.tombstones.isEmpty && manifest.size == 1)
      return Snapshots.latestVersion(spark, metaDir(root)).get
    val live = cur.tombstones.foldLeft(cur.postings)(
      (p, ts) => p.join(ts, Seq("doc_id"), "left_anti"))
    val batch = nextBatch(spark, root)
    live.write.mode("overwrite").parquet(poolPath(root, batch))
    publishMeta(spark, root, Seq(batch), cur.dfs, cur.nDocs, cur.totalDl,
      None, cur.postings.schema("doc_id").dataType)
  }

  /** Drop meta versions past the newest `keepLast` (never the committed
    * or a pinned one — Snapshots' rules), then delete pool batches no
    * REMAINING version references. Returns (versions dropped, batches
    * dropped). */
  def vacuum(spark: SparkSession, root: String,
             keepLast: Int): (Seq[Int], Seq[String]) = {
    val droppedVersions = Snapshots.vacuum(spark, metaDir(root), keepLast)
    val referenced = Snapshots.versions(spark, metaDir(root)).flatMap { v =>
      Snapshots.readVersion(spark, metaDir(root), v)
        .filter(col("kind") === "batch")
        .select("key").collect().map(_.getString(0))
    }.toSet
    val poolDir = new org.apache.hadoop.fs.Path(s"$root/pool")
    val fs = poolDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphans =
      if (!fs.exists(poolDir)) Seq.empty[String]
      else fs.listStatus(poolDir).toSeq.map(_.getPath.getName)
        .filterNot(referenced)
    orphans.foreach(b =>
      fs.delete(new org.apache.hadoop.fs.Path(poolPath(root, b)), true))
    (droppedVersions, orphans)
  }

  /** The committed version's manifest (pool batch names, sorted). */
  private def manifestOf(spark: SparkSession, root: String): Seq[String] =
    Snapshots.readLatest(spark, metaDir(root))
      .filter(col("kind") === "batch")
      .select("key").collect().map(_.getString(0)).sorted.toSeq
}
