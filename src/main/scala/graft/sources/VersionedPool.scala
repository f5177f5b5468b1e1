package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Shared core of the snapshot-versioned index formats
  * ([[graft.curate.Bm25Versioned]] and [[graft.ann.IvfVersioned]] —
  * extracted r10, VERDICT r9 #8, so the next index tier gets versioning
  * for free):
  *
  * {{{
  * root/
  *   pool/bNNNNN/   immutable batch dirs (never rewritten)
  *   meta/          a Snapshots table: one row-set per version
  * }}}
  *
  * Each version's metadata is ONE published frame of
  * (kind, key, num, <id>) rows: the pool MANIFEST (`kind='batch'`),
  * scalar stats (`kind='stat'`, always including `has_tombstones`), the
  * optional tombstone id set (`kind='tombstone'`, id column named by the
  * owning tier — doc_id / nid), plus any index-specific rows the tier
  * passes through (`extra`, e.g. BM25's vocabulary dfs). A maintenance
  * op writes zero or one new pool batch, then commits with ONE
  * `Snapshots.publish` pointer swap; readers resolve a version once and
  * keep serving it while maintenance publishes away; `Snapshots.pin` /
  * `readVersion` on `root/meta` give long-readers and time travel.
  * Crash model: a crash before publish leaves only an unreferenced
  * pool/meta orphan — nothing to repair, only to [[vacuum]]. The
  * manifest-over-shared-immutable-files shape of public table formats
  * (Iceberg/Delta snapshots). Single-writer maintenance. */
object VersionedPool {

  def metaDir(root: String): String = s"$root/meta"
  def poolPath(root: String, batch: String): String = s"$root/pool/$batch"

  /** Next batch name, aligned with the meta version Snapshots will
    * allocate (max version DIRECTORY present + 1 — matching publish's own
    * rule, so crash-orphaned attempts never collide with a committed
    * batch; a retried attempt overwrites only its own orphan). */
  def nextBatch(spark: SparkSession, root: String): String =
    f"b${Snapshots.versions(spark, metaDir(root)).lastOption.getOrElse(0) + 1}%05d"

  /** Refuse to init over an existing versioned root. */
  def requireFresh(spark: SparkSession, root: String): Unit =
    require(Snapshots.versions(spark, metaDir(root)).isEmpty,
      s"versioned index already exists under $root — use append/delete")

  /** The committed version number (throws if none committed yet). */
  def currentVersion(spark: SparkSession, root: String): Int =
    Snapshots.latestVersion(spark, metaDir(root)).get

  /** Build one version's meta frame and publish it: manifest + stats
    * (has_tombstones derived here) + tombstones + the tier's extra
    * (kind, key, num) rows. Returns the committed version. */
  def publishMeta(spark: SparkSession, root: String, batches: Seq[String],
                  stats: Seq[(String, Double)], tombstones: Option[DataFrame],
                  idCol: String, idType: DataType,
                  extra: Option[DataFrame] = None): Int = {
    import spark.implicits._
    val nullId = lit(null).cast(idType).as(idCol)
    val batchRows = batches.toDF("key").select(lit("batch").as("kind"),
      col("key"), lit(null).cast("double").as("num"), nullId)
    val statRows = (stats :+ ("has_tombstones", tombstones.fold(0.0)(_ => 1.0)))
      .toDF("key", "num").select(lit("stat").as("kind"), col("key"),
        col("num"), nullId)
    val extraRows = extra.map(_.select(col("kind"), col("key"), col("num"), nullId))
    val tsRows = tombstones.map(_.select(lit("tombstone").as("kind"),
      lit(null).cast("string").as("key"), lit(null).cast("double").as("num"),
      col(idCol)))
    val meta = (extraRows.toSeq ++ tsRows.toSeq)
      .foldLeft(batchRows.unionByName(statRows))(_.unionByName(_))
    // ONE manifest file per version (the Iceberg/Delta shape): the local
    // batch/stat relations otherwise parallelize to defaultParallelism
    // slices and the union writes ~35 near-empty files per publish
    // (measured) — every subsequent meta read then pays the full listing
    // + footer + per-file task cost. Meta is metadata-bounded by contract
    // (manifest + stats + vocab/tombstone rows), so a single file stays
    // small at any corpus scale.
    Snapshots.publish(spark, metaDir(root), meta.coalesce(1))
  }

  /** One resolved version: manifest, stats, the raw meta frame (for the
    * tier's extra kinds), the tombstone id frame if any, and the pool —
    * the manifest's batches read together. All frames keep serving this
    * version while later versions publish. */
  case class Resolved(batches: Seq[String], stats: Map[String, Double],
                      meta: DataFrame, tombstones: Option[DataFrame],
                      pool: DataFrame)

  def load(spark: SparkSession, root: String, idCol: String,
           version: Option[Int] = None): Resolved = {
    val meta = version.fold(Snapshots.readLatest(spark, metaDir(root)))(
      v => Snapshots.readVersion(spark, metaDir(root), v))
    // batches + stats in ONE collect (both metadata-bounded kinds; the
    // tombstone/extra kinds can be big and stay distributed)
    val bs = meta.filter(col("kind") === "batch" || col("kind") === "stat")
      .select("kind", "key", "num").collect()
    val batches = bs.filter(_.getString(0) == "batch")
      .map(_.getString(1)).sorted.toSeq
    val stats = bs.filter(_.getString(0) == "stat")
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    val ts = if (stats.getOrElse("has_tombstones", 0.0) == 0.0) None
      else Some(meta.filter(col("kind") === "tombstone").select(idCol))
    val pool = spark.read.parquet(batches.map(poolPath(root, _)).toIndexedSeq: _*)
    Resolved(batches, stats, meta, ts, pool)
  }

  /** The committed version's manifest (pool batch names, sorted). */
  def manifestOf(spark: SparkSession, root: String): Seq[String] =
    Snapshots.readLatest(spark, metaDir(root))
      .filter(col("kind") === "batch")
      .select("key").collect().map(_.getString(0)).sorted.toSeq

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
}
