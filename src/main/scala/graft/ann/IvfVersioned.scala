package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.sources.Snapshots

/** SNAPSHOT-VERSIONED IVF vector index — [[graft.curate.Bm25Versioned]]'s
  * design applied to the ANN tier:
  *
  * {{{
  * root/
  *   model/         the frozen coarse quantizer (written once at init;
  *                  re-fit = a NEW index root, by design — see
  *                  [[Ivf.assignmentDrift]] for when that is due)
  *   pool/bNNNNN/   immutable assigned-vector batch dirs (nid, nvec, cell)
  *   meta/          a graft.sources.Snapshots table: one row-set per version
  * }}}
  *
  * Each version's metadata is ONE published frame holding the pool
  * MANIFEST and the tombstone id set — a vector index has no derived
  * df/stats analog (cosine is per-pair), so maintenance is even simpler
  * than BM25's: append = one new pool batch + publish; delete = publish
  * alone (takedown-sized metadata, no data write); compact = fold into
  * one fresh batch + publish. Every op commits with ONE
  * `Snapshots.publish` pointer swap; readers resolve a version once and
  * keep serving it while maintenance publishes away, `pin`/`readVersion`
  * give long-readers and time travel. Crash model: a crash before
  * publish leaves only an unreferenced pool orphan — nothing to repair,
  * only to [[vacuum]].
  *
  * Scale shape: assignment is a pure function of (vector, frozen model),
  * so append batches are O(batch) and serving over any version is
  * IDENTICAL to a fresh full assignment of that version's live set (the
  * q160/q163 contracts, now per version — the q167 gate). Stored batches
  * never shuffle; serving joins only probed cells and anti-joins
  * tombstones on the candidate-sized frame.
  *
  * Single-writer maintenance, like the BM25 twin. */
object IvfVersioned {

  /** One resolved version: the assigned-vector frame (union of the
    * manifest's immutable batches) and its tombstones, ready for
    * [[Ivf.topKAgainstIndex]]. */
  case class VIndex(index: DataFrame, tombstones: Option[DataFrame])

  private def metaDir(root: String) = s"$root/meta"
  private def poolPath(root: String, batch: String) = s"$root/pool/$batch"
  private def modelPath(root: String) = s"$root/model"

  private def nextBatch(spark: SparkSession, root: String): String =
    f"b${Snapshots.versions(spark, metaDir(root)).lastOption.getOrElse(0) + 1}%05d"

  private def publishMeta(spark: SparkSession, root: String,
                          batches: Seq[String],
                          tombstones: Option[DataFrame],
                          idType: DataType): Int = {
    import spark.implicits._
    val nullId = lit(null).cast(idType).as("nid")
    val batchRows = batches.toDF("key").select(lit("batch").as("kind"),
      col("key"), lit(null).cast("double").as("num"), nullId)
    val statRows = Seq(("has_tombstones", tombstones.fold(0.0)(_ => 1.0)))
      .toDF("key", "num").select(lit("stat").as("kind"), col("key"),
        col("num"), nullId)
    val tsRows = tombstones.map(_.select(lit("tombstone").as("kind"),
      lit(null).cast("string").as("key"), lit(null).cast("double").as("num"),
      col("nid")))
    val meta = tsRows.foldLeft(batchRows.unionByName(statRows))(_.unionByName(_))
    Snapshots.publish(spark, metaDir(root), meta)
  }

  /** Create version 1: fit the model on the initial corpus, freeze it,
    * write the first pool batch from its assignment. */
  def init(spark: SparkSession, root: String, vectors: DataFrame,
           idCol: String, vecCol: String,
           numCells: Int, iterations: Int = 2): Int = {
    require(Snapshots.versions(spark, metaDir(root)).isEmpty,
      s"versioned index already exists under $root — use append/delete")
    val src = vectors.filter(col(vecCol).isNotNull)
    val model = Ivf.fit(src, idCol, vecCol, numCells, iterations)
    Ivf.save(model, spark, modelPath(root))
    val batch = nextBatch(spark, root)
    val assigned = Ivf.assign(src, vecCol, model)
      .select(col(idCol).as("nid"), col(vecCol).as("nvec"), col("cell"))
    assigned.write.mode("overwrite").parquet(poolPath(root, batch))
    publishMeta(spark, root, Seq(batch), None, assigned.schema("nid").dataType)
  }

  /** The frozen coarse quantizer. */
  def model(spark: SparkSession, root: String): Ivf.Model =
    Ivf.load(spark, modelPath(root))

  /** Resolve a version (default: committed latest). The returned frames
    * keep serving that version while later versions publish. */
  def load(spark: SparkSession, root: String,
           version: Option[Int] = None): VIndex = {
    val meta = version.fold(Snapshots.readLatest(spark, metaDir(root)))(
      v => Snapshots.readVersion(spark, metaDir(root), v))
    val batches = meta.filter(col("kind") === "batch")
      .select("key").collect().map(_.getString(0)).sorted
    val hasTs = meta.filter(col("kind") === "stat" && col("key") === "has_tombstones")
      .select("num").collect().head.getDouble(0) != 0.0
    val index = spark.read.parquet(batches.map(poolPath(root, _)).toIndexedSeq: _*)
    val ts = if (hasTs) Some(meta.filter(col("kind") === "tombstone").select("nid"))
      else None
    VIndex(index, ts)
  }

  /** Append a vector batch as a new version: assign against the FROZEN
    * stored model, write one new pool batch, publish. Returns the new
    * version (or the current one for an all-null no-op batch).
    * `rejectDuplicateIds` guards the disjoint-id precondition
    * (tombstoned ids count as present — revival needs a compact first). */
  def append(spark: SparkSession, root: String, vectors: DataFrame,
             idCol: String, vecCol: String,
             rejectDuplicateIds: Boolean = false): Int = {
    val src = vectors.filter(col(vecCol).isNotNull)
    if (src.limit(1).collect().isEmpty)
      return Snapshots.latestVersion(spark, metaDir(root)).get
    val cur = load(spark, root)
    if (rejectDuplicateIds) {
      val dup = cur.index
        .join(broadcast(src.select(col(idCol).as("nid")).distinct()),
          Seq("nid"), "left_semi")
        .select("nid").limit(1).collect()
      require(dup.isEmpty, s"versioned append: batch re-adds vector id " +
        s"${dup.head.get(0)} already present under $root")
    }
    val batch = nextBatch(spark, root)
    Ivf.assign(src, vecCol, model(spark, root))
      .select(col(idCol).as("nid"), col(vecCol).as("nvec"), col("cell"))
      .write.mode("overwrite").parquet(poolPath(root, batch))
    publishMeta(spark, root, manifestOf(spark, root) :+ batch, cur.tombstones,
      cur.index.schema("nid").dataType)
  }

  /** Remove vectors as a new version — a publish with the grown
    * tombstone set, NO data write at all. Already-tombstoned and absent
    * ids are no-ops; returns the current version if nothing was present
    * to remove. */
  def delete(spark: SparkSession, root: String, ids: DataFrame,
             idCol: String): Int = {
    val cur = load(spark, root)
    val req = cur.tombstones.foldLeft(
      ids.select(col(idCol).as("nid")).distinct())(
      (r, ts) => r.join(ts, Seq("nid"), "left_anti"))
    val present = req.join(cur.index.select("nid"), Seq("nid"), "left_semi")
      .localCheckpoint(true) // takedown-sized; two consumers below
    if (present.limit(1).collect().isEmpty)
      return Snapshots.latestVersion(spark, metaDir(root)).get
    publishMeta(spark, root, manifestOf(spark, root),
      Some(cur.tombstones.fold(present: DataFrame)(_.unionByName(present))),
      cur.index.schema("nid").dataType)
  }

  /** Fold the current version into ONE fresh pool batch with tombstones
    * applied — the deliberate rewrite, as a new version; older versions
    * and pins keep resolving the old batches until [[vacuum]]. */
  def compact(spark: SparkSession, root: String): Int = {
    val cur = load(spark, root)
    val manifest = manifestOf(spark, root)
    if (cur.tombstones.isEmpty && manifest.size == 1)
      return Snapshots.latestVersion(spark, metaDir(root)).get
    val live = cur.tombstones.foldLeft(cur.index)(
      (p, ts) => p.join(ts, Seq("nid"), "left_anti"))
    val batch = nextBatch(spark, root)
    live.write.mode("overwrite").parquet(poolPath(root, batch))
    publishMeta(spark, root, Seq(batch), None, cur.index.schema("nid").dataType)
  }

  /** Drop meta versions past the newest `keepLast` (Snapshots' rules —
    * never the committed or a pinned one), then delete pool batches no
    * remaining version references. */
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

  /** Serve top-k from a resolved version — [[Ivf.topKAgainstIndex]] with
    * the version's tombstones on the candidate frame. */
  def topK(spark: SparkSession, root: String, queries: DataFrame,
           queryId: String, queryVec: String, k: Int, nProbes: Int = 3,
           version: Option[Int] = None): DataFrame = {
    val vi = load(spark, root, version)
    Ivf.topKAgainstIndex(vi.index, queries, model(spark, root),
      queryId, queryVec, k, nProbes, vi.tombstones)
  }

  private def manifestOf(spark: SparkSession, root: String): Seq[String] =
    Snapshots.readLatest(spark, metaDir(root))
      .filter(col("kind") === "batch")
      .select("key").collect().map(_.getString(0)).sorted.toSeq
}
