package graft.curate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.VersionedPool

/** SNAPSHOT-VERSIONED positional phrase index — the third tier on the
  * shared [[graft.sources.VersionedPool]] core (after
  * [[Bm25Versioned]] and [[graft.ann.IvfVersioned]]), and the proof of
  * the r10 unification's promise that the next index format gets
  * versioning for free: the phrase index has NO derived state at all
  * (no df/stats analog — postings (term, doc_id, pos) are the whole
  * index), so this tier is nothing but pool batches + the core's
  * manifest/tombstone snapshots. An append writes one immutable batch;
  * a delete publishes METADATA ONLY (the tombstone set grows); serving
  * anti-joins tombstones below the per-phrase term prune, so the
  * anti-join input is term-posting-sized, never corpus-sized
  * ([[Phrase.phraseHits]] semantics are unchanged — spec-pinned
  * equal to a fresh build on the live corpus).
  *
  * Layout, commit protocol, crash model, pin/vacuum rules: see
  * [[VersionedPool]]. Single-writer maintenance. */
object PhraseVersioned {

  // The tombstone id type is the POOL's doc_id type (any id type the
  // positional postings carry — derived like the sibling tiers do, not
  // hardcoded: a string-keyed corpus would otherwise publish long-typed
  // null id rows that break the tombstone union on the first delete).
  private def publish(spark: SparkSession, root: String,
                      batches: Seq[String], tombstones: Option[DataFrame],
                      idType: org.apache.spark.sql.types.DataType): Int =
    VersionedPool.publishMeta(spark, root, batches, stats = Seq.empty,
      tombstones = tombstones, idCol = "doc_id", idType = idType)

  /** Create version 1 from an initial corpus (batch written even when
    * empty, so every manifest loads a schema'd pool). */
  def init(spark: SparkSession, root: String, docs: DataFrame,
           docId: String, docText: String): Int = {
    VersionedPool.requireFresh(spark, root)
    val batch = VersionedPool.nextBatch(spark, root)
    val postings = Phrase.positionalPostings(docs, docId, docText)
    postings.hint("rebalance") // adaptive output sizing (see IvfVersioned)
      .write.mode("overwrite").parquet(VersionedPool.poolPath(root, batch))
    publish(spark, root, Seq(batch), None,
      postings.schema("doc_id").dataType)
  }

  /** The version's live postings (tombstones anti-joined — the filter
    * sits on doc_id, so a downstream term prune still pushes below it).
    * Resolved HERE: keeps serving this version while maintenance
    * publishes away. */
  def load(spark: SparkSession, root: String,
           version: Option[Int] = None): DataFrame = {
    val r = VersionedPool.load(spark, root, "doc_id", version)
    r.tombstones.foldLeft(r.pool)(
      (p, ts) => p.join(ts, Seq("doc_id"), "left_anti"))
  }

  /** Serve phrase queries against a version: term-prune the pool first
    * (the [[Phrase.phraseSearch]] shape), THEN hit. */
  def hits(spark: SparkSession, root: String, phrases: Seq[Seq[String]],
           version: Option[Int] = None): DataFrame = {
    val wanted = phrases.flatten.distinct
    Phrase.phraseHits(
      load(spark, root, version).filter(col("term").isin(wanted: _*)),
      phrases)
  }

  /** Append a document batch as a new version — one pool batch + one
    * publish. Returns the new version. */
  def append(spark: SparkSession, root: String, newDocs: DataFrame,
             docId: String, docText: String): Int = {
    val batch = VersionedPool.nextBatch(spark, root)
    val postings = Phrase.positionalPostings(newDocs, docId, docText)
    postings.hint("rebalance") // adaptive output sizing (see IvfVersioned)
      .write.mode("overwrite").parquet(VersionedPool.poolPath(root, batch))
    val cur = VersionedPool.load(spark, root, "doc_id")
    publish(spark, root,
      VersionedPool.manifestOf(spark, root) :+ batch, cur.tombstones,
      postings.schema("doc_id").dataType)
  }

  /** Remove documents as a new version — METADATA ONLY (no pool write):
    * the new meta carries the grown tombstone set, restricted to ids
    * actually present (absent/already-dead ids are no-ops, so the set
    * stays corpus-bounded). Returns the new version (or the current one
    * when nothing was present to remove). */
  def delete(spark: SparkSession, root: String, ids: DataFrame,
             idCol: String): Int = {
    val r = VersionedPool.load(spark, root, "doc_id")
    val live = r.tombstones.foldLeft(r.pool)(
      (p, ts) => p.join(ts, Seq("doc_id"), "left_anti"))
    val present = live.join(
        broadcast(ids.select(col(idCol).as("doc_id")).distinct()),
        Seq("doc_id"), "left_semi")
      .select("doc_id").distinct()
    if (present.limit(1).collect().isEmpty)
      return VersionedPool.currentVersion(spark, root)
    publish(spark, root, VersionedPool.manifestOf(spark, root),
      Some(r.tombstones.fold(present)(_.unionByName(present))),
      r.pool.schema("doc_id").dataType)
  }

  /** Fold the current version into ONE fresh tombstone-free pool batch —
    * the deliberate rewrite, as a new version; older versions keep
    * resolving the old batches until [[vacuum]]. */
  def compact(spark: SparkSession, root: String): Int = {
    val cur = VersionedPool.load(spark, root, "doc_id")
    if (cur.tombstones.isEmpty && cur.batches.size == 1)
      return VersionedPool.currentVersion(spark, root)
    val live = cur.tombstones.foldLeft(cur.pool)(
      (p, ts) => p.join(ts, Seq("doc_id"), "left_anti"))
    val batch = VersionedPool.nextBatch(spark, root)
    live.hint("rebalance") // adaptive output sizing
      .write.mode("overwrite").parquet(VersionedPool.poolPath(root, batch))
    publish(spark, root, Seq(batch), None,
      cur.pool.schema("doc_id").dataType)
  }

  /** Core vacuum: drop old versions, then unreferenced pool batches. */
  def vacuum(spark: SparkSession, root: String,
             keepLast: Int): (Seq[Int], Seq[String]) =
    VersionedPool.vacuum(spark, root, keepLast)
}
