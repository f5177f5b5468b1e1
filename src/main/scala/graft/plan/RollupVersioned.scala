package graft.plan

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Snapshots, VersionedPool}

/** SNAPSHOT-VERSIONED rollup summaries — the FOURTH
  * [[graft.sources.VersionedPool]] tier (after BM25 / IVF / phrase,
  * q162/q167/q184), closing VERDICT r12 #6: today a refresh
  * RE-REGISTERS in place, so a dashboard mid-flight over a refreshed
  * summary has no pinned snapshot to keep reading. Here every summary
  * state is an immutable pool batch and every maintenance op commits
  * with ONE [[Snapshots.publish]] pointer swap:
  *
  * {{{
  * root/
  *   pool/bNNNNN/   one FULL summary (Rollup.materialize layout) per
  *                  version — summaries are group-cardinality-sized, so
  *                  a whole-summary batch per version is the honest and
  *                  CHEAP cost (unlike postings, there is nothing big to
  *                  share between versions)
  *   meta/          Snapshots table: manifest (the one batch) + layout
  *                  rows (grain/measure/sketch/hist columns in order) +
  *                  the BASE FILE MANIFEST the version aggregates —
  *                  `kind='basefile'`, the time-travel key
  * }}}
  *
  * TIME TRAVEL is staleness-guard-shaped: [[registerVersion]] registers
  * version v's batch against the AS-OF base frame (an explicit read of
  * exactly v's basefile manifest), whose own FileIndex fingerprint
  * matches by construction — so a dashboard holding the as-of frame
  * serves v forever, a dashboard over the live base dir serves the
  * CURRENT version, and neither can ever read the other's data as
  * fresh (the guard falls through on any mismatch, as always).
  * [[Snapshots.pin]]/[[VersionedPool.vacuum]] give long-readers the
  * same bytes-linger-until-vacuum contract as every other tier.
  * Crash model: a crash before publish leaves an unreferenced pool
  * orphan — nothing to repair, only to vacuum. Single-writer
  * maintenance. */
object RollupVersioned {

  /** The summary layout, fixed at [[init]] and carried in every
    * version's meta. */
  case class Layout(groupCols: Seq[String], measures: Seq[String],
                    distinctCols: Seq[String] = Nil, sketchK: Int = 64,
                    histCols: Seq[String] = Nil)

  private def layoutRows(spark: SparkSession, layout: Layout,
                         baseEntries: Seq[String]): DataFrame = {
    import spark.implicits._
    def rows(kind: String, cols: Seq[String]) =
      cols.zipWithIndex.map { case (c, i) => (kind, c, i.toDouble) }
    (rows("grain", layout.groupCols) ++ rows("measure", layout.measures) ++
      rows("distinct", layout.distinctCols) ++ rows("hist", layout.histCols) ++
      baseEntries.sorted.zipWithIndex.map { case (e, i) =>
        ("basefile", e, i.toDouble) })
      .toDF("kind", "key", "num")
  }

  private def layoutOf(meta: DataFrame): Layout = {
    def cols(kind: String): Seq[String] = meta
      .filter(col("kind") === kind).orderBy("num")
      .select("key").collect().map(_.getString(0)).toSeq
    Layout(cols("grain"), cols("measure"), cols("distinct"), 64, cols("hist"))
  }

  private def baseEntriesOf(meta: DataFrame): Set[String] =
    meta.filter(col("kind") === "basefile")
      .select("key").collect().map(_.getString(0)).toSet

  private def baseEntries(base: DataFrame): Seq[String] = {
    val rel = base.queryExecution.analyzed.collectFirst {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
          fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
          _, _, _, _) => fs
    }.getOrElse(throw new IllegalArgumentException(
      "base must be a file-backed relation"))
    rel.location match {
      case p: org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex =>
        p.allFiles().map(f =>
          s"${f.getPath}|${f.getLen}|${f.getModificationTime}").toSeq
      case other => other.inputFiles.toSeq.map { s =>
        val pth = new org.apache.hadoop.fs.Path(s)
        val st = pth.getFileSystem(
          base.sparkSession.sparkContext.hadoopConfiguration).getFileStatus(pth)
        s"$s|${st.getLen}|${st.getModificationTime}"
      }
    }
  }

  private def writeBatch(spark: SparkSession, root: String,
                         summary: DataFrame): String = {
    val batch = VersionedPool.nextBatch(spark, root)
    summary.write.mode("overwrite")
      .parquet(VersionedPool.poolPath(root, batch))
    batch
  }

  /** Aggregate `base` under `layout`, commit it as version 1. */
  def init(spark: SparkSession, root: String, base: DataFrame,
           layout: Layout): Int = {
    VersionedPool.requireFresh(spark, root)
    val batch = writeBatch(spark, root,
      Rollup.materialize(base, layout.groupCols, layout.measures,
        layout.distinctCols, layout.sketchK, layout.histCols))
    VersionedPool.publishMeta(spark, root, Seq(batch),
      Seq("sketch_k" -> layout.sketchK.toDouble), None, "doc_id",
      org.apache.spark.sql.types.LongType,
      Some(layoutRows(spark, layout, baseEntries(base))))
  }

  /** Fold a PURE APPEND of `base` (vs the committed version's basefile
    * manifest) into a NEW version: aggregate exactly the appended
    * files, [[Rollup.merge]] with the committed summary, commit one new
    * batch + publish. Old versions stay readable/pinned. Returns None —
    * publishing nothing — when the diff is not a pure append (removals
    * / in-place changes: rebuild via [[init]] on a fresh root) or is
    * empty. */
  def refreshAppended(spark: SparkSession, root: String,
                      base: DataFrame): Option[Int] = {
    val meta = Snapshots.readLatest(spark, VersionedPool.metaDir(root))
    val layout = layoutOf(meta)
    val saved = baseEntriesOf(meta)
    val sketchK = meta.filter(col("kind") === "stat" && col("key") === "sketch_k")
      .select("num").collect().headOption.map(_.getDouble(0).toInt).getOrElse(64)
    val current = baseEntries(base).toSet
    val appended = current -- saved
    val removed = saved -- current
    if (appended.isEmpty || removed.nonEmpty || saved.isEmpty) return None
    val deltaFiles = appended.toSeq.sorted.map(_.split("\\|")(0))
    val delta = spark.read.parquet(deltaFiles: _*)
    val needed = (layout.groupCols ++ layout.measures ++
      layout.distinctCols ++ layout.histCols).toSet
    if (!needed.subsetOf(delta.columns.toSet)) return None
    val stored = summaryOf(spark, root, None)
    val deltaAgg = Rollup.materialize(delta, layout.groupCols,
      layout.measures, layout.distinctCols, sketchK, layout.histCols)
    val merged = Rollup.merge(stored, deltaAgg, layout.groupCols,
      layout.measures, layout.distinctCols, sketchK, layout.histCols)
    val batch = writeBatch(spark, root, merged)
    Some(VersionedPool.publishMeta(spark, root, Seq(batch),
      Seq("sketch_k" -> sketchK.toDouble), None, "doc_id",
      org.apache.spark.sql.types.LongType,
      Some(layoutRows(spark, layout.copy(sketchK = sketchK),
        current.toSeq))))
  }

  /** Fold a PURE DELETE (files moved out of the base through
    * [[RollupRewrite.deleteFiles]]' trash protocol — bytes linger for
    * the retraction read) into a NEW version: the removed files'
    * partials RETRACT from the committed summary via the shared
    * [[Rollup.retract]] arithmetic (sums/counts subtract exactly,
    * emptied groups drop, extremum/sketch-touched groups recompute
    * from the reduced base filtered to the affected grains), one new
    * batch commits with one publish, and every older version — pinned
    * dashboards included — keeps serving its own state. Returns None
    * when the diff is not a pure delete, the removed files cannot be
    * resolved in `trashDirs`, or the bare reads miss a needed column
    * (the same refusal discipline as [[RollupRewrite.refreshStale]]'s
    * delete path). */
  def refreshRemoved(spark: SparkSession, root: String, base: DataFrame,
                     trashDirs: Seq[String]): Option[Int] = {
    val meta = Snapshots.readLatest(spark, VersionedPool.metaDir(root))
    val layout = layoutOf(meta)
    val saved = baseEntriesOf(meta)
    val sketchK = meta.filter(col("kind") === "stat" && col("key") === "sketch_k")
      .select("num").collect().headOption.map(_.getDouble(0).toInt).getOrElse(64)
    val current = baseEntries(base).toSet
    val removed = saved -- current
    val appended = current -- saved
    if (removed.isEmpty || appended.nonEmpty || saved.isEmpty) return None
    val conf = spark.sparkContext.hadoopConfiguration
    val resolved = removed.toSeq.sorted.map(_.split("\\|")(0)).map { p =>
      trashDirs.iterator.map { td =>
        new org.apache.hadoop.fs.Path(td, RollupRewrite.trashFileName(p))
      }.find(dst => dst.getFileSystem(conf).exists(dst)).map(_.toString)
    }
    if (resolved.exists(_.isEmpty)) return None
    val removedDf = spark.read.parquet(resolved.flatten: _*)
    val needed = (layout.groupCols ++ layout.measures ++
      layout.distinctCols ++ layout.histCols).toSet
    if (!needed.subsetOf(removedDf.columns.toSet) ||
        !needed.subsetOf(base.columns.toSet)) return None
    val retracted = Rollup.retract(summaryOf(spark, root, None), removedDf,
      base, layout.groupCols.map(g => g -> col(g)), layout.measures,
      layout.distinctCols, sketchK, layout.histCols)
    val batch = writeBatch(spark, root, retracted)
    Some(VersionedPool.publishMeta(spark, root, Seq(batch),
      Seq("sketch_k" -> sketchK.toDouble), None, "doc_id",
      org.apache.spark.sql.types.LongType,
      Some(layoutRows(spark, layout.copy(sketchK = sketchK),
        current.toSeq))))
  }

  /** Version v's summary frame (latest when None) — a plain scan of its
    * immutable pool batch, serving-stable while maintenance publishes. */
  def summaryOf(spark: SparkSession, root: String,
                version: Option[Int]): DataFrame = {
    val meta = version.fold(
      Snapshots.readLatest(spark, VersionedPool.metaDir(root)))(
      v => Snapshots.readVersion(spark, VersionedPool.metaDir(root), v))
    val batches = meta.filter(col("kind") === "batch")
      .select("key").collect().map(_.getString(0)).sorted
    spark.read.parquet(batches.map(VersionedPool.poolPath(root, _)).toIndexedSeq: _*)
  }

  /** Register version v (latest when None) with [[RollupRewrite]] and
    * return the AS-OF base frame its dashboards should query: an
    * explicit read of exactly the basefile manifest the version
    * aggregated, whose FileIndex fingerprint matches the registration
    * by construction — so aggregates over the returned frame serve from
    * this version's batch, aggregates over a moved-on base dir fall
    * through (or serve a LATER registered version). Registrations for
    * different versions coexist: their base path sets differ. */
  def registerVersion(spark: SparkSession, root: String,
                      version: Option[Int] = None): DataFrame = {
    val meta = version.fold(
      Snapshots.readLatest(spark, VersionedPool.metaDir(root)))(
      v => Snapshots.readVersion(spark, VersionedPool.metaDir(root), v))
    val layout = layoutOf(meta)
    val sketchK = meta.filter(col("kind") === "stat" && col("key") === "sketch_k")
      .select("num").collect().headOption.map(_.getDouble(0).toInt).getOrElse(64)
    val files = baseEntriesOf(meta).toSeq.sorted.map(_.split("\\|")(0))
    val asOf = spark.read.parquet(files: _*)
    RollupRewrite.register(asOf, summaryOf(spark, root, version),
      layout.groupCols, layout.measures, layout.distinctCols, sketchK,
      histCols = layout.histCols)
    asOf
  }

  /** [[VersionedPool.vacuum]]: drop unpinned meta versions past
    * `keepLast`, delete pool batches no remaining version references. */
  def vacuum(spark: SparkSession, root: String,
             keepLast: Int): (Seq[Int], Seq[String]) =
    VersionedPool.vacuum(spark, root, keepLast)

  // ---------------------------------------------------------------------
  // The JOINED (AJI) versioned tier (r13): one full Rollup layout over
  // `fact ⋈ dim` per version, meta additionally carrying the join keys
  // (`kind='key'`) and the DIM side's basefile manifest
  // (`kind='dimfile'`) — time travel over a maintained aggregate join
  // summary. Same crash model, pinning, and vacuum as the plain tier.
  // ---------------------------------------------------------------------

  private def joinedRows(spark: SparkSession, layout: Layout,
                         keys: Seq[(String, String)],
                         factEntries: Seq[String],
                         dimEntries: Seq[String]): DataFrame = {
    import spark.implicits._
    layoutRows(spark, layout, factEntries).unionByName(
      (keys.zipWithIndex.map { case ((f, d), i) =>
        ("key", s"${encName(f)}:${encName(d)}", i.toDouble) } ++
        dimEntries.sorted.zipWithIndex.map { case (e, i) =>
          ("dimfile", e, i.toDouble) })
        .toDF("kind", "key", "num"))
  }

  // key pairs URL-encode both names before joining with ':' (ADVICE r13
  // #2 — a fact column containing ':' would mis-split otherwise),
  // matching the j2/s2 lattice-manifest convention. Decode is identity
  // on the raw names older metas persisted (no '%' in practice).
  private def encName(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def decName(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  private def keysOf(meta: DataFrame): Seq[(String, String)] =
    meta.filter(col("kind") === "key").orderBy("num")
      .select("key").collect().map(_.getString(0)).toSeq.map { kv =>
        val Array(f, d) = kv.split(":", 2)
        decName(f) -> decName(d)
      }

  private def dimEntriesOf(meta: DataFrame): Set[String] =
    meta.filter(col("kind") === "dimfile")
      .select("key").collect().map(_.getString(0)).toSet

  private def join2(fact: DataFrame, dim: DataFrame,
                    keys: Seq[(String, String)]): DataFrame =
    fact.join(dim, keys.map { case (fk, dk) =>
      fact(fk) === dim(dk) }.reduce(_ && _))

  /** Aggregate `fact ⋈ dim` under `layout`, commit as version 1 of a
    * VERSIONED aggregate join summary. */
  def initJoined(spark: SparkSession, root: String, fact: DataFrame,
                 dim: DataFrame, keys: Seq[(String, String)],
                 layout: Layout): Int = {
    VersionedPool.requireFresh(spark, root)
    val batch = writeBatch(spark, root,
      Rollup.materialize(join2(fact, dim, keys), layout.groupCols,
        layout.measures, layout.distinctCols, layout.sketchK,
        layout.histCols))
    VersionedPool.publishMeta(spark, root, Seq(batch),
      Seq("sketch_k" -> layout.sketchK.toDouble), None, "doc_id",
      org.apache.spark.sql.types.LongType,
      Some(joinedRows(spark, layout, keys, baseEntries(fact),
        baseEntries(dim))))
  }

  /** Fold PURE APPENDS on either (or both) sides into a NEW version via
    * the q206 inner-join distributivity — `ΔF ⋈ dimCur` plus
    * `F_saved ⋈ ΔD` (the saved fact manifest read directly: the honest
    * dim-append cost, like [[RollupRewrite]]'s joined refresh) — merged
    * with the committed summary, one batch + one publish. Returns None
    * on a non-append diff on either side (rebuild via [[initJoined]] on
    * a fresh root), an empty diff, or a bare read missing a needed
    * column. Old versions stay readable and pinnable. */
  def refreshAppendedJoined(spark: SparkSession, root: String,
                            fact: DataFrame, dim: DataFrame): Option[Int] = {
    val meta = Snapshots.readLatest(spark, VersionedPool.metaDir(root))
    val layout = layoutOf(meta)
    val keys = keysOf(meta)
    val savedF = baseEntriesOf(meta)
    val savedD = dimEntriesOf(meta)
    val sketchK = meta.filter(col("kind") === "stat" && col("key") === "sketch_k")
      .select("num").collect().headOption.map(_.getDouble(0).toInt).getOrElse(64)
    val curF = baseEntries(fact).toSet
    val curD = baseEntries(dim).toSet
    val fApp = curF -- savedF
    val dApp = curD -- savedD
    if (savedF.isEmpty || savedD.isEmpty) return None
    if ((savedF -- curF).nonEmpty || (savedD -- curD).nonEmpty) return None
    if (fApp.isEmpty && dApp.isEmpty) return None
    val carried = (layout.groupCols ++ layout.measures ++
      layout.distinctCols ++ layout.histCols).toSet
    val neededFact = carried.filterNot(dim.columns.contains) ++ keys.map(_._1)
    val neededDim = carried.filter(dim.columns.contains) ++ keys.map(_._2)
    def agg(df: DataFrame) = Rollup.materialize(df, layout.groupCols,
      layout.measures, layout.distinctCols, sketchK, layout.histCols)
    val parts = Seq.newBuilder[DataFrame]
    if (fApp.nonEmpty) {
      val deltaFact = spark.read.parquet(
        fApp.toSeq.sorted.map(_.split("\\|")(0)): _*)
      if (!neededFact.subsetOf(deltaFact.columns.toSet)) return None
      parts += agg(join2(deltaFact, dim, keys))
    }
    if (dApp.nonEmpty) {
      val savedFact = spark.read.parquet(
        savedF.toSeq.sorted.map(_.split("\\|")(0)): _*)
      val deltaDim = spark.read.parquet(
        dApp.toSeq.sorted.map(_.split("\\|")(0)): _*)
      if (!neededFact.subsetOf(savedFact.columns.toSet) ||
          !neededDim.subsetOf(deltaDim.columns.toSet)) return None
      parts += agg(join2(savedFact, deltaDim, keys))
    }
    val deltaSummary = parts.result().reduce((a, b) =>
      Rollup.merge(a, b, layout.groupCols, layout.measures,
        layout.distinctCols, sketchK, layout.histCols))
    val merged = Rollup.merge(summaryOf(spark, root, None), deltaSummary,
      layout.groupCols, layout.measures, layout.distinctCols, sketchK,
      layout.histCols)
    val batch = writeBatch(spark, root, merged)
    Some(VersionedPool.publishMeta(spark, root, Seq(batch),
      Seq("sketch_k" -> sketchK.toDouble), None, "doc_id",
      org.apache.spark.sql.types.LongType,
      Some(joinedRows(spark, layout.copy(sketchK = sketchK), keys,
        curF.toSeq, curD.toSeq))))
  }

  /** Fold a PURE SINGLE-SIDE DELETE (files trash-moved through
    * [[RollupRewrite.deleteFiles]]) into a NEW version of the versioned
    * AJI: the removed join tuples are exactly `removed-side rows ⋈ the
    * other side` (the q217 set-difference distributivity), so
    * [[Rollup.retract]] applies verbatim to the joined frame —
    * sums/counts subtract exactly, extremum-touched groups recompute
    * from the CURRENT join, emptied groups drop — and one batch commits
    * with one publish while older versions stay pinned/readable.
    * Returns None when the delete is mixed with an append, touches both
    * sides, cannot be trash-resolved, or a bare read misses a needed
    * column. */
  def refreshRemovedJoined(spark: SparkSession, root: String,
                           fact: DataFrame, dim: DataFrame,
                           trashDirs: Seq[String]): Option[Int] = {
    val meta = Snapshots.readLatest(spark, VersionedPool.metaDir(root))
    val layout = layoutOf(meta)
    val keys = keysOf(meta)
    val savedF = baseEntriesOf(meta)
    val savedD = dimEntriesOf(meta)
    val sketchK = meta.filter(col("kind") === "stat" && col("key") === "sketch_k")
      .select("num").collect().headOption.map(_.getDouble(0).toInt).getOrElse(64)
    val curF = baseEntries(fact).toSet
    val curD = baseEntries(dim).toSet
    val fRem = savedF -- curF
    val dRem = savedD -- curD
    if (savedF.isEmpty || savedD.isEmpty) return None
    if ((curF -- savedF).nonEmpty || (curD -- savedD).nonEmpty) return None
    if ((fRem.nonEmpty) == (dRem.nonEmpty)) return None // exactly one side
    val conf = spark.sparkContext.hadoopConfiguration
    val rem = if (fRem.nonEmpty) fRem else dRem
    val resolved = rem.toSeq.sorted.map(_.split("\\|")(0)).map { p =>
      trashDirs.iterator.map { td =>
        new org.apache.hadoop.fs.Path(td, RollupRewrite.trashFileName(p))
      }.find(dst => dst.getFileSystem(conf).exists(dst)).map(_.toString)
    }
    if (resolved.exists(_.isEmpty)) return None
    val removedDf = spark.read.parquet(resolved.flatten: _*)
    val carried = (layout.groupCols ++ layout.measures ++
      layout.distinctCols ++ layout.histCols).toSet
    val neededFact = carried.filterNot(dim.columns.contains) ++ keys.map(_._1)
    val neededDim = carried.filter(dim.columns.contains) ++ keys.map(_._2)
    val removedJoined =
      if (fRem.nonEmpty) {
        if (!neededFact.subsetOf(removedDf.columns.toSet)) return None
        join2(removedDf, dim, keys)
      } else {
        if (!neededDim.subsetOf(removedDf.columns.toSet)) return None
        join2(fact, removedDf, keys)
      }
    val retracted = Rollup.retract(summaryOf(spark, root, None),
      removedJoined, join2(fact, dim, keys),
      layout.groupCols.map(g => g -> col(g)), layout.measures,
      layout.distinctCols, sketchK, layout.histCols)
    val batch = writeBatch(spark, root, retracted)
    Some(VersionedPool.publishMeta(spark, root, Seq(batch),
      Seq("sketch_k" -> sketchK.toDouble), None, "doc_id",
      org.apache.spark.sql.types.LongType,
      Some(joinedRows(spark, layout.copy(sketchK = sketchK), keys,
        curF.toSeq, curD.toSeq))))
  }

  // ---------------------------------------------------------------------
  // The STAR versioned tier (r13): one full Rollup layout over
  // `fact ⋈ dim1 ⋈ … ⋈ dimk` per version; meta carries per-dim keys
  // (`kind='keyI'`) and per-dim basefile manifests (`kind='dimfileI'`).
  // Appends on fact and/or any dims fold via the q212 TELESCOPING
  // decomposition; single-side trash deletes retract via the q217
  // algebra. Same pool/pin/vacuum contract as the other tiers.
  // ---------------------------------------------------------------------

  private def starRows(spark: SparkSession, layout: Layout,
                       factEntries: Seq[String],
                       dims: Seq[(Seq[(String, String)], Seq[String])])
      : DataFrame = {
    import spark.implicits._
    layoutRows(spark, layout, factEntries).unionByName(
      dims.zipWithIndex.flatMap { case ((keys, entries), i) =>
        keys.zipWithIndex.map { case ((f, d), j) =>
          (s"key$i", s"${encName(f)}:${encName(d)}", j.toDouble) } ++
          entries.sorted.zipWithIndex.map { case (e, j) =>
            (s"dimfile$i", e, j.toDouble) }
      }.toDF("kind", "key", "num"))
  }

  private def starDimCount(meta: DataFrame): Int =
    meta.filter(col("kind").startsWith("key"))
      .select("kind").distinct().collect()
      .map(_.getString(0).stripPrefix("key").toInt).foldLeft(-1)(_ max _) + 1

  private def starKeysOf(meta: DataFrame, i: Int): Seq[(String, String)] =
    meta.filter(col("kind") === s"key$i").orderBy("num")
      .select("key").collect().map(_.getString(0)).toSeq.map { kv =>
        val Array(f, d) = kv.split(":", 2)
        decName(f) -> decName(d)
      }

  private def starDimEntriesOf(meta: DataFrame, i: Int): Set[String] =
    meta.filter(col("kind") === s"dimfile$i")
      .select("key").collect().map(_.getString(0)).toSet

  private def starJoin(fact: DataFrame,
                       dims: Seq[(DataFrame, Seq[(String, String)])])
      : DataFrame =
    dims.foldLeft(fact) { case (acc, (d, keys)) =>
      acc.join(d, keys.map { case (fk, dk) =>
        fact(fk) === d(dk) }.reduce(_ && _))
    }

  /** Aggregate the star join under `layout`, commit as version 1. */
  def initStar(spark: SparkSession, root: String, fact: DataFrame,
               dims: Seq[(DataFrame, Seq[(String, String)])],
               layout: Layout): Int = {
    require(dims.size >= 2, "initStar needs 2+ dims; use initJoined")
    VersionedPool.requireFresh(spark, root)
    val batch = writeBatch(spark, root,
      Rollup.materialize(starJoin(fact, dims), layout.groupCols,
        layout.measures, layout.distinctCols, layout.sketchK,
        layout.histCols))
    VersionedPool.publishMeta(spark, root, Seq(batch),
      Seq("sketch_k" -> layout.sketchK.toDouble), None, "doc_id",
      org.apache.spark.sql.types.LongType,
      Some(starRows(spark, layout, baseEntries(fact),
        dims.map { case (d, keys) => (keys, baseEntries(d)) })))
  }

  /** Fold PURE APPENDS on the fact and/or ANY subset of dims into a NEW
    * version via the q212 telescoping decomposition: `ΔF ⋈ dims_cur`
    * plus one term per appended dim i — `F_saved ⋈ dims<i SAVED ⋈ ΔDi ⋈
    * dims>i cur` — pairwise disjoint by first-new-side, merged with the
    * committed summary, one batch + one publish. Returns None on any
    * removal, an empty diff, or a bare read missing a needed column. */
  def refreshAppendedStar(spark: SparkSession, root: String,
                          fact: DataFrame,
                          dims: Seq[(DataFrame, Seq[(String, String)])])
      : Option[Int] = {
    val meta = Snapshots.readLatest(spark, VersionedPool.metaDir(root))
    val layout = layoutOf(meta)
    val n = starDimCount(meta)
    require(dims.size == n, s"expected $n dims, got ${dims.size}")
    val keys = (0 until n).map(starKeysOf(meta, _))
    val savedF = baseEntriesOf(meta)
    val savedD = (0 until n).map(starDimEntriesOf(meta, _))
    val sketchK = meta.filter(col("kind") === "stat" && col("key") === "sketch_k")
      .select("num").collect().headOption.map(_.getDouble(0).toInt).getOrElse(64)
    val curF = baseEntries(fact).toSet
    val curDs = dims.map { case (d, _) => baseEntries(d).toSet }
    val fApp = curF -- savedF
    val dApps = (0 until n).map(i => curDs(i) -- savedD(i))
    if (savedF.isEmpty || savedD.exists(_.isEmpty)) return None
    if ((savedF -- curF).nonEmpty ||
        (0 until n).exists(i => (savedD(i) -- curDs(i)).nonEmpty)) return None
    if (fApp.isEmpty && dApps.forall(_.isEmpty)) return None
    def filesOf(entries: Set[String]): Seq[String] =
      entries.toSeq.sorted.map(_.split("\\|")(0))
    val dimCols = dims.flatMap(_._1.columns).toSet
    val carried = (layout.groupCols ++ layout.measures ++
      layout.distinctCols ++ layout.histCols).toSet
    val neededFact = carried.filterNot(dimCols.contains) ++
      keys.flatten.map(_._1)
    def neededDim(i: Int) =
      carried.filter(dims(i)._1.columns.contains) ++ keys(i).map(_._2)
    def agg(df: DataFrame) = Rollup.materialize(df, layout.groupCols,
      layout.measures, layout.distinctCols, sketchK, layout.histCols)
    val dimCur = (0 until n).map(i => dims(i)._1 -> keys(i))
    lazy val dimSaved = (0 until n).map(i =>
      spark.read.parquet(filesOf(savedD(i)): _*) -> keys(i))
    val parts = Seq.newBuilder[DataFrame]
    if (fApp.nonEmpty) {
      val deltaFact = spark.read.parquet(filesOf(fApp): _*)
      if (!neededFact.subsetOf(deltaFact.columns.toSet)) return None
      parts += agg(starJoin(deltaFact, dimCur))
    }
    if (dApps.exists(_.nonEmpty)) {
      val savedFact = spark.read.parquet(filesOf(savedF): _*)
      if (!neededFact.subsetOf(savedFact.columns.toSet)) return None
      (0 until n).foreach { i =>
        if (dApps(i).nonEmpty) {
          val deltaDim = spark.read.parquet(filesOf(dApps(i)): _*)
          if (!neededDim(i).subsetOf(deltaDim.columns.toSet)) return None
          if ((0 until i).exists(j =>
              !neededDim(j).subsetOf(dimSaved(j)._1.columns.toSet)))
            return None
          val sides = (0 until n).map { j =>
            if (j < i) dimSaved(j)
            else if (j == i) deltaDim -> keys(i)
            else dimCur(j)
          }
          parts += agg(starJoin(savedFact, sides))
        }
      }
    }
    val deltaSummary = parts.result().reduce((a, b) =>
      Rollup.merge(a, b, layout.groupCols, layout.measures,
        layout.distinctCols, sketchK, layout.histCols))
    val merged = Rollup.merge(summaryOf(spark, root, None), deltaSummary,
      layout.groupCols, layout.measures, layout.distinctCols, sketchK,
      layout.histCols)
    val batch = writeBatch(spark, root, merged)
    Some(VersionedPool.publishMeta(spark, root, Seq(batch),
      Seq("sketch_k" -> sketchK.toDouble), None, "doc_id",
      org.apache.spark.sql.types.LongType,
      Some(starRows(spark, layout.copy(sketchK = sketchK), curF.toSeq,
        (0 until n).map(i => (keys(i), curDs(i).toSeq))))))
  }

  /** Fold a PURE SINGLE-SIDE trash delete (fact or ONE dim) into a NEW
    * version — the q217 star retraction as one atomic publish. Returns
    * None on mixed diffs, multi-side deletes, unresolvable trash, or a
    * bare read missing a needed column. */
  def refreshRemovedStar(spark: SparkSession, root: String,
                         fact: DataFrame,
                         dims: Seq[(DataFrame, Seq[(String, String)])],
                         trashDirs: Seq[String]): Option[Int] = {
    val meta = Snapshots.readLatest(spark, VersionedPool.metaDir(root))
    val layout = layoutOf(meta)
    val n = starDimCount(meta)
    require(dims.size == n, s"expected $n dims, got ${dims.size}")
    val keys = (0 until n).map(starKeysOf(meta, _))
    val savedF = baseEntriesOf(meta)
    val savedD = (0 until n).map(starDimEntriesOf(meta, _))
    val sketchK = meta.filter(col("kind") === "stat" && col("key") === "sketch_k")
      .select("num").collect().headOption.map(_.getDouble(0).toInt).getOrElse(64)
    val curF = baseEntries(fact).toSet
    val curDs = dims.map { case (d, _) => baseEntries(d).toSet }
    val fRem = savedF -- curF
    val dRems = (0 until n).map(i => savedD(i) -- curDs(i))
    if (savedF.isEmpty || savedD.exists(_.isEmpty)) return None
    if ((curF -- savedF).nonEmpty ||
        (0 until n).exists(i => (curDs(i) -- savedD(i)).nonEmpty)) return None
    val remSides = (if (fRem.nonEmpty) 1 else 0) + dRems.count(_.nonEmpty)
    if (remSides != 1) return None
    val conf = spark.sparkContext.hadoopConfiguration
    val rem = if (fRem.nonEmpty) fRem else dRems.find(_.nonEmpty).get
    val resolved = rem.toSeq.sorted.map(_.split("\\|")(0)).map { p =>
      trashDirs.iterator.map { td =>
        new org.apache.hadoop.fs.Path(td, RollupRewrite.trashFileName(p))
      }.find(dst => dst.getFileSystem(conf).exists(dst)).map(_.toString)
    }
    if (resolved.exists(_.isEmpty)) return None
    val removedDf = spark.read.parquet(resolved.flatten: _*)
    val dimCols = dims.flatMap(_._1.columns).toSet
    val carried = (layout.groupCols ++ layout.measures ++
      layout.distinctCols ++ layout.histCols).toSet
    val neededFact = carried.filterNot(dimCols.contains) ++
      keys.flatten.map(_._1)
    def neededDim(i: Int) =
      carried.filter(dims(i)._1.columns.contains) ++ keys(i).map(_._2)
    val dimCur = (0 until n).map(i => dims(i)._1 -> keys(i))
    val removedJoined =
      if (fRem.nonEmpty) {
        if (!neededFact.subsetOf(removedDf.columns.toSet)) return None
        starJoin(removedDf, dimCur)
      } else {
        val i = dRems.indexWhere(_.nonEmpty)
        if (!neededDim(i).subsetOf(removedDf.columns.toSet)) return None
        starJoin(fact, (0 until n).map(j =>
          if (j == i) removedDf -> keys(i) else dimCur(j)))
      }
    val retracted = Rollup.retract(summaryOf(spark, root, None),
      removedJoined, starJoin(fact, dimCur),
      layout.groupCols.map(g => g -> col(g)), layout.measures,
      layout.distinctCols, sketchK, layout.histCols)
    val batch = writeBatch(spark, root, retracted)
    Some(VersionedPool.publishMeta(spark, root, Seq(batch),
      Seq("sketch_k" -> sketchK.toDouble), None, "doc_id",
      org.apache.spark.sql.types.LongType,
      Some(starRows(spark, layout.copy(sketchK = sketchK), curF.toSeq,
        (0 until n).map(i => (keys(i), curDs(i).toSeq))))))
  }

  /** Register version v of a versioned STAR summary (latest when None)
    * and return the AS-OF (fact, dims) frames its dashboards should
    * join — explicit reads of exactly the version's manifests, so
    * different versions' registrations coexist and a moved-on live
    * base falls through. */
  def registerVersionStar(spark: SparkSession, root: String,
                          version: Option[Int] = None)
      : (DataFrame, Seq[(DataFrame, Seq[(String, String)])]) = {
    val meta = version.fold(
      Snapshots.readLatest(spark, VersionedPool.metaDir(root)))(
      v => Snapshots.readVersion(spark, VersionedPool.metaDir(root), v))
    val layout = layoutOf(meta)
    val n = starDimCount(meta)
    val sketchK = meta.filter(col("kind") === "stat" && col("key") === "sketch_k")
      .select("num").collect().headOption.map(_.getDouble(0).toInt).getOrElse(64)
    val asOfFact = spark.read.parquet(
      baseEntriesOf(meta).toSeq.sorted.map(_.split("\\|")(0)): _*)
    val asOfDims = (0 until n).map { i =>
      spark.read.parquet(starDimEntriesOf(meta, i).toSeq.sorted
        .map(_.split("\\|")(0)): _*) -> starKeysOf(meta, i)
    }
    RollupRewrite.registerStar(asOfFact, asOfDims,
      summaryOf(spark, root, version), layout.groupCols, layout.measures,
      layout.distinctCols, sketchK, layout.histCols)
    (asOfFact, asOfDims)
  }

  /** Register version v of a versioned AJI (latest when None) and
    * return the AS-OF (fact, dim) frames its dashboards should join:
    * explicit reads of exactly the manifests the version aggregated,
    * whose fingerprints match the registration by construction —
    * different versions' registrations coexist (their path sets
    * differ), and a moved-on live base falls through. */
  def registerVersionJoined(spark: SparkSession, root: String,
                            version: Option[Int] = None)
      : (DataFrame, DataFrame) = {
    val meta = version.fold(
      Snapshots.readLatest(spark, VersionedPool.metaDir(root)))(
      v => Snapshots.readVersion(spark, VersionedPool.metaDir(root), v))
    val layout = layoutOf(meta)
    val keys = keysOf(meta)
    val sketchK = meta.filter(col("kind") === "stat" && col("key") === "sketch_k")
      .select("num").collect().headOption.map(_.getDouble(0).toInt).getOrElse(64)
    val asOfFact = spark.read.parquet(
      baseEntriesOf(meta).toSeq.sorted.map(_.split("\\|")(0)): _*)
    val asOfDim = spark.read.parquet(
      dimEntriesOf(meta).toSeq.sorted.map(_.split("\\|")(0)): _*)
    RollupRewrite.registerJoined(asOfFact, asOfDim, keys,
      summaryOf(spark, root, version), layout.groupCols, layout.measures,
      layout.distinctCols, sketchK, layout.histCols)
    (asOfFact, asOfDim)
  }
}
