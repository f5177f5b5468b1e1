package graft.curate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** BM25 retrieval over an inverted-index join — the mining/retrieval
  * primitive of a training-data pipeline (mine a corpus for documents
  * relevant to seed queries; score near-duplicate candidates lexically;
  * build hard negatives for retrieval training).
  *
  * Okapi BM25: score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) /
  * (tf + k1·(1 − b + b·dl/avgdl)), idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
  *
  * Scale shape: the corpus tokenizes ONCE into a (term, doc_id, dl, tf,
  * df) postings index (one corpus-sized shuffle; document frequency is
  * folded into the postings at build time on the SAME term partitioning,
  * so query-time scoring never re-aggregates it); the query term set
  * rides a BROADCAST onto the postings (queries are seed-sized — the
  * corpus never shuffles for them), and the per-(query, doc) sum is one
  * candidate-sized aggregation. Top-k per query runs on the heap plan
  * node ([[graft.plan.TopKPerGroup]]) — shuffle bounded at partitions ×
  * queries × k, no per-query sort of the candidate set.
  *
  * Lifecycle: [[buildIndex]] materializes the index eagerly (via
  * localCheckpoint — block-manager blocks released by GC when the index
  * goes unreferenced, never an entry in the cache manager), so nothing a
  * one-shot [[scores]]/[[topK]] call caches outlives the call. For the
  * at-scale reuse path, [[saveIndex]]/[[loadIndex]] persist the index as
  * a table: build once, score every later query batch against storage
  * without rescanning or re-tokenizing the corpus.
  */
object Bm25 {

  /** A built inverted index: `postings` is (term, doc_id, dl, tf, df) —
    * document frequency pre-joined — plus the corpus stats the score
    * formula needs. `nDocs`/`avgdl` count only docs with ≥1 token (blank
    * docs can match nothing and must not dilute avgdl). */
  final case class Index(postings: DataFrame, nDocs: Double, avgdl: Double)

  /** Tokenize the corpus once and materialize the enriched postings.
    * The raw (doc, term, tf) frame has two consumers (the df aggregation
    * and the df join), so it persists for the build and unpersists before
    * returning; the returned postings are an EAGER localCheckpoint —
    * scoring reads materialized blocks, and no cache entry survives. An
    * empty/all-blank corpus yields an empty index (nDocs = 0), which
    * scores to an empty result downstream. */
  def buildIndex(docs: DataFrame, docId: String, docText: String): Index = {
    // Hash-scatter BY doc id at data-derived width before tokenizing
    // (r14, guide §2.3): a single-file corpus otherwise runs the whole
    // tokenize+explode+partial-agg stage as ONE task, and the keyed
    // scatter also lets the (doc_id, dl, term) groupBy ride the
    // partitioning with no further exchange — one shuffle total, now
    // placed BELOW the tokenizer. No-op for already-wide inputs.
    val corpus = graft.dedup.Dedup
      .ensureParallelism(docs, Seq(col(docId)))
      .select(col(docId).as("doc_id"), T.tokens(col(docText)).as("__toks"))
      .filter(size(col("__toks")) > 0)
    val tfs = corpus
      .select(col("doc_id"), size(col("__toks")).cast("double").as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 1-row bounded collect: corpus doc count + mean length, computed from
    // the slim cached index (doc_id is unique per (doc_id, dl) pair);
    // doubles as the cache materialization
    val statsRow = tfs.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).cast("double"), avg(col("dl"))).collect()(0)
    if (statsRow.isNullAt(1)) { // empty/all-blank corpus: avg(dl) is NULL
      val empty = tfs.limit(0).withColumn("df", lit(0.0)).localCheckpoint(true).transform(graft.plan.Checkpoints.track)
      tfs.unpersist()
      Index(empty, 0.0, 1.0) // avgdl unused at nDocs = 0; 1.0 avoids 0/0
    } else {
      val dfs = tfs.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
      // same term partitioning as the tf groupBy — co-partitioned join.
      // Coalesce the materialized postings to a CORPUS-SIZED partition
      // count (nDocs is already known): the groupBy inherits the
      // session-wide shuffle width, the checkpoint freezes it, and every
      // later scoring job then pays one near-empty task per partition
      // (measured ~0.4-1.2 s/job of task-launch overhead on small
      // corpora). ~50k docs/partition ≈ 2M posting rows; narrow
      // dependency, so the tokenize/shuffle parallelism is unchanged.
      val parts = postingsParts(statsRow.getDouble(0))
      val enriched = tfs.join(dfs, Seq("term")).coalesce(parts)
        .localCheckpoint(true).transform(graft.plan.Checkpoints.track)
      tfs.unpersist()
      Index(enriched, statsRow.getDouble(0), statsRow.getDouble(1))
    }
  }

  /** Scale-adaptive partition count for materialized postings/df frames:
    * one partition per ~50k docs (≈2M posting rows at typical term
    * density), at least 1 — derived from the data, never from the local
    * core count (guide §2: partition counts must scale with input). */
  private def postingsParts(nDocs: Double): Int =
    math.max(1L, (nDocs / 50000.0).toLong).toInt

  /** Persist an index: postings as a parquet table, stats as a 1-row
    * sidecar. Doubles round-trip parquet exactly, so a loaded index
    * scores bit-identically to the in-memory one. */
  def saveIndex(index: Index, path: String): Unit = {
    index.postings.write.mode("overwrite").parquet(s"$path/postings")
    val spark = index.postings.sparkSession
    import spark.implicits._
    Seq((index.nDocs, index.avgdl)).toDF("n_docs", "avgdl")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Load an index persisted by [[saveIndex]]. The postings frame is a
    * plain storage-backed scan — nothing cached, serving-safe in a loop. */
  def loadIndex(spark: SparkSession, path: String): Index = {
    val st = spark.read.parquet(s"$path/stats")
      .select(col("n_docs").cast("double"), col("avgdl").cast("double"))
      .collect()(0)
    Index(spark.read.parquet(s"$path/postings"), st.getDouble(0), st.getDouble(1))
  }

  /** Raw BM25 scores against a built/loaded index for every (query, doc)
    * pair sharing at least one term: (qid, doc_id, score) — unrounded
    * doubles. The corpus side is never shuffled: query terms broadcast
    * onto the postings and only matching rows enter the aggregation. */
  def scoresAgainstIndex(index: Index, queries: DataFrame,
                         queryId: String, queryText: String,
                         k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qterms = queries
      .select(col(queryId).as("qid"),
        explode(array_distinct(T.tokens(col(queryText)))).as("term"))
    val idf = log(lit(1.0) +
      (lit(index.nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val termScore = idf * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(index.avgdl)))
    index.postings
      .join(broadcast(qterms), Seq("term"))
      .select(col("qid"), col("doc_id"), termScore.as("__s"))
      .groupBy("qid", "doc_id")
      .agg(sum(col("__s")).as("score"))
  }

  /** One-shot scores: build an ephemeral index, score against it. Docs
    * with no tokens are excluded from the corpus statistics (they can
    * match nothing). Leaves nothing cached — repeated calls in a
    * long-lived session must not accumulate state (Bm25Spec pins the
    * cache manager empty after looped calls). */
  def scores(docs: DataFrame, docId: String, docText: String,
             queries: DataFrame, queryId: String, queryText: String,
             k1: Double = 1.2, b: Double = 0.75): DataFrame =
    scoresAgainstIndex(buildIndex(docs, docId, docText),
      queries, queryId, queryText, k1, b)

  /** Top `k` docs per query by BM25, with the score QUANTIZED to
    * `scoreDecimals` before ranking and ties broken by ascending doc id.
    * Quantization is the cross-engine determinism device: raw double sums
    * differ by ulps between engines/summation orders, so ranking on the
    * rounded score + id makes the result exactly reproducible (probe that
    * real scores sit far from the rounding boundary — q96 does).
    * Returns (qid, rank, doc_id, score). */
  def topK(docs: DataFrame, docId: String, docText: String,
           queries: DataFrame, queryId: String, queryText: String,
           k: Int, k1: Double = 1.2, b: Double = 0.75,
           scoreDecimals: Int = 4): DataFrame =
    topKFromScores(
      scores(docs, docId, docText, queries, queryId, queryText, k1, b),
      k, scoreDecimals)

  /** [[topK]] served from a built/loaded index — the stored-artifact
    * path: build once, save, then every query batch ranks against the
    * index table without touching corpus text. */
  def topKAgainstIndex(index: Index, queries: DataFrame,
                       queryId: String, queryText: String,
                       k: Int, k1: Double = 1.2, b: Double = 0.75,
                       scoreDecimals: Int = 4): DataFrame =
    topKFromScores(
      scoresAgainstIndex(index, queries, queryId, queryText, k1, b),
      k, scoreDecimals)

  private def topKFromScores(sc: DataFrame, k: Int, scoreDecimals: Int): DataFrame =
    graft.plan.TopKPerGroup(
        sc.withColumn("score", round(col("score"), scoreDecimals)),
        Seq(col("qid")),
        Seq(col("score").desc, col("doc_id").asc), k, rankName = "rank")
      .select(col("qid"), col("rank"), col("doc_id"), col("score"))

  // ------------------------------------------------- incremental index

  /** The MAINTAINABLE index format: document frequency lives in a
    * separate vocabulary-sized `(term, df)` table instead of being folded
    * into every posting row. The fold ([[Index]]) is the right read
    * layout for a build-once index, but it makes appends corpus-sized: a
    * new batch changes df for every term it touches, which under the
    * folded layout rewrites every posting of those terms — at realistic
    * vocabulary overlap, most of a 100 TB index. Here an append is
    * O(batch + vocabulary): batch postings APPEND (stored postings are
    * never read, rewritten, or shuffled), the df table merges by term
    * (vocab-sized), and the scalar stats add arithmetically. Scoring
    * joins df onto the BROADCAST query-term side, so the serving plan
    * shape is identical to [[scoresAgainstIndex]].
    *
    * Exactness contract (the q158 gate): an index built incrementally
    * over any disjoint split of the corpus serves quantized top-k
    * IDENTICAL to a full rebuild — df counts and doc counts are integer
    * sums, and `totalDl` is a sum of integer-valued doubles (token
    * counts), exact in float64 below 2^53 regardless of summation order,
    * so `avgdl` is bit-identical to the rebuild's. Appended batches must
    * carry doc ids DISJOINT from the stored corpus (the same admission
    * precondition as the q109 dedup index); re-adding an id double-counts
    * exactly as a real posting list would — pass
    * `rejectDuplicateIds = true` to [[appendIncIndex]] to turn that
    * silent corruption into an error.
    *
    * DELETION ([[deleteFromIncIndex]]) is the lifecycle's other half —
    * takedowns and post-hoc dedup rejections under a format whose whole
    * point is never rewriting postings: removed doc ids land in a
    * doc-count-bounded `tombstones` table consulted at SERVE time (an
    * anti-join on the candidate-sized frame after the query-term join —
    * the postings themselves are never read for a delete beyond the one
    * scan that computes the decrements), df/nDocs/totalDl decrement from
    * the tombstoned docs' own postings rows (integer decrements — serving
    * stays EXACTLY rebuild-equal on the reduced corpus, the q159 gate),
    * and [[compactIncIndex]] eventually folds tombstones back into
    * storage. Consistency model: (postings, tombstones) is the source of
    * truth; dfs/stats are DERIVED and [[repairIncIndex]] recomputes them
    * after any crash mid-maintenance. */
  final case class IncIndex(postings: DataFrame, dfs: DataFrame,
                            nDocs: Double, totalDl: Double,
                            tombstones: Option[DataFrame] = None) {
    def avgdl: Double = if (nDocs == 0) 1.0 else totalDl / nDocs
  }

  /** Build the maintainable index: same one corpus pass as
    * [[buildIndex]], df kept separate. */
  def buildIncIndex(docs: DataFrame, docId: String, docText: String): IncIndex = {
    // keyed scatter below the tokenizer — see [[buildIndex]]
    val corpus = graft.dedup.Dedup
      .ensureParallelism(docs, Seq(col(docId)))
      .select(col(docId).as("doc_id"), T.tokens(col(docText)).as("__toks"))
      .filter(size(col("__toks")) > 0)
    val tfs = corpus
      .select(col("doc_id"), size(col("__toks")).cast("double").as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val statsRow = tfs.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).cast("double"), sum(col("dl"))).collect()(0)
    val out =
      if (statsRow.isNullAt(1)) {
        val empty = tfs.limit(0).localCheckpoint(true).transform(graft.plan.Checkpoints.track)
        IncIndex(empty,
          empty.select(col("term"), lit(0.0).as("df")).localCheckpoint(true).transform(graft.plan.Checkpoints.track),
          0.0, 0.0)
      } else {
        // corpus-sized partitioning before the checkpoints (see
        // [[buildIndex]]): the cached groupBy keeps the session shuffle
        // width otherwise, and serving/appending then pays a task per
        // near-empty partition on every job
        val parts = postingsParts(statsRow.getDouble(0))
        IncIndex(
          tfs.coalesce(parts).localCheckpoint(true).transform(graft.plan.Checkpoints.track),
          tfs.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
            .coalesce(parts)
            .localCheckpoint(true).transform(graft.plan.Checkpoints.track),
          statsRow.getDouble(0), statsRow.getDouble(1))
      }
    tfs.unpersist()
    out
  }

  def saveIncIndex(index: IncIndex, path: String): Unit = {
    // a re-save over a swap-maintained root must not leave a stale
    // pointer shadowing the plain dirs (save has no mid-write reader
    // contract — it is an overwrite, not a commit). Plain dirs write
    // FIRST, pointers delete LAST (ADVICE r13 #1): a crash mid-save
    // leaves the pointers intact, so the committed generation stays
    // resolvable until the replacement bytes fully exist.
    index.postings.write.mode("overwrite").parquet(s"$path/postings")
    index.dfs.write.mode("overwrite").parquet(s"$path/dfs")
    val spark = index.postings.sparkSession
    import spark.implicits._
    Seq((index.nDocs, index.totalDl)).toDF("n_docs", "total_dl")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
    val rootP = new org.apache.hadoop.fs.Path(path)
    val pfs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("postings", "dfs", "stats").foreach { n =>
      pfs.delete(new org.apache.hadoop.fs.Path(s"$path/.ptr_$n"), false) }
  }

  def loadIncIndex(spark: SparkSession, path: String): IncIndex = {
    val st = spark.read.parquet(resolveTable(spark, path, "stats"))
      .select(col("n_docs").cast("double"), col("total_dl").cast("double"))
      .collect()(0)
    IncIndex(spark.read.parquet(resolveTable(spark, path, "postings")),
      spark.read.parquet(resolveTable(spark, path, "dfs")),
      st.getDouble(0), st.getDouble(1), tombstonesOpt(spark, path))
  }

  private def tombstonesOpt(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Append a document batch to a stored incremental index —
    * O(batch + vocabulary), the stored postings are untouched: batch
    * postings append as new files, the df table and 1-row stats rewrite
    * via tmp+rename (both vocab-or-smaller). Single-writer maintenance
    * op; concurrent readers mid-append can see the new postings before
    * the new stats — version the index directory with
    * [[graft.sources.Snapshots]] when serving must be isolated from
    * maintenance. Crash recovery: postings (the source of truth) commit
    * FIRST, so a crash that leaves dfs/stats stale or mid-swap repairs
    * with [[repairIncIndex]]. Batch doc ids must be disjoint from the
    * stored corpus (see [[IncIndex]]); `rejectDuplicateIds` enforces that
    * precondition with one broadcast probe of the stored postings
    * (batch-id-sized build side, no shuffle) instead of trusting it. */
  def appendIncIndex(spark: SparkSession, path: String, newDocs: DataFrame,
                     docId: String, docText: String,
                     rejectDuplicateIds: Boolean = false): Unit = {
    val delta = buildIncIndex(newDocs, docId, docText)
    if (delta.nDocs == 0.0) return
    if (rejectDuplicateIds) {
      val dup = spark.read.parquet(resolveTable(spark, path, "postings"))
        .join(broadcast(delta.postings.select("doc_id").distinct()),
          Seq("doc_id"), "left_semi")
        .select("doc_id").limit(1).collect()
      require(dup.isEmpty, s"appendIncIndex: batch re-adds doc id " +
        s"${dup.head.get(0)} already present in $path/postings — a re-add " +
        "double-counts df/tf (compact + delete first, or fix the batch)")
    }
    val old = loadIncIndex(spark, path)
    delta.postings.write.mode("append")
      .parquet(resolveTable(spark, path, "postings"))
    // merged df is materialized by the tmp write BEFORE the old dir is
    // replaced, so the plan never overwrites its own input
    val mergedDfs = old.dfs.unionByName(delta.dfs)
      .groupBy("term").agg(sum(col("df")).as("df"))
    swapWrite(mergedDfs, path, "dfs")
    import spark.implicits._
    swapWrite(Seq((old.nDocs + delta.nDocs, old.totalDl + delta.totalDl))
      .toDF("n_docs", "total_dl").coalesce(1), path, "stats")
  }

  /** Remove documents from a stored incremental index WITHOUT rewriting
    * postings — O(ids + one postings scan + vocabulary): the ids actually
    * present land in the `tombstones` table (consulted at serve time as a
    * candidate-sized anti-join), and df/nDocs/totalDl decrement from the
    * removed docs' own postings rows, so serving is EXACTLY a rebuild
    * over the reduced corpus (integer decrements — the q159 gate).
    * Already-tombstoned and absent ids are no-ops (idempotent; no
    * double-decrement). Tombstones commit FIRST: a crash before the
    * dfs/stats swaps leaves (postings, tombstones) — the source of truth
    * — already final, and [[repairIncIndex]] rebuilds the rest.
    * Single-writer, like [[appendIncIndex]]. */
  def deleteFromIncIndex(spark: SparkSession, path: String, ids: DataFrame,
                         idCol: String): Unit = {
    val old = loadIncIndex(spark, path)
    val req = old.tombstones.foldLeft(
      ids.select(col(idCol).as("doc_id")).distinct())(
      (r, ts) => r.join(ts, Seq("doc_id"), "left_anti"))
    // the one postings scan: rows of the docs being removed (ids
    // broadcast). EAGER localCheckpoint, NOT persist: the tombstone
    // append below writes a path this frame's lineage reads, and
    // Spark's recacheByPath would silently RECOMPUTE a persisted frame
    // against the grown tombstone set — the anti-join then erases the
    // docs being deleted and the df/stats decrements vanish (a
    // SEQUENTIAL-deletes corruption the swap-commit spec caught;
    // one-shot deletes never hit it because the tombstone table did
    // not pre-exist). A checkpoint has no lineage to recompute.
    val removed = old.postings.join(broadcast(req), Seq("doc_id"))
      .localCheckpoint(true)
    try {
      val st = removed.select(col("doc_id"), col("dl")).distinct()
        .agg(count(lit(1)).cast("double"), sum(col("dl"))).collect()(0)
      if (!st.isNullAt(1)) { // at least one requested doc is present
        removed.select("doc_id").distinct()
          .write.mode("append").parquet(s"$path/tombstones")
        val dec = removed.groupBy("term")
          .agg(count(lit(1)).cast("double").as("__dec"))
        // vocab-sized merge; terms whose last doc died leave the table
        swapWrite(old.dfs.join(dec, Seq("term"), "left")
          .select(col("term"),
            (col("df") - coalesce(col("__dec"), lit(0.0))).as("df"))
          .filter(col("df") > 0), path, "dfs")
        import spark.implicits._
        swapWrite(Seq((old.nDocs - st.getDouble(0), old.totalDl - st.getDouble(1)))
          .toDF("n_docs", "total_dl").coalesce(1), path, "stats")
      }
    } finally removed.unpersist()
  }

  /** Recompute the DERIVED tables (dfs, stats) from the source of truth
    * (postings minus tombstones) — ONE aggregation pass; the repair path
    * after a crash mid-[[appendIncIndex]]/[[deleteFromIncIndex]] left
    * them stale or mid-swap (missing). Reads postings directly (not
    * [[loadIncIndex]], which needs the very tables being repaired). */
  def repairIncIndex(spark: SparkSession, path: String): Unit = {
    val postings = spark.read.parquet(resolveTable(spark, path, "postings"))
    val live = tombstonesOpt(spark, path)
      .foldLeft(postings)((p, ts) => p.join(ts, Seq("doc_id"), "left_anti"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val st = live.select(col("doc_id"), col("dl")).distinct()
        .agg(count(lit(1)).cast("double"), sum(col("dl"))).collect()(0)
      swapWrite(live.groupBy("term")
        .agg(count(lit(1)).cast("double").as("df")), path, "dfs")
      import spark.implicits._
      swapWrite(Seq((
          if (st.isNullAt(1)) (0.0, 0.0)
          else (st.getDouble(0), st.getDouble(1))))
        .toDF("n_docs", "total_dl").coalesce(1), path, "stats")
    } finally live.unpersist()
  }

  /** Fold tombstones back into storage: the ONE deliberate postings
    * rewrite, run at the operator's chosen cadence (when the tombstone
    * fraction makes the serve-time anti-join or the dead-row scan cost
    * noticeable). dfs/stats are already decrement-correct, so only
    * postings rewrite and the tombstone table clears. Idempotent and
    * crash-ordered: postings swap first — a crash before the tombstone
    * delete leaves the anti-join filtering already-absent ids, a no-op. */
  def compactIncIndex(spark: SparkSession, path: String): Unit =
    tombstonesOpt(spark, path).foreach { ts =>
      swapWrite(spark.read.parquet(resolveTable(spark, path, "postings"))
        .join(ts, Seq("doc_id"), "left_anti"), path, "postings")
      val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }

  /** Resolve the live directory of a swap-managed table: the pointer
    * file `root/.ptr_<name>` names the current generation dir when a
    * [[swapWrite]] has committed one; absent, the table lives at the
    * legacy plain `root/name` (the layout every index starts with —
    * saveIncIndex writes plain dirs, so pre-pointer indexes resolve
    * unchanged). */
  private[graft] def resolveTable(spark: SparkSession, root: String,
                                  name: String): String = {
    val ptr = new org.apache.hadoop.fs.Path(s"$root/.ptr_$name")
    val fs = ptr.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(ptr)) s"$root/$name"
    else {
      val in = fs.open(ptr)
      val gen = try new String(
          org.apache.commons.io.IOUtils.toByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim
        finally in.close()
      s"$root/$gen"
    }
  }

  /** Replace table `root/name` with `df`'s rows — SINGLE-RENAME commit
    * (VERDICT r12 #5, closing the two-rename no-dst window carried
    * since r10): the new rows land in a fresh GENERATION dir
    * (`root/.gen_<name>_<k>` — the write also materializes the plan, so
    * a df reading the table can rewrite it), and the commit is ONE
    * atomic FileContext rename of a tiny pointer FILE onto
    * `root/.ptr_<name>` (Rename.OVERWRITE replaces files atomically —
    * the dir-swap limitation that forced the old stage-out/stage-in
    * pair does not apply). A reader resolving the table through
    * [[resolveTable]] therefore sees the OLD generation or the NEW one,
    * never a missing directory. Crash model: before the pointer rename,
    * the new generation is an unreferenced orphan (the retry overwrites
    * it — generation numbering follows the committed pointer); after
    * it, the commit is complete. Superseded generations are kept ONE
    * swap (a reader that resolved just before the commit keeps
    * streaming the previous dir) and deleted on the NEXT swap — the
    * bytes-linger-until-vacuum contract every versioned tier follows. */
  private def swapWrite(df: DataFrame, root: String, name: String): Unit = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(conf)
    val currentDir = resolveTable(spark, root, name)
    val currentGen = new org.apache.hadoop.fs.Path(currentDir).getName
    val nextN = currentGen match {
      case g if g.startsWith(s".gen_${name}_") =>
        g.substring(s".gen_${name}_".length).toLong + 1
      case _ => 1L
    }
    val gen = s".gen_${name}_$nextN"
    df.write.mode("overwrite").parquet(s"$root/$gen")
    // ONE atomic commit: tmp pointer file → rename OVERWRITE
    val ptr = new org.apache.hadoop.fs.Path(s"$root/.ptr_$name")
    val tmpPtr = new org.apache.hadoop.fs.Path(s"$root/.ptrtmp_$name")
    val out = fs.create(tmpPtr, true)
    try out.write(gen.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(ptr.toUri, conf)
    fc.rename(tmpPtr, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // reclaim generations OLDER than the one just superseded (and the
    // legacy plain dir once it is no longer the previous generation)
    val keep = Set(gen, currentGen)
    val stale = fs.listStatus(rootP).toSeq.map(_.getPath.getName)
      .filter(n => (n.startsWith(s".gen_${name}_") || n == name) &&
        !keep.contains(n))
    stale.foreach(n =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/$n"), true))
  }

  /** [[scoresAgainstIndex]] for the maintainable format: df joins onto
    * the query-term side (small), which then broadcasts onto the
    * postings — same serving plan shape, stored postings never shuffle.
    * Tombstoned docs drop via an anti-join on the CANDIDATE-sized frame
    * (after the query-term join — the full postings never pay for
    * deletes), and since df/nDocs/avgdl were decremented at delete time,
    * the surviving scores are identical doubles to a rebuild over the
    * reduced corpus (same inputs, same expression tree), so quantized
    * rankings agree — the q159 gate. */
  def scoresAgainstIncIndex(index: IncIndex, queries: DataFrame,
                            queryId: String, queryText: String,
                            k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qterms = queries
      .select(col(queryId).as("qid"),
        explode(array_distinct(T.tokens(col(queryText)))).as("term"))
      .join(index.dfs, Seq("term"))
    val idf = log(lit(1.0) +
      (lit(index.nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val termScore = idf * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(index.avgdl)))
    val cand = index.postings.join(broadcast(qterms), Seq("term"))
    index.tombstones.foldLeft(cand)(
        (c, ts) => c.join(ts, Seq("doc_id"), "left_anti"))
      .select(col("qid"), col("doc_id"), termScore.as("__s"))
      .groupBy("qid", "doc_id")
      .agg(sum(col("__s")).as("score"))
  }

  def topKAgainstIncIndex(index: IncIndex, queries: DataFrame,
                          queryId: String, queryText: String,
                          k: Int, k1: Double = 1.2, b: Double = 0.75,
                          scoreDecimals: Int = 4): DataFrame =
    topKFromScores(
      scoresAgainstIncIndex(index, queries, queryId, queryText, k1, b),
      k, scoreDecimals)
}
