package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}

import graft.functions.{SimilarityFunctions => S}

/** IVF (inverted-file) approximate nearest-neighbor search — the coarse-
  * quantizer alternative to hyperplane LSH ([[Ann.lshTopK]]).
  *
  * Index build = a deterministic mini-KMeans: centroids init from the
  * corpus rows with the smallest portable hash (no RNG — reruns produce
  * the same index), a few Lloyd iterations, then each corpus vector is
  * assigned to its nearest centroid. Search probes the `nProbes` nearest
  * centroid cells per query.
  *
  * ALL centroid math happens in a quantized integer space: vectors are
  * snapped to a 1/[[Ivf.QScale]] grid (`floor(x·QScale + 0.5)` per
  * component — an exact, engine-portable double op), Lloyd sums accumulate
  * as exact `array<bigint>` ([[graft.functions.expressions.VecSumLongAgg]];
  * integer addition is order-independent, so the fit is a pure function of
  * the data, not of partitioning), and centroid components are the exact
  * double quotients sum/count. That makes the whole fit replayable
  * verbatim in another SQL engine — the q34/q68 DuckDB oracles unroll
  * init + Lloyd rounds and hash-match. Final candidate SCORING still uses
  * the raw un-quantized vectors (cosine), so quantization only perturbs
  * cell boundaries, not result quality.
  *
  * Scale shape: centroids are always driver-small (√N-ish), broadcast into
  * a native expression for assignment — the corpus is only ever scanned
  * linearly, shuffled once by cell id, and compared within probed cells.
  * The Lloyd update is ONE aggregation per iteration, partial-aggregated
  * map-side, means formed on the driver.
  */
object Ivf {

  /** Vector quantization scale for centroid math: components snap to a
    * 1e-6 grid. Embedding components are O(1), so quantized magnitudes are
    * ≤ ~1e6 and per-cell bigint sums have ~9e12-row headroom. */
  val QScale: Double = 1e6

  /** Centroid components live in the QUANTIZED space (× [[QScale]]); each
    * value is an exact integer-sum / count double quotient. */
  case class Model(centroids: Array[Array[Double]]) {
    def numCells: Int = centroids.length
  }

  /** Deterministic KMeans fit over an `array<float|double>` column. */
  def fit(corpus: DataFrame, idCol: String, vecCol: String,
          numCells: Int, iterations: Int = 3): Model = {
    // Deterministic pseudo-random init: vectors with the smallest
    // md5(quantized vector) — md5 of the comma-joined bigint components,
    // an engine-portable total order (the oracle replays it with
    // array_to_string + md5). Hashing the VECTOR (not the id) makes
    // exact-dup embeddings — present in real corpora and in this one by
    // design — collide instead of seeding identical centroids
    // (⇒ permanently empty cells), and makes limit-boundary ties harmless
    // (a tie IS the same vector, and duplicates carry the same hash, so
    // driver-side distinctBy removes them regardless of which copy the
    // limit kept). Distinctness is enforced on an 8× oversample driver-
    // side: a corpus-wide dropDuplicates would shuffle the whole corpus
    // just for init. orderBy+limit plans as TakeOrderedAndProject — a
    // distributed per-partition top-k + driver merge, unlike a global
    // row_number window which drags the whole corpus onto one partition.
    val over = math.max(numCells * 8, numCells + 64)
    val distinctVecs = corpus
      .select(quantize(col(vecCol)).as("q"))
      .filter(col("q").isNotNull)
    def smallestByHash(src: DataFrame, n: Int) = src
      .withColumn("__h", md5(concat_ws(",", col("q").cast(ArrayType(StringType)))))
      .orderBy("__h").limit(n)
      .select("q").collect()
      .map(_.getSeq[Long](0).toArray)
      .distinctBy(_.toSeq)
    var init = smallestByHash(distinctVecs, over).take(numCells)
    if (init.length < numCells) {
      // mass-duplicated corpus: the oversample window was all copies.
      // Fall back to an exact corpus-wide distinct — one extra shuffle on
      // the RARE degenerate path only; the model then has min(distinct,
      // numCells) cells (correct; duplicate centroids would not be).
      init = smallestByHash(distinctVecs.distinct(), numCells)
    }
    require(init.length >= 1, s"no non-null vectors in $vecCol")

    var centroids = init.map(_.map(_.toDouble))
    var it = 0
    while (it < iterations) {
      val dim = centroids(0).length
      // Lloyd update in ONE aggregation: exact elementwise bigint-vector
      // sum + count per cell (VecSumLongAgg partial-aggregates map-side),
      // mean formed on the driver. Cells can be empty -> keep previous
      // centroid.
      val sums = corpus.filter(col(vecCol).isNotNull)
        .select(
          quantize(col(vecCol)).as("q"),
          nearestCells(col(vecCol), Model(centroids), 1)(0).as("cell"))
        .groupBy("cell")
        .agg(graft.functions.expressions.VecSumLongAgg.vecSumLong(col("q"), dim).as("s"),
          count(lit(1)).as("cnt"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        val cell = r.getInt(0)
        val s = r.getSeq[Long](1)
        val cnt = r.getLong(2)
        var d = 0
        while (d < dim) { next(cell)(d) = s(d).toDouble / cnt; d += 1 }
      }
      centroids = next
      it += 1
    }
    Model(centroids)
  }

  /** `array<float|double>` → quantized `array<bigint>` (× [[QScale]]). */
  def quantize(vec: Column): Column =
    ExpressionUtils.column(QuantizeVecExpr(ExpressionUtils.expression(vec)))

  /** Column of the `nProbes` nearest cell ids (ascending distance). */
  def nearestCells(vec: Column, model: Model, nProbes: Int): Column =
    ExpressionUtils.column(
      NearestCellsExpr(ExpressionUtils.expression(vec), model.centroids, nProbes))

  /** Assign every row its cell id — the stored index at scale. */
  def assign(corpus: DataFrame, vecCol: String, model: Model): DataFrame =
    graft.dedup.Dedup.ensureParallelism(corpus)
      .withColumn("cell", nearestCells(col(vecCol), model, 1)(0))

  /** Top-k by cosine within the probed cells. */
  def topK(corpus: DataFrame, queries: DataFrame, model: Model,
           corpusId: String, corpusVec: String,
           queryId: String, queryVec: String,
           k: Int, nProbes: Int = 3): DataFrame =
    // single consumer — at scale the assigned index is a stored table the
    // caller materializes once (assign() + save); persisting here would
    // only slow the one-shot query path.
    topKAgainstIndex(
      assign(corpus, corpusVec, model)
        .select(col(corpusId).as("nid"), col(corpusVec).as("nvec"), col("cell")),
      queries, model, queryId, queryVec, k, nProbes)

  /** Serve top-k from a PRE-ASSIGNED index table `(nid, nvec, cell)` —
    * the stored-artifact path: [[assign]] once, [[save]] the model next to
    * the index table, then every query batch joins the (cell-bucketed)
    * index without rescanning or re-quantizing the corpus. Queries
    * broadcast; the corpus side is touched only in the probed cells.
    * `tombstones` (a `nid` id frame from [[deleteFromIndex]]) is
    * anti-joined on the CANDIDATE-sized frame — probed cells × queries,
    * never the stored index — so deletes cost nothing at serve time
    * beyond the id filter (the [[graft.curate.Bm25.topKAgainstIncIndex]]
    * device applied to the ANN tier). */
  def topKAgainstIndex(index: DataFrame, queries: DataFrame, model: Model,
                       queryId: String, queryVec: String,
                       k: Int, nProbes: Int = 3,
                       tombstones: Option[DataFrame] = None): DataFrame = {
    val q = queries.select(col(queryId).as("qid"), col(queryVec).as("qvec"),
        explode(nearestCells(col(queryVec), model, nProbes)).as("cell"))
    val cand = index.join(broadcast(q), Seq("cell"))
      .filter(col("qid") =!= col("nid"))
    val scored = tombstones.foldLeft(cand)((c, ts) =>
        c.join(ts.select(col(ts.columns.head).as("nid")), Seq("nid"), "left_anti"))
      .select(col("qid"), col("nid"), S.cosine(col("qvec"), col("nvec")).as("cos"))
      .groupBy("qid", "nid").agg(max("cos").as("cos"))
    // heap top-k ([[graft.plan.TopKPerGroup]]), not a row_number window: a
    // window would shuffle + SORT the full probed-candidate set per qid; the
    // heap node bounds shuffle volume at partitions × queries × k. Ranking
    // semantics identical (same order keys, same tie-break), pinned by
    // IvfSpec's plan-shape test and the unchanged q34/q156 oracles.
    graft.plan.TopKPerGroup(scored, Seq(col("qid")),
      Seq(col("cos").desc, col("nid").asc), k, rankName = "rank")
  }

  /** Append a vector batch to a STORED index table against the STORED
    * model — the maintainable-index op (the [[graft.curate.Bm25
    * .appendIncIndex]] twin for the ANN tier): assignment is a pure
    * function of (vector, frozen model), so appending batches assigned
    * with the loaded model yields an index IDENTICAL to re-assigning the
    * full corpus — the stored rows are never read, rewritten, or
    * shuffled, and the append is O(batch). The model is deliberately NOT
    * re-fit here: refresh it when [[assignmentDrift]] alarms. Batch ids
    * must be disjoint from the stored index (same admission precondition
    * as the dedup/BM25 index appends). */
  def appendToIndex(spark: org.apache.spark.sql.SparkSession,
                    indexPath: String, modelPath: String,
                    newRows: DataFrame, idCol: String, vecCol: String): Unit = {
    val model = load(spark, modelPath)
    assign(newRows.filter(col(vecCol).isNotNull), vecCol, model)
      .select(col(idCol).as("nid"), col(vecCol).as("nvec"), col("cell"))
      // REBALANCE before the write: assignment runs at full parallelism,
      // the batch lands in adaptively-sized files instead of one file per
      // compute partition (near-empty at small batch sizes; every serve
      // pays a task per file otherwise)
      .hint("rebalance")
      .write.mode("append").parquet(indexPath)
  }

  /** Remove vectors from a STORED index without touching stored rows —
    * the [[graft.curate.Bm25.deleteFromIncIndex]] twin for the ANN tier
    * (takedowns / post-hoc dedup rejections at 100 TB cannot afford an
    * index rewrite). Ids land in `indexPath/_tombstones` — the
    * underscore prefix makes the subdirectory invisible to
    * `spark.read.parquet(indexPath)` (Hadoop's hidden-file filter), so
    * existing readers of the index table are unaffected; serving passes
    * [[tombstonesOf]] to [[topKAgainstIndex]], which anti-joins on the
    * candidate-sized frame. Unlike BM25 there is no derived df/stats
    * state to decrement — cosine scores are per-pair — so the delete is
    * O(ids): one id-frame anti-join (idempotence: re-deleting an id is a
    * no-op) and one append. Single-writer, like [[appendToIndex]]. */
  def deleteFromIndex(spark: org.apache.spark.sql.SparkSession,
                      indexPath: String, ids: DataFrame, idCol: String): Unit = {
    val req = tombstonesOf(spark, indexPath).foldLeft(
      ids.select(col(idCol).as("nid")).distinct())(
      (r, ts) => r.join(ts, Seq("nid"), "left_anti"))
    req.write.mode("append").parquet(s"$indexPath/_tombstones")
  }

  /** The tombstone id frame of a stored index (column `nid`), if any
    * deletes have been issued — pass to [[topKAgainstIndex]]. Serving
    * entry point, so it first heals a [[compactIndex]] crash stranded
    * between its two renames. */
  def tombstonesOf(spark: org.apache.spark.sql.SparkSession,
                   indexPath: String): Option[DataFrame] = {
    recoverCompaction(spark, indexPath)
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/_tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Heal a [[compactIndex]] crash: between rename(dst→old) and
    * rename(tmp→dst) the index path does NOT exist (live data stranded in
    * `.old_`/`.tmp_` siblings — readers in that window fail). The tmp
    * directory was fully written BEFORE any rename, so recovery completes
    * the swap (rename tmp→dst, drop old); if tmp is somehow gone, the old
    * directory rolls back verbatim. When the index path exists it only
    * reclaims a crash-orphaned `.old_` copy (a kill between the final
    * rename and the cleanup) — otherwise a no-op. Concurrent healers are
    * safe: a failed rename re-checks dst before throwing (two readers,
    * or a reader racing the compacting writer, may complete the same
    * swap). Returns true when a STRANDED state was healed (ADVICE r9). */
  def recoverCompaction(spark: org.apache.spark.sql.SparkSession,
                        indexPath: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(indexPath)
    val fs = dst.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(dst.getParent, s".tmp_${dst.getName}")
    val old = new org.apache.hadoop.fs.Path(dst.getParent, s".old_${dst.getName}")
    if (fs.exists(dst)) {
      // committed swap: dst existing is the invariant — but a crash
      // between the final rename and the old-dir cleanup leaves a
      // full-index-sized .old_ orphan (with its _tombstones) that no
      // later code path reclaims unless tombstones accumulate again.
      // Reclaim it here; report false (nothing was STRANDED).
      if (fs.exists(old)) fs.delete(old, true)
      false
    } else if (!fs.exists(old)) false
    else if (fs.exists(tmp)) {
      // a concurrent reader/writer may heal the same window first: a
      // failed rename with dst now present IS success, not an error
      if (!fs.rename(tmp, dst) && !fs.exists(dst))
        throw new java.io.IOException(s"failed to complete compaction swap at $dst")
      fs.delete(old, true); true
    } else {
      if (!fs.rename(old, dst) && !fs.exists(dst))
        throw new java.io.IOException(s"failed to roll back compaction at $dst")
      true
    }
  }

  /** Fold tombstones back into storage — the ONE deliberate index
    * rewrite, at the operator's cadence (when the dead fraction makes
    * the serve-time anti-join or the dead-row cell scans noticeable).
    * Live rows materialize into a sibling tmp directory BEFORE any
    * rename (so the rewrite can read the very table it replaces), then
    * two metadata-only renames swap the directories — the
    * [[graft.curate.Bm25]] swapWrite discipline; the tombstone subdir
    * rides out with the old directory, so the swap can never produce a
    * tombstone-less un-compacted index. HONEST crash window: between
    * rename(dst→old) and rename(tmp→dst) the index path does NOT exist
    * and concurrent readers in that window fail; [[recoverCompaction]]
    * (run automatically here and by [[tombstonesOf]]) heals the stranded
    * state by completing the swap from the fully-written tmp — the window
    * costs availability, never durability. A long-lived index that cannot
    * afford it should use [[IvfVersioned]]'s pointer swap instead.
    * Serving is invariant: the anti-join already hid exactly these
    * rows. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
                   indexPath: String): Unit =
    tombstonesOf(spark, indexPath).foreach { ts =>
      val conf = spark.sparkContext.hadoopConfiguration
      val dst = new org.apache.hadoop.fs.Path(indexPath)
      val fs = dst.getFileSystem(conf)
      val tmp = new org.apache.hadoop.fs.Path(dst.getParent, s".tmp_${dst.getName}")
      val old = new org.apache.hadoop.fs.Path(dst.getParent, s".old_${dst.getName}")
      spark.read.parquet(indexPath).join(ts, Seq("nid"), "left_anti")
        .hint("rebalance") // compaction exists to fix file layout — size it
        .write.mode("overwrite").parquet(tmp.toString)
      fs.delete(old, true) // leftover from a previous crash
      if (!fs.rename(dst, old))
        throw new java.io.IOException(s"failed to stage out $dst")
      // a reader running recoverCompaction can complete the swap from
      // tmp in this window — rename failure with dst present is success
      if (!fs.rename(tmp, dst) && !fs.exists(dst))
        throw new java.io.IOException(s"failed to swap $dst")
      fs.delete(old, true)
    }

  /** Centroid-drift alarm for a frozen model: PSI between the stored
    * index's cell-occupancy histogram and a new batch's — when fresh data
    * lands in cells with very different mass than the corpus the model was
    * fit on, the coarse quantizer no longer matches the distribution and a
    * re-fit is due. Cell ids ARE the buckets (exact categories — no
    * [[graft.stats.Drift]] magnitude bucketing, which would collapse
    * adjacent cells), with the same add-half smoothing; each side
    * aggregates once to ≤ numCells rows and the PSI forms on the driver.
    * Conventional read: < 0.1 stable, > 0.25 ⇒ re-fit. */
  def assignmentDrift(index: DataFrame, newAssigned: DataFrame): Double = {
    val rows = index.groupBy("cell").agg(count(lit(1)).as("n_a"))
      .join(newAssigned.groupBy("cell").agg(count(lit(1)).as("n_b")),
        Seq("cell"), "full_outer")
      .select(coalesce(col("n_a"), lit(0L)), coalesce(col("n_b"), lit(0L)))
      .collect()
    if (rows.isEmpty) return 0.0
    val k = rows.length * 0.5
    val ta = rows.map(_.getLong(0)).sum + k
    val tb = rows.map(_.getLong(1)).sum + k
    rows.map { r =>
      val pa = (r.getLong(0) + 0.5) / ta
      val pb = (r.getLong(1) + 0.5) / tb
      (pa - pb) * math.log(pa / pb)
    }.sum
  }

  /** Persist a fitted model as a tiny parquet table `(cell, centroid)` —
    * one file; the model is driver-small by construction. */
  def save(model: Model, spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a model persisted by [[save]]; cell ids order the centroids so
    * stored `cell` assignments in index tables stay valid. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model =
    // by-name selection: a hand-written or evolved model table with a
    // different column order fails with a clear analysis error instead of
    // silently misreading positional fields
    Model(spark.read.parquet(path)
      .select(col("cell").cast("int"), col("centroid").cast("array<double>"))
      .orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray))
}

/** Nearest-centroid ids by euclidean distance, ascending — array<int> of
  * length `nProbes`. Tight loops; centroids ride in the expression (they
  * are driver-small and serialize with the plan). Codegen calls into the
  * expression object so corpus-assignment scans stay inside whole-stage
  * codegen (CodegenFallback would split the span at every IVF assign). */
case class NearestCellsExpr(child: Expression, centroids: Array[Array[Double]], nProbes: Int)
    extends UnaryExpression {

  require(nProbes >= 1, "nProbes must be >= 1")
  // a model can legitimately end up with fewer cells than a caller's probe
  // count (degenerate corpora shrink the fit) — probing every cell is the
  // right semantic then, not a crash at query time
  private val probes = math.min(nProbes, centroids.length)

  def compute(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("nearestCells", this, classOf[NearestCellsExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);"
    })

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val k = centroids.length
    val d2 = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cen = centroids(c)
      val n = math.min(a.numElements(), cen.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        // quantize the input component exactly as Ivf.quantize does —
        // distances compare in the same integer-grid space the centroids
        // live in, so assignment is a function of (quantized data, model)
        val xq = math.floor(
          (if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)) * Ivf.QScale + 0.5)
        val x = xq - cen(i)
        s += x * x
        i += 1
      }
      d2(c) = s
      c += 1
    }
    // sortBy is stable, so equal distances break toward the smaller cell
    // id — the same tie rule the SQL replay uses (ORDER BY d2, cell)
    val idx = Array.tabulate(k)(identity).sortBy(d2)
    new GenericArrayData(idx.take(probes))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<float|double>` → `array<bigint>`: per-component
  * `floor(x·QScale + 0.5)` — the exact scalar double op every engine
  * computes bit-identically, so quantized vectors (and everything derived
  * from them: init hashes, Lloyd sums, centroids) are engine-portable.
  * Native with codegen so fit-time corpus scans stay in whole-stage spans. */
case class QuantizeVecExpr(child: Expression) extends UnaryExpression {

  def compute(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("quantizeVec", this, classOf[QuantizeVecExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);"
    })

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(
        (if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)) * Ivf.QScale + 0.5).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
