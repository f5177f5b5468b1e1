package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Dataset-curation operators for training-data pipelines: deterministic
  * hash-based splits/sampling and corpus-level TF-IDF term statistics.
  *
  * Everything here is reproducible by construction — splits are a pure
  * function of the row id (never of partitioning, cluster size, or a seed
  * stream like `df.sample`), so the same document lands in the same split
  * on every run and engine, which is what dataset cards require.
  */
object Curate {

  /** Deterministic bucket in [0, buckets): the first 15 hex chars of
    * md5(id ++ salt) as an integer, mod buckets. 15 hex chars = 60 bits,
    * comfortably inside a positive long (ANSI-safe). Changing `salt` derives
    * an independent split from the same ids. */
  def hashBucket(id: Column, buckets: Int, salt: String = ""): Column =
    hashBucketDyn(id, buckets, lit(salt))

  /** Downsample every group to (approximately, deterministically) the
    * size of the SMALLEST group — distribution matching for dataset
    * balancing, the DOWNSAMPLING dual of [[weightedMix]]'s upsampling.
    * A row survives iff `portableHash60(id:salt) mod n_group < n_min`:
    * a per-group keep-rate of exactly n_min/n_group applied by portable
    * md5 arithmetic, so the surviving SET is a pure function of the data
    * (engine/partitioning/cluster-size independent) and a SQL engine
    * replays it verbatim. Survivor counts are Binomial-concentrated
    * around n_min (exact equality would need a per-group rank — a
    * per-group sort this deliberately avoids).
    *
    * Scale shape: one group-count aggregation (group-sized, broadcast
    * back), then a map-side filter — the corpus moves zero times. */
  def matchDistribution(df: DataFrame, groupCol: String, idCol: String,
                        salt: String = ""): DataFrame = {
    // ONE corpus aggregation: collect the group-sized counts, derive the
    // min locally, and broadcast a LOCAL frame back — re-evaluating the
    // counts subtree as the join build side would scan the corpus twice
    val spark = df.sparkSession
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val rows = counts.collect()
    require(rows.nonEmpty, "matchDistribution: empty input")
    val nMin = rows.map(_.getLong(1)).min
    val local = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), counts.schema)
    // NULL-SAFE key join: the aggregation forms a null group (and its
    // count can even BE the minimum) — a plain equi-join would silently
    // drop every null-group row, contradicting "downsample EVERY group"
    df.join(broadcast(local.withColumnRenamed(groupCol, "__g2")),
        col(groupCol) <=> col("__g2"))
      .filter(pmod(portableHash60(concat(col(idCol).cast("string"), lit(salt))),
        col("__n")) < lit(nMin))
      .drop("__g2", "__n")
  }

  /** Downsample to an ARBITRARY target mixture — "40% web, 40% code,
    * 20% books" — the general form of [[matchDistribution]] (which is the
    * all-equal-weights special case). Only downsampling: the achievable
    * scale is c = min_g n_g/w_g (the limiting group keeps everything),
    * and every other group keeps rate c·w_g/n_g via the exact integer
    * rule `hash mod (n_g·w_m) < n_m·w_g` — a cross-multiplied rational,
    * no float thresholds, SQL-replayable verbatim. Groups without a
    * target weight drop entirely.
    *
    * Limiting-group choice: argmin of n_g/w_g ordered by (the DOUBLE
    * ratio, group key) — the double division is a single portable IEEE
    * op both engines compute identically, and exact ratio TIES pick the
    * smallest key deterministically. (Tied groups yield different
    * (modBase, threshold) integer pairs — same keep RATE but different
    * kept SETS — so the tie-break is part of the operator contract.)
    *
    * Scale shape: identical to [[matchDistribution]] — one corpus
    * aggregation, a local broadcast frame, a map-side filter. */
  def matchProportions(df: DataFrame, groupCol: String, idCol: String,
                       targets: Seq[(String, Long)],
                       salt: String = ""): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      "targets must be non-empty with positive weights")
    val spark = df.sparkSession
    import spark.implicits._
    val w = targets.toMap
    val counts = df.filter(col(groupCol).isin(targets.map(_._1): _*))
      .groupBy(col(groupCol).cast("string").as("__gs"))
      .agg(count(lit(1)).as("__n"))
      .as[(String, Long)].collect()
    require(counts.nonEmpty, "matchProportions: no rows in any target group")
    val (nm, wm) = {
      val (g, n) = counts.minBy { case (g, n) => (n.toDouble / w(g), g) }
      (n, w(g))
    }
    val rules = counts.map { case (g, n) => (g, n * wm, nm * w(g)) }
      .toSeq.toDF(groupCol, "__mod", "__thr")
    df.join(broadcast(rules), Seq(groupCol))
      .filter(pmod(portableHash60(concat(col(idCol).cast("string"), lit(salt))),
        col("__mod")) < col("__thr"))
      .drop("__mod", "__thr")
  }

  /** [[hashBucket]] with a per-row (Column) salt — e.g. an epoch index, so
    * each epoch draws an independent deterministic subsample. */
  def hashBucketDyn(id: Column, buckets: Int, salt: Column): Column =
    pmod(portableHash60(concat(id.cast("string"), salt)), lit(buckets.toLong))

  /** Engine-portable 60-bit uniform hash: first 15 hex chars of md5 as a
    * long in [0, 2^60) — any engine with md5 reproduces it bit-for-bit
    * (the property every deterministic-sampling op here leans on). */
  def portableHash60(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 15), 16, 10).cast("long")

  /** Split label from integer weights, e.g. Seq("train" -> 8, "val" -> 1,
    * "test" -> 1): buckets [0,8) → train, [8,9) → val, [9,10) → test. */
  def splitLabel(id: Column, weights: Seq[(String, Int)], salt: String = ""): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    val total = weights.map(_._2).sum
    val b = hashBucket(id, total, salt)
    val lows = weights.scanLeft(0)(_ + _._2).init
    weights.zip(lows).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, w), lo)) => when(b >= lo && b < lo + w, lit(name)).otherwise(acc)
    }
  }

  /** Named deterministic split of `df` by hash of `idCol`. The returned
    * frames are disjoint filters over the same scan — no shuffle at all. */
  def deterministicSplit(df: DataFrame, idCol: String,
                         weights: Seq[(String, Int)], salt: String = ""): Map[String, DataFrame] = {
    val label = splitLabel(col(idCol), weights, salt)
    weights.map { case (name, _) => name -> df.filter(label === name) }.toMap
  }

  /** Leakage-safe split: assign the split from the near-duplicate CLUSTER
    * canonical id, not the row id, so every member of a duplicate cluster
    * lands in the same split (a near-copy of a training doc can never leak
    * into test). `clusters` is the (id, cluster_id) frame of
    * [[graft.dedup.Dedup.duplicateClusters]] — rows absent from it are
    * singletons and act as their own canonical.
    *
    * Scale shape: the cluster frame is the set of DUPLICATED docs only — a
    * small fraction of the corpus — so it broadcasts; the corpus streams
    * map-side with no shuffle, same as [[deterministicSplit]]. Above
    * broadcast size, drop the hint: the join keys on the id, which the
    * dedup pipeline upstream already shuffled on. */
  def leakageSafeSplit(df: DataFrame, idCol: String, clusters: DataFrame,
                       weights: Seq[(String, Int)], salt: String = "",
                       broadcastClusters: Boolean = true): DataFrame = {
    val c0 = clusters.select(col("id").as(idCol), col("cluster_id").as("__canon"))
    val c = if (broadcastClusters) broadcast(c0) else c0
    df.join(c, Seq(idCol), "left")
      .withColumn("__canon", coalesce(col("__canon"), col(idCol)))
      .withColumn("__split", splitLabel(col("__canon"), weights, salt))
      .withColumnRenamed("__canon", "canonical_id")
      .withColumnRenamed("__split", "split")
  }

  /** Deterministic stratified sample: keep a row iff its hash bucket (of
    * 10000) falls under its stratum's fraction. Unknown strata default to
    * `defaultFraction`. Map-side filter only — no shuffle, no seed. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double], defaultFraction: Double = 0.0,
                       salt: String = ""): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    // round before the cast: 0.29 * 10000 = 2899.9999… would truncate to
    // 2899 and silently keep one bucket fewer than documented
    df.filter(hashBucket(col(idCol), 10000, salt) < round(frac * 10000).cast("long"))
  }

  /** Dense 0-based rank of `idCol` values in id order: `(__idx, id)`.
    * Ids must be DISTINCT — rows are ranked, not deduped, so a duplicated
    * id would receive multiple indices. The scalable global-rank shape —
    * range partition + in-partition sort + two-pass zipWithIndex
    * (per-partition counts, then offsets) — with NO single-partition
    * global window. The index is a pure function of the id SET (range
    * boundaries only move rows between partitions, never change the
    * sorted order), so it is deterministic across runs, partitionings,
    * and cluster sizes. */
  def denseIndex(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val idField = df.schema(idCol)
    val sorted = df.select(col(idCol))
      .repartitionByRange(col(idCol)).sortWithinPartitions(col(idCol))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(i, r.get(0)) }
    spark.createDataFrame(rdd, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__idx",
        org.apache.spark.sql.types.LongType, nullable = false),
      idField.copy(name = idCol))))
  }

  /** SEQUENCE PACKING — concatenate weighted rows (documents with token
    * counts) in id order and split the stream at fixed `seqLen`
    * boundaries: the op every LLM training pipeline runs right before
    * writing shards. One span row per (sequence, document) overlap:
    * `(seq_id, id, seq_off, tok_off, span_len)` — a document whose
    * token interval crosses a boundary spills into the next sequence
    * (span rows chain via tok_off), and every sequence except the last
    * is exactly full by construction. All arithmetic is 64-bit integer
    * — nothing to round, nothing to probe.
    *
    * Scale shape: the global exclusive prefix sum uses the
    * [[denseIndex]] device — range partition + in-partition sort +
    * two-pass offsets (per-partition totals collected, #partitions
    * rows) — NO single-partition global window. Deterministic across
    * runs, partitionings, and cluster sizes for the same reason
    * denseIndex is: range boundaries move rows between partitions but
    * never change the global sorted order. Ids must be DISTINCT (the
    * order of equal ids is undefined); rows with weight <= 0 are
    * dropped. */
  def packSequences(df: DataFrame, idCol: String, weightCol: String,
                    seqLen: Long): DataFrame = {
    require(seqLen >= 1, "seqLen must be >= 1")
    val spark = df.sparkSession
    val idField = df.schema(idCol)
    val sorted = df
      .select(col(idCol), col(weightCol).cast("long").as("__w"))
      .filter(col(idCol).isNotNull && col("__w") > 0)
      .repartitionByRange(col(idCol)).sortWithinPartitions(col(idCol))
    val rdd = sorted.rdd
    val partTotals = rdd.mapPartitionsWithIndex { case (pi, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(1))
      Iterator((pi, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val spans = rdd.mapPartitionsWithIndex { case (pi, it) =>
      var cum = bc.value(pi)
      it.flatMap { r =>
        val start = cum
        val w = r.getLong(1)
        cum += w
        val firstSeq = start / seqLen
        val lastSeq = (start + w - 1) / seqLen
        (firstSeq to lastSeq).iterator.map { k =>
          val lo = math.max(start, k * seqLen)
          val hi = math.min(start + w, (k + 1) * seqLen)
          org.apache.spark.sql.Row(k, r.get(0), lo - k * seqLen, lo - start, hi - lo)
        }
      }
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(spans, StructType(Seq(
      StructField("seq_id", LongType, nullable = false),
      idField.copy(name = idCol),
      StructField("seq_off", LongType, nullable = false),
      StructField("tok_off", LongType, nullable = false),
      StructField("span_len", LongType, nullable = false))))
  }

  /** Deterministic negative sampling for retrieval/contrastive training:
    * k pseudo-random corpus documents per query, drawn by portable md5
    * arithmetic — reproducible across engines, runs, and partitionings
    * (the property seed-based `sample` cannot give). Draw for (query,
    * slot) = md5-hash of "qid:slot:salt" mod corpus size, mapped to a doc
    * through the [[denseIndex]]; a draw that lands on the query itself is
    * dropped (documented contract — callers wanting exactly k should
    * over-draw by one slot). Returns (qid, slot, neg_id).
    *
    * Scale shape: the dense index is built once per corpus (and is
    * exactly what you'd persist alongside it); the queries×k draw frame
    * is tiny and broadcasts onto the index join. Corpus ids must be
    * distinct; corpus text never moves. */
  def negativeSamples(corpus: DataFrame, idCol: String,
                      queries: DataFrame, qidCol: String,
                      k: Int, salt: String = ""): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // size from a plain corpus count (scan only) — counting the INDEX
    // would execute the whole range-shuffle + sort + zipWithIndex
    // pipeline once for the count and again for the join below
    val n = corpus.select(col(idCol)).count()
    require(n > 0, "corpus must be non-empty")
    val idx = denseIndex(corpus, idCol)
    val draws = queries.select(col(qidCol).as("qid"))
      .withColumn("slot", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("__draw", pmod(portableHash60(
        concat(col("qid").cast("string"), lit(":"),
          col("slot").cast("string"), lit(":"), lit(salt))), lit(n)))
    broadcast(draws).join(idx, col("__draw") === col("__idx"))
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col("slot"), col(idCol).as("neg_id"))
  }

  /** Deterministic per-group cap — the "at most n documents per domain /
    * language / source" knob of dataset balancing. Survivors are the n
    * rows with the smallest portable hash of (id, salt): a uniform,
    * reproducible choice independent of partitioning, engine, and cluster
    * size (ties broken by id). Runs on the heap top-k plan node
    * ([[graft.plan.TopKPerGroup]]), so the shuffle is bounded at
    * partitions × groups × n rows — full groups are never sorted or
    * collected, which is what makes a cap over a 100 TB corpus with a
    * hot-domain skew feasible.
    *
    * `idCol` must be non-null (and unique for a fully deterministic cap):
    * NULL ids hash to a NULL priority, which sorts first and makes the
    * choice among several null-id rows arbitrary — filter or coalesce ids
    * before capping (same contract as [[tokenBudget]], which enforces it). */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, n: Int,
                  salt: String = ""): DataFrame =
    graft.plan.TopKPerGroup(df,
      Seq(col(groupCol)),
      Seq(portableHash60(concat(col(idCol).cast("string"), lit(salt))).asc,
        col(idCol).asc),
      k = n, rankName = "__rk").drop("__rk")

  /** Deterministic token-budget selection — "give me a reproducible
    * ~N-token subset of this corpus": rows are ranked by the portable hash
    * of (id, salt) and kept while the running sum of `weightCol` stays
    * ≤ `budget` (the first row that would cross the budget, and everything
    * after it, is dropped). Semantically a cumulative-sum window over a
    * GLOBAL (hash, id) ordering — but a global window collapses the corpus
    * onto one partition, so it is computed scale-shaped instead:
    *
    *  1. rows land in `buckets` RANGE buckets by their hash's top bits
    *     (power-of-two bucket count ⇒ an exact `shiftright`, and bucket
    *     order ≡ hash order);
    *  2. one partial aggregation ships `buckets` per-bucket totals to the
    *     driver, whose prefix sum locates the boundary bucket b*: buckets
    *     before it fit entirely, buckets after it are entirely out and
    *     never pay the window;
    *  3. surviving buckets (≤ b*) window WITHIN the bucket — parallel, at
    *     most ~1/buckets of the data per group — plus the broadcast
    *     driver prefix, which makes the running total exact and global.
    *
    * Output = input + `cum_weight` (the exact running total, so the cut
    * is auditable). Integer weights make the result bit-identical to the
    * naive global window (spec-pinned) and SQL-replayable.
    *
    * `weightCol` must be NON-NEGATIVE (token counts are): the boundary
    * search prunes tail buckets on the premise that the running total is
    * monotone, which negative weights would break. NULL weights count as
    * zero (the row is kept, the running total is unchanged). */
  def tokenBudget(df: DataFrame, idCol: String, weightCol: String,
                  budget: Long, salt: String = "", buckets: Int = 1024): DataFrame = {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two >= 2")
    require(budget >= 0, "budget must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val shift = 60 - java.lang.Integer.numberOfTrailingZeros(buckets)
    val w = coalesce(col(weightCol).cast("long"), lit(0L))
    val withPri = df
      .withColumn("__pri", portableHash60(concat(col(idCol).cast("string"), lit(salt))))
      .withColumn("__bkt", shiftright(col("__pri"), shift).cast("int"))
    val totals = withPri.groupBy("__bkt")
      .agg(sum(w).as("t"))
      .collect().map { r =>
        // a NULL id hashes to a NULL priority/bucket: such rows are not
        // rankable under the documented global (hash, id) order, and the
        // null bucket would otherwise surface here as an opaque NPE. The
        // totals collect already scans every bucket, so this check is free.
        require(!r.isNullAt(0),
          s"tokenBudget: NULL $idCol values are not rankable — " +
            "filter or coalesce ids before budgeting")
        r.getInt(0) -> r.getLong(1)
      }.toMap
    val prefix = (0 until buckets).map(b => totals.getOrElse(b, 0L)).scanLeft(0L)(_ + _)
    // boundary bucket: the last one whose preceding prefix still fits
    val bStar = prefix.indexWhere(_ > budget) match {
      case -1 => buckets - 1 // whole corpus fits the budget
      case i  => i - 1
    }
    val spark = df.sparkSession
    import spark.implicits._
    val pre = (0 to bStar).map(b => (b, prefix(b))).toDF("__bkt", "__pre")
    val wb = Window.partitionBy(col("__bkt")).orderBy(col("__pri"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withPri.filter(col("__bkt") <= bStar) // tail buckets never pay the window
      .join(broadcast(pre), Seq("__bkt"))
      .withColumn("cum_weight", sum(w).over(wb) + col("__pre"))
      .filter(col("cum_weight") <= budget)
      .drop("__pri", "__bkt", "__pre")
  }

  /** Deterministic weighted source mixture — the "upsample Wikipedia 2.5×,
    * downsample CommonCrawl to 0.25×" knob of every LLM data recipe,
    * expressed as epoch replication: a row with weight w appears in epochs
    * 0..⌊w⌋−1 unconditionally and in epoch ⌊w⌋ with probability w−⌊w⌋,
    * decided by a hash of (id, epoch) — so each epoch's fractional keep is
    * an INDEPENDENT deterministic subsample, reproducible across runs,
    * engines, and cluster sizes (never `sample(seed)`, which is
    * partitioning-dependent). Weights are per-stratum (source); rows of
    * strata absent from `weights` get `defaultWeight`. Weight 0 drops the
    * stratum. Output = input columns + `epoch` (int).
    *
    * Scale shape: map-side only — a `when` chain for the weight, an explode
    * bounded by ⌈w⌉ (epoch fan-out), and a hash filter; no shuffle, no
    * driver state. */
  def weightedMix(df: DataFrame, idCol: String, strataCol: String,
                  weights: Map[String, Double], defaultWeight: Double = 1.0,
                  salt: String = ""): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w <= 1000),
      "weights must be in [0, 1000] — each unit of weight replicates the stratum once")
    val w = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val full = floor(w).cast("int")
    val frac = w - full
    val lastEpochs = when(frac > 0, lit(1)).otherwise(lit(0))
    val thresh = round(frac * 10000).cast("long")
    df.filter(w > 0)
      .withColumn("epoch", explode(sequence(lit(0), full + lastEpochs - 1)))
      .filter(col("epoch") < full ||
        hashBucketDyn(col(idCol), 10000,
          concat(lit(salt), lit(":"), col("epoch").cast("string"))) < thresh)
  }

  /** Greedy next-fit sequence packing: assign each document's chunks (in
    * chunk order) to training sequences of at most `capacity` tokens — a
    * new sequence starts when the current chunk would overflow the one
    * being filled. An oversized chunk (> capacity alone) gets its own
    * sequence. The packing complement of [[chunkTokens]]: chunker splits
    * docs into model-sized pieces, packer bins the pieces into fixed
    * training rows to minimize padding. Returns the input columns +
    * `seq_idx` (int, per-document sequence number).
    *
    * Scale shape: ONE hash shuffle on the document id + an in-partition
    * sort; the pass itself is a streaming linear scan with per-document
    * reset — no per-group buffering (unlike flatMapGroups, which
    * materializes each group), no driver state. Inherently sequential
    * per document, which is why this is `mapPartitions` and not a window
    * function: reset-on-overflow cumulative sums have no closed form. */
  def packNextFit(chunks: DataFrame, idCol: String, orderCol: String,
                  sizeCol: String, capacity: Int): DataFrame = {
    require(capacity >= 1, "capacity must be >= 1")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val outSchema = StructType(chunks.schema.fields :+
      StructField("seq_idx", IntegerType, nullable = false))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    val idIdx = chunks.schema.fieldIndex(idCol)
    val sizeIdx = chunks.schema.fieldIndex(sizeCol)
    chunks.repartition(col(idCol))
      .sortWithinPartitions(col(idCol), col(orderCol))
      .mapPartitions { it =>
        var curId: Any = null
        var first = true
        var acc = 0
        var seq = 0
        it.map { r =>
          val n = r.getAs[Number](sizeIdx).intValue()
          val id = r.get(idIdx)
          if (first || id != curId) { curId = id; first = false; seq = 0; acc = n }
          else if (acc + n > capacity) { seq += 1; acc = n }
          else acc += n
          Row.fromSeq(r.toSeq :+ seq)
        }
      }.toDF()
  }

  /** Best-fit-decreasing sequence packing within each group: the group's
    * items sort by (size DESC, `orderCol` ASC) and each goes into the
    * open bin with the LEAST remaining room that still fits — i.e. the
    * largest current load ≤ capacity − size, ties broken by the
    * lowest-numbered bin — opening a new bin only when none fits. The
    * padding-minimizing middle between [[packNextFit]] (streaming, never
    * reuses an earlier bin) and exact bin packing (NP-hard): the classic
    * BFD guarantee is ≤ 11/9·OPT + 2/3 bins vs next-fit's 2·OPT.
    * Oversized items (> capacity alone) get their own bin, like
    * packNextFit. Returns the input columns + `seq_idx` (int, per-group
    * bin number in bin-creation order). Deterministic, integer-only —
    * the same greedy replays exactly in SQL (q181's unrolled oracle).
    *
    * Scale shape: ONE hash shuffle on the group id + an in-partition
    * sort; each group buffers only ITS items (the per-partition bin pool
    * is bounded by the group's item count — documents, not the corpus),
    * then a linear best-fit scan over ≤ items bins. `orderCol` and
    * `sizeCol` must be numeric. Padding companion: [[paddingStats]]. */
  def packBestFitDecreasing(items: DataFrame, idCol: String, orderCol: String,
                            sizeCol: String, capacity: Long): DataFrame = {
    require(capacity >= 1, "capacity must be >= 1")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val outSchema = StructType(items.schema.fields :+
      StructField("seq_idx", IntegerType, nullable = false))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    val idIdx = items.schema.fieldIndex(idCol)
    val sizeIdx = items.schema.fieldIndex(sizeCol)
    val ordIdx = items.schema.fieldIndex(orderCol)
    items.repartition(col(idCol)).sortWithinPartitions(col(idCol))
      .mapPartitions { it =>
        val buf = new scala.collection.mutable.ArrayBuffer[Row]()
        var curId: Any = null
        var started = false
        def flush(): Iterator[Row] = {
          if (buf.isEmpty) Iterator.empty
          else {
            val sorted = buf.sortBy(r =>
              (-r.getAs[Number](sizeIdx).longValue(),
                r.getAs[Number](ordIdx).longValue()))
            val bins = new scala.collection.mutable.ArrayBuffer[Long]()
            val out = sorted.map { r =>
              val sz = r.getAs[Number](sizeIdx).longValue()
              var best = -1
              var i = 0
              while (i < bins.length) {
                if (bins(i) + sz <= capacity &&
                    (best < 0 || bins(i) > bins(best))) best = i
                i += 1
              }
              val idx =
                if (best >= 0) { bins(best) += sz; best }
                else { bins += sz; bins.length - 1 }
              Row.fromSeq(r.toSeq :+ idx)
            }.toVector
            buf.clear()
            out.iterator
          }
        }
        new Iterator[Row] {
          private var pending: Iterator[Row] = Iterator.empty
          def hasNext: Boolean = {
            while (!pending.hasNext && it.hasNext) {
              val r = it.next()
              val id = r.get(idIdx)
              if (!started) { started = true; curId = id; buf += r.copy() }
              else if (id != curId) {
                val done = flush(); curId = id; buf += r.copy(); pending = done
              } else buf += r.copy()
            }
            if (!pending.hasNext && !it.hasNext && buf.nonEmpty) pending = flush()
            pending.hasNext
          }
          def next(): Row = pending.next()
        }
      }.toDF()
  }

  /** Per-group packing quality for any packer output: bin count, packed
    * token total, and the padding fraction in integer BASIS POINTS —
    * (n_seqs·capacity − Σsize)·10000 div (n_seqs·capacity) — so the
    * next-fit / best-fit tradeoff is measurable with no float-tie risk
    * (negative only if oversized items exceed capacity, where padding is
    * ill-defined anyway). */
  def paddingStats(packed: DataFrame, idCol: String, sizeCol: String,
                   seqCol: String, capacity: Long): DataFrame =
    packed.groupBy(col(idCol))
      .agg((max(col(seqCol)).cast("long") + 1L).as("n_seqs"),
        sum(col(sizeCol).cast("long")).as("sum_tokens"))
      .withColumn("pad_bp",
        expr(s"(n_seqs * ${capacity}L - sum_tokens) * 10000 div (n_seqs * ${capacity}L)"))

  /** Token-window chunker: split each document into training sequences of
    * at most `maxTokens` tokens with `overlap` tokens of context carried
    * between consecutive chunks (stride = maxTokens − overlap). The
    * sequence-packing front door of every LLM data pipeline. Returns
    * (id, chunk_idx, chunk_text, n_tokens); empty docs produce no chunks.
    * Map-side only — no shuffle. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens >= 1 && overlap >= 0 && overlap < maxTokens,
      "need maxTokens >= 1 and 0 <= overlap < maxTokens")
    val stride = maxTokens - overlap
    val toks = T.tokens(col(textCol))
    // native strided-chunk kernel — the HOF transform-over-sequence form
    // captures the tokenizer inside the lambda and re-tokenizes per chunk
    docs.filter(size(T.tokens(col(textCol))) > 0)
      .select(col(idCol).as("id"),
        posexplode(graft.functions.expressions.TextExpressions
          .tokenChunks(toks, maxTokens, stride))
          .as(Seq("chunk_idx", "chunk_text")))
      .withColumn("n_tokens", size(T.tokens(col("chunk_text"))))
  }

  /** Self-trained bigram language-model score per document: the corpus's
    * own bigram distribution scores each doc by mean log P(w2 | w1) — the
    * classic cheap perplexity filter (gibberish and shuffled text score
    * low; text matching the corpus's phrase statistics scores high).
    * Documents with fewer than two tokens drop (no bigrams).
    *
    * Shuffle profile: the tokenize+explode of the corpus — the expensive
    * stage — runs exactly ONCE: it is immediately aggregated to per-doc
    * gram counts, and BOTH the model side (gram counts → conditional
    * probabilities) and the scoring side (count-weighted mean) consume
    * that same aggregation, so Spark's exchange reuse executes the
    * scan→explode→shuffle subtree a single time (PlanSpec pins the
    * ReusedExchange). Downstream shuffles are vocabulary-shaped, never
    * corpus-shaped: one (gram) aggregation for counts, one (first-word)
    * aggregation for denominators, a vocabulary-sized join back, then one
    * (doc) weighted mean — Σ c·ln p / Σ c ≡ the per-instance average. */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = T.tokens(col(textCol))
    // per-(doc, gram) counts: the single corpus pass both sides share.
    // The explicit isnotnull filters pre-seed exactly the constraints the
    // downstream joins would infer per-consumer — without them each consumer
    // pushes a DIFFERENT null filter into its copy of this subtree and the
    // exchanges stop being identical, which silently disables the reuse.
    val bgc = docs
      .select(col(idCol).as("id"),
        explode(when(size(toks) >= 2, T.wordShingles(col(textCol), 2))
          .otherwise(array().cast("array<string>"))).as("g"))
      .filter(col("g").isNotNull && split(col("g"), " ")(0).isNotNull)
      .groupBy("id", "g").agg(count(lit(1)).as("dc"))
    val cnt = bgc.groupBy("g").agg(sum(col("dc")).as("c"))
    val uni = cnt.groupBy(split(col("g"), " ")(0).as("w")).agg(sum(col("c")).as("cw"))
    val probs = cnt.join(uni, split(cnt("g"), " ")(0) === uni("w"))
      .select(col("g"), (col("c").cast("double") / col("cw")).as("p"))
    bgc.join(probs, "g")
      .groupBy("id")
      .agg((sum(col("dc") * log(col("p"))) / sum(col("dc"))).as("bigram_logprob"))
  }

  /** Corpus TF-IDF per (document, term): tf = in-doc term count, df = number
    * of documents containing the term, tfidf = tf · (ln((N+1)/(df+1)) + 1)
    * (smoothed so benchmark-absent terms stay finite).
    *
    * Shuffle profile at scale: explode is map-side; one shuffle to
    * (id, term) for tf; df aggregates the already-distinct tf pairs by term
    * (second, vocabulary-sized shuffle); the idf join shuffles on term and
    * AQE flips it to broadcast when the vocabulary is small. The corpus
    * row count is one scalar agg. */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = docs.count()
    val terms = docs.select(col(idCol).as("id"), explode(T.tokens(col(textCol))).as("term"))
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "term")
      .select(col("id"), col("term"), col("tf"), col("df"),
        (col("tf") * (log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0)).as("tfidf"))
  }

  /** Collapse consecutive repeated tokens within each document ("a a the"
    * → "a the") — the classic intra-document repetition cleaner (generation
    * artifacts, stutter, copy-paste runs). Complements
    * [[graft.dedup.Dedup.stripDuplicatedSegments]], which removes
    * CROSS-document boilerplate; this removes WITHIN-document runs.
    *
    * Scale shape: pure map-side — one native linear-pass kernel per row
    * ([[graft.functions.expressions.CollapseRunsExpr]]), no explode, no
    * shuffle, no corpus state (plan-shape guarded). NOT the HOF
    * `filter(toks, (t, i) => t =!= element_at(toks, i))`: capturing the
    * tokenizer expression inside the lambda re-evaluates it per ELEMENT
    * — O(n²) regex splits per document, measured 20× slower on q88.
    * Output: id, clean_text, n_tokens (original), n_collapsed (removed). */
  def collapseRepeatTokens(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = T.tokens(col(textCol))
    val kept = graft.functions.expressions.TextExpressions.collapseRuns(toks)
    df.select(col(idCol).as("id"),
      array_join(kept, " ").as("clean_text"),
      size(toks).as("n_tokens"),
      (size(toks) - size(kept)).as("n_collapsed"))
  }

  /** The corpus's `topK` most frequent tokens, ties broken by token
    * ascending — a deterministic reference vocabulary. Bounded driver
    * collect (topK rows), like IVF centroids. */
  def topVocabulary(df: DataFrame, textCol: String, topK: Int): Seq[String] = {
    require(topK >= 1, "topK must be >= 1")
    df.select(explode(T.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(topK).collect().map(_.getString(0)).toSeq
  }

  /** Vocabulary coverage per document: what fraction of a document's
    * tokens fall in the corpus's top-`topK` vocabulary — the cheap
    * lexical-quality filter (garbled or off-domain text scores low).
    * `cover_bp` is integer basis points, `(10000 · n_in_vocab) div
    * n_tokens` — integer-exact, so cross-engine replay never hits a
    * float-rounding tie. Zero-token documents score 0.
    *
    * Scale shape: one vocabulary aggregation (token-distinct-sized
    * shuffle + bounded topK collect), then map-side scoring via an InSet
    * probe per token — the corpus is never exploded a second time and
    * never shuffles. */
  def vocabCoverage(df: DataFrame, idCol: String, textCol: String,
                    topK: Int = 1000): DataFrame = {
    val vocab = topVocabulary(df, textCol, topK)
    val toks = T.tokens(col(textCol))
    val inVocab = size(filter(toks, t => t.isInCollection(vocab)))
    df.select(col(idCol).as("id"),
        size(toks).as("n_tokens"), inVocab.as("n_in_vocab"))
      .withColumn("cover_bp", when(col("n_tokens") === 0, lit(0L))
        .otherwise(expr("(CAST(n_in_vocab AS BIGINT) * 10000) div n_tokens")))
  }
}
