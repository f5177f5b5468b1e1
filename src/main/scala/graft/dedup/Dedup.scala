package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{SimilarityFunctions => S, TextFunctions => T}

/** Document deduplication for training-data pipelines, at three cost tiers:
  *
  *  1. exact     — one hash-shuffle; O(N).
  *  2. near-dup  — MinHash/SimHash banding: candidates only collide within a
  *                 band bucket, so the pairwise verify is confined to tiny
  *                 buckets. Never materializes the N² pair space — the only
  *                 shape that survives 100 TB.
  *  3. embedding — cosine near-dup over an embedding column (delegates
  *                 bucketing to [[graft.ann.Ann]]-style LSH).
  *
  * All candidate-pair outputs use (id_keep < id_dup) ordering so results are
  * deterministic sets.
  */
object Dedup {

  /** Compute-bound stages (signature hashing) must not inherit the scan's
    * split count: a small single-file table arrives as ONE partition and
    * serializes the whole kernel onto one core. When the input has fewer
    * partitions than the cluster has slots, scatter it first; when splits
    * are plentiful (any real at-scale input) this is a no-op — no shuffle
    * is added. */
  private[graft] def ensureParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }

  /** Degenerate-bucket guard: a bucket with B members expands to B² pairs,
    * so one pathological hash collision (boilerplate docs, zero vectors)
    * can dominate the whole job. Buckets above `maxBucketSize` are dropped
    * from candidate generation — their members are (by construction)
    * near-identical to thousands of others and are better handled by the
    * exact-dedup tier first. The count rides the same (bucket) shuffle the
    * pair join needs, so the guard adds no extra exchange. */
  private def capBuckets(banded: DataFrame, keys: Seq[String], maxBucketSize: Int): DataFrame = {
    if (maxBucketSize == Int.MaxValue) banded
    else {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
      banded.withColumn("__bucket_n", count(lit(1)).over(w))
        .filter(col("__bucket_n") <= maxBucketSize)
        .drop("__bucket_n")
    }
  }

  /** Exact dedup on a content column: md5-group, keep the smallest id.
    * Single shuffle on the 128-bit content hash — at 100 TB, hash first so
    * the shuffle carries (hash, id), not the document bytes. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("text_hash"), col(idCol))
      .groupBy("text_hash")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Rows of `df` surviving exact dedup (the min-id representative of each
    * distinct content hash). */
  def exactSurvivors(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exact(df, idCol, textCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** MinHash-LSH candidate pairs: shingle → k-permutation signature →
    * `bands` band hashes → explode → self-join per (band, hash) bucket →
    * verify with the signature-estimated Jaccard. Returns
    * (id_a, id_b, est_jaccard) with id_a < id_b, deduped across bands.
    *
    * Shuffle profile: one explode+shuffle on band hash (k·N/bands rows),
    * bucket-local pair expansion — no global cross join. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleLen: Int = 3, k: Int = 64, bands: Int = 16,
                   threshold: Double = 0.7,
                   maxBucketSize: Int = 10000): DataFrame = {
    val sigs = ensureParallelism(df.select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"),
        S.minhashSignature(T.wordShingles(col("__text"), shingleLen), k).as("sig"))
    minhashPairsFromSignatures(sigs, k, bands, threshold, maxBucketSize)
  }

  /** LSH pair generation over a precomputed `(id, sig)` frame — the shape
    * used when signatures are stored (or shared with another phase). The
    * frame is persisted here so both self-join branches read cached rows
    * instead of recomputing upstream hashing; at cluster scale this stage
    * reads the signature table instead. */
  def minhashPairsFromSignatures(sigFrame: DataFrame, k: Int, bands: Int,
                                 threshold: Double,
                                 maxBucketSize: Int = 10000): DataFrame = {
    val sigs = sigFrame.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = capBuckets(sigs.select(col("id"), col("sig"),
      posexplode(S.minhashBands(col("sig"), k, bands)).as(Seq("band", "bhash"))),
      Seq("band", "bhash"), maxBucketSize)
    val a = banded.select(col("band"), col("bhash"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bhash"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bhash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), S.minhashJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .groupBy("id_a", "id_b").agg(max("est_jaccard").as("est_jaccard"))
  }

  /** SimHash near-dup candidate pairs: 64-bit fingerprint, banded into four
    * 16-bit chunks (any equal chunk ⇒ candidate; catches all pairs within
    * Hamming distance 3 by pigeonhole), verified by exact Hamming distance. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucketSize: Int = 10000): DataFrame = {
    val fp = ensureParallelism(df.select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"), S.simhash(T.tokens(col("__text"))).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunks = (0 until 4).map(i =>
      shiftright(col("fp"), i * 16).bitwiseAND(lit(0xFFFFL)).as(s"c$i"))
    val banded = capBuckets(fp.select(col("id") +: col("fp") +: chunks: _*)
      .select(col("id"), col("fp"),
        posexplode(array((0 until 4).map(i => col(s"c$i")): _*)).as(Seq("band", "chunk"))),
      Seq("band", "chunk"), maxBucketSize)
    val a = banded.select(col("band"), col("chunk"), col("id").as("id_a"), col("fp").as("fp_a"))
    val b = banded.select(col("band"), col("chunk"), col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), S.hamming64(col("fp_a"), col("fp_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
  }

  /** Survivor selection over near-dup pairs: keep-smallest-id — any doc
    * appearing as the larger side of a pair is dropped. For chains
    * a<b<c with pairs (a,b),(b,c), both b and c drop and a survives; this
    * keep-first policy is the standard large-scale choice (full connected
    * components cost iterative joins for marginal benefit). */
  def nearDupSurvivors(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("id_b").as(idCol)).distinct(), Seq(idCol), "left_anti")

  /** Exact n-gram Jaccard over MinHash-generated candidates: the LSH pass
    * proposes pairs, then the true shingle-set Jaccard verifies them.
    * This is the standard two-phase shape — cheap recall, exact precision —
    * that avoids ever computing N² true Jaccards. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleLen: Int = 3, threshold: Double = 0.8,
                        k: Int = 64, bands: Int = 16): DataFrame = {
    // Recall phase over the whole corpus; the exact-jaccard verify phase
    // then recomputes shingles ONLY for the candidate ids (broadcast
    // semi-join prune) — at 100 TB the candidates are orders of magnitude
    // smaller than the corpus, so the verify side never touches the rest.
    val candidates = minhashPairs(df, idCol, textCol, shingleLen, k, bands,
        threshold = threshold * 0.7) // lower LSH bar: recall phase
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candIds = candidates
      .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val sh = df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .join(broadcast(candIds), Seq("id"), "left_semi")
      .select(col("id"), array_distinct(T.wordShingles(col("__text"), shingleLen)).as("sh"))
    candidates
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"), S.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Benchmark decontamination report (GPT-3/PaLM style): for each corpus
    * document, the number of distinct word n-grams it shares with ANY
    * benchmark document. Documents with overlap are contamination suspects
    * and should be dropped (or audited) before training.
    *
    * Scale shape: the benchmark gram set is tiny relative to a 100 TB corpus
    * (eval suites are MBs), so it is collected into a broadcast hash join —
    * the corpus streams through map-side with NO shuffle of document bytes;
    * the only exchange is the per-doc count aggregation over matching grams
    * (a vanishingly small subset). Default n=13 is the published standard;
    * lower it for short-document corpora. */
  def contaminationReport(corpus: DataFrame, benchmark: DataFrame,
                          idCol: String, textCol: String, n: Int = 13): DataFrame = {
    val bg = benchmark
      .select(explode(array_distinct(T.wordShingles(col(textCol), n))).as("g"))
      .distinct()
    val dg = ensureParallelism(corpus.select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"), explode(array_distinct(T.wordShingles(col("__text"), n))).as("g"))
    dg.join(broadcast(bg), Seq("g"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_shared_ngrams"))
  }

  /** Corpus rows surviving decontamination: drop any document sharing at
    * least `minOverlap` distinct n-grams with the benchmark set. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String, n: Int = 13,
                    minOverlap: Int = 1): DataFrame = {
    val flagged = contaminationReport(corpus, benchmark, idCol, textCol, n)
      .filter(col("n_shared_ngrams") >= minOverlap)
      .select(col("id").as(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }

  /** Embedding cosine near-dup pairs via random-hyperplane LSH bucketing
    * (see [[graft.ann.Ann.hyperplaneSignature]]): vectors sharing a
    * signature bucket are verified with exact double-precision cosine. */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double = 0.9, planes: Int = 12,
                     dim: Int = 64, maxBucketSize: Int = 10000): DataFrame = {
    val withSig = capBuckets(
      ensureParallelism(df.select(col(idCol).as("id"), col(vecCol).as("vec")))
        .select(col("id"), col("vec"),
          graft.ann.Ann.hyperplaneSignature(col("vec"), dim, planes).as("bucket")),
      Seq("bucket"), maxBucketSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = withSig.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = withSig.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), S.cosine(col("vec_a"), col("vec_b")).as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy("id_a", "id_b").agg(max("cos").as("cos"))
  }
}
