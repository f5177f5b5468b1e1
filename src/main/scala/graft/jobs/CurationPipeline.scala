package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.curate.Curate
import graft.dedup.Dedup
import graft.functions.{TextFunctions => T}

/** End-to-end training-data curation pipeline — the composition a user of
  * the engine actually runs over a raw document corpus:
  *
  *  1. clean     — control-char strip, PII redaction, whitespace collapse
  *  2. filter    — quality score, repetition, char entropy, language
  *  3. dedup     — exact tier, then MinHash-LSH near-dup survivors
  *  4. decontam  — drop docs sharing n-grams with a benchmark set
  *                 (Bloom-prefiltered when the gram set is large)
  *  5. mix       — per-source weighted epoch replication (optional)
  *  6. split     — deterministic hash split into train/val/test
  *  7. chunk     — token-window sequences from the train split
  *  8. pack      — next-fit packing of chunks into fixed training rows
  *
  * Every stage is one of the library's documented operators; the pipeline
  * only sequences them and writes each split (plus chunked train) to the
  * output directory. Returns the per-stage row-count funnel — the number
  * every curation run reports.
  *
  * Scale notes: stages 1-2 are map-side only; stage 3 is the one-shuffle
  * LSH tier; stage 4 broadcasts the benchmark grams (or probes a
  * driver-held Bloom filter in-scan); stages 5-7 are map-side; stage 8 is
  * one doc-id shuffle of int triples. Nothing in the pipeline
  * materializes N² or collects to the driver beyond the funnel counts.
  */
object CurationPipeline {

  case class Config(
      idCol: String = "doc_id",
      textCol: String = "text",
      minQuality: Double = 0.2,
      maxTopBigramFrac: Double = 0.5,
      minEntropy: Double = 1.0,
      allowedLangs: Seq[String] = Seq("en", "de", "es", "fr", "zh", "und"),
      nearDupThreshold: Double = 0.9,
      // keep-best-quality cluster representative (Dedup.bestPerCluster)
      // instead of the cheap keep-smallest-id pass (nearDupSurvivors)
      qualityAwareDedup: Boolean = false,
      decontamNgram: Int = 3,
      // route decontamination through the fixed-size Bloom prefilter
      // (identical output; the choice is a scan-mechanics knob)
      bloomDecontam: Boolean = false,
      // per-source sampling weights (epoch replication); None = no mixing
      mixWeights: Option[(String, Map[String, Double], Double)] = None,
      splitWeights: Seq[(String, Int)] = Seq("train" -> 8, "val" -> 1, "test" -> 1),
      chunkTokens: Int = 512,
      chunkOverlap: Int = 32,
      // pack train chunks into sequences of this many tokens; 0 = skip
      packCapacity: Int = 0)

  def run(spark: SparkSession, docs: DataFrame, benchmark: Option[DataFrame],
          outDir: String, cfg: Config = Config()): Map[String, Long] = {
    val id = col(cfg.idCol)
    val funnel = scala.collection.mutable.LinkedHashMap[String, Long]()
    funnel("input") = docs.count()

    // 1. clean (map-side)
    val cleaned = docs.withColumn(cfg.textCol,
      T.normalizeWhitespace(T.redactPii(T.stripControlChars(col(cfg.textCol)))))

    // 2. quality gate (map-side; every signal is a documented operator)
    val rs = T.ngramRepetition(col(cfg.textCol), 2)
    val filtered = cleaned
      .filter(T.qualityScore(col(cfg.textCol), T.EnglishStopwords) >= cfg.minQuality)
      .filter(rs.getField("top_frac") <= cfg.maxTopBigramFrac)
      .filter(T.charEntropy(col(cfg.textCol)) >= cfg.minEntropy)
      .filter(T.languageId(col(cfg.textCol)).isin(cfg.allowedLangs: _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    funnel("quality_filtered") = filtered.count()

    // 3. dedup: exact, then near-dup survivors (optionally quality-aware:
    // each cluster keeps its highest-quality member rather than smallest id)
    val exact = Dedup.exactSurvivors(filtered, cfg.idCol, cfg.textCol)
    val pairs = Dedup.ngramJaccardPairs(exact, cfg.idCol, cfg.textCol,
      threshold = cfg.nearDupThreshold)
    val survivors =
      if (cfg.qualityAwareDedup)
        exact.join(
          Dedup.bestPerCluster(exact, cfg.idCol, pairs.select(col("id_a"), col("id_b")),
            T.qualityScore(col(cfg.textCol), T.EnglishStopwords)),
          Seq(cfg.idCol), "left_semi")
      else Dedup.nearDupSurvivors(exact, cfg.idCol, pairs)
    val deduped = survivors
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    funnel("deduped") = deduped.count()
    filtered.unpersist()

    // 4. benchmark decontamination (optional)
    val decontaminated = benchmark match {
      case Some(b) if cfg.bloomDecontam =>
        Dedup.bloomDecontaminate(deduped, b, cfg.idCol, cfg.textCol, cfg.decontamNgram)
      case Some(b) => Dedup.decontaminate(deduped, b, cfg.idCol, cfg.textCol, cfg.decontamNgram)
      case None    => deduped
    }
    funnel("decontaminated") = decontaminated.count()

    // 5. weighted source mixing (optional): epoch-replicated rows carry a
    // distinct id (id, epoch) downstream so split/chunk stay per-copy
    val mixed = cfg.mixWeights match {
      case Some((strataCol, weights, default)) =>
        val m = Curate.weightedMix(decontaminated, cfg.idCol, strataCol, weights, default)
          .withColumn(cfg.idCol, concat(id.cast("string"), lit("#"), col("epoch").cast("string")))
          .drop("epoch")
        funnel("mixed") = m.count()
        m
      case None => decontaminated
    }

    // 6. deterministic split; each split is a filter over the same frame
    val splits = Curate.deterministicSplit(mixed, cfg.idCol, cfg.splitWeights)
    splits.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
      funnel(s"split_$name") = spark.read.parquet(s"$outDir/$name").count()
    }
    deduped.unpersist()

    // 7. chunk the train split into training sequences
    val train = spark.read.parquet(s"$outDir/train")
    val chunks = Curate.chunkTokens(train, cfg.idCol, cfg.textCol,
      cfg.chunkTokens, cfg.chunkOverlap)
    chunks.write.mode("overwrite").parquet(s"$outDir/train_chunks")
    funnel("train_chunks") = spark.read.parquet(s"$outDir/train_chunks").count()

    // 8. pack chunks into fixed-capacity training rows (optional)
    if (cfg.packCapacity > 0) {
      val packed = Curate.packNextFit(
        spark.read.parquet(s"$outDir/train_chunks")
          .select(col("id"), col("chunk_idx"), col("n_tokens")),
        "id", "chunk_idx", "n_tokens", cfg.packCapacity)
      packed.write.mode("overwrite").parquet(s"$outDir/train_packed")
      funnel("train_sequences") = spark.read.parquet(s"$outDir/train_packed")
        .select("id", "seq_idx").distinct().count()
    }

    funnel.toMap
  }
}
