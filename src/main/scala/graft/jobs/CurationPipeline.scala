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
  *  5. split     — deterministic hash split into train/val/test
  *  6. chunk     — token-window sequences from the train split
  *
  * Every stage is one of the library's documented operators; the pipeline
  * only sequences them and writes each split (plus chunked train) to the
  * output directory. Returns the per-stage row-count funnel — the number
  * every curation run reports.
  *
  * Scale notes: stages 1-2 are map-side only; stage 3 is the one-shuffle
  * LSH tier; stage 4 broadcasts the benchmark grams; stages 5-6 are
  * map-side. Nothing in the pipeline materializes N² or collects to the
  * driver beyond the funnel counts.
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
      splitWeights: Seq[(String, Int)] = Seq("train" -> 8, "val" -> 1, "test" -> 1),
      chunkTokens: Int = 512,
      chunkOverlap: Int = 32)

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
      case Some(b) => Dedup.decontaminate(deduped, b, cfg.idCol, cfg.textCol, cfg.decontamNgram)
      case None    => deduped
    }
    funnel("decontaminated") = decontaminated.count()

    // 5. deterministic split; each split is a filter over the same frame
    val splits = Curate.deterministicSplit(decontaminated, cfg.idCol, cfg.splitWeights)
    splits.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
      funnel(s"split_$name") = spark.read.parquet(s"$outDir/$name").count()
    }
    deduped.unpersist()

    // 6. chunk the train split into training sequences
    val train = spark.read.parquet(s"$outDir/train")
    val chunks = Curate.chunkTokens(train, cfg.idCol, cfg.textCol,
      cfg.chunkTokens, cfg.chunkOverlap)
    chunks.write.mode("overwrite").parquet(s"$outDir/train_chunks")
    funnel("train_chunks") = spark.read.parquet(s"$outDir/train_chunks").count()

    funnel.toMap
  }
}
