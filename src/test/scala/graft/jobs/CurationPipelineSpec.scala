package graft.jobs

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("full curation run over real testdata: funnel, splits, chunks") {
    val out = java.nio.file.Files.createTempDirectory("curation").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val benchmark = docs.filter(col("doc_id") % 50 === 0)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)

    val funnel = CurationPipeline.run(spark, corpus, Some(benchmark), out,
      CurationPipeline.Config(minQuality = 0.0, minEntropy = 0.5,
        chunkTokens = 32, chunkOverlap = 8))

    // the funnel only ever narrows
    assert(funnel("input") >= funnel("quality_filtered"))
    assert(funnel("quality_filtered") >= funnel("deduped"))
    assert(funnel("deduped") >= funnel("decontaminated"))
    // splits are a disjoint partition of the decontaminated set
    val splitTotal = funnel("split_train") + funnel("split_val") + funnel("split_test")
    assert(splitTotal == funnel("decontaminated"))
    // something survived end-to-end and chunking produced ≥1 row per doc
    assert(funnel("split_train") > 0)
    assert(funnel("train_chunks") >= funnel("split_train"))

    // artifacts on disk are readable and text was actually cleaned
    val train = spark.read.parquet(s"$out/train")
    assert(!train.filter(col("text").rlike("[\\x00-\\x08]")).take(1).nonEmpty)
    val chunks = spark.read.parquet(s"$out/train_chunks")
    assert(chunks.columns.toSet == Set("id", "chunk_idx", "chunk_text", "n_tokens"))
    assert(chunks.agg(max("n_tokens")).as[Int].head() <= 32)
  }

  test("bloom decontam, mixing and packing stages compose end-to-end") {
    val out = java.nio.file.Files.createTempDirectory("curationm").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val benchmark = docs.filter(col("doc_id") % 50 === 0)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)

    val funnel = CurationPipeline.run(spark, corpus, Some(benchmark), out,
      CurationPipeline.Config(minQuality = 0.0, minEntropy = 0.5,
        bloomDecontam = true,
        mixWeights = Some(("source", Map("src0" -> 2.0, "src1" -> 0.5), 1.0)),
        chunkTokens = 32, chunkOverlap = 8, packCapacity = 64))

    // bloom decontam output is identical to the exact path by construction
    val exact = CurationPipeline.run(spark, corpus, Some(benchmark),
      java.nio.file.Files.createTempDirectory("curatione").toString,
      CurationPipeline.Config(minQuality = 0.0, minEntropy = 0.5,
        chunkTokens = 32, chunkOverlap = 8))
    assert(funnel("decontaminated") == exact("decontaminated"))

    // mixing replicates: the mixed count exceeds the decontaminated count
    // when upsampled strata dominate (src0 doubled, only src1 halved)
    assert(funnel("mixed") > funnel("decontaminated"))
    val splitTotal = funnel("split_train") + funnel("split_val") + funnel("split_test")
    assert(splitTotal == funnel("mixed"))

    // packed sequences exist, pack no finer than one sequence per chunk
    assert(funnel.contains("train_sequences"))
    assert(funnel("train_sequences") >= 1 &&
      funnel("train_sequences") <= funnel("train_chunks"))
    // packed artifact respects capacity per (doc, sequence)
    val packed = spark.read.parquet(s"$out/train_packed")
    val overCap = packed.groupBy("id", "seq_idx")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("n"))
      .filter(col("t") > 64 && col("n") > 1)
    assert(overCap.isEmpty, "a multi-chunk sequence exceeded capacity")
  }

  test("quality-aware dedup keeps cluster counts consistent with the cheap policy") {
    val out = java.nio.file.Files.createTempDirectory("curationq").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val funnel = CurationPipeline.run(spark, docs, None, out,
      CurationPipeline.Config(minQuality = 0.0, minEntropy = 0.5,
        qualityAwareDedup = true, chunkTokens = 32, chunkOverlap = 8))
    // bestPerCluster keeps EXACTLY one doc per connected component while
    // the cheap keep-smallest-id pass keeps every doc that never appears
    // as a pair's larger side (>= 1 per component) — so quality-aware
    // dedup can only be at least as aggressive
    val cheap = CurationPipeline.run(spark, docs, None,
      java.nio.file.Files.createTempDirectory("curationc").toString,
      CurationPipeline.Config(minQuality = 0.0, minEntropy = 0.5,
        chunkTokens = 32, chunkOverlap = 8))
    assert(funnel("deduped") <= cheap("deduped"))
    assert(funnel("deduped") > 0 && funnel("split_train") > 0)
  }
}
