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
