package graft

class EntrySpec extends SparkSpec {

  test("entry flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has either an oracle or is a documented rows-only check") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // hash-based / approximate operators only
    assert(rowsOnly == Set("q22_minhash_pairs", "q23_simhash_pairs", "q25_lsh_topk",
      "q32_embedding_dedup", "q33_fingerprint", "q34_ivf_topk", "q46_source_sketch",
      "q50_multimodal"))
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
