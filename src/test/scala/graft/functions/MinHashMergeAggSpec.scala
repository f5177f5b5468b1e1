package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.MinHashMergeAgg
import graft.functions.{SimilarityFunctions => S, TextFunctions => T}

class MinHashMergeAggSpec extends SparkSpec {
  import spark.implicits._

  test("merged group signature equals the signature of the concatenated text") {
    // min over per-doc minima == min over the union of shingles, exactly
    val docs = Seq(
      ("g1", "alpha beta gamma delta epsilon"),
      ("g1", "zeta eta theta iota kappa"),
      ("g2", "lambda mu nu xi omicron"))
      .toDF("grp", "text")
    val k = 32
    val merged = docs
      .select(col("grp"), S.minhashSignature(T.wordShingles(col("text"), 2), k).as("sig"))
      .groupBy("grp")
      .agg(MinHashMergeAgg.minhashMerge(col("sig"), k).as("msig"))
      .as[(String, Seq[Long])].collect().toMap
    val g1Union = Seq("alpha beta gamma delta epsilon zeta eta theta iota kappa").toDF("text")
      .select(S.minhashSignature(T.wordShingles(col("text"), 2), k).as("sig"))
      .as[Seq[Long]].collect()(0)
    // union-of-shingles signature: shingles of the two docs separately
    // (concatenation adds one cross-boundary shingle, so compute the union
    // by unioning the shingle arrays instead)
    val unionSig = Seq(("alpha beta gamma delta epsilon", "zeta eta theta iota kappa")).toDF("t1", "t2")
      .select(S.minhashSignature(
        concat(T.wordShingles(col("t1"), 2), T.wordShingles(col("t2"), 2)), k).as("sig"))
      .as[Seq[Long]].collect()(0)
    assert(merged("g1") == unionSig)
    assert(merged("g2").length == k)
    assert(g1Union.length == k)
  }

  test("partial aggregation appears in the plan (map-side combine)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val agg = docs
      .select(col("source"), S.minhashSignature(T.wordShingles(col("text"), 3), 32).as("sig"))
      .groupBy("source").agg(MinHashMergeAgg.minhashMerge(col("sig"), 32).as("msig"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("partial_minhashmergeagg") || plan.toLowerCase.contains("partial"),
      s"no partial aggregation in:\n$plan")
    assert(agg.count() > 0)
  }
}
