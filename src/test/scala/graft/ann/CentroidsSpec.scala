package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CentroidsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, "a", Array(1.0f, 0.0f)),
    (2L, "a", Array(0.0f, 1.0f)),
    (3L, "b", Array(0.5f, 0.5f)),
    (4L, "b", Array(0.5f, 0.5f))
  ).toDF("vec_id", "label", "embedding")

  test("groupCosines: hand-computed centroid cosines") {
    val got = Centroids.groupCosines(vecs, "vec_id", "embedding", "label", dim = 2)
      .select(col("vec_id"), round(col("centroid_cos"), 6).as("c"))
      .as[(Long, Double)].collect().toMap
    // group a centroid dir = (1, 1): cos = 1/sqrt(2) for both members
    assert(got(1L) == 0.707107 && got(2L) == 0.707107)
    // group b members ARE the centroid direction
    assert(got(3L) == 1.0 && got(4L) == 1.0)
  }

  test("groupCosines: exact integer sums make the result partitioning-invariant") {
    val a = Centroids.groupCosines(vecs, "vec_id", "embedding", "label", 2)
      .select("vec_id", "centroid_cos").as[(Long, Double)].collect().toSet
    val b = Centroids.groupCosines(vecs.repartition(7), "vec_id", "embedding", "label", 2)
      .select("vec_id", "centroid_cos").as[(Long, Double)].collect().toSet
    assert(a == b) // bit-identical doubles, not just approximately equal
  }
}
