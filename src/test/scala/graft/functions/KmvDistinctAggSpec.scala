package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.KmvDistinctAgg
import graft.functions.expressions.KmvDistinctAgg.kmvSketch

class KmvDistinctAggSpec extends SparkSpec {
  import spark.implicits._

  test("buffer keeps the k smallest distinct values in order") {
    val b = new KmvDistinctAgg.Buffer(new Array[Long](4), 0)
    Seq(50L, 10L, 30L, 10L, 70L, 20L, 5L, 30L).foreach(b.insert)
    assert(java.util.Arrays.copyOf(b.values, b.size).toSeq == Seq(5L, 10L, 20L, 30L))
    b.insert(1L)
    assert(java.util.Arrays.copyOf(b.values, b.size).toSeq == Seq(1L, 5L, 10L, 20L))
    b.insert(100L) // worse than the current worst: ignored
    assert(java.util.Arrays.copyOf(b.values, b.size).toSeq == Seq(1L, 5L, 10L, 20L))
  }

  test("sketch is partition-invariant (merge ≡ union of minima)") {
    val hashes = (1 to 5000).map(i => (i % 10, (i.toLong * 2654435761L) % (1L << 60)))
    val once = hashes.toDF("g", "h").repartition(1)
      .groupBy("g").agg(kmvSketch(col("h"), 8).as("m"))
      .as[(Int, Seq[Long])].collect().toMap
    val many = hashes.toDF("g", "h").repartition(16)
      .groupBy("g").agg(kmvSketch(col("h"), 8).as("m"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(once == many)
    assert(once.values.forall(m => m == m.sorted && m.distinct == m))
  }

  test("below-k groups return their exact distinct set") {
    val got = Seq((1, 5L), (1, 5L), (1, 9L), (2, 3L)).toDF("g", "h")
      .groupBy("g").agg(kmvSketch(col("h"), 16).as("m"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(got(1) == Seq(5L, 9L) && got(2) == Seq(3L))
  }

  test("estimator lands within theory bounds on a uniform stream") {
    // 60-bit multiplicative-scrambled values ~ uniform; n = 20000 distinct
    val n = 20000
    val k = 256
    val df = spark.range(0, n)
      .select((abs(xxhash64(col("id"))) % lit(1L << 60)).as("h"))
    val mins = df.agg(kmvSketch(col("h"), k).as("m")).as[Seq[Long]].head()
    val est = (k - 1).toDouble * (1L << 60).toDouble / mins.last.toDouble
    // 1/sqrt(k-2) ≈ 6.3% relative error; allow 4 sigma
    assert(math.abs(est - n) / n < 0.25, s"estimate $est for true $n")
  }
}
