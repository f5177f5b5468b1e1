package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfVersionedSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val e = spark.read.parquet(s"$sf/embeddings.parquet")
    .select("vec_id", "embedding")

  private def served(root: String, version: Option[Int] = None): Set[(Long, Long, Int)] = {
    val q = e.filter(col("vec_id") % 50 === 1)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    IvfVersioned.topK(spark, root, q, "qid", "qvec", k = 5, nProbes = 4, version)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
  }

  private def direct(root: String, corpus: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] = {
    val m = IvfVersioned.model(spark, root)
    val q = e.filter(col("vec_id") % 50 === 1)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    Ivf.topKAgainstIndex(
        Ivf.assign(corpus, "embedding", m)
          .select(col("vec_id").as("nid"), col("embedding").as("nvec"), col("cell")),
        q, m, "qid", "qvec", k = 5, nProbes = 4)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
  }

  test("version chain: every version serves a fresh assignment of its live set; time travel isolated") {
    val root = java.nio.file.Files.createTempDirectory("ivfv").toString
    try {
      val v1 = IvfVersioned.init(spark, root, e.filter(col("vec_id") % 3 === 0),
        "vec_id", "embedding", numCells = 8, iterations = 2)
      val v2 = IvfVersioned.append(spark, root,
        e.filter(col("vec_id") % 3 === 1), "vec_id", "embedding")
      val v3 = IvfVersioned.append(spark, root,
        e.filter(col("vec_id") % 3 === 2), "vec_id", "embedding")
      val v4 = IvfVersioned.delete(spark, root,
        e.filter(col("vec_id") % 7 === 2).select("vec_id"), "vec_id")
      assert(Seq(v1, v2, v3, v4) == Seq(1, 2, 3, 4))
      // the committed latest ≡ direct index over the live set, same model
      assert(served(root) == direct(root, e.filter(col("vec_id") % 7 =!= 2)))
      // time travel: v1 still serves exactly the slice-0 index
      assert(served(root, Some(1)) == direct(root, e.filter(col("vec_id") % 3 === 0)))
      assert(served(root, Some(3)) == direct(root, e))
      // no-op delete (ids absent or already tombstoned) stays at v4
      assert(IvfVersioned.delete(spark, root,
        e.filter(col("vec_id") % 7 === 2).select("vec_id"), "vec_id") == 4)
      assert(IvfVersioned.delete(spark, root,
        Seq(999999L).toDF("vec_id"), "vec_id") == 4)
      // no-op append (all-null batch) stays at v4
      assert(IvfVersioned.append(spark, root,
        Seq((888888L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"),
        "vec_id", "embedding") == 4)
      // duplicate guard
      intercept[IllegalArgumentException] {
        IvfVersioned.append(spark, root, e.filter(col("vec_id") % 3 === 1),
          "vec_id", "embedding", rejectDuplicateIds = true)
      }
      // compact folds tombstones into one batch as v5 — serving unchanged,
      // old versions still resolvable
      val before = served(root)
      assert(IvfVersioned.compact(spark, root) == 5)
      assert(served(root) == before)
      assert(IvfVersioned.load(spark, root).tombstones.isEmpty)
      assert(served(root, Some(1)) == direct(root, e.filter(col("vec_id") % 3 === 0)))
      // vacuum to the last version: old metas + unreferenced batches go,
      // the compacted serving survives
      val (dropped, orphans) = IvfVersioned.vacuum(spark, root, keepLast = 1)
      assert(dropped.nonEmpty && orphans.nonEmpty)
      assert(served(root) == before)
      // a second compact with a single clean batch is a no-op version
      assert(IvfVersioned.compact(spark, root) == 5)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("init refuses a root that already holds a versioned index") {
    val root = java.nio.file.Files.createTempDirectory("ivfv2").toString
    try {
      IvfVersioned.init(spark, root, e.limit(30), "vec_id", "embedding", numCells = 4)
      intercept[IllegalArgumentException] {
        IvfVersioned.init(spark, root, e.limit(30), "vec_id", "embedding", numCells = 4)
      }
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
