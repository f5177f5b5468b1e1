package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val e = spark.read.parquet(s"$sf/embeddings.parquet")

  test("fit is deterministic across reruns and partitionings") {
    val m1 = Ivf.fit(e, "vec_id", "embedding", numCells = 10, iterations = 2)
    val m2 = Ivf.fit(e.repartition(7), "vec_id", "embedding", numCells = 10, iterations = 2)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
  }

  test("assign puts every vector in a valid cell; cells are reasonably used") {
    val m = Ivf.fit(e, "vec_id", "embedding", numCells = 10)
    val cells = Ivf.assign(e, "embedding", m).select("cell").as[Int].collect()
    assert(cells.forall(c => c >= 0 && c < 10))
    assert(cells.distinct.length >= 5, "degenerate clustering")
  }

  test("mass-duplicated corpus: exact-distinct fallback + probe clamping") {
    // 3 distinct vectors massively duplicated: the oversample window is all
    // copies, so the exact fallback kicks in and the model gets 3 cells
    val vecs = Seq(
      Array(1.0f, 0.0f), Array(0.0f, 1.0f), Array(-1.0f, 0.0f))
    val df = (0 until 600).map(i => (i.toLong, vecs(i % 3).toSeq))
      .toDF("vec_id", "embedding")
    val m = Ivf.fit(df, "vec_id", "embedding", numCells = 8)
    assert(m.numCells == 3, s"expected 3 distinct cells, got ${m.numCells}")
    // nProbes larger than the shrunken cell count clamps instead of crashing
    val q = Seq((1000L, Seq(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val top = Ivf.topK(df, q, m, "vec_id", "embedding", "vec_id", "embedding",
      k = 3, nProbes = 8)
    assert(top.count() == 3)
  }

  test("IVF top-k recall vs brute force") {
    val q = e.filter(col("vec_id") % 100 === 0)
    val m = Ivf.fit(e, "vec_id", "embedding", numCells = 8, iterations = 2)
    val exact = Ann.bruteForceTopK(e, q, "vec_id", "embedding", "vec_id", "embedding", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = Ivf.topK(e, q, m, "vec_id", "embedding", "vec_id", "embedding", 5, nProbes = 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // probing half the cells on a weak-neighbor corpus
    assert(recall >= 0.4, s"IVF recall $recall too low")
  }

  test("model save/load round-trips and the stored index serves identical top-k") {
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    val m = Ivf.fit(e, "vec_id", "embedding", numCells = 8, iterations = 2)
    Ivf.save(m, spark, s"$dir/model")
    val loaded = Ivf.load(spark, s"$dir/model")
    assert(loaded.centroids.map(_.toSeq).toSeq == m.centroids.map(_.toSeq).toSeq)
    // the serving path: assign once, store, answer query batches from the
    // stored table — results must equal the rebuild-every-time path
    Ivf.assign(e, "embedding", m)
      .select(col("vec_id").as("nid"), col("embedding").as("nvec"), col("cell"))
      .write.mode("overwrite").parquet(s"$dir/index")
    val q = e.filter(col("vec_id") % 100 === 0)
    val fromStored = Ivf.topKAgainstIndex(
        spark.read.parquet(s"$dir/index"), q, loaded, "vec_id", "embedding", 5, nProbes = 4)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
    val direct = Ivf.topK(e, q, m, "vec_id", "embedding", "vec_id", "embedding", 5, nProbes = 4)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
    assert(fromStored == direct)
  }

  test("serving ranks through the heap node, never a window sort") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_plan").toString
    try {
      val m = Ivf.fit(e, "vec_id", "embedding", numCells = 8, iterations = 1)
      Ivf.assign(e, "embedding", m)
        .select(col("vec_id").as("nid"), col("embedding").as("nvec"), col("cell"))
        .write.mode("overwrite").parquet(s"$dir/index")
      val served = Ivf.topKAgainstIndex(spark.read.parquet(s"$dir/index"),
        e.filter(col("vec_id") % 100 === 0), m, "vec_id", "embedding", 5, nProbes = 4)
      val plan = served.queryExecution.executedPlan.toString
      // a row_number window would shuffle + SORT the full probed-candidate
      // set per qid; the heap node bounds it (VERDICT r8 #2)
      assert(plan.contains("TopKPerGroup"), s"heap node missing:\n$plan")
      assert(!plan.contains("Window"), s"window rank leaked back in:\n$plan")
      assert(served.count() > 0)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("appendToIndex against the frozen stored model equals full-corpus assignment") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_append").toString
    try {
      val m = Ivf.fit(e, "vec_id", "embedding", numCells = 8, iterations = 2)
      Ivf.save(m, spark, s"$dir/model")
      Ivf.assign(e.filter(col("vec_id") % 3 =!= 2), "embedding", m)
        .select(col("vec_id").as("nid"), col("embedding").as("nvec"), col("cell"))
        .write.mode("overwrite").parquet(s"$dir/index")
      Ivf.appendToIndex(spark, s"$dir/index", s"$dir/model",
        e.filter(col("vec_id") % 3 === 2), "vec_id", "embedding")
      val appended = spark.read.parquet(s"$dir/index")
        .select("nid", "cell").as[(Long, Int)].collect().toSet
      val full = Ivf.assign(e, "embedding", m)
        .select(col("vec_id"), col("cell")).as[(Long, Int)].collect().toSet
      assert(appended == full)
      // and the serving path over the appended index ≡ the one-shot path
      val q = e.filter(col("vec_id") % 100 === 0)
      val served = Ivf.topKAgainstIndex(spark.read.parquet(s"$dir/index"),
          q, Ivf.load(spark, s"$dir/model"), "vec_id", "embedding", 5, nProbes = 4)
        .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
      val direct = Ivf.topK(e, q, m, "vec_id", "embedding", "vec_id", "embedding",
          5, nProbes = 4)
        .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
      assert(served == direct)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("deleteFromIndex: tombstoned serving ≡ an index that never held the ids; compact is invisible") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_delete").toString
    try {
      val m = Ivf.fit(e, "vec_id", "embedding", numCells = 8, iterations = 2)
      Ivf.save(m, spark, s"$dir/model")
      Ivf.assign(e, "embedding", m)
        .select(col("vec_id").as("nid"), col("embedding").as("nvec"), col("cell"))
        .write.mode("overwrite").parquet(s"$dir/index")
      val before = spark.read.parquet(s"$dir/index").count()
      val dead = e.filter(col("vec_id") % 7 === 3).select("vec_id")
      Ivf.deleteFromIndex(spark, s"$dir/index", dead, "vec_id")
      // _tombstones is invisible to plain readers of the index table
      assert(spark.read.parquet(s"$dir/index").count() == before)
      // idempotent: re-deleting adds no tombstone rows
      val tsCount = Ivf.tombstonesOf(spark, s"$dir/index").get.count()
      Ivf.deleteFromIndex(spark, s"$dir/index", dead, "vec_id")
      assert(Ivf.tombstonesOf(spark, s"$dir/index").get.count() == tsCount)
      val q = e.filter(col("vec_id") % 100 === 0 && col("vec_id") % 7 =!= 3)
      def serve() = Ivf.topKAgainstIndex(spark.read.parquet(s"$dir/index"),
          q, Ivf.load(spark, s"$dir/model"), "vec_id", "embedding", 5, nProbes = 4,
          tombstones = Ivf.tombstonesOf(spark, s"$dir/index"))
        .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
      val served = serve()
      // ground truth: an index built over the reduced corpus with the SAME
      // frozen model (deletes never re-fit)
      Ivf.assign(e.filter(col("vec_id") % 7 =!= 3), "embedding", m)
        .select(col("vec_id").as("nid"), col("embedding").as("nvec"), col("cell"))
        .write.mode("overwrite").parquet(s"$dir/reduced")
      val reduced = Ivf.topKAgainstIndex(spark.read.parquet(s"$dir/reduced"),
          q, m, "vec_id", "embedding", 5, nProbes = 4)
        .select("qid", "nid", "rank").as[(Long, Long, Int)].collect().toSet
      assert(served == reduced)
      assert(served.nonEmpty)
      // no served id is deleted
      val deadIds = dead.as[Long].collect().toSet
      assert(served.forall { case (_, nid, _) => !deadIds.contains(nid) })
      // compaction folds tombstones into storage without changing serving
      Ivf.compactIndex(spark, s"$dir/index")
      assert(Ivf.tombstonesOf(spark, s"$dir/index").isEmpty)
      assert(spark.read.parquet(s"$dir/index").count() == before - deadIds.size)
      assert(serve() == served)
      // compact with no tombstones is a no-op
      Ivf.compactIndex(spark, s"$dir/index")
      assert(serve() == served)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("recoverCompaction heals a crash stranded between the two renames (ADVICE r9)") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_recover").toString
    try {
      val m = Ivf.fit(e, "vec_id", "embedding", numCells = 8, iterations = 2)
      Ivf.assign(e, "embedding", m)
        .select(col("vec_id").as("nid"), col("embedding").as("nvec"), col("cell"))
        .write.mode("overwrite").parquet(s"$dir/index")
      val dead = e.filter(col("vec_id") % 7 === 3).select("vec_id")
      Ivf.deleteFromIndex(spark, s"$dir/index", dead, "vec_id")
      val before = spark.read.parquet(s"$dir/index").count()
      val deadN = dead.distinct().count()
      // simulate a compaction crash between rename(dst→old) and
      // rename(tmp→dst): tmp fully written, dst renamed away
      val conf = spark.sparkContext.hadoopConfiguration
      val dst = new org.apache.hadoop.fs.Path(s"$dir/index")
      val fs = dst.getFileSystem(conf)
      val tmp = new org.apache.hadoop.fs.Path(dst.getParent, s".tmp_${dst.getName}")
      val old = new org.apache.hadoop.fs.Path(dst.getParent, s".old_${dst.getName}")
      spark.read.parquet(s"$dir/index")
        .join(Ivf.tombstonesOf(spark, s"$dir/index").get, Seq("nid"), "left_anti")
        .write.mode("overwrite").parquet(tmp.toString)
      assert(fs.rename(dst, old))
      assert(!fs.exists(dst), "stranded: index path absent")
      // the serving entry point heals it — swap completed from tmp
      val ts = Ivf.tombstonesOf(spark, s"$dir/index")
      assert(fs.exists(dst) && !fs.exists(old) && !fs.exists(tmp))
      assert(ts.isEmpty, "tombstones rode out with the old directory")
      assert(spark.read.parquet(s"$dir/index").count() == before - deadN)
      // rollback path: dst renamed away with NO tmp present
      assert(fs.rename(dst, old))
      assert(Ivf.recoverCompaction(spark, s"$dir/index"))
      assert(fs.exists(dst) && !fs.exists(old))
      assert(spark.read.parquet(s"$dir/index").count() == before - deadN)
      // idempotent no-op on a healthy index
      assert(!Ivf.recoverCompaction(spark, s"$dir/index"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("assignmentDrift: stable distribution ~0, shifted distribution alarms") {
    val idx = Seq(0, 0, 0, 1).toDF("cell")
    assert(math.abs(Ivf.assignmentDrift(idx, idx)) < 1e-12)
    val shifted = Seq(1, 1, 1, 1).toDF("cell")
    val psi = Ivf.assignmentDrift(idx, shifted)
    assert(psi > 0.25, s"expected re-fit alarm, psi=$psi") // > action threshold
    // a mild rebalance stays under the alarm
    val mild = Seq(0, 0, 1, 1).toDF("cell")
    assert(Ivf.assignmentDrift(idx, mild) < 0.25)
  }
}
