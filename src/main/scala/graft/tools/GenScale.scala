package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver's testdata for battery-scale
  * headroom runs (VERDICT r5 #5): replicate each table `k`× with
  * key-space remapping (newKey = oldKey·k + replica — FK-consistent
  * across fact/dim tables), while DE-correlating content so operator
  * complexity stays representative instead of degenerating:
  *
  *  - `documents.text` gets a per-(replica, doc) seeded word shuffle —
  *    replicas are NOT near-dups of each other, so LSH/segment dedup sees
  *    ~k× vocabulary and bucket load, not k-sized duplicate clusters;
  *  - `embeddings.embedding` gets a per-replica dimension permutation +
  *    sign flips (an exact orthogonal transform: norms and within-replica
  *    geometry preserved, cross-replica cosines decorrelated);
  *  - `events.ts` shifts by replica milliseconds and is written as plain
  *    INT64 nanos — the same long the battery's nanosAsLong reader
  *    produces from the driver's TIMESTAMP(NANOS) files;
  *  - dimension tables (region/nation) stay fixed, like real warehouses.
  *
  * Bench-only data: oracle thresholds are probed against the DRIVER's
  * testdata, not this (scaling exponents in PERF.md are the deliverable).
  * Usage: runMain graft.tools.GenScale <srcDir> <dstDir> <k> [grow-vocab]
  *
  * `grow-vocab`: suffix every document token with its replica tag (~r,
  * replica 0 untouched). The driver's synthetic vocabulary is SMALL, so a
  * plain k× replication makes shingle postings k× denser — a regime real
  * corpora don't enter (vocabulary grows with corpus size; Heaps' law).
  * With grow-vocab the vocabulary scales ~k× alongside the corpus,
  * within-replica near-dup structure is preserved exactly, and
  * posting-density-sensitive operators (exact Jaccard, BM25) see the
  * realistic regime instead of the adversarial one. */
object GenScale {

  def main(args: Array[String]): Unit = {
    val (srcDir, dstDir, kStr) = (args(0), args(1), args(2))
    val growVocab = args.length > 3 && args(3) == "grow-vocab"
    val k = kStr.toInt
    require(k >= 1, "k must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def src(name: String): DataFrame = spark.read.parquet(s"$srcDir/$name.parquet")
    // Match the driver's layout EXACTLY: each table is a single plain FILE
    // named <table>.parquet, not a directory of part files. The streaming
    // queries depend on this — their file source streams the sf dir with
    // pathGlobFilter=events.parquet, which never matches a part-*.parquet
    // inside a directory (measured: a directory layout silently streams
    // ZERO rows and the streaming family benches at fixed cost only).
    def write(df: DataFrame, name: String): Unit = {
      val conf = spark.sparkContext.hadoopConfiguration
      val tmp = new org.apache.hadoop.fs.Path(s"$dstDir/.__tmp_$name")
      val dst = new org.apache.hadoop.fs.Path(s"$dstDir/$name.parquet")
      val fs = dst.getFileSystem(conf)
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = fs.listStatus(tmp).map(_.getPath)
        .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file produced for $name"))
      if (fs.exists(dst)) fs.delete(dst, true)
      require(fs.rename(part, dst), s"rename failed for $name")
      fs.delete(tmp, true)
    }

    // keyCols remapped to key*k+r; replicas unioned. Replication happens
    // via an explode so one scan produces all replicas.
    def replicate(df: DataFrame, keyCols: Seq[String]): DataFrame = {
      val exploded = df.withColumn("__r", explode(sequence(lit(0), lit(k - 1))))
      keyCols.foldLeft(exploded) { (acc, c) =>
        acc.withColumn(c, col(c) * k + col("__r"))
      }
    }

    write(src("region"), "region")
    write(src("nation"), "nation")
    write(replicate(src("customer"), Seq("c_custkey")).drop("__r"), "customer")
    write(replicate(src("supplier"), Seq("s_suppkey")).drop("__r"), "supplier")
    write(replicate(src("part"), Seq("p_partkey")).drop("__r"), "part")
    write(replicate(src("orders"), Seq("o_orderkey", "o_custkey")).drop("__r"), "orders")
    write(replicate(src("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey")).drop("__r"), "lineitem")

    // events: shift each replica by r ms so per-user sequences stay
    // distinct but windows keep their density. ts arrives either as INT64
    // nanos (legacy TIMESTAMP(NANOS) testdata under nanosAsLong) or as a
    // native timestamp[us] column — shift in the matching unit; the
    // battery's adaptive reader (Queries.normalizeTs) handles both output
    // encodings.
    val ev = replicate(src("events"), Seq("event_id", "user_id"))
    val shifted = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        ev.withColumn("ts", col("ts") + col("__r") * lit(1000000L))
      case _ =>
        ev.withColumn("ts", timestamp_micros(
          unix_micros(col("ts").cast("timestamp")) + col("__r") * lit(1000L)))
    }
    write(shifted.drop("__r"), "events")

    // documents: seeded per-(replica, doc) word shuffle — same length
    // scale and vocabulary, decorrelated shingles
    val shuffleWords = udf { (text: String, seed: Long) =>
      if (text == null) null
      else {
        val words = text.split("\\s+", -1)
        val rnd = new scala.util.Random(seed)
        val arr = words.clone()
        var i = arr.length - 1
        while (i > 0) { val j = rnd.nextInt(i + 1); val t = arr(i); arr(i) = arr(j); arr(j) = t; i -= 1 }
        arr.mkString(" ")
      }
    }
    val shuffled = replicate(src("documents"), Seq("doc_id"))
      .withColumn("text",
        when(col("__r") === 0, col("text"))
          .otherwise(shuffleWords(col("text"), col("doc_id") + col("__r") * lit(1000000007L))))
    val docsOut =
      if (!growVocab) shuffled
      else shuffled.withColumn("text",
        when(col("__r") === 0 || col("text").isNull, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "),
              t => concat(t, lit("~"), col("__r"))), " ")))
    write(docsOut.drop("__r"), "documents")

    // embeddings: per-replica orthogonal transform (dim permutation +
    // sign flips), identity for replica 0
    val dim = 64
    val transforms: Array[(Array[Int], Array[Float])] = Array.tabulate(k) { r =>
      val rnd = new scala.util.Random(2654435761L * (r + 1))
      val perm = rnd.shuffle((0 until dim).toVector).toArray
      val signs = Array.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
      if (r == 0) ((0 until dim).toArray, Array.fill(dim)(1.0f)) else (perm, signs)
    }
    val rotate = udf { (v: Seq[Float], r: Int) =>
      if (v == null) null
      else {
        val (perm, signs) = transforms(r)
        val out = new Array[Float](v.length)
        var i = 0
        while (i < v.length && i < dim) { out(i) = v(perm(i)) * signs(i); i += 1 }
        out.toSeq
      }
    }
    write(replicate(src("embeddings"), Seq("vec_id"))
      .withColumn("embedding", rotate(col("embedding"), col("__r")))
      .drop("__r"), "embeddings")

    println(s"generated ${k}x scale-up of $srcDir at $dstDir")
    spark.stop()
  }
}
