package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("batchSessions splits on the gap, aggregates per session") {
    val events = Seq(
      (1L, "2024-01-01 10:00:00", 1.0, 1L),
      (1L, "2024-01-01 10:10:00", 2.0, 2L), // same session (10 min gap)
      (1L, "2024-01-01 12:00:00", 3.0, 3L), // > 1h later: new session
      (2L, "2024-01-01 10:00:00", 4.0, 4L))
      .toDF("user_id", "ts_s", "value", "event_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val sessions = Sessionize.batchSessions(events, "user_id", "ts", "value", "event_id", 3600)
      .select(col("user_id"), col("session_idx"), col("n_events"), col("total_value"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(sessions == Set((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 3.0), (2L, 1L, 1L, 4.0)))
  }

  test("streamingDedup drops repeat keys across micro-batches within the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("sdedup").toString
    Seq(("h1", "2024-01-01 10:00:00"), ("h2", "2024-01-01 10:00:10"), ("h1", "2024-01-01 10:00:20"))
      .toDF("text_hash", "ts_s").write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val deduped = Streaming.streamingDedup(stream, "ts", "1 hour", Seq("text_hash"))
    val q = deduped.writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("sdedup_out").select("text_hash").as[String].collect().sorted.toSeq
        == Seq("h1", "h2"))
      // second micro-batch: a dup of h1 (dropped, state remembers) and a new h3
      Seq(("h1", "2024-01-01 10:01:00"), ("h3", "2024-01-01 10:01:05"))
        .toDF("text_hash", "ts_s").write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      assert(spark.table("sdedup_out").select("text_hash").as[String].collect().sorted.toSeq
        == Seq("h1", "h2", "h3"))
    } finally q.stop()
  }

  test("streamingCounts keeps per-user state across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("sess").toString
    Seq((10L, 1), (10L, 2), (20L, 3)).toDF("user_id", "x").write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val counts = Sessionize.streamingCounts(stream, "user_id")
    val q = counts.writeStream.format("memory").queryName("sess_counts")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val r1 = spark.table("sess_counts").groupBy("user_id").agg(max("n").as("n"))
        .as[(Long, Long)].collect().toMap
      assert(r1 == Map(10L -> 2L, 20L -> 1L))
      // second batch arrives: counts accumulate through state
      Seq((10L, 4)).toDF("user_id", "x").write.mode("append").parquet(s"$dir/in")
      q.processAllAvailable()
      val r2 = spark.table("sess_counts").groupBy("user_id").agg(max("n").as("n"))
        .as[(Long, Long)].collect().toMap
      assert(r2 == Map(10L -> 3L, 20L -> 1L))
    } finally q.stop()
  }
  test("sessionPaths: gap splits, ordered paths, (n desc, path) top-k") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val ev = Seq(
      // u1: a,b within gap | new session: a,b again (same path twice for u1? no - different users)
      (1L, 100L, 1L, "a"), (1L, 150L, 2L, "b"),
      (1L, 1000L, 3L, "a"), (1L, 1050L, 4L, "b"),
      // u2: single-event session "c", and a tie at ts=100 ordered by id: a then b
      (2L, 100L, 5L, "a"), (2L, 100L, 6L, "b"), (2L, 5000L, 7L, "c")
    ).toDF("u", "tsu", "id", "st")
    val got = Sessionize.sessionPaths(ev, "u", "tsu", "id", "st",
        gapMicros = 500L, topK = 10)
      .as[(Int, String, Long)].collect().toSeq
    // paths: u1 -> "a>b" x2; u2 -> "a>b" (tie ordered by id) + "c"
    assert(got == Seq((1, "a>b", 3L), (2, "c", 1L)))
  }
  test("streamingClosedSessions: gaps emit across and within micro-batches") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fmgws").toString
    // batch 1: u1 at 0, 10, 1000 (gap 100 closes [0,10] inside the batch)
    Seq((1L, 0L), (1L, 10L), (1L, 1000L)).toDF("u", "tsu")
      .coalesce(1).write.parquet(dir + "/b1")
    // batch 2: u1 at 990 (a LATE cross-batch event: joins the open
    // session without rewinding its frontier), 1050 (extends), 5000
    // (closes [990,1050] with 3 events); u2 opens a session that is
    // never closed -> never emitted
    Seq((1L, 990L), (1L, 1050L), (1L, 5000L), (2L, 7L)).toDF("u", "tsu")
      .coalesce(1).write.parquet(dir + "/b2")
    // order the source's batches by file modification time
    def onlyParquet(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    onlyParquet(dir + "/b1").setLastModified(1000000L)
    onlyParquet(dir + "/b2").setLastModified(2000000L)
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val schema = ss.read.parquet(dir + "/b1").schema
    val src = ss.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").parquet(dir)
    val closed = Sessionize.streamingClosedSessions(src, "u", "tsu", gapMicros = 100L)
    val q = closed.writeStream.format("memory")
      .queryName("fmgws_sink").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = ss.table("fmgws_sink")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 10L, 2L), (1L, 990L, 1050L, 3L)))
  }
}
