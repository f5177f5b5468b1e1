package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def mkStreamDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("stream").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "k", "v").write.parquet(s"$dir/in")
    s"$dir/in"
  }

  test("forEachBatch runs the body, persists, and gates empty batches") {
    val in = mkStreamDir()
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val seen = new java.util.concurrent.atomic.AtomicLong()
    val q = Streaming.forEachBatch(stream,
      Streaming.ForEachBatchOptions(windowSize = "1 seconds")) { (batch, _) =>
      seen.addAndGet(batch.count())
    }
    try q.processAllAvailable() finally q.stop()
    assert(seen.get() == 3)
  }

  test("forEachBatch retries failing batches up to batchMaxRetries") {
    val in = mkStreamDir()
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val attempts = new java.util.concurrent.atomic.AtomicInteger()
    val q = Streaming.forEachBatch(stream,
      Streaming.ForEachBatchOptions(windowSize = "1 seconds", batchMaxRetries = 3)) { (_, _) =>
      if (attempts.incrementAndGet() < 3) throw new RuntimeException("flaky")
    }
    try q.processAllAvailable() finally q.stop()
    assert(attempts.get() == 3) // failed twice, succeeded on the third

    intercept[IllegalArgumentException] {
      Streaming.forEachBatch(stream,
        Streaming.ForEachBatchOptions(batchMaxRetries = 101))((_, _) => ())
    }
  }

  test("forEachBatch with availableNow drains everything then stops on its own") {
    val in = mkStreamDir()
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val seen = new java.util.concurrent.atomic.AtomicLong()
    val q = Streaming.forEachBatch(stream,
      Streaming.ForEachBatchOptions(availableNow = true)) { (batch, _) =>
      seen.addAndGet(batch.count())
    }
    q.awaitTermination(30000)
    assert(!q.isActive) // AvailableNow terminates after draining
    assert(seen.get() == 3)
  }

  test("sampleStream drains into a memory sink and limits") {
    val in = mkStreamDir()
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val sample = Streaming.sampleStream(spark, stream, 2, "sample_t")
    assert(sample.count() == 2)
  }

  test("streaming source factory routes file transports with schema") {
    val in = mkStreamDir()
    val schema = spark.read.parquet(in).schema
    val stream = Streaming.source(spark, "file", path = Some(in), schema = Some(schema))
    assert(stream.isStreaming)
    val sample = Streaming.sampleStream(spark, stream, 3, "src_factory_t")
    assert(sample.count() == 3)
  }

  test("ingestion-time columns appended to requested granularity") {
    val df = Seq(1).toDF("x")
    val out = Streaming.withIngestionTimeColumns(df, "day")
    assert(out.columns.toSeq == Seq("x", "ingest_year", "ingest_month", "ingest_day"))
    intercept[IllegalArgumentException](Streaming.withIngestionTimeColumns(df, "fortnight"))
  }

  test("windowed aggregate with watermark (event-time extension)") {
    val in = java.nio.file.Files.createTempDirectory("wstream").toString
    Seq(
      ("2024-01-01 00:00:10", "a", 1.0), ("2024-01-01 00:00:40", "a", 2.0),
      ("2024-01-01 00:01:10", "b", 3.0))
      .toDF("ts_s", "k", "v").withColumn("ts", col("ts_s").cast("timestamp"))
      .drop("ts_s").write.parquet(s"$in/in")
    val schema = spark.read.parquet(s"$in/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$in/in")
    val agg = Streaming.windowedAggregate(stream, "ts", "10 minutes", "1 minute",
      Seq(sum(col("v")).as("total")), extraKeys = Seq("k"))
    val q = agg.writeStream.format("memory").queryName("wagg").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("wagg")
      .select(col("window.start").cast("string"), col("k"), col("total"))
      .as[(String, String, Double)].collect().toSet
    assert(rows == Set(
      ("2024-01-01 00:00:00", "a", 3.0),
      ("2024-01-01 00:01:00", "b", 3.0)))
  }

  test("GraftJob init/commit lifecycle flushes bookmark state") {
    val state = java.nio.file.Files.createTempDirectory("job").toString
    val data = java.nio.file.Files.createTempDirectory("jobdata")
    java.nio.file.Files.writeString(data.resolve("x.csv"), "a")
    val job = GraftJob.init("nightly", Map("env" -> "test"), state)
    assert(job.bookmarks.newFiles(spark, "t1", data.toString, "*.csv").size == 1)
    job.commit()
    val job2 = GraftJob.init("nightly", Map.empty, state)
    assert(job2.bookmarks.newFiles(spark, "t1", data.toString, "*.csv").isEmpty)
  }

  test("bookmarks hand out only new files and commit durably") {
    val state = java.nio.file.Files.createTempDirectory("bm").toString
    val data = java.nio.file.Files.createTempDirectory("bmdata")
    java.nio.file.Files.writeString(data.resolve("f1.csv"), "a")
    val bm = new Bookmarks(state)
    assert(bm.newFiles(spark, "ctx1", data.toString, "*.csv").map(f => f.split('/').last) == Seq("f1.csv"))
    bm.commit()
    // already processed -> nothing new
    assert(bm.newFiles(spark, "ctx1", data.toString, "*.csv").isEmpty)
    // new file appears -> only it is returned; a fresh Bookmarks sees the same state
    java.nio.file.Files.writeString(data.resolve("f2.csv"), "b")
    val bm2 = new Bookmarks(state)
    assert(bm2.newFiles(spark, "ctx1", data.toString, "*.csv").map(_.split('/').last) == Seq("f2.csv"))
    // uncommitted state is not durable
    val bm3 = new Bookmarks(state)
    assert(bm3.newFiles(spark, "ctx1", data.toString, "*.csv").map(_.split('/').last) == Seq("f2.csv"))
  }

  test("bookmark pause processes new files but never commits state") {
    val state = java.nio.file.Files.createTempDirectory("bmp").toString
    val data = java.nio.file.Files.createTempDirectory("bmpdata")
    java.nio.file.Files.writeString(data.resolve("f1.csv"), "a")
    val paused = new Bookmarks(state, BookmarkOption.Pause(None, None))
    assert(paused.newFiles(spark, "c", data.toString, "*.csv").size == 1)
    paused.commit() // must be a no-op
    val after = new Bookmarks(state)
    assert(after.newFiles(spark, "c", data.toString, "*.csv").size == 1,
      "pause leaked state: the file shows as already processed")
  }

  test("bookmark pause from/to replays exactly the files those runs committed") {
    val state = java.nio.file.Files.createTempDirectory("bmr").toString
    val data = java.nio.file.Files.createTempDirectory("bmrdata")
    // run 1 commits f1; run 2 commits f2; run 3 commits f3
    for (i <- 1 to 3) {
      java.nio.file.Files.writeString(data.resolve(s"f$i.csv"), s"$i")
      val bm = new Bookmarks(state)
      assert(bm.newFiles(spark, "c", data.toString, "*.csv").map(_.split('/').last) == Seq(s"f$i.csv"))
      bm.commit()
      assert(bm.currentRun("c") == i)
    }
    // replay (1, 3] = what runs 2 and 3 processed, without state updates
    val replay = new Bookmarks(state, BookmarkOption.Pause(Some(1L), Some(3L)))
    assert(replay.newFiles(spark, "c", data.toString, "*.csv").map(_.split('/').last)
      == Seq("f2.csv", "f3.csv"))
    replay.commit()
    assert(new Bookmarks(state).currentRun("c") == 3, "replay advanced the bookmark")
  }

  test("bookmark disable ignores state in both directions") {
    val state = java.nio.file.Files.createTempDirectory("bmd").toString
    val data = java.nio.file.Files.createTempDirectory("bmddata")
    java.nio.file.Files.writeString(data.resolve("f1.csv"), "a")
    val en = new Bookmarks(state)
    en.newFiles(spark, "c", data.toString, "*.csv"); en.commit()
    val dis = new Bookmarks(state, BookmarkOption.Disable)
    assert(dis.newFiles(spark, "c", data.toString, "*.csv").size == 1,
      "disable must reprocess everything")
    dis.commit()
    assert(new Bookmarks(state).currentRun("c") == 1)
  }

  test("bookmark run versioning holds over a randomized run sequence") {
    val rnd = new scala.util.Random(11)
    val state = java.nio.file.Files.createTempDirectory("bmseq").toString
    val data = java.nio.file.Files.createTempDirectory("bmseqdata")
    var next = 0
    val perRun = scala.collection.mutable.ArrayBuffer[Set[String]]()
    for (_ <- 1 to 8) {
      val added = (0 until rnd.nextInt(4)).map { _ =>
        val f = s"f$next.csv"; next += 1
        java.nio.file.Files.writeString(data.resolve(f), "x")
        f
      }.toSet
      val bm = new Bookmarks(state)
      val fresh = bm.newFiles(spark, "c", data.toString, "*.csv").map(_.split('/').last).toSet
      assert(fresh == added, s"run handed out $fresh, expected $added")
      bm.commit()
      if (added.nonEmpty) perRun += added
    }
    val bm = new Bookmarks(state)
    // run ids advanced once per non-empty run, in order
    assert(bm.currentRun("c") == perRun.size)
    for ((files, i) <- perRun.zipWithIndex) {
      assert(bm.rangePaths("c", i, i + 1).map(_.split('/').last).toSet == files)
    }
    // full range = everything ever committed
    assert(bm.rangePaths("c", 0, perRun.size).map(_.split('/').last).toSet
      == perRun.flatten.toSet)
  }

  test("GraftJob resolves bookmark options with the reference's validation quirks") {
    val state = java.nio.file.Files.createTempDirectory("jopt").toString
    // range options without pause -> invalid
    intercept[IllegalArgumentException] {
      GraftJob.init("j", Map("job-bookmark-option" -> "job-bookmark-enable",
        "job-bookmark-from" -> "1", "job-bookmark-to" -> "2"), state)
    }
    // pause with exactly one range option -> missing-option error
    intercept[IllegalArgumentException] {
      GraftJob.init("j", Map("job-bookmark-option" -> "job-bookmark-pause",
        "job-bookmark-from" -> "1"), state)
    }
    // pause with both, and pause with neither, are valid
    GraftJob.init("j", Map("job-bookmark-option" -> "job-bookmark-pause",
      "job-bookmark-from" -> "1", "job-bookmark-to" -> "2"), state)
    GraftJob.init("j", Map("job-bookmark-option" -> "job-bookmark-pause"), state)
    // reference quirk preserved: a SINGLE stray range option without pause
    // is silently ignored (utils.py only errors when both are present)
    GraftJob.init("j", Map("job-bookmark-option" -> "job-bookmark-enable",
      "job-bookmark-from" -> "1"), state)
  }
}
