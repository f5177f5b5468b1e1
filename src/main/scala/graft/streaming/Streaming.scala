package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.storage.StorageLevel

/** Structured-Streaming surface of the engine (SURVEY.md §2.13).
  *
  * The reference's streaming model is micro-batch `forEachBatch` with a
  * processing-time trigger, per-batch persist + empty-batch gate, and a
  * bounded retry loop (`context.py:602-664`). Event-time windows /
  * watermarks are NOT part of the reference surface, but
  * [[windowedAggregate]] provides them as the natural Spark extension.
  */
object Streaming {

  /** Streaming source factory (`getStreamingSource` /
    * `create_data_frame_from_options`, `context.py:122-147,284-293`):
    * connection_type picks the stream transport — kafka/kinesis go through
    * their Spark source names; file-ish types through the schema'd file
    * stream source. (Kafka/kinesis connectors are separate artifacts; the
    * spec routing is the engine surface.) */
  def source(spark: SparkSession, connectionType: String,
             options: Map[String, String] = Map.empty,
             format: Option[String] = None,
             path: Option[String] = None,
             schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r0 = spark.readStream.options(options)
    val r = schema.fold(r0)(r0.schema)
    connectionType match {
      case "kafka" | "kinesis" => r.format(connectionType).load()
      case "s3" | "file" =>
        val fmt = format.getOrElse("parquet")
        r.format(fmt).load(path.getOrElse(options("path")))
      case other => r.format(other).load()
    }
  }

  case class ForEachBatchOptions(
      windowSize: String = "10 seconds",        // processing-time trigger
      checkpointLocation: Option[String] = None,
      batchMaxRetries: Int = 3,                 // default 3, range 0-100 (context.py:643-645)
      persistDataFrame: Boolean = true,         // persist+count gate (context.py:627-638)
      storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK,
      availableNow: Boolean = false)            // drain-all-then-stop trigger (batch-style backfills)

  /** `GlueContext.forEachBatch` (`context.py:602-664`): wraps the user fn
    * with (a) persist + count so empty batches are skipped without running
    * the body, (b) a retry loop with linear backoff, (c) unpersist in a
    * finally. Exceptions after the last retry propagate and fail the query.
    */
  def forEachBatch(stream: DataFrame, opts: ForEachBatchOptions)
                  (fn: (DataFrame, Long) => Unit): StreamingQuery = {
    require(opts.batchMaxRetries >= 0 && opts.batchMaxRetries <= 100,
      "batchMaxRetries must be in [0, 100]")
    val trigger =
      if (opts.availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(opts.windowSize)
    val writer = stream.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val frame = if (opts.persistDataFrame) batch.persist(opts.storageLevel) else batch
        try {
          if (frame.count() > 0) {           // empty-batch gate
            var attempt = 0
            var done = false
            while (!done) {
              try { fn(frame, batchId); done = true }
              catch {
                case e: Throwable if attempt < opts.batchMaxRetries =>
                  attempt += 1
                  Thread.sleep(100L * attempt) // linear backoff
                case e: Throwable => throw e
              }
            }
          }
        } finally if (opts.persistDataFrame) frame.unpersist()
      }
    opts.checkpointLocation.fold(writer)(c => writer.option("checkpointLocation", c)).start()
  }

  /** Ingestion-time partitioning columns (`context.py:666-674`): append
    * ingest_year/month/day/hour/minute up to the requested granularity. */
  def withIngestionTimeColumns(df: DataFrame, granularity: String = "hour"): DataFrame = {
    val order = Seq("year", "month", "day", "hour", "minute")
    val n = order.indexOf(granularity)
    require(n >= 0, s"granularity must be one of $order")
    val ts = current_timestamp()
    val adds: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "ingest_year" -> date_format(ts, "yyyy"),
      "ingest_month" -> date_format(ts, "MM"),
      "ingest_day" -> date_format(ts, "dd"),
      "ingest_hour" -> date_format(ts, "HH"),
      "ingest_minute" -> date_format(ts, "mm"))
    adds.take(n + 1).foldLeft(df) { case (d, (c, e)) => d.withColumn(c, e) }
  }

  /** Stream sampler (`getSampleStreamingDynamicFrame`, `context.py:553-599`):
    * memory sink + limit poll, then stop. Synchronous for batch-backed
    * streams via processAllAvailable. */
  def sampleStream(spark: SparkSession, stream: DataFrame, num: Int,
                   queryName: String = s"graft_sample"): DataFrame = {
    val q = stream.writeStream
      .format("memory").queryName(queryName).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName).limit(num)
  }

  /** Exact dedup across micro-batches — the streaming-ingest twin of
    * [[graft.dedup.Dedup.exact]]: state-store-backed drop of any row whose
    * `keys` (typically a content hash) were already seen, with state aged
    * out by the watermark so it stays bounded by the dedup horizon instead
    * of growing with the stream. At scale, dedup-at-ingest costs one
    * state lookup per row vs re-scanning the corpus in batch. */
  def streamingDedup(stream: DataFrame, tsCol: String, watermark: String,
                     keys: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-static enrichment: join a stream against a static dimension
    * (the lookup-table shape — enrich events with customer/segment/dim
    * attributes at ingest). The static side is broadcast by default: a
    * stream-static join re-evaluates the static plan per micro-batch, and
    * a broadcast keeps that re-evaluation shuffle-free — the stream side
    * never exchanges at all. Set `broadcastDim = false` only when the
    * dimension is too big to broadcast (then every micro-batch pays a
    * shuffle on both sides). */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame, keys: Seq[String],
                       joinType: String = "inner",
                       broadcastDim: Boolean = true): DataFrame =
    stream.join(
      if (broadcastDim) org.apache.spark.sql.functions.broadcast(dim) else dim,
      keys, joinType)

  /** Event-time windowed aggregation with watermark — the Spark-native
    * extension beyond the reference surface. */
  def windowedAggregate(stream: DataFrame, tsCol: String, watermark: String,
                        windowDuration: String,
                        aggs: Seq[org.apache.spark.sql.Column],
                        extraKeys: Seq[String] = Nil): DataFrame = {
    val keys = window(col(tsCol), windowDuration) +: extraKeys.map(col)
    stream.withWatermark(tsCol, watermark)
      .groupBy(keys: _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}

/** The `Job.init/commit` lifecycle (`glue-jobs/awsglue/job.py:13-48`):
  * a named job run owning a [[Bookmarks]] store; `commit()` flushes all
  * bookmark state handed out during the run. The bookmark option and
  * range are resolved from `args` exactly like `getResolvedOptions`
  * (`utils.py:130-155`), quirks preserved: with pause the range options
  * come in pairs (exactly one missing is an error; both missing means
  * "pause at the current bookmark"); without pause, BOTH present is an
  * error but a single stray `from`/`to` is SILENTLY ignored — that is
  * what the reference's `len(absent) == 0` check does, faithfully kept. */
class GraftJob private (val name: String, val args: Map[String, String],
                        val bookmarks: Bookmarks) {
  def commit(): Unit = bookmarks.commit()
}

object GraftJob {
  def init(name: String, args: Map[String, String], stateDir: String): GraftJob = {
    val opt = args.getOrElse("job-bookmark-option", "job-bookmark-enable")
    val range = Seq("job-bookmark-from", "job-bookmark-to").map(args.get)
    val absent = range.count(_.isEmpty)
    val mode: BookmarkOption = opt match {
      case "job-bookmark-pause" =>
        if (absent == 1)
          throw new IllegalArgumentException(
            "Missing option or value for job-bookmark-from/job-bookmark-to")
        (range.head, range(1)) match {
          case (Some(f), Some(t)) => BookmarkOption.Pause(Some(f.toLong), Some(t.toLong))
          case _                  => BookmarkOption.Pause(None, None)
        }
      case other =>
        if (absent == 0)
          throw new IllegalArgumentException(
            "Invalid option(s) job-bookmark-from job-bookmark-to")
        if (other == "job-bookmark-disable") BookmarkOption.Disable
        else BookmarkOption.Enable
    }
    new GraftJob(name, args, new Bookmarks(s"$stateDir/$name", mode))
  }
}

/** Bookmark behavior (`Job.job_bookmark_options()`, `utils.py:130-155`):
  * Enable advances state on commit; Disable ignores state entirely;
  * Pause processes without EVER updating state — with a (from, to] run-id
  * range it replays exactly the files those past runs committed. */
sealed trait BookmarkOption
object BookmarkOption {
  case object Enable extends BookmarkOption
  case object Disable extends BookmarkOption
  final case class Pause(fromRun: Option[Long], toRun: Option[Long]) extends BookmarkOption
}

/** Job bookmarks (`job.py:13-48`, `utils.py:79-158`): incremental file
  * processing keyed by a `transformation_ctx` string. State is a manifest
  * of already-processed file paths, versioned by the run id that committed
  * them (`<runId>\t<path>` lines; legacy un-tabbed lines read as run 0) —
  * run versioning is what makes `job-bookmark-pause` from/to replay
  * possible. `commit()` flushes pending paths under a fresh run id. File
  * listing happens driver-side once per run — at scale swap the manifest
  * for a Structured Streaming file source checkpoint, which has the same
  * exactly-once listing semantics.
  */
class Bookmarks(stateDir: String, option: BookmarkOption = BookmarkOption.Enable) {
  import scala.jdk.CollectionConverters._
  private val fs = java.nio.file.Paths.get(stateDir)
  java.nio.file.Files.createDirectories(fs)
  private var pending = Map.empty[String, Set[String]]

  private def stateFile(ctx: String) = fs.resolve(s"$ctx.manifest")

  private def entries(ctx: String): Seq[(Long, String)] = {
    val f = stateFile(ctx)
    if (!java.nio.file.Files.exists(f)) Nil
    else java.nio.file.Files.readAllLines(f).asScala.toSeq.filter(_.nonEmpty).map { line =>
      line.split("\t", 2) match {
        case Array(run, path) if run.forall(_.isDigit) => (run.toLong, path)
        case _                                         => (0L, line) // legacy manifest
      }
    }
  }

  def processedPaths(ctx: String): Set[String] = entries(ctx).map(_._2).toSet

  /** Highest run id recorded for `ctx` (0 when never committed). */
  def currentRun(ctx: String): Long = (0L +: entries(ctx).map(_._1)).max

  /** Files the runs in (fromRun, toRun] committed for `ctx` — the
    * `job-bookmark-pause --job-bookmark-from --job-bookmark-to` replay set. */
  def rangePaths(ctx: String, fromRun: Long, toRun: Long): Seq[String] =
    entries(ctx).filter { case (r, _) => r > fromRun && r <= toRun }.map(_._2).distinct.sorted

  /** Files to process under `dir` for this context, per the bookmark
    * option: Enable = unseen files (remembered as pending until
    * [[commit]]); Disable = everything, state untouched; Pause = unseen
    * files WITHOUT remembering them (commit is a no-op), or the recorded
    * (from, to] replay range when one was given. */
  def newFiles(spark: SparkSession, ctx: String, dir: String, glob: String = "*"): Seq[String] = {
    option match {
      case BookmarkOption.Pause(Some(f), Some(t)) => return rangePaths(ctx, f, t)
      case _ => ()
    }
    import org.apache.hadoop.fs.{FileSystem, Path}
    val p = new Path(dir)
    val hfs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    if (!hfs.exists(p)) return Nil
    val all = hfs.globStatus(new Path(p, glob)).toSeq
      .filter(_.isFile).map(_.getPath.toString)
    option match {
      case BookmarkOption.Disable => all.sorted
      case BookmarkOption.Pause(_, _) =>
        all.filterNot(processedPaths(ctx).contains).sorted // never committed
      case BookmarkOption.Enable =>
        val fresh = all.filterNot(processedPaths(ctx).contains).sorted
        pending = pending.updated(ctx, pending.getOrElse(ctx, Set.empty) ++ fresh)
        fresh
    }
  }

  /** `Job.commit()`: durably record everything handed out by newFiles
    * under the next run id. No-op under Disable/Pause (nothing pends). */
  def commit(): Unit = {
    pending.foreach { case (ctx, paths) =>
      val run = currentRun(ctx) + 1
      val lines = (entries(ctx) ++ paths.toSeq.sorted.map((run, _)))
        .map { case (r, path) => s"$r\t$path" }
      java.nio.file.Files.write(stateFile(ctx), lines.asJava)
    }
    pending = Map.empty
  }
}
