package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level profile of named battery queries under the EXACT Bench
  * session shape (local[32], shuffle.partitions = cpus, AQE on): runs
  * each query once to warm codegen/file caches, then times the second
  * run (the one Bench's best-of-2 reports) with a listener recording
  * every Spark job's wall time and call site. Prints, per query:
  *
  *   wall            total second-run wall-clock
  *   jobs            number of Spark jobs the run scheduled
  *   sum(job)        total in-job time (overlapping jobs sum > wall)
  *   driver gap      wall − span covered by jobs ≈ driver-side work
  *                   (planning, file listing, metadata fs ops, collect
  *                   post-processing) — the §7.3 signal
  *   top jobs        slowest jobs with their call sites
  *
  * Usage: `sbt "runMain graft.tools.ProfileQuery q182_restartable_pipeline[,q225_versioned_mixed] [sfDir] [topN]"`
  */
object ProfileQuery {
  private case class Job(id: Int, desc: String, t0: Long, var t1: Long = -1L)

  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val topN = args.lift(2).map(_.toInt).getOrElse(12)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val p = js.properties
        val desc = Option(p).flatMap(pp =>
          Option(pp.getProperty("spark.job.description"))).orElse(
          js.stageInfos.lastOption.map(si =>
            si.name + " [" + js.stageInfos.map(_.numTasks).sum + " tasks/" +
              js.stageInfos.length + " stages]"))
          .getOrElse("?")
        jobs.put(js.jobId, Job(js.jobId, desc, System.nanoTime()))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach(_.t1 = System.nanoTime())
      }
    }

    // same warm-up as Bench
    spark.range(0, 1000000).selectExpr("id % 7 as k").groupBy("k").count().count()
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      graft.queries.Queries.all(name)(spark, sfDir)
        .queryExecution.toRdd.count()
      val w = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      w
    }

    val qs = if (names.nonEmpty) names else graft.queries.Queries.all.keys.toSeq.sorted
    qs.foreach { name =>
      runOnce(name) // warm
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val wall = runOnce(name)
      spark.sparkContext.removeSparkListener(listener)
      // drain listener bus before reading
      Thread.sleep(200)
      val done = jobs.values().toArray(Array.empty[Job]).filter(_.t1 > 0)
        .sortBy(_.t0)
      val sumJob = done.map(j => (j.t1 - j.t0) / 1e9).sum
      // merged span covered by >=1 running job
      val covered = {
        var cov = 0L; var end = Long.MinValue
        done.foreach { j =>
          if (j.t0 > end) { cov += j.t1 - j.t0; end = j.t1 }
          else if (j.t1 > end) { cov += j.t1 - end; end = j.t1 }
        }
        cov / 1e9
      }
      println(f"===== $name  wall=$wall%.3fs jobs=${done.length} " +
        f"sum(job)=$sumJob%.3fs covered=$covered%.3fs driverGap=${wall - covered}%.3fs")
      done.sortBy(j => j.t0 - j.t1).take(topN).foreach { j =>
        println(f"  ${(j.t1 - j.t0) / 1e9}%8.3fs  job=${j.id}%4d  ${j.desc.take(140)}")
      }
    }
    spark.stop()
  }
}
