package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler (not part of the library surface). */
object Profile21 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(0, 1000000).selectExpr("id % 7 as k").groupBy("k").count().count()

    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (record) {
        val si = sc.stageInfo
        val dur = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        val cpu = si.taskMetrics.executorCpuTime / 1e6
        val run = si.taskMetrics.executorRunTime
        println(f"[stage] id=${si.stageId}%3d tasks=${si.numTasks}%4d wall=${dur}%5d ms run=${run}%6d ms cpu=${cpu}%9.0f ms  ${si.name.takeWhile(_ != '\n').take(80)}")
      }
    })

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    // warm one full run, then record the second
    time("q22 warm")(graft.queries.Queries.q22MinhashPairs(spark, sfDir).count())
    spark.catalog.clearCache()
    record = true
    time("q22 recorded")(graft.queries.Queries.q22MinhashPairs(spark, sfDir).count())
    record = false
    spark.catalog.clearCache()
    time("q21 warm")(graft.queries.Queries.q21NgramJaccard(spark, sfDir).count())
    spark.catalog.clearCache()
    record = true
    time("q21 recorded")(graft.queries.Queries.q21NgramJaccard(spark, sfDir).count())
    spark.stop()
  }
}
