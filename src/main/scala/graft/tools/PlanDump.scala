package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dump `.explain("formatted")` evidence for named battery queries — the
  * optimization-round artifact (`plans/r<N>/<query>_{before,after}.txt`).
  *
  * Most lifecycle gates materialize on the driver and return a
  * LocalRelation, so the returned frame's plan is trivial; the plans that
  * matter are the ones the gate EXECUTES in flight. A
  * QueryExecutionListener captures every in-gate execution (with its
  * action name and duration) and the dump keeps the slowest few — plus
  * the returned frame's own formatted plan when it is non-trivial.
  * Constructing a gate query runs its lifecycle work, so sf0.01 keeps the
  * dump cheap; plan SHAPE is scale-independent. (Executions on a gate's
  * private `newSession()` — the streaming gates — are not observed by the
  * parent session's listener; those gates' claims are evidenced by
  * profiler job tables instead.)
  *
  * Usage: `sbt "runMain graft.tools.PlanDump <outDir> <suffix> q98_triangles,q74_cms_estimate [sfDir] [topN]"`
  * writes `<outDir>/q98_triangles_<suffix>.txt` etc.
  */
object PlanDump {
  private case class Rec(fn: String, durNs: Long, plan: String)

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.01")
    val topN = args.lift(4).map(_.toInt).getOrElse(6)
    new java.io.File(outDir).mkdirs()
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val recs = ArrayBuffer.empty[Rec]
    val listener = new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, durNs: Long): Unit =
        recs.synchronized {
          recs += Rec(fn, durNs, qe.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        }
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    names.foreach { name =>
      recs.synchronized(recs.clear())
      val df = graft.queries.Queries.all(name)(spark, sfDir)
      val finalPlan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      df.queryExecution.toRdd.count() // the bench action; fills AQE final plans
      Thread.sleep(1500)              // the execution-listener bus is async
      val (top, nTotal) = recs.synchronized {
        (recs.sortBy(-_.durNs).take(topN).toList, recs.length)
      }
      val sb = new StringBuilder
      sb ++= s"===== $name ($suffix) — returned frame plan =====\n"
      sb ++= finalPlan
      sb ++= s"\n\n===== in-gate executions: $nTotal captured; slowest $topN by duration =====\n"
      top.zipWithIndex.foreach { case (r, i) =>
        sb ++= f"\n----- #${i + 1}: action=${r.fn} duration=${r.durNs / 1e9}%.3fs -----\n"
        sb ++= r.plan
        sb ++= "\n"
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        sb.toString.getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt (${sb.length} chars, $nTotal execs)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
