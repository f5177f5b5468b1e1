package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints a short total-only JSON line, then the full JSON
  * line, and writes the full JSON whole to SPARK_GRAFT_BENCH_OUT
  * (default ./BENCH_LOCAL.json):
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "loadavg":L,"calibration_sec":C,"resampled":[...],"errors":{...}}
  *
  * Measurement-validity hardening (VERDICT r2 task 1):
  *  - query failures are captured per-query in "errors" (never folded into a
  *    timing) and the process exits non-zero if any query failed;
  *  - "loadavg" (1-min /proc/loadavg) and "calibration_sec" (a fixed
  *    CPU-bound loop timed in-process) let the driver/judge detect a loaded
  *    machine: on idle 32-core hardware the calibration loop runs in a
  *    stable time, so a 2-3x inflated value means the numbers are noise;
  *  - any query whose two samples disagree by >3x is re-measured (up to two
  *    extra samples) and listed in "resampled" — the min over all samples is
  *    reported, which is the steady-state cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val benchT0 = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Fixed CPU-bound calibration: single-threaded xorshift loop. Its time on
    // this hardware is machine-load-sensitive but workload-independent, so it
    // calibrates the run (recorded in the JSON, and measured BEFORE the
    // warm-up so it reflects the same conditions the queries see).
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9e3779b97f4a7c15L; var i = 0
      while (i < 200000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      if (x == 42) println("") // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e9
    }
    val calibrationSec = calibrate()
    // PARALLEL calibration (r14): the single-threaded loop cannot see
    // host-level CPU steal/throttling that only bites wide parallel
    // stages — measured this round: calibration_sec 0.38 (healthy) while
    // a 32-way version of the same loop ran 1.64× its ideal and
    // /proc/stat showed 22% steal, inflating the battery ~30%. The ratio
    // calibration_par_sec / calibration_sec ≈ 1 on honest hardware;
    // well above 1 means wide stages are being throttled and the numbers
    // are not baseline-comparable even at low loadavg.
    val calibrationParSec = {
      val n = cpus.toInt
      val t0 = System.nanoTime()
      val threads = (0 until n).map { _ => new Thread(() => calibrate()) }
      threads.foreach(_.start()); threads.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    def stealJiffies(): Long =
      try scala.io.Source.fromFile("/proc/stat").getLines().next()
        .trim.split("\\s+").drop(1).lift(7).map(_.toLong).getOrElse(-1L)
      catch { case _: Throwable => -1L }
    val steal0 = stealJiffies()
    val loadavg =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // Pre-flight load discipline (VERDICT r7 task 7): three of four driver
    // benches ran at loadavg >= 3.9 and every round re-adjudicated load
    // noise by hand. Label the run up front — "contended": true means the
    // timings are NOT comparable to calm baselines and nobody should chase
    // regressions in them. Labeling, not refusing: the driver's bench must
    // still produce a JSON under load, it just arrives pre-adjudicated.
    val contended = loadavg > 2.0
    if (contended)
      System.err.println(f"bench: PRE-FLIGHT WARNING loadavg=$loadavg%.2f > 2.0 " +
        "— timings will be labeled \"contended\":true and are not baseline-comparable")

    // Warm up the JVM/codegen paths so the first timed query isn't charged
    // for session bring-up: one shuffle + one parquet scan.
    spark.range(0, 1000000).selectExpr("id % 7 as k").groupBy("k").count().count()
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    // One timed sample; Left(error) if the query throws — never a fake timing.
    // toRdd.count(), NOT Dataset.count(): a count() on top of the query
    // lets Catalyst prune aggregate expressions and even ELIMINATE whole
    // joins whose right side is distinct-keyed — q98's entire triangle
    // computation optimized away under count() and the bench measured
    // node counting for two rounds (r7 discovery, PERF.md). toRdd drives
    // the query exactly as written (AQE included) and produces every
    // output row, which is what a real consumer pays.
    // Per-SAMPLE steal share (r14): battery-wide steal_pct averages away a
    // steal burst that lands on one query's window — r14e read q98 at
    // 19 s with battery steal 1.04% while the same code profiled 5.9–9 s
    // in every standalone window. Each timed sample records the host
    // steal share of ITS OWN window so a per-query outlier carries its
    // adjudication label with it ("steal_windows" in the JSON, additive).
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, (Double, Int, Double)] = {
      val st0 = stealJiffies()
      val t0 = System.nanoTime()
      val res =
        try { fn(spark, sfDir).queryExecution.toRdd.count(); Right((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
        }
      val stealQ = {
        val s1 = stealJiffies()
        val wallJ = (System.nanoTime() - t0) / 1e7 * cpus.toInt
        if (st0 < 0 || s1 < 0 || wallJ <= 0) -1.0
        else math.round((s1 - st0) / wallJ * 10000) / 100.0
      }
      // clear between measurements so library persists (LSH signatures etc.)
      // don't leak across queries; the explicit GC lets the ContextCleaner
      // reap accumulated broadcasts/shuffle files NOW instead of mid-query —
      // without it, late-battery queries are charged for earlier queries'
      // garbage (measured: q44 2.24 s late in the battery vs 0.77 s alone)
      spark.catalog.clearCache()
      // catalog.clearCache() drops SQL-cached relations ONLY — RDDs pinned
      // by localCheckpoint(eager) (the library's iteration/streaming
      // device) and by direct persists stay in storage memory until the
      // ContextCleaner happens to reap their GC'd handles, so a battery
      // neighbor runs with storage memory occupied (the q98 in-battery 4x
      // tail — VERDICT r9 #2). Unpersist them NOW, blocking, and report
      // how many were found per query ("persisted_rdds" in the JSON) so
      // storage leaks are attributable instead of smearing into neighbors.
      val leaked = spark.sparkContext.getPersistentRDDs
      leaked.values.foreach(_.unpersist(blocking = true))
      System.gc()
      res.map(t => (t, leaked.size, stealQ))
    }

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val resampled = scala.collection.mutable.ArrayBuffer[String]()
    // Optional comma-separated query filter for profiling a subset locally;
    // the driver never sets it, so recorded rounds always run the full battery.
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val leaks = scala.collection.mutable.LinkedHashMap[String, Int]()
    // steal share of the window the REPORTED (min) sample ran in, for
    // queries where it exceeded 2% — the per-query adjudication label
    val stealWindows = scala.collection.mutable.LinkedHashMap[String, Double]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // best-of-N: first run warms codegen/file cache; if the two samples
      // disagree >3x (scheduler/GC interference), take up to two more.
      val samples = List(timeOnce(fn), timeOnce(fn))
      samples.collectFirst { case Left(e) => e }.foreach(errors(name) = _)
      var ok = samples.collect { case Right((s, _, st)) => (s, st) }
      // leak telemetry covers EVERY run, resamples included — a query
      // that leaks only on its slow contended runs is exactly the case
      // the persisted_rdds field exists to attribute (r10 review)
      var leak = samples.collect { case Right((_, n, _)) => n }
        .maxOption.getOrElse(0)
      if (ok.size == 2 && ok.map(_._1).max / math.max(ok.map(_._1).min, 1e-9) > 3.0) {
        resampled += name
        var extra = 0
        while (extra < 2 && ok.map(_._1).max / math.max(ok.map(_._1).min, 1e-9) > 3.0) {
          timeOnce(fn) match {
            case Right((s, n, st)) => ok = ok :+ (s, st); leak = math.max(leak, n)
            case Left(e)       => errors(name) = e // flaky failure counts as failure
          }
          extra += 1
        }
      }
      if (leak > 0) leaks(name) = leak
      val best = if (ok.isEmpty) -1.0 else ok.map(_._1).min
      ok.find(_._1 == best).map(_._2).filter(_ > 2.0)
        .foreach(stealWindows(name) = _)
      name -> best
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      // Spark messages routinely contain newlines — control chars would
      // break the one-line JSON contract exactly when errors matter
      val esc = v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\x00-\\x1f]", " ")
      "\"" + k + "\":\"" + esc + "\""
    }.mkString("{", ",", "}")
    val resJson = resampled.map("\"" + _ + "\"").mkString("[", ",", "]")
    val leakJson = leaks.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val stealWinJson = stealWindows.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Truncation-proof evidence (VERDICT r4 task 2, r5 task 8): BENCH_r04
    // came back `parsed: null` because the driver's capture cut the single
    // long line mid-JSON, and r04/r05 both showed the capture keeps the
    // TAIL and truncates the head. Four redundant emissions, any one of
    // which is sufficient:
    //  1. a SHORT total-only JSON line FIRST (fits any capture budget);
    //  2. the full one-line JSON (the original driver contract);
    //  3. the same full JSON written whole to a file;
    //  4. the SHORT line again LAST — a tail-keeping capture always ends
    //     with a parseable total.
    // battery-wide steal share: jiffies stolen by the host during the
    // run over total cpu-time capacity (cpus × wall, in USER_HZ=100)
    val stealPct = {
      val s1 = stealJiffies()
      if (steal0 < 0 || s1 < 0) -1.0
      else {
        val wallJiffies = (System.nanoTime() - benchT0) / 1e7 * cpus.toInt
        if (wallJiffies <= 0) -1.0
        else math.round((s1 - steal0) / wallJiffies * 10000) / 100.0
      }
    }
    val shortLine =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","loadavg":$loadavg,"calibration_sec":$calibrationSec,"calibration_par_sec":$calibrationParSec,"steal_pct":$stealPct,"contended":$contended}"""
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","loadavg":$loadavg,"calibration_sec":$calibrationSec,"calibration_par_sec":$calibrationParSec,"steal_pct":$stealPct,"contended":$contended,"resampled":$resJson,"persisted_rdds":$leakJson,"steal_windows":$stealWinJson,"errors":$errJson}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"bench: could not write $outFile: ${e.getMessage}") }
    println(shortLine)
    println(fullLine)
    println(shortLine)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
