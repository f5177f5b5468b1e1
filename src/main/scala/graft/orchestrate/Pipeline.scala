package graft.orchestrate

/** Sequential pipeline runner replacing the Step Function state machine
  * (SURVEY.md §3.1): named stages, per-stage status, retry with configurable
  * backoff matching the reference's policies (`orcs_glue_job.json:16-25`:
  * 3 attempts / 10 s interval / ×10 backoff for Glue tasks;
  * `cungtronghau.json:13-25`: 6 attempts / 2 s / ×2 for Lambda tasks).
  * The whole orchestration collapses into driver control flow — no process
  * boundaries, no poll loops.
  */
object Pipeline {

  case class RetryPolicy(maxAttempts: Int, intervalMs: Long, backoffRate: Double)
  object RetryPolicy {
    /** Step Function Glue-task policy (`orcs_glue_job.json:38-48`). */
    val GlueTask: RetryPolicy = RetryPolicy(3, 10000L, 10.0)
    /** Step Function Lambda-task policy (`cungtronghau.json:13-25`). */
    val LambdaTask: RetryPolicy = RetryPolicy(6, 2000L, 2.0)
    /** No retries. */
    val None: RetryPolicy = RetryPolicy(1, 0L, 1.0)
  }

  sealed trait StageStatus
  case class Succeeded(stage: String, attempts: Int, millis: Long) extends StageStatus
  case class Failed(stage: String, attempts: Int, error: Throwable) extends StageStatus
  /** The ledger says this stage committed in a PREVIOUS run — skipped. */
  case class Skipped(stage: String) extends StageStatus

  case class Stage(name: String, policy: RetryPolicy = RetryPolicy.None)(val body: () => Unit)

  /** A stage of a RESTARTABLE pipeline: `body` does the work (and must
    * tolerate finding its own committed output — the guard-then-act
    * idempotence the crash model requires), `repair` heals partial state
    * a crashed attempt may have left (e.g. [[graft.curate.Bm25
    * .repairIncIndex]] after a mid-append kill). `repair` runs before the
    * body whenever a previous attempt STARTED but did not commit — on
    * restart after a crash, and between in-process retries. */
  case class RecoverableStage(name: String,
                              policy: RetryPolicy = RetryPolicy.None)(
    val body: () => Unit)(val repair: () => Unit = () => ())

  /** Run stages in order; stop at the first stage that exhausts its
    * retries. Returns the per-stage status log. `sleeper` is injectable for
    * tests. */
  /** RESTARTABLE pipeline run (VERDICT r9 #5 — the crash-recovery
    * orchestration the lifecycle pieces compose into): per-stage COMMIT
    * markers in a filesystem ledger make the whole pipeline re-runnable
    * after a process kill. Protocol per stage, in order:
    *
    *  1. `done-NN-name` marker exists → the stage committed in a previous
    *     run → [[Skipped]], move on (restart skips finished work);
    *  2. `intent-NN-name` marker exists without `done` → a previous run
    *     was KILLED inside this stage → run `repair` first (heal partial
    *     state), then re-run the body;
    *  3. otherwise write the intent marker, run the body (with the
    *     stage's retry policy — `repair` runs between in-process retries
    *     too), and on success write `done` THEN drop `intent` (a crash
    *     between the two leaves both markers; `done` wins on restart).
    *
    * Markers are empty files created atomically; the ledger directory is
    * the restart token — delete it to force a from-scratch run. Stage
    * bodies must be guard-then-act idempotent (check for their own
    * committed output before redoing side effects): the crash window
    * between a body's last write and the `done` marker re-runs the body.
    * Halts at the first stage that exhausts retries, like [[run]] — the
    * ledger then lets the NEXT invocation resume exactly there. */
  def runRestartable(spark: org.apache.spark.sql.SparkSession,
                     ledgerDir: String, stages: Seq[RecoverableStage],
                     sleeper: Long => Unit = Thread.sleep): Seq[StageStatus] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    def marker(kind: String, i: Int, name: String) =
      new org.apache.hadoop.fs.Path(dir, f"$kind-$i%02d-$name")
    def touch(p: org.apache.hadoop.fs.Path): Unit = fs.create(p, true).close()
    val log = scala.collection.mutable.ArrayBuffer.empty[StageStatus]
    var halted = false
    for ((stage, i) <- stages.zipWithIndex if !halted) {
      val done = marker("done", i, stage.name)
      val intent = marker("intent", i, stage.name)
      if (fs.exists(done)) log += Skipped(stage.name)
      else {
        val crashed = fs.exists(intent)
        touch(intent)
        var attempt = 0
        var result: Option[StageStatus] = None
        val t0 = System.nanoTime()
        while (result.isEmpty) {
          attempt += 1
          try {
            if (crashed || attempt > 1) stage.repair()
            stage.body()
            result = Some(Succeeded(stage.name, attempt,
              (System.nanoTime() - t0) / 1000000L))
          } catch {
            case _: Throwable if attempt < stage.policy.maxAttempts =>
              sleeper((stage.policy.intervalMs *
                math.pow(stage.policy.backoffRate, (attempt - 1).toDouble)).toLong)
            case e: Throwable =>
              result = Some(Failed(stage.name, attempt, e))
              halted = true
          }
        }
        result.get match {
          case _: Succeeded => touch(done); fs.delete(intent, false)
          case _ => () // intent stays — the next run repairs + retries
        }
        log += result.get
      }
    }
    log.toSeq
  }

  def run(stages: Seq[Stage], sleeper: Long => Unit = Thread.sleep): Seq[StageStatus] = {
    val log = scala.collection.mutable.ArrayBuffer.empty[StageStatus]
    var halted = false
    for (stage <- stages if !halted) {
      var attempt = 0
      var result: Option[StageStatus] = None
      val t0 = System.nanoTime()
      while (result.isEmpty) {
        attempt += 1
        try {
          stage.body()
          result = Some(Succeeded(stage.name, attempt, (System.nanoTime() - t0) / 1000000L))
        } catch {
          case e: Throwable if attempt < stage.policy.maxAttempts =>
            val delay = (stage.policy.intervalMs *
              math.pow(stage.policy.backoffRate, (attempt - 1).toDouble)).toLong
            sleeper(delay)
          case e: Throwable =>
            result = Some(Failed(stage.name, attempt, e))
            halted = true
        }
      }
      log += result.get
    }
    log.toSeq
  }
}
