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

  case class Stage(name: String, policy: RetryPolicy = RetryPolicy.None)(val body: () => Unit)

  /** Run stages in order; stop at the first stage that exhausts its
    * retries. Returns the per-stage status log. `sleeper` is injectable for
    * tests. */
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
