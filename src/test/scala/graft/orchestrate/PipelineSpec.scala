package graft.orchestrate

import graft.SparkSpec

class PipelineSpec extends SparkSpec {
  import Pipeline._

  private def freshLedger(): String =
    java.nio.file.Files.createTempDirectory("graft_ledger_").toString

  test("stages run in order; all succeed") {
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    val log = Pipeline.run(Seq(
      Stage("extract")(() => order += "extract"),
      Stage("transform")(() => order += "transform")))
    assert(order.toSeq == Seq("extract", "transform"))
    assert(log.forall(_.isInstanceOf[Succeeded]))
  }

  test("retry with backoff matches the Glue-task policy") {
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    var tries = 0
    val log = Pipeline.run(Seq(Stage("flaky", RetryPolicy.GlueTask) { () =>
      tries += 1
      if (tries < 3) throw new RuntimeException("transient")
    }), sleeper = d => delays += d)
    assert(log == Seq(log.head))
    assert(log.head.asInstanceOf[Succeeded].attempts == 3)
    assert(delays.toSeq == Seq(10000L, 100000L)) // 10s, then ×10 backoff
  }

  test("exhausted retries halt the pipeline; later stages don't run") {
    var ran = false
    val log = Pipeline.run(Seq(
      Stage("bad", RetryPolicy(2, 1L, 1.0))(() => throw new RuntimeException("nope")),
      Stage("after")(() => ran = true)), sleeper = _ => ())
    assert(log.length == 1)
    val f = log.head.asInstanceOf[Failed]
    assert(f.attempts == 2 && f.error.getMessage == "nope")
    assert(!ran)
  }

  test("runRestartable: fresh run commits every stage; restart skips them all") {
    val ledger = freshLedger()
    val runs = scala.collection.mutable.ArrayBuffer.empty[String]
    var repairs = 0
    def stages = Seq(
      RecoverableStage("ingest")(() => runs += "ingest")(() => repairs += 1),
      RecoverableStage("publish")(() => runs += "publish")(() => repairs += 1))
    val first = Pipeline.runRestartable(spark, ledger, stages)
    assert(first.map(_.getClass.getSimpleName) == Seq("Succeeded", "Succeeded"))
    assert(runs.toSeq == Seq("ingest", "publish"))
    assert(repairs == 0, "a clean first attempt must not run repair")
    val second = Pipeline.runRestartable(spark, ledger, stages)
    assert(second == Seq(Skipped("ingest"), Skipped("publish")))
    assert(runs.toSeq == Seq("ingest", "publish"), "restart must not re-run bodies")
  }

  test("runRestartable: kill mid-stage -> restart repairs, re-runs, continues; earlier stages skipped") {
    val ledger = freshLedger()
    val events = scala.collection.mutable.ArrayBuffer.empty[String]
    var crash = true
    def stages = Seq(
      RecoverableStage("ingest")(() => events += "ingest")(),
      RecoverableStage("append")({ () =>
        events += "append"
        if (crash) throw new RuntimeException("killed mid-append")
      })(() => events += "repair"),
      RecoverableStage("serve")(() => events += "serve")())
    val crashed = Pipeline.runRestartable(spark, ledger, stages)
    assert(crashed.map(_.getClass.getSimpleName) == Seq("Succeeded", "Failed"))
    assert(events.toSeq == Seq("ingest", "append"), "halt at the failed stage")
    crash = false
    events.clear()
    val resumed = Pipeline.runRestartable(spark, ledger, stages)
    assert(resumed.head == Skipped("ingest"))
    assert(resumed.tail.map(_.getClass.getSimpleName) == Seq("Succeeded", "Succeeded"))
    // the intent marker from the killed run forces repair BEFORE the body
    assert(events.toSeq == Seq("repair", "append", "serve"))
    // and a third invocation is a full no-op
    assert(Pipeline.runRestartable(spark, ledger, stages)
      .forall(_.isInstanceOf[Skipped]))
  }

  test("runRestartable: crash between done-write and intent-delete -> done wins on restart") {
    val ledger = freshLedger()
    var body = 0
    def stages = Seq(RecoverableStage("only")(() => body += 1)())
    Pipeline.runRestartable(spark, ledger, stages)
    assert(body == 1)
    // simulate the crash window: done exists AND intent re-appears
    val fs = new org.apache.hadoop.fs.Path(ledger)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(ledger, "intent-00-only"), true).close()
    val log = Pipeline.runRestartable(spark, ledger, stages)
    assert(log == Seq(Skipped("only")) && body == 1)
  }

  test("runRestartable: repair runs between in-process retries") {
    val ledger = freshLedger()
    val events = scala.collection.mutable.ArrayBuffer.empty[String]
    var tries = 0
    val log = Pipeline.runRestartable(spark, ledger, Seq(
      RecoverableStage("flaky", RetryPolicy(3, 1L, 1.0))({ () =>
        tries += 1; events += s"body$tries"
        if (tries < 3) throw new RuntimeException("transient")
      })(() => events += "repair")), sleeper = _ => ())
    assert(log.head.asInstanceOf[Succeeded].attempts == 3)
    assert(events.toSeq ==
      Seq("body1", "repair", "body2", "repair", "body3"))
  }
}
