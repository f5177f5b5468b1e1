package graft.orchestrate

import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  import Pipeline._

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
}
