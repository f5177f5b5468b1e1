package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "bal")

  test("applyChanges: last-wins update, delete override, insert, passthrough") {
    val changes = Seq(
      (1L, "a1", 11.0, "U", 1L), (1L, "a2", 12.0, "U", 2L), // last wins: a2/12
      (2L, "b", 20.0, "U", 1L), (2L, "b", 20.0, "D", 2L),   // delete overrides
      (4L, "d", 40.0, "I", 1L),                             // insert new key
      (5L, "e", 50.0, "I", 1L), (5L, "e", 50.0, "D", 2L)    // insert then delete = no-op
    ).toDF("k", "name", "bal", "op", "seq")
    val got = Cdc.applyChanges(base, changes, Seq("k"), "op", "seq")
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "a2", 12.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("applyChanges: empty change log is identity; missing payload rejected") {
    val empty = Seq.empty[(Long, String, Double, String, Long)]
      .toDF("k", "name", "bal", "op", "seq")
    val got = Cdc.applyChanges(base, empty, Seq("k"), "op", "seq")
      .as[(Long, String, Double)].collect().toSet
    assert(got == base.as[(Long, String, Double)].collect().toSet)
    intercept[IllegalArgumentException] {
      Cdc.applyChanges(base, Seq((1L, "x", 1L)).toDF("k", "op", "seq"),
        Seq("k"), "op", "seq")
    }
  }
  test("applyChanges == sequential reference fold over 5 seeded random logs") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val baseKeys = (0L until 30L).filter(_ => rnd.nextBoolean())
      val b = baseKeys.map(k => (k, s"n$k", k * 1.0)).toDF("k", "name", "bal")
      val log = (1L to 60L).map { seq =>
        val k = rnd.nextInt(40).toLong // keys beyond the base = inserts
        val op = rnd.nextInt(4) match { case 0 => "D"; case _ => "U" }
        (k, s"n$k-$seq", k + seq * 0.01, op, seq)
      }
      val changes = log.toDF("k", "name", "bal", "op", "seq")
      val got = Cdc.applyChanges(b, changes, Seq("k"), "op", "seq")
        .as[(Long, String, Double)].collect().toSet
      // reference: fold ops in seq order into a map
      var state = baseKeys.map(k => k -> ((s"n$k", k * 1.0))).toMap
      for ((k, name, bal, op, _) <- log.sortBy(_._5))
        state = if (op == "D") state - k else state + (k -> ((name, bal)))
      val expect = state.map { case (k, (n, v)) => (k, n, v) }.toSet
      assert(got == expect, s"seed $seed")
    }
  }
}
