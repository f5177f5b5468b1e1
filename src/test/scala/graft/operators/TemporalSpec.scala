package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    ("u1", 10L, "a"), ("u1", 20L, "b"), ("u1", 30L, "c"),
    ("u2", 5L, "d"), // before any right row
    ("u3", 50L, "e") // key absent on the right
  ).toDF("k", "ts", "tag")

  private def right = Seq(
    ("u1", 10L, 1.0), ("u1", 25L, 2.0),
    ("u2", 6L, 9.0)
  ).toDF("k", "ts", "v")

  test("asofJoin picks the latest right row at or before each left ts") {
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
      .select(col("tag"), col("asof_ts"), col("asof_v"))
      .as[(String, Option[Long], Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out("a") == ((Some(10L), Some(1.0)))) // equal ts matches (<=)
    assert(out("b") == ((Some(10L), Some(1.0))))
    assert(out("c") == ((Some(25L), Some(2.0))))
    assert(out("d") == ((None, None))) // nothing at or before
    assert(out("e") == ((None, None))) // key missing on the right
  }

  test("asofJoin tie-break is deterministic: max payload among tied right rows") {
    // three right rows share the winning (key, ts) — the max (v, ts) payload
    // must win no matter how the shuffle lands
    val l = Seq(("u1", 20L, "x")).toDF("k", "ts", "tag")
    val r = Seq(("u1", 10L, 1.0), ("u1", 10L, 7.0), ("u1", 10L, 3.0))
      .toDF("k", "ts", "v")
    (1 to 3).foreach { _ =>
      val out = Temporal.asofJoin(l, r.repartition(5), Seq("k"), "ts", Seq("v"))
        .select(col("asof_v")).as[Double].collect()
      assert(out.toSeq == Seq(7.0))
    }
  }

  test("asofJoin null keys follow SQL join semantics (never match)") {
    val l = Seq((Some("u1"), 20L, "a"), (None, 20L, "b")).toDF("k", "ts", "tag")
    val r = Seq((Some("u1"), 10L, 1.0), (None, 5L, 9.0)).toDF("k", "ts", "v")
    val out = Temporal.asofJoin(l, r, Seq("k"), "ts", Seq("v"))
      .select(col("tag"), col("asof_v")).as[(String, Option[Double])]
      .collect().toMap
    assert(out("a") == Some(1.0))
    assert(out("b").isEmpty, "null-key left row must keep left-outer nulls")
  }

  test("strict mode excludes equal-ts right rows") {
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", Seq("v"), strict = true)
      .select(col("tag"), col("asof_ts")).as[(String, Option[Long])].collect().toMap
    assert(out("a").isEmpty) // the ts=10 right row no longer matches ts=10 left
    assert(out("b") == Some(10L))
  }

  test("left row count is preserved exactly (no fan-out, no loss)") {
    val l = spark.range(0, 1000).select(
      (col("id") % 7).as("k"), col("id").as("ts"), col("id").as("x"))
    val r = spark.range(0, 300).select(
      (col("id") % 7).as("k"), (col("id") * 3).as("ts"), col("id").as("v"))
    val out = Temporal.asofJoin(l, r, Seq("k"), "ts", Seq("v"))
    assert(out.count() == 1000)
    assert(out.columns.contains("asof_v") && out.columns.contains("asof_ts"))
  }

  test("intervalJoin matches points to containing intervals exactly once") {
    val points = Seq(("u1", 5L), ("u1", 15L), ("u1", 100L), ("u2", 7L))
      .toDF("k", "pt")
    val ivs = Seq(
      ("u1", 0L, 10L, "w1"), ("u1", 4L, 20L, "w2"), // overlapping windows
      ("u2", 50L, 60L, "w3"),
      ("u1", 30L, 20L, "bad") // inverted interval: dropped
    ).toDF("k", "s", "e", "w")
    val got = Temporal.intervalJoin(points, ivs, Seq("k"), "pt", "s", "e", binWidth = 7L)
      .select(col("pt"), col("w")).as[(Long, String)].collect().toSet
    // pt=5 in w1 and w2; pt=15 only w2 (even though it spans 3 bins -> no dups);
    // pt=100 and u2's pt=7 match nothing
    assert(got == Set((5L, "w1"), (5L, "w2"), (15L, "w2")))
  }

  test("intervalJoin plans an equi-join on (key, bin), not a nested loop") {
    val points = Seq(("u1", 5L)).toDF("k", "pt")
    val ivs = Seq(("u1", 0L, 10L)).toDF("k", "s", "e")
    val p = Temporal.intervalJoin(points, ivs, Seq("k"), "pt", "s", "e", 7L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"range join degenerated to a cross product:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"expected a hash-key join:\n$p")
  }

  test("plan shape: one exchange on the key, no join node at all") {
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"expected exactly one key exchange:\n$p")
  }

  test("asofJoinForward picks the earliest right row at or after each left ts") {
    val out = Temporal.asofJoinForward(left, right, Seq("k"), "ts", Seq("v"))
      .select(col("tag"), col("next_ts"), col("next_v"))
      .as[(String, Option[Long], Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out("a") == ((Some(10L), Some(1.0)))) // equal ts matches (>=)
    assert(out("b") == ((Some(25L), Some(2.0))))
    assert(out("c") == ((None, None))) // nothing after
    assert(out("d") == ((Some(6L), Some(9.0))))
    assert(out("e") == ((None, None))) // key missing on the right
  }

  test("asofJoinForward strict excludes the equal-ts row") {
    val out = Temporal.asofJoinForward(left, right, Seq("k"), "ts", Seq("v"),
        strict = true)
      .select(col("tag"), col("next_ts")).as[(String, Option[Long])]
      .collect().toMap
    assert(out("a") == Some(25L)) // skips the ts=10 row
    assert(out("c") == None)
  }

  test("asofJoinForward tie-break is deterministic: min payload among tied rows") {
    val l = Seq(("u1", 5L, "x")).toDF("k", "ts", "tag")
    val r = Seq(("u1", 10L, 7.0), ("u1", 10L, 1.0), ("u1", 10L, 3.0))
      .toDF("k", "ts", "v")
    (1 to 3).foreach { _ =>
      val out = Temporal.asofJoinForward(l, r.repartition(5), Seq("k"), "ts", Seq("v"))
        .select(col("next_v")).as[Double].collect()
      assert(out.toSeq == Seq(1.0))
    }
  }

  test("asofJoinForward plans one key exchange and no join node") {
    val out = Temporal.asofJoinForward(left, right, Seq("k"), "ts", Seq("v"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"forward as-of must not plan a join:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"expected exactly one key exchange:\n$p")
  }
  test("transitionCounts: per-entity lag edges with deterministic tie-break") {
    import org.apache.spark.sql.functions.col
    val ev = Seq(
      // u1: a -> b -> b -> c   (ordered by ts, then id for the tie at ts=20)
      ("u1", 10L, 1L, "a"), ("u1", 20L, 2L, "b"), ("u1", 20L, 3L, "b"),
      ("u1", 40L, 4L, "c"),
      // u2: single event, contributes no edge
      ("u2", 5L, 5L, "a")
    ).toDF("u", "ts", "id", "st")
    val got = Temporal.transitionCounts(ev, "u", "st", Seq(col("ts"), col("id")))
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 1L), ("b", "b", 1L), ("b", "c", 1L)))
    // partitioning-invariant: the explicit (ts, id) order pins the lag
    val re = Temporal.transitionCounts(ev.repartition(5), "u", "st",
      Seq(col("ts"), col("id"))).as[(String, String, Long)].collect().toSet
    assert(re == got)
  }
  test("resampleForwardFill: LOCF on the global grid, nulls before first event") {
    import org.apache.spark.sql.functions.col
    val ev = Seq(
      (1L, 100L, 10.0), (1L, 250L, 20.0), (2L, 50L, 5.0),
      (2L, 100L, 7.0), (2L, 100L, 6.0) // tie at an instant: max wins
    ).toDF("u", "tsu", "v")
    val got = Temporal.resampleForwardFill(ev, "u", "tsu", "v", stepMicros = 100L)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // grid buckets 0..2 (50..250); bucket ts = b*100
    assert(got((1L, 0L)).isEmpty)           // before u1's first event
    assert(got((1L, 1L)).contains(10.0))    // ts 100 inclusive
    assert(got((1L, 2L)).contains(10.0))    // 250 > 200: not yet visible
    assert(got((2L, 0L)).isEmpty && got((2L, 1L)).contains(7.0))
    assert(got((2L, 2L)).contains(7.0))
    assert(got.size == 6)
  }
}
