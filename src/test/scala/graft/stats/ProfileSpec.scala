package graft.stats

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("summarize: exact stats on a small frame, one row per column") {
    val df = Seq(
      (1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, None, 10.0), (4L, Some("a"), 40.0)
    ).toDF("id", "tag", "x")
    val p = Profile.summarize(df, Seq("id", "tag", "x"), k = 16)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          Option(r.get(4)), Option(r.get(5))))).toMap
    // below k the KMV estimate is the exact non-null distinct count
    assert(p("id") == ((4L, 0L, 4.0, Some(1.0), Some(4.0))))
    assert(p("tag") == ((4L, 1L, 2.0, None, None)))
    assert(p("x") == ((4L, 0L, 3.0, Some(10.0), Some(40.0))))
  }

  test("summarize plans ONE aggregation without Expand") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Profile.summarize(df, Seq("doc_id", "lang", "source"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      s"profiler must not multiply the corpus per column:\n$plan")
    assert(plan.linesIterator.count(_.contains("FileScan")) == 1,
      s"profiler must read the table once:\n$plan")
  }

  test("histogramQuantiles: exact on power-of-two masses, never above the value") {
    // group g: 8 copies of 16 and 8 of 64 -> p50 bucket lower bound 16, p90 64
    val df = (Seq.fill(8)(16L) ++ Seq.fill(8)(64L)).map(("g", _)).toDF("s", "v")
    val q = Profile.histogramQuantiles(df, "s", "v", Seq(0.5, 0.9))
      .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    assert(q(0.5) == 16L && q(0.9) == 64L)
  }

  test("histogramQuantiles error is bounded by the bucket width") {
    val n = 3000
    val df = (1 to n).map(i => ("u", i.toLong)).toDF("s", "v")
    val got = Profile.histogramQuantiles(df, "s", "v", Seq(0.5, 0.9))
      .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    for ((p, q) <- got) {
      val trueQ = math.ceil(p * n)
      // estimate = bucket lower bound containing the true quantile:
      // within [trueQ/1.25, trueQ] for 2 sub-bits
      assert(q <= trueQ && q >= trueQ / 1.25 - 1, s"p=$p q=$q true=$trueQ")
    }
  }

  test("histogramQuantiles is merge-consistent across partitionings") {
    val df = (1 to 1000).map(i => (s"g${i % 3}", (i * 37 % 511 + 1).toLong))
    val one = Profile.histogramQuantiles(df.toDF("s", "v").repartition(1), "s", "v", Seq(0.5))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    val many = Profile.histogramQuantiles(df.toDF("s", "v").repartition(16), "s", "v", Seq(0.5))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(one == many)
  }
}
