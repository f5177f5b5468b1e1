package graft.stats

import graft.SparkSpec

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  test("thresholdCounts: hand-computed type-7 median (p50) with interpolation") {
    // group a: values 1.00, 2.00, 3.00, 10.00 → cents (100, 200, 300, 1000)
    //   p50: h = 50*3/100 = 1.5 → k=1, r=50; t_num = 200*50 + 300*50 = 25000
    //   (i.e. 2.50); above: 300*100=30000 > 25000 and 1000*100 → n_above=2
    // group b: single value → t_num = its cents*100, nothing strictly above
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 10.0),
      ("b", 7.25)
    ).toDF("g", "v")
    val got = Anomaly.thresholdCounts(df, "g", "v", pNum = 50, pDen = 100)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") == ((4L, 25000L, 2L)))
    assert(got("b") == ((1L, 72500L, 0L)))
  }

  test("thresholdCounts: p100 is the max (nothing above), p0 the min") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("g", "v")
    val top = Anomaly.thresholdCounts(df, "g", "v", 100, 100)
      .as[(String, Long, Long, Long)].collect().head
    assert(top == (("a", 3L, 30000L, 0L)))
    val bottom = Anomaly.thresholdCounts(df, "g", "v", 0, 100)
      .as[(String, Long, Long, Long)].collect().head
    assert(bottom == (("a", 3L, 10000L, 2L)))
  }

  test("thresholdCounts: nulls excluded; partitioning-invariant") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0))).toDF("g", "v")
    val got = Anomaly.thresholdCounts(df, "g", "v", 50, 100)
      .as[(String, Long, Long, Long)].collect().head
    // values (1.00, 3.00): median t_num = 100*50 + 300*50 = 20000; above: 1
    assert(got == (("a", 2L, 20000L, 1L)))
    val re = Anomaly.thresholdCounts(df.repartition(7), "g", "v", 50, 100)
      .as[(String, Long, Long, Long)].collect().head
    assert(re == got)
  }
  test("rollingMedian: exact scaled medians over a 3-row frame") {
    import org.apache.spark.sql.functions.col
    // u1 values by ts: 1.00, 5.00, 3.00, 2.00 → cents 100, 500, 300, 200
    // frames: [100] m=1 med2=200; [100,500] m=2 med2=600;
    //   [100,300,500] m=3 med2=600; [200,300,500] m=3 med2=600
    val df = Seq(
      ("u1", 1L, 1.0), ("u1", 2L, 5.0), ("u1", 3L, 3.0), ("u1", 4L, 2.0)
    ).toDF("u", "id", "v")
    val got = Anomaly.rollingMedian(df, "u", "v", Seq(col("id")), window = 3, idCol = "id")
      .as[(String, Long, Int, Long)].collect().map(r => r._2 -> ((r._3, r._4))).toMap
    assert(got(1L) == ((1, 200L)) && got(2L) == ((2, 600L)))
    assert(got(3L) == ((3, 600L)) && got(4L) == ((3, 600L)))
  }
  test("zOutlierCounts: hand-computed integer inequality") {
    // group a cents: 100, 100, 100, 100, 700 -> n=5, s1=1100, s2=530000
    // V = n*s2 - s1^2 = 2650000 - 1210000 = 1440000; z=2: rhs = 5760000
    // x=100: (500-1100)^2 = 360000 (in);  x=700: (3500-1100)^2 = 5760000
    //   -> NOT > rhs (exact boundary: the strict inequality keeps it in)
    val df = Seq(("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 7.0)).toDF("g", "v")
    val got = Anomaly.zOutlierCounts(df, "g", "v", z = 2L)
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(got == (("a", 5L, 1100L, 530000L, 0L)))
    // z=1: rhs = 1440000 -> 700 is out (5760000 > 1440000), the 100s stay
    val g1 = Anomaly.zOutlierCounts(df, "g", "v", z = 1L)
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(g1 == (("a", 5L, 1100L, 530000L, 1L)))
  }
}
