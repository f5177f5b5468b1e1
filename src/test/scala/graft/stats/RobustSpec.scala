package graft.stats

import graft.SparkSpec

class RobustSpec extends SparkSpec {
  import spark.implicits._

  test("weightedMedian: lower median by cumulative weight, ties merged") {
    // g=a: (1.00 w3), (2.00 w1), (3.00 w4): W=8, half=4 -> cum(1.00)=3 < 4,
    //   cum(2.00)=4 -> 2*4 >= 8 -> median 200
    // g=b: ties at 5.00 (w1+w1), 9.00 w2: W=4 -> cum(5.00)=2, 2*2 >= 4 -> 500
    val df = Seq(
      ("a", 1.0, 3.0), ("a", 2.0, 1.0), ("a", 3.0, 4.0),
      ("b", 5.0, 1.0), ("b", 5.0, 1.0), ("b", 9.0, 2.0)
    ).toDF("g", "v", "w")
    val m = Robust.weightedMedian(df, "g", "v", "w")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("a") == ((8L, 200L)) && m("b") == ((4L, 500L)))
  }

  test("weightedMedian: unit weights reduce to the lower median") {
    val df = Seq(("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 1.0), ("a", 4.0, 1.0))
      .toDF("g", "v", "w")
    val m = Robust.weightedMedian(df, "g", "v", "w")
      .as[(String, Long, Long)].collect().head
    assert(m == (("a", 4L, 200L))) // lower median of {1,2,3,4} = 2
  }

  test("winsorizedSum: clamping bounds and exact scaled sum") {
    // 5 values 1.00..5.00, p(25,75): h25 = 25*4/100 = 1 -> k=1, r=0 -> lo = 200*100
    // h75 = 3 -> hi = 400*100; clamp(100*100)=20000, others in-range,
    // clamp(500*100)=40000 -> wsum = 20000+20000+30000+40000+40000 = 150000
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0))
      .toDF("g", "v")
    val got = Robust.winsorizedSum(df, "g", "v", loNum = 25, hiNum = 75, pDen = 100)
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(got == (("a", 5L, 20000L, 40000L, 150000L)))
  }

  test("winsorizedSum: full range [p0, p100] is the plain sum") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 7.5)).toDF("g", "v")
    val got = Robust.winsorizedSum(df, "g", "v", 0, 100)
      .as[(String, Long, Long, Long, Long)].collect().head
    // sum of cents*100 = (100+200+750)*100 = 105000; bounds = min/max*100
    assert(got == (("a", 3L, 10000L, 75000L, 105000L)))
  }
}
