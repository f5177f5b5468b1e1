package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.HistAgg

/** [[HistAgg]] — the mergeable 256-bucket integer histogram sketch that
  * carries quantiles through the rollup summary tier. The contract under
  * test: bucket arithmetic IS q80's (`Profile.histogramQuantiles`), the
  * sketch is mergeable losslessly, and the lower-bound quantile derived
  * from a sketch equals the Profile implementation bit for bit. */
class HistAggSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bucket arithmetic: lo(bucketOf(v)) <= v < lo(next), msb*4+sub layout") {
    val probes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 15L, 16L, 17L,
      100L, 1000L, 12345L, (1L << 40) - 1, 1L << 40, Long.MaxValue) ++
      (0 until 500).map(i => 1L + (i.toLong * 2654435761L) % (1L << 45))
    probes.foreach { v =>
      val b = HistAgg.bucketOf(v)
      assert(HistAgg.bucketLo(b) <= v, s"v=$v bucket=$b lo=${HistAgg.bucketLo(b)}")
      // the next non-empty-able bucket's lower bound exceeds v
      val nextLo = ((b + 1) until HistAgg.Buckets).iterator
        .map(HistAgg.bucketLo).find(_ > HistAgg.bucketLo(b))
      nextLo.foreach(nl => assert(v < nl, s"v=$v bucket=$b nextLo=$nl"))
    }
    // the Profile arithmetic: msb = floor(log2 v), sub = next two bits
    assert(HistAgg.bucketOf(1L) == 0 * 4 + 0)
    assert(HistAgg.bucketOf(3L) == 1 * 4 + 0) // msb<2 => sub 0
    assert(HistAgg.bucketOf(4L) == 2 * 4 + 0)
    assert(HistAgg.bucketOf(5L) == 2 * 4 + 1)
    assert(HistAgg.bucketOf(7L) == 2 * 4 + 3)
  }

  test("sketch counts: NULLs and v < 1 excluded, totals match the q80 filter") {
    val df = Seq[java.lang.Long](1L, 2L, 5L, 5L, 0L, -3L, null, 1000L)
      .toDF("v")
    val h = df.agg(HistAgg.histSketch(col("v")).as("h"))
      .select(aggregate(col("h"), lit(0L), (a, x) => a + x).as("n"))
      .collect()(0).getLong(0)
    assert(h == 5L, s"0, -3 and NULL must be excluded, got $h")
  }

  test("merge of slice sketches ≡ full sketch, bit for bit; quantiles match Profile") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("o_orderstatus")
        .agg(HistAgg.histSketch(col("o_custkey")).as("h"))
    val full = sk(orders)
      .select(col("o_orderstatus"), concat_ws(",", col("h")).as("s"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    val merged = sk(orders.filter(col("o_orderkey") % 2 === 0))
      .unionByName(sk(orders.filter(col("o_orderkey") % 2 =!= 0)))
      .groupBy("o_orderstatus")
      .agg(HistAgg.histMerge(col("h")).as("h"))
      .select(col("o_orderstatus"), concat_ws(",", col("h")).as("s"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(merged == full && full.nonEmpty,
      "elementwise bucket merge must equal the one-pass sketch")
    // quantiles from the sketch ≡ Profile.histogramQuantiles (q80)
    val probs = Seq(0.5, 0.9, 0.99)
    val fromSketch = sk(orders).select(col("o_orderstatus").as("grp"),
        explode(array(probs.map(p =>
          struct(lit(p).as("prob"), HistAgg.histQuantile(col("h"), p).as("q"))): _*))
          .as("e"))
      .select(col("grp"), col("e.prob"), col("e.q"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val fromProfile = graft.stats.Profile.histogramQuantiles(
        orders, "o_orderstatus", "o_custkey", probs)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(fromSketch == fromProfile && fromProfile.nonEmpty,
      s"sketch quantiles must equal q80's: $fromSketch vs $fromProfile")
  }

  test("empty and all-excluded groups yield NULL quantiles") {
    val df = Seq((1, 0L), (1, -5L), (2, 8L)).toDF("g", "v")
    val q = df.groupBy("g").agg(HistAgg.histSketch(col("v")).as("h"))
      .select(col("g"), HistAgg.histQuantile(col("h"), 0.5).as("q"))
      .collect().map(r => (r.getInt(0), Option(r.get(1)))).toMap
    assert(q == Map(1 -> None, 2 -> Some(8L)))
  }
}
