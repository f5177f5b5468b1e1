package graft.layout

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def refInterleave(xs: Seq[Long], bits: Int): Long = {
    var out = 0L
    for (i <- 0 until bits; (x, c) <- xs.zipWithIndex)
      out |= ((x >> i) & 1L) << (i * xs.size + c)
    out
  }

  test("zValue matches the reference bit interleave") {
    val cases = Seq(Seq(3L, 1L), Seq(0L, 0L), Seq(1023L, 1023L), Seq(512L, 7L),
      Seq(5L, 9L, 2L))
    val got = cases.map { xs =>
      val cols = xs.indices.map(i => col(s"c$i"))
      val df = Seq(xs).map(v => (v.lift(0).getOrElse(0L), v.lift(1).getOrElse(0L), v.lift(2).getOrElse(0L)))
        .toDF("c0", "c1", "c2")
      df.select(Layout.zValue(cols.take(xs.size), 10)).head().getLong(0)
    }
    assert(got == cases.map(refInterleave(_, 10)))
  }

  test("zValue interleaving is monotone per dimension on aligned prefixes") {
    // growing one input (others fixed) never decreases the z-value
    val df = spark.range(0, 1024).select(col("id"))
    val z = df.select(col("id"), Layout.zValue(Seq(col("id"), lit(37L)), 10).as("z"))
      .orderBy("id").as[(Long, Long)].collect()
    z.sliding(2).foreach { case Array((_, a), (_, b)) => assert(a < b) }
  }

  test("writeZOrdered produces disjoint per-file z-ranges that bound BOTH dims") {
    val dir = Files.createTempDirectory("zorder").toString
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(pmod(col("l_partkey"), lit(1024L)).as("p"),
        pmod(col("l_suppkey"), lit(1024L)).as("s"))
    Layout.writeZOrdered(df, Seq("p", "s"), bits = 10, numFiles = 4, path = dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
    assert(files.size == 4)
    val ranges = files.map { f =>
      spark.read.parquet(f)
        .select(min(Layout.zValue(Seq(col("p"), col("s")), 10)).as("lo"),
          max(Layout.zValue(Seq(col("p"), col("s")), 10)).as("hi"))
        .as[(Long, Long)].head()
    }.sortBy(_._1)
    // range partitioning: file N's max z < file N+1's min z — a z-range
    // scan predicate therefore skips whole files
    ranges.sliding(2).foreach { case Seq((_, hi), (lo, _)) => assert(hi < lo) }
  }

  test("zValue rejects widths that overflow a positive long") {
    intercept[IllegalArgumentException] {
      Layout.zValue(Seq(col("a"), col("b")), 32)
    }
  }
  test("fileStats + prunedScan: skips non-intersecting files, same results") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    val df = (0L until 1000L).toDF("k").withColumn("v", col("k") % 7)
    df.repartitionByRange(10, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(dir)
    val manifest = Layout.fileStats(spark, dir, Seq("k"))
    assert(manifest.count() == 10)
    val (pruned, kept, total) = Layout.prunedScan(spark, dir, manifest, "k", 250L, 349L)
    assert(total == 10 && kept < total && kept >= 1)
    val got = pruned.agg(count(lit(1)), sum(col("v"))).as[(Long, Long)].collect().head
    val exp = df.filter(col("k") >= 250 && col("k") <= 349)
      .agg(count(lit(1)), sum(col("v"))).as[(Long, Long)].collect().head
    assert(got == exp)
    // empty band below all data: zero files, empty result, correct schema
    val (none, kept0, _) = Layout.prunedScan(spark, dir, manifest, "k", -10L, -5L)
    assert(kept0 == 0 && none.count() == 0 && none.columns.contains("v"))
  }
}
