package graft.plan

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded randomized trials pinning [[Rollup.retract]]'s CONTRACT:
  * `retract(materialize(full), removedRows, reducedBase) ≡
  * materialize(reduced)` — exactly, for every column of the layout —
  * across removal patterns the unsafe-path analysis must classify
  * correctly: removals carrying a group's extremum (including EQUAL
  * extrema with and without a surviving twin), removals emptying a
  * measure's non-null count while rows remain (sum/min/max must come
  * back NULL, which only the recompute path can produce), whole groups
  * vanishing, null-measure rows, filled KMV sketches (k=8 below the
  * value domain) and histogram buckets. Integer and DECIMAL measures —
  * both retract bit-exactly, so equality is literal, no epsilon. 24
  * deterministic trials (fixed seed; a failure prints its trial). */
class RollupRetractPropertySpec extends SparkSpec {
  import spark.implicits._

  private def normalized(df: DataFrame): Map[String, Seq[String]] =
    df.collect().map { r =>
      val g = r.getAs[String]("g")
      g -> df.columns.sorted.toSeq.map { c =>
        r.get(r.fieldIndex(c)) match {
          case null => "∅"
          case a: scala.collection.Seq[_] => a.mkString("[", ",", "]")
          case d: java.math.BigDecimal => d.toPlainString
          case v => v.toString
        }
      }
    }.toMap

  test("retract(materialize(full), removed, reduced) == materialize(reduced), 24 seeded trials") {
    val rnd = new scala.util.Random(42)
    val dir = java.nio.file.Files.createTempDirectory("retract_prop").toString
    try {
      (1 to 24).foreach { trial =>
        val n = 8 + rnd.nextInt(28)
        val rows = (0 until n).map { i =>
          (i.toLong,
            s"g${rnd.nextInt(4)}",
            // nullable long measure; small domain forces extremum TIES
            if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(7).toLong),
            // decimal measure on the 0.01 grid
            new java.math.BigDecimal(rnd.nextInt(500))
              .movePointLeft(2).setScale(2),
            // distinct + histogram columns (domain > k=8 fills sketches)
            s"s${rnd.nextInt(12)}",
            1L + rnd.nextInt(100))
        }
        val removedIds = rows.map(_._1).filter(_ => rnd.nextInt(3) == 0).toSet
        val full = rows
          .toDF("id", "g", "mo", "d", "s", "v")
          .select(col("id"), col("g"), col("mo").as("m"),
            col("d").cast("decimal(10,2)").as("d"), col("s"), col("v"))
        full.write.mode("overwrite").parquet(s"$dir/full")
        val stored = spark.read.parquet(s"$dir/full")
        val removedDf = stored.filter(col("id").isin(removedIds.toSeq: _*))
        val reduced = stored.filter(!col("id").isin(removedIds.toSeq: _*))
        val grains = Seq("g").map(c => c -> col(c))
        val retracted = Rollup.retract(
          Rollup.materialize(stored, Seq("g"), Seq("m", "d"), Seq("s"), 8,
            Seq("v")),
          removedDf, reduced, grains, Seq("m", "d"), Seq("s"), 8, Seq("v"))
        val recomputed = Rollup.materialize(reduced, Seq("g"),
          Seq("m", "d"), Seq("s"), 8, Seq("v"))
        val got = normalized(retracted)
        val want = normalized(recomputed)
        assert(got == want,
          s"trial $trial diverged (removed=${removedIds.toSeq.sorted}):\n" +
            s"got  $got\nwant $want")
      }
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
