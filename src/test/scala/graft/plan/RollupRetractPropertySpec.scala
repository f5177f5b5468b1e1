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

  private def normalized(df: DataFrame): Map[String, Seq[String]] = {
    val rows = df.collect()
    val m = rows.map { r =>
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
    // a double emission (survivor row AND recomputed row for the same
    // group) must fail the trial, not collapse into the map (ADVICE r13
    // #5)
    assert(rows.length == m.size,
      s"duplicate grain rows: ${rows.length} rows, ${m.size} groups")
    m
  }

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

  test("joined retraction: retract(removedSide ⋈ other, joined frame) == rebuild of the reduced join, 16 seeded trials") {
    // the q217 ALGEBRA pinned at the Rollup level: a pure delete on ONE
    // side of an inner join removes exactly `removed-side rows ⋈ the
    // other side` (each tuple holds one row of the deleting side), so
    // retract over the joined frame must equal a from-scratch rebuild
    // of the reduced join — across duplicate dim keys (multiplicity),
    // dangling keys on both sides, null measures, filled sketches and
    // histograms, and both delete orientations
    val rnd = new scala.util.Random(1213)
    val dir = java.nio.file.Files.createTempDirectory("retract_jprop").toString
    try {
      (1 to 16).foreach { trial =>
        val nf = 8 + rnd.nextInt(24)
        val factRows = (0 until nf).map { i =>
          (i.toLong, rnd.nextInt(6).toLong, // k=5 never joins (dangling)
            if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(7).toLong),
            s"s${rnd.nextInt(12)}", 1L + rnd.nextInt(100))
        }
        val nd = 4 + rnd.nextInt(8)
        val dimRows = (0 until nd).map { j =>
          (1000L + j, rnd.nextInt(5).toLong, s"g${rnd.nextInt(3)}")
        } // dk repeats → join multiplicity; dk=4-only dims may dangle
        factRows.toDF("fid", "k", "m", "s", "v")
          .write.mode("overwrite").parquet(s"$dir/fact")
        dimRows.toDF("did", "dk", "seg")
          .write.mode("overwrite").parquet(s"$dir/dim")
        val fact = spark.read.parquet(s"$dir/fact")
        val dim = spark.read.parquet(s"$dir/dim")
        def join2(f: DataFrame, d: DataFrame) =
          f.join(d, f("k") === d("dk"))
        val stored = Rollup.materialize(join2(fact, dim), Seq("seg"),
          Seq("m"), Seq("s"), 8, Seq("v"))
        val deleteFact = rnd.nextBoolean()
        val (removedJoined, reducedJoin) =
          if (deleteFact) {
            val gone = factRows.map(_._1).filter(_ => rnd.nextInt(3) == 0)
            (join2(fact.filter(col("fid").isin(gone: _*)), dim),
              join2(fact.filter(!col("fid").isin(gone: _*)), dim))
          } else {
            val gone = dimRows.map(_._1).filter(_ => rnd.nextInt(3) == 0)
            (join2(fact, dim.filter(col("did").isin(gone: _*))),
              join2(fact, dim.filter(!col("did").isin(gone: _*))))
          }
        val retracted = Rollup.retract(stored, removedJoined, reducedJoin,
          Seq("seg").map(c => c -> col(c)), Seq("m"), Seq("s"), 8, Seq("v"))
        val recomputed = Rollup.materialize(reducedJoin, Seq("seg"),
          Seq("m"), Seq("s"), 8, Seq("v"))
        def norm(df: DataFrame): Map[String, Seq[String]] =
          df.collect().map { r =>
            r.getAs[String]("seg") -> df.columns.sorted.toSeq.map { c =>
              r.get(r.fieldIndex(c)) match {
                case null => "∅"
                case a: scala.collection.Seq[_] => a.mkString("[", ",", "]")
                case x => x.toString
              }
            }
          }.toMap
        assert(norm(retracted) == norm(recomputed),
          s"trial $trial (deleteFact=$deleteFact) diverged:\n" +
            s"got  ${norm(retracted)}\nwant ${norm(recomputed)}")
      }
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("MIXED-diff fold through refreshStale == full rebuild, 16 seeded trials (r14)") {
    // the q221 COMPOSITION pinned end-to-end: register → trash-delete a
    // random slice subset AND append random files (a lossy compacted
    // rewrite of some removed rows + brand-new rows) in ONE stale
    // window → refreshStale folds → the refreshed summary must equal a
    // from-scratch materialization of the post-compaction base. Trials
    // sweep removal fractions up to FULL compaction, extremum-carrying
    // removals, null measures, filled KMV sketches (k=4), and
    // histograms — a recompute-path read of the current listing instead
    // of the surviving registered files double-counts the appends and
    // fails here.
    val rnd = new scala.util.Random(777)
    val root = java.nio.file.Files.createTempDirectory("mixed_prop").toString
    try {
      (1 to 16).foreach { trial =>
        val dir = s"$root/t$trial"
        val nSlices = 3 + rnd.nextInt(3)
        def mkRows(n: Int, idBase: Long) = (0 until n).map { i =>
          (idBase + i, s"g${rnd.nextInt(4)}",
            if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(7).toLong),
            s"s${rnd.nextInt(9)}", 1L + rnd.nextInt(50))
        }
        val slicePaths = (0 until nSlices).map { sl =>
          val df = mkRows(3 + rnd.nextInt(6), sl * 100L)
            .toDF("id", "g", "m", "s", "v")
          val st = java.nio.file.Files.createTempDirectory("sl").toString
          df.coalesce(1).write.mode("overwrite").parquet(st)
          val part = new java.io.File(st).listFiles()
            .filter(_.getName.endsWith(".parquet")).head
          val dst = new java.io.File(s"$dir/base/sl$sl.parquet")
          dst.getParentFile.mkdirs()
          java.nio.file.Files.move(part.toPath, dst.toPath)
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(st))
          dst.getAbsolutePath
        }
        val base0 = spark.read.parquet(s"$dir/base")
        Rollup.materialize(base0, Seq("g"), Seq("m"), Seq("s"), 4, Seq("v"))
          .write.mode("overwrite").parquet(s"$dir/sum")
        RollupRewrite.register(base0, spark.read.parquet(s"$dir/sum"),
          Seq("g"), Seq("m"), Seq("s"), 4, histCols = Seq("v"))
        // the mixed window: remove a random nonempty slice subset (up
        // to ALL), append a lossy rewrite of some removed rows + a
        // brand-new slice
        val removed = slicePaths.filter(_ => rnd.nextInt(2) == 0) match {
          case Seq() => Seq(slicePaths(rnd.nextInt(nSlices)))
          case some => some
        }
        val removedRows = spark.read.parquet(removed: _*).collect()
        val keep = removedRows.filter(_ => rnd.nextInt(4) > 0)
        if (keep.nonEmpty)
          spark.createDataFrame(java.util.Arrays.asList(keep: _*),
              spark.read.parquet(removed: _*).schema)
            .coalesce(1).write.mode("append").parquet(s"$dir/base")
        mkRows(2 + rnd.nextInt(5), 9000L).toDF("id", "g", "m", "s", "v")
          .coalesce(1).write.mode("append").parquet(s"$dir/base")
        RollupRewrite.deleteFiles(spark, removed, s"$dir/trash")
        val rep = RollupRewrite.refreshStale(spark, s"$dir/ref",
          trashDirs = Seq(s"$dir/trash"))
        assert(rep.size == 1 && rep.head.refreshed &&
            rep.head.removedFiles.map(p =>
              new org.apache.hadoop.fs.Path(p).getName).toSet ==
              removed.map(p =>
                new org.apache.hadoop.fs.Path(p).getName).toSet,
          s"trial $trial: mixed diff must fold with the exact removed set: $rep")
        val got = normalized(spark.read.parquet(rep.head.summaryPath))
        val want = normalized(Rollup.materialize(
          spark.read.parquet(s"$dir/base"), Seq("g"), Seq("m"), Seq("s"),
          4, Seq("v")))
        assert(got == want,
          s"trial $trial (removed=${removed.map(_.split('/').last)}) " +
            s"diverged:\ngot  $got\nwant $want")
        RollupRewrite.clear()
      }
    } finally {
      RollupRewrite.clear()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }

  test("JOINED mixed-diff fold: removals on one side + appends on any, 12 seeded trials (r14)") {
    // the generalized composition pinned end-to-end on the AJI: a
    // random window removes slices from ONE side (fact or dim) and
    // appends fresh files to EITHER side; refreshStale must fold it to
    // exactly the post-window join rebuild. Trials sweep duplicate dim
    // keys (multiplicity), dangling keys, appended fact rows that JOIN
    // the removed dim rows (the saved-state trap — a current-state
    // retraction corrupts group counts), extremum-carrying removals,
    // and filled sketches.
    val rnd = new scala.util.Random(4242)
    val root = java.nio.file.Files.createTempDirectory("mixedj_prop").toString
    try {
      (1 to 12).foreach { trial =>
        val dir = s"$root/t$trial"
        def writeSlice(df: org.apache.spark.sql.DataFrame, sub: String,
                       name: String): String = {
          val st = java.nio.file.Files.createTempDirectory("sl").toString
          df.coalesce(1).write.mode("overwrite").parquet(st)
          val part = new java.io.File(st).listFiles()
            .filter(_.getName.endsWith(".parquet")).head
          val dst = new java.io.File(s"$dir/$sub/$name.parquet")
          dst.getParentFile.mkdirs()
          java.nio.file.Files.move(part.toPath, dst.toPath)
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(st))
          dst.getAbsolutePath
        }
        def factRows(n: Int) = (0 until n).map(_ =>
          (rnd.nextInt(6).toLong, rnd.nextInt(20).toLong)) // k=5 dangles
        def dimRows(n: Int) = (0 until n).map(_ =>
          (rnd.nextInt(5).toLong, s"g${rnd.nextInt(3)}")) // dup dk keys
        val factSlices = (0 until 2 + rnd.nextInt(2)).map(i =>
          writeSlice(factRows(2 + rnd.nextInt(5)).toDF("k", "m"),
            "fact", s"f$i"))
        val dimSlices = (0 until 2 + rnd.nextInt(2)).map(i =>
          writeSlice(dimRows(2 + rnd.nextInt(4)).toDF("dk", "seg"),
            "dim", s"d$i"))
        val fact0 = spark.read.parquet(s"$dir/fact")
        val dim0 = spark.read.parquet(s"$dir/dim")
        Rollup.materializeJoined(fact0, dim0, Seq("k" -> "dk"),
            Seq("seg"), Seq("m"), Seq("k"), 4)
          .write.mode("overwrite").parquet(s"$dir/aji")
        RollupRewrite.registerJoined(fact0, dim0, Seq("k" -> "dk"),
          spark.read.parquet(s"$dir/aji"), Seq("seg"), Seq("m"),
          Seq("k"), 4)
        // the window: remove from EITHER or BOTH sides (r14: sequential
        // per-side retraction — keep ≥1 slice per side so the dirs stay
        // readable), append to a random subset of sides
        def pick(pool: Seq[String]) =
          if (rnd.nextBoolean()) pool.take(1 + rnd.nextInt(pool.size - 1))
          else Nil
        var remF = pick(factSlices)
        val remD = pick(dimSlices)
        if (remF.isEmpty && remD.isEmpty) remF = factSlices.take(1)
        val remFact = remF.nonEmpty // printed in failures
        val removed = remF ++ remD
        val appendFact = rnd.nextBoolean()
        val appendDim = !appendFact || rnd.nextBoolean()
        if (appendFact)
          writeSlice(factRows(2 + rnd.nextInt(4)).toDF("k", "m"),
            "fact", "fnew")
        if (appendDim)
          writeSlice(dimRows(1 + rnd.nextInt(3)).toDF("dk", "seg"),
            "dim", "dnew")
        RollupRewrite.deleteFiles(spark, removed, s"$dir/trash")
        val rep = RollupRewrite.refreshStale(spark, s"$dir/ref",
          trashDirs = Seq(s"$dir/trash"))
        assert(rep.size == 1 && rep.head.refreshed &&
            rep.head.removedFiles.map(p =>
              new org.apache.hadoop.fs.Path(p).getName).toSet ==
              removed.map(p =>
                new org.apache.hadoop.fs.Path(p).getName).toSet,
          s"trial $trial (remFact=$remFact): must fold with the exact " +
            s"removed set: $rep")
        def normSeg(df: DataFrame): Map[String, Seq[String]] = {
          val rows = df.collect()
          val m = rows.map { r =>
            r.getAs[String]("seg") -> df.columns.sorted.toSeq.map { c =>
              r.get(r.fieldIndex(c)) match {
                case null => "∅"
                case a: scala.collection.Seq[_] => a.mkString("[", ",", "]")
                case x => x.toString
              }
            }
          }.toMap
          assert(rows.length == m.size, "duplicate grain rows")
          m
        }
        val got = normSeg(spark.read.parquet(rep.head.summaryPath))
        val want = normSeg(Rollup.materializeJoined(
          spark.read.parquet(s"$dir/fact"), spark.read.parquet(s"$dir/dim"),
          Seq("k" -> "dk"), Seq("seg"), Seq("m"), Seq("k"), 4))
        assert(got == want,
          s"trial $trial (remFact=$remFact appendF=$appendFact " +
            s"appendD=$appendDim) diverged:\ngot  $got\nwant $want")
        RollupRewrite.clear()
      }
    } finally {
      RollupRewrite.clear()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }
}
