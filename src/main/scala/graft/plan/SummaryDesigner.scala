package graft.plan

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The DESIGN half of the self-tuning summary loop — where q187's
  * workload capture feeds the HRU grain advisor, this completes the
  * circle to FULL summary specifications: which grains to materialize
  * (the advisor's business) AND which measure / sketch / histogram
  * columns each must carry so that every captured query actually serves
  * from it. capture → design → [[buildAndRegister]] → serve, no human
  * in the loop.
  *
  * Requirement model (the serving rules of [[RollupRewrite]], inverted):
  * a query is servable by a grain G iff its grouping dims, its filter
  * columns, AND its exact count(distinct) arguments all lie in G (the
  * q191/q196 conjunct rule + the q180 distinct-in-grain rule) — so each
  * captured entry's requirement set is that union, and the advisor runs
  * on requirement sets exactly like [[LatticeAdvisor.adviseFiltered]].
  * The carried columns of an advised grain are then the union of the
  * needs of every entry it can serve: plain measures (sum / count /
  * min / max / avg), KMV sketch columns (q171; a single sketch k per
  * design — entries with conflicting ks are skipped, the layout stores
  * one k), and histogram columns (q200). Entries with underivable
  * aggregate shapes (`servable = false`) are ignored — designing for
  * them would waste storage on summaries nothing can use.
  *
  * Computed grains flow through: a captured `month(o_orderdate)` grain
  * token is re-parsed with `expr()` and becomes a synthesized summary
  * column registered via `groupExprOf` — the q191 machinery.
  *
  * Everything is DETERMINISTIC: tokens sort lexicographically, the
  * advisor's greedy is exact-integer, carried columns sort — identical
  * captures produce identical designs (the property the q201 gate's
  * hash-oracle leans on). Scale shape: the design itself is
  * driver-sized (capture log + one advisor cardinality pass); the cost
  * is in materializing the chosen summaries, which is the point. */
object SummaryDesigner {

  /** One designed summary: materialize + register arguments.
    * `grainExprSql` carries the defining SQL of SYNTHESIZED (computed)
    * grain columns; plain grain columns are absent from it. */
  case class SummarySpec(grainCols: Seq[String],
                         grainExprSql: Map[String, String],
                         measures: Seq[String],
                         distinctCols: Seq[String],
                         histCols: Seq[String],
                         sketchK: Int)

  private def dimName(token: String, plainCols: Set[String]): String =
    if (plainCols.contains(token)) token
    else "__g" + java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(8)

  /** Design a k-summary lattice for `base` from the current capture log
    * (see [[RollupRewrite.startWorkloadCapture]]). `sketchCardK = Some(k)`
    * switches the advisor's cardinality pass to the approx (cube-free)
    * mode — the 100-TB path. Returns Nil when nothing servable was
    * captured for this base. */
  def design(base: DataFrame, k: Int,
             sketchCardK: Option[Int] = None): Seq[SummarySpec] =
    RollupRewrite.withCaptureSuspended(designInner(base,
      (dims, wl) => LatticeAdvisor.advise(base, dims, wl,
        math.min(k, 1 << dims.size), sketchCardK)))

  /** [[design]] under a TOTAL ROW budget instead of a view count — the
    * HRU resource-bounded mode ([[LatticeAdvisor.adviseUnderBudget]]):
    * grains are admitted while their summary rows fit the remaining
    * budget and stop at zero benefit, so the design never commits to
    * more summary storage than `maxRows` rows across the lattice. */
  def designUnderBudget(base: DataFrame, maxRows: Long,
                        sketchCardK: Option[Int] = None): Seq[SummarySpec] =
    RollupRewrite.withCaptureSuspended(designInner(base,
      (dims, wl) => LatticeAdvisor.adviseUnderBudget(base, dims, wl,
        maxRows, sketchCardK)))

  private def designInner(base: DataFrame,
      adviseFn: (Seq[(String, Column)], Seq[Set[String]]) =>
        Seq[LatticeAdvisor.Advice]): Seq[SummarySpec] = {
    val paths = RollupRewrite.scanRootPaths(base)
    val all = RollupRewrite.capturedEntries(paths)
    // one sketch k per design: conflicting-k sketch entries are skipped
    val ks = all.filter(_.servable).flatMap(_.sketchKs).distinct
    val sketchK = ks.headOption.getOrElse(64)
    val entries = all.filter(e => e.servable &&
      (e.sketchKs.isEmpty || e.sketchKs == Set(sketchK)))
    if (entries.isEmpty) return Nil
    val reqOf: RollupRewrite.CaptureEntry => Set[String] =
      e => e.grain ++ e.filterCols ++ e.distinctCols
    val plainCols = base.columns.toSet
    val tokens = entries.flatMap(reqOf).distinct.sorted
    val dims: Seq[(String, Column)] = tokens.map { t =>
      dimName(t, plainCols) -> (if (plainCols.contains(t)) col(t) else expr(t))
    }
    val nameOf: Map[String, String] =
      tokens.map(t => t -> dimName(t, plainCols)).toMap
    val workload = entries.map(e => reqOf(e).map(nameOf))
    val advice = adviseFn(dims, workload)
    advice.flatMap { a =>
      val g = a.grain.toSet
      val served = entries.filter(e => reqOf(e).map(nameOf).subsetOf(g))
      if (served.isEmpty) None
      else Some(SummarySpec(
        a.grain,
        a.grain.collect {
          case n if !plainCols.contains(n) =>
            n -> tokens.find(t => nameOf(t) == n).get
        }.toMap,
        served.flatMap(_.measures).distinct.sorted,
        served.flatMap(_.sketchCols).distinct.sorted,
        served.flatMap(_.histCols).distinct.sorted,
        sketchK))
    }
  }

  /** Materialize + register every designed spec under `outDir`
    * (`design_<i>_<grain digest>` parquet each) — after this, the
    * captured workload re-serves from the designed lattice with no base
    * scans. Returns the summary paths in spec order. */
  def buildAndRegister(spark: SparkSession, base: DataFrame,
                       specs: Seq[SummarySpec], outDir: String): Seq[String] =
    RollupRewrite.withCaptureSuspended(specs.zipWithIndex.map { case (sp, i) =>
      val grainExprs = sp.grainCols.map(g =>
        g -> sp.grainExprSql.get(g).map(expr).getOrElse(col(g)))
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(sp.grainCols.mkString(",")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString.take(8)
      val out = s"$outDir/design_${i}_$digest"
      Rollup.materializeExpr(base, grainExprs, sp.measures, sp.distinctCols,
          sp.sketchK, sp.histCols)
        .write.mode("overwrite").parquet(out)
      RollupRewrite.register(base, spark.read.parquet(out), sp.grainCols,
        sp.measures, sp.distinctCols, sp.sketchK,
        sp.grainExprSql.map { case (n, sql) => n -> expr(sql) }, sp.histCols)
      out
    })

  /** [[design]] for the JOIN shape — the q201 self-tuning loop closed
    * for aggregate join summaries: captured JOIN-AGGREGATE observations
    * over `(fact, dim, keys)` ([[RollupRewrite.capturedJoinedEntries]],
    * either orientation) feed the same HRU advisor, with grain
    * cardinalities computed over the JOINED frame (one join-sized
    * advisor pass — approx mode via `sketchCardK` keeps it cube-free),
    * and each advised grain carries the union of the needs of the
    * queries it serves. Grains are plain columns from either side (the
    * AJI contract); `grainExprSql` is always empty here. Deterministic
    * like [[design]]. Returns Nil when nothing servable was captured
    * for this join. */
  def designJoined(fact: DataFrame, dim: DataFrame,
                   keys: Seq[(String, String)], k: Int,
                   sketchCardK: Option[Int] = None): Seq[SummarySpec] =
    RollupRewrite.withCaptureSuspended {
      val fPaths = RollupRewrite.scanRootPaths(fact)
      val dPaths = RollupRewrite.scanRootPaths(dim)
      val all = RollupRewrite.capturedJoinedEntries(fPaths, dPaths, keys)
      val ks = all.filter(_.servable).flatMap(_.sketchKs).distinct
      val sketchK = ks.headOption.getOrElse(64)
      val entries = all.filter(e => e.servable &&
        (e.sketchKs.isEmpty || e.sketchKs == Set(sketchK)))
      if (entries.isEmpty) Nil
      else {
        val reqOf: RollupRewrite.JoinedCaptureEntry => Set[String] =
          e => e.grain ++ e.filterCols ++ e.distinctCols
        val cond = keys.map { case (f, d) => fact(f) === dim(d) }
          .reduce(_ && _)
        val joined = fact.join(dim, cond)
        val joinedCols = joined.columns.toSet
        val tokens = entries.flatMap(reqOf).distinct.sorted
        // a requirement outside the join's columns cannot be designed for
        val designable = entries.filter(e =>
          reqOf(e).subsetOf(joinedCols) && e.grain.nonEmpty)
        if (designable.isEmpty) Nil
        else {
          val dims = tokens.filter(joinedCols.contains).map(t => t -> col(t))
          val workload = designable.map(reqOf)
          val advice = LatticeAdvisor.advise(joined, dims, workload,
            math.min(k, 1 << dims.size), sketchCardK)
          advice.flatMap { a =>
            val g = a.grain.toSet
            val served = designable.filter(e => reqOf(e).subsetOf(g))
            if (served.isEmpty) None
            else Some(SummarySpec(a.grain, Map.empty,
              served.flatMap(_.measures).distinct.sorted,
              served.flatMap(_.sketchCols).distinct.sorted,
              served.flatMap(_.histCols).distinct.sorted,
              sketchK))
          }
        }
      }
    }

  /** Materialize + register every designed JOINED spec under `outDir`
    * (`designj_<i>_<grain digest>` parquet each) — after this, the
    * captured join workload re-serves from the designed AJIs with zero
    * Join nodes. Returns the summary paths in spec order. */
  def buildAndRegisterJoined(spark: SparkSession, fact: DataFrame,
                             dim: DataFrame, keys: Seq[(String, String)],
                             specs: Seq[SummarySpec], outDir: String)
      : Seq[String] =
    RollupRewrite.withCaptureSuspended(specs.zipWithIndex.map { case (sp, i) =>
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(sp.grainCols.mkString(",")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString.take(8)
      val out = s"$outDir/designj_${i}_$digest"
      Rollup.materializeJoined(fact, dim, keys, sp.grainCols, sp.measures,
          sp.distinctCols, sp.sketchK, sp.histCols)
        .write.mode("overwrite").parquet(out)
      RollupRewrite.registerJoined(fact, dim, keys, spark.read.parquet(out),
        sp.grainCols, sp.measures, sp.distinctCols, sp.sketchK, sp.histCols)
      out
    })

  /** [[designJoined]] at STAR width: captured star-join observations
    * over `(fact, dims)` feed the same HRU advisor with grain
    * cardinalities computed over the flattened star join. */
  def designStar(fact: DataFrame,
                 dims: Seq[(DataFrame, Seq[(String, String)])], k: Int,
                 sketchCardK: Option[Int] = None): Seq[SummarySpec] =
    RollupRewrite.withCaptureSuspended {
      val fPaths = RollupRewrite.scanRootPaths(fact)
      val dimSides = dims.map { case (d, keys) =>
        (RollupRewrite.scanRootPaths(d), keys.toSet) }.toSet
      val all = RollupRewrite.capturedStarEntries(fPaths, dimSides)
      val ks = all.filter(_.servable).flatMap(_.sketchKs).distinct
      val sketchK = ks.headOption.getOrElse(64)
      val entries = all.filter(e => e.servable &&
        (e.sketchKs.isEmpty || e.sketchKs == Set(sketchK)))
      if (entries.isEmpty) Nil
      else {
        val reqOf: RollupRewrite.StarCaptureEntry => Set[String] =
          e => e.grain ++ e.filterCols ++ e.distinctCols
        val joined = dims.foldLeft(fact) { case (acc, (d, keys)) =>
          acc.join(d, keys.map { case (f, dk) =>
            fact(f) === d(dk) }.reduce(_ && _))
        }
        val joinedCols = joined.columns.toSet
        val tokens = entries.flatMap(reqOf).distinct.sorted
        val designable = entries.filter(e =>
          reqOf(e).subsetOf(joinedCols) && e.grain.nonEmpty)
        if (designable.isEmpty) Nil
        else {
          val dcols = tokens.filter(joinedCols.contains).map(t => t -> col(t))
          val workload = designable.map(reqOf)
          val advice = LatticeAdvisor.advise(joined, dcols, workload,
            math.min(k, 1 << dcols.size), sketchCardK)
          advice.flatMap { a =>
            val g = a.grain.toSet
            val served = designable.filter(e => reqOf(e).subsetOf(g))
            if (served.isEmpty) None
            else Some(SummarySpec(a.grain, Map.empty,
              served.flatMap(_.measures).distinct.sorted,
              served.flatMap(_.sketchCols).distinct.sorted,
              served.flatMap(_.histCols).distinct.sorted,
              sketchK))
          }
        }
      }
    }

  /** Materialize + register every designed STAR spec under `outDir`
    * (`designs_<i>_<grain digest>` parquet each). */
  def buildAndRegisterStar(spark: SparkSession, fact: DataFrame,
                           dims: Seq[(DataFrame, Seq[(String, String)])],
                           specs: Seq[SummarySpec], outDir: String)
      : Seq[String] =
    RollupRewrite.withCaptureSuspended(specs.zipWithIndex.map { case (sp, i) =>
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(sp.grainCols.mkString(",")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString.take(8)
      val out = s"$outDir/designs_${i}_$digest"
      Rollup.materializeStar(fact, dims, sp.grainCols, sp.measures,
          sp.distinctCols, sp.sketchK, sp.histCols)
        .write.mode("overwrite").parquet(out)
      RollupRewrite.registerStar(fact, dims, spark.read.parquet(out),
        sp.grainCols, sp.measures, sp.distinctCols, sp.sketchK, sp.histCols)
      out
    })
}
