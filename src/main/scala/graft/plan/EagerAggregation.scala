package graft.plan

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** EAGER AGGREGATION — partial-aggregation pushdown through a join
  * (Yan & Larson, "Eager aggregation and lazy aggregation", VLDB '95;
  * the classic warehouse rewrite Spark's optimizer does not perform).
  *
  * Shape it targets:
  * {{{
  *   fact.join(dim, fact("k") === dim("k"))
  *       .groupBy(dim("attr")).agg(sum(fact("m")), ...)
  * }}}
  * The stock plan shuffles the FULL fact table into the join (when the
  * dim side is too big to broadcast) and aggregates after; at 100 TB the
  * fact-sized join shuffle is the bottleneck. The rewrite pre-aggregates
  * the fact side by its join keys first:
  * {{{
  *   Aggregate(G, merge(partials),
  *     Join(Aggregate(factKeys ++ factGroupCols, partials, fact), dim))
  * }}}
  * so only one partial row per fact join key crosses the wire (and the
  * pre-aggregation itself gets Spark's map-side combine — the fact never
  * leaves its input partitions at full size), and the join's own shuffle
  * requirement is satisfied by the pre-aggregation's partitioning.
  *
  * WHY IT IS CORRECT under dim-side duplicate keys: each pre-aggregated
  * fact row is duplicated by the join exactly as many times as each of
  * its raw rows would have been, so sum/count/min/max over the duplicated
  * partials equal the same functions over the duplicated raw rows.
  * Null fact join keys drop identically on both shapes (inner equi-join).
  *
  * Supported (everything else leaves the plan untouched): INNER, LEFT
  * OUTER, RIGHT OUTER and FULL OUTER joins with pure conjunctive
  * attribute-equality conditions; aggregates
  * sum / count / count(*) / min / max / avg(non-decimal), undistinct and
  * unfiltered, whose inputs all come from ONE side (that side becomes
  * the fact); grouping expressions over the other side plus any fact
  * columns (fact-side grouping columns join the pre-aggregation keys).
  *
  * OUTER-JOIN ARGUMENT RESTRICTION (ADVICE r10, soundness): whenever the
  * fact side can be NULL-EXTENDED by the join (left/right outer with the
  * fact on the non-preserved side, and full outer always), every
  * aggregate argument must be a plain fact AttributeReference (NULL on a
  * null-extended row, so it drops out of sum/count/min/max/avg exactly
  * like the raw row would) — or the all-non-null-literal count(*) form,
  * which gets the count-bug coalesce fix. A non-null-rejecting
  * EXPRESSION arg — min(coalesce(o_x, 0)), count(CASE WHEN p THEN 1
  * END) — evaluates NON-NULL on each null-extended raw row, but the
  * pushed shape has no partial row there at all: the rewrite would
  * silently drop those contributions, so it bails instead. On the inner
  * and fact-preserved paths arbitrary expression args remain sound (the
  * pre-aggregation evaluates them on exactly the raw fact rows).
  *
  * FULL OUTER combines both outer obligations and is sound under the
  * same restriction: an unmatched fact partial null-extends ONCE
  * carrying its n_k rows' partials (the fact-preserved argument), an
  * unmatched dim row has a NULL partial whose plain-attr aggregates drop
  * exactly like the raw null-extended row's (the restriction), and
  * count(*) reads 1 on it via the coalesce fix.
  * Result expressions may be arbitrary trees over aggregate calls (the
  * CollapseProject-folded shape — same contract as [[RollupRewrite]]).
  * sum(decimal) re-sums partials at wider precision and casts back to
  * the original sum type; avg decomposes into sum/count partials and
  * divides at the top (bit-equal for integral inputs, partial-merge
  * summation order for floats — the same reassociation any map-side
  * partial performs).
  *
  * Opt-in ([[enable]]) like [[RollupRewrite]]: it is a heuristic — when
  * fact join keys are near-unique the pre-aggregation reduces nothing
  * (it costs one extra operator on the same shuffle), and when the dim
  * side broadcasts, map-side partials after the join already avoid the
  * fact shuffle. The win is the large-dim sort-merge case, which is the
  * common 100-TB fact/dim shape.
  *
  * COST GUARD (VERDICT r11 #1) — what makes "enabled fleet-wide" safe:
  * the downside regime is real and severe (measured in-battery: a
  * near-unique-key 100M pre-aggregation SPILLED its hash state, 78.8 s
  * vs 9.7 s direct — 8×), so before firing the rule estimates the fact
  * side's ROWS PER PRE-AGG KEY and bails below [[setMinReduction]]
  * (default 4 rows/key — under that, the partial map approaches fact
  * size and the extra operator can only cost). Estimate sources, in
  * order:
  *
  *  1. logical-plan statistics (CBO `rowCount` + per-column
  *     `distinctCount`, when ANALYZE-style stats exist in the catalog);
  *  2. the [[analyzeKeys]] registry: one aggregation pass over the base
  *     records exact row count + KMV distinct estimates per key column
  *     (the q69/q171 sketch machinery) keyed by the base's file paths —
  *     the rule matches the fact subtree's single file relation and its
  *     pre-agg key COLUMN NAMES against it.
  *
  * Multi-column key sets use max(per-column distinct) — a true LOWER
  * bound on the tuple distinct count, hence an UPPER bound on the
  * reduction: the rule bails only when even the optimistic reduction is
  * below threshold (never guards away a genuinely reducing regime).
  * When NEITHER source covers the keys the rule fires as before —
  * estimate-free behavior is unchanged, so enabling the guard cannot
  * silently un-push a workload that was relying on the rewrite; the
  * registry row count describes the base at analyze time (a filtered
  * fact usually loses rows and keys together, keeping the RATIO
  * representative — the same approximation every cardinality-estimating
  * optimizer makes).
  */
object EagerAggregation {

  /** [[analyzeKeys]] output: base row count + per-column distinct-count
    * estimates (KMV k=1024 ⇒ ~3% error; exact below 1024 distinct). */
  case class KeyStats(rows: Long, distinctByCol: Map[String, Long])

  private val keyStats =
    new java.util.concurrent.ConcurrentHashMap[Set[String], KeyStats]()

  @volatile private var minReduction: Double = 4.0

  /** Reduction threshold (rows per pre-agg key) below which the rewrite
    * bails when an estimate is available. 0 disables the guard. */
  def setMinReduction(r: Double): Unit = minReduction = r

  def clearKeyStats(): Unit = keyStats.clear()

  /** ANALYZE-style stats pass: ONE aggregation over `df` (count(*) plus
    * a KMV sketch per column) recorded against the frame's single
    * file-backed relation. Columns accumulate across calls — analyze the
    * join-key and fact-grouping columns a workload actually uses. */
  def analyzeKeys(df: DataFrame, cols: Seq[String], k: Int = 1024): KeyStats = {
    import org.apache.spark.sql.functions._
    val paths = df.queryExecution.analyzed.collect {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
          fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
          _, _, _, _) =>
        fs.location.rootPaths.map(_.toString).toSet
    }
    require(paths.size == 1,
      s"analyzeKeys needs a single file-backed relation, found ${paths.size}")
    val sketches = cols.map(c =>
      graft.functions.expressions.KmvDistinctAgg.kmvSketch(
        graft.curate.Curate.portableHash60(col(c)), k).as(s"__s_$c"))
    val row = df.agg(count(lit(1)).as("__n"), sketches: _*).collect()(0)
    val rows = row.getLong(0)
    val dist = cols.zipWithIndex.map { case (c, i) =>
      val arr = row.getSeq[Long](i + 1)
      val est =
        if (arr.length < k) arr.length.toDouble
        else (k - 1).toDouble * (1L << 60).toDouble / arr(k - 1).toDouble
      c -> math.max(1L, est.toLong)
    }.toMap
    val merged = keyStats.merge(paths.head, KeyStats(rows, dist),
      (old, nw) => KeyStats(nw.rows, old.distinctByCol ++ nw.distinctByCol))
    merged
  }

  /** Estimated rows-per-key for aggregating `fact` by `keys`; None when
    * neither plan stats nor the [[analyzeKeys]] registry cover them. */
  private[plan] def estimatedReduction(fact: LogicalPlan,
                                       keys: Seq[Attribute]): Option[Double] = {
    if (keys.isEmpty) return None // global pre-agg: always maximally reducing
    val st = fact.stats
    val fromPlan = st.rowCount.flatMap { rc =>
      val ds = keys.flatMap(a => st.attributeStats.get(a).flatMap(_.distinctCount))
      if (ds.isEmpty) None
      else Some(rc.toDouble / math.max(1.0, ds.max.toDouble))
    }
    fromPlan.orElse {
      val rels = fact.collect {
        case org.apache.spark.sql.execution.datasources.LogicalRelation(
            fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
            _, _, _, _) =>
          fs.location.rootPaths.map(_.toString).toSet
      }
      if (rels.size != 1) None
      else Option(keyStats.get(rels.head)).flatMap { ks =>
        val ds = keys.flatMap(a => ks.distinctByCol.get(a.name))
        if (ds.isEmpty) None
        else Some(ks.rows.toDouble / math.max(1.0, ds.max.toDouble))
      }
    }
  }

  def enable(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[PushRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new PushRule

  def disable(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[PushRule])

  /** True when the optimized plan carries an Aggregate BELOW a Join —
    * the pushed-partial shape, for gates/specs that must PROVE the
    * rewrite fired. */
  def partialAggBelowJoin(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case j: Join => j.children.exists(_.collectFirst {
        case a: Aggregate => a
      }.isDefined)
    }.exists(identity)

  private[plan] class PushRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

    private def stripProjects(p: LogicalPlan): LogicalPlan = p match {
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        stripProjects(child)
      case other => other
    }

    private def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }

    private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
      val join = stripProjects(agg.child) match {
        case j: Join if (j.joinType == Inner || j.joinType == LeftOuter ||
            j.joinType == RightOuter || j.joinType == FullOuter) &&
            j.condition.isDefined => j
        case _ => return None
      }
      val leftOut = join.left.outputSet
      val rightOut = join.right.outputSet
      // pure conjunction of attribute equi-predicates, oriented (left, right)
      val keyPairs = conjuncts(join.condition.get).map {
        case EqualTo(a: AttributeReference, b: AttributeReference)
          if leftOut.contains(a) && rightOut.contains(b) => (a, b)
        case EqualTo(a: AttributeReference, b: AttributeReference)
          if leftOut.contains(b) && rightOut.contains(a) => (b, a)
        case _ => return None
      }
      val aggCalls = agg.aggregateExpressions.flatMap(_.collect {
        case ae: AggregateExpression => ae
      })
      if (aggCalls.isEmpty) return None
      if (aggCalls.exists(ae => ae.isDistinct || ae.filter.isDefined)) return None
      val aggRefs = AttributeSet(aggCalls.flatMap(_.references))
      val (fact, dim, factIsLeft) =
        if (aggRefs.subsetOf(leftOut)) (join.left, join.right, true)
        else if (aggRefs.subsetOf(rightOut)) (join.right, join.left, false)
        else return None
      // OUTER-join soundness (Yan-Larson's outer variant). When the fact
      // is the PRESERVED side, pre-aggregation is sound verbatim: an
      // unmatched partial row null-extends once carrying its n_k rows'
      // partials, exactly what the n_k raw rows would have contributed.
      // When the fact side can be NULL-EXTENDED (incl. both obligations
      // at once under FULL OUTER), plain-attr aggregates stay sound
      // because null partials drop out of sum/count(e)/min/max/avg just
      // like raw null-extended rows do — EXCEPT count(*), which counts
      // the null-extended row itself: that partial merges as
      // sum(coalesce(partial, 1)) below (the classic COUNT BUG fix — a
      // preserved dim row with no match contributes 1).
      val factNullExtended = join.joinType match {
        case Inner => false
        case LeftOuter => !factIsLeft
        case RightOuter => factIsLeft
        case _ => true // FullOuter
      }
      // ADVICE r10 (high): on the null-extended path a non-null-rejecting
      // EXPRESSION arg (min(coalesce(o_x, 0)), count(CASE WHEN ...)) is
      // evaluated to a NON-NULL value on each raw null-extended row, but
      // the pushed shape has no partial row there — silent undercount.
      // Restrict null-extended-fact rewrites to plain fact attribute
      // args (NULL on null-extended rows ⇒ they drop identically) and
      // the all-non-null-literal count(*) form (coalesce-fixed below).
      if (factNullExtended && !aggCalls.forall { ae =>
        ae.aggregateFunction match {
          case c: Count if c.children.forall {
            case l: Literal => l.value != null
            case _ => false
          } => true
          case f => f.children.nonEmpty &&
            f.children.forall(_.isInstanceOf[AttributeReference])
        }
      }) return None
      // idempotence at the optimizer's fixpoint: a pushed plan's fact side
      // IS an Aggregate — never stack a second pre-aggregation on it
      if (stripProjects(fact).isInstanceOf[Aggregate]) return None
      val factOut = fact.outputSet
      val factKeys = keyPairs.map(p => if (factIsLeft) p._1 else p._2)
      val groupRefs = AttributeSet(agg.groupingExpressions.flatMap(_.references))
      val factGroupAttrs = agg.groupingExpressions.flatMap(_.references)
        .filter(factOut.contains).distinct
      // COST GUARD: bail when the pre-aggregation provably reduces too
      // little (rows per key below the threshold) — the near-unique-key
      // regime where its hash state approaches fact size and spills.
      // No estimate ⇒ fire (estimate-free behavior unchanged).
      if (minReduction > 0) {
        val guardKeys = (factKeys ++ factGroupAttrs).distinct
        estimatedReduction(fact, guardKeys) match {
          case Some(r) if r < minReduction => return None
          case _ => ()
        }
      }

      // partials, deduplicated by (kind, canonicalized input)
      val partials = scala.collection.mutable.LinkedHashMap[
        (String, Expression), Alias]()
      def partialOf(kind: String, fn: AggregateFunction,
                    key: Expression): Attribute = {
        val al = partials.getOrElseUpdate((kind, key.canonicalized),
          Alias(AggregateExpression(fn, Complete, isDistinct = false),
            s"__ea_${kind}_${partials.size}")())
        al.toAttribute
      }
      def sumOf(a: Expression) =
        AggregateExpression(Sum(a), Complete, isDistinct = false)
      def mergeOf(ae: AggregateExpression): Option[Expression] =
        ae.aggregateFunction match {
          case Sum(e, _) =>
            val m = sumOf(partialOf("sum", Sum(e), e))
            Some(if (m.dataType == ae.dataType) m else Cast(m, ae.dataType))
          case c: Count =>
            // count(*) keys on the literal row-count partial; count(args)
            // on the FULL canonicalized argument list — count(a,b) and
            // count(a,c) in one query must not share a partial (ADVICE r9)
            val key: Expression = c.children match {
              case Seq() => Literal(1)
              case Seq(one) => one
              case many => CreateStruct(many)
            }
            val countStar = c.children.forall {
              case l: Literal => l.value != null
              case _ => false
            }
            val partial: Expression = partialOf("cnt", c, key)
            // count-bug fix: when the fact side is null-extended by an
            // outer join, a preserved dim row with no match still counts
            // as ONE output row for count(*) — its NULL partial reads 1
            val summed = sumOf(
              if (countStar && factNullExtended)
                Coalesce(Seq(partial, Literal(1L)))
              else partial)
            // empty-join global aggregate: stock count returns 0 but
            // sum(partial) over zero rows returns NULL — coalesce restores
            // answer-invisibility (grouped outputs never see the NULL:
            // a group row exists only when input rows do) (ADVICE r9)
            Some(Coalesce(Seq(summed, Literal(0L))))
          case Min(e) =>
            Some(AggregateExpression(Min(partialOf("min", Min(e), e)),
              Complete, isDistinct = false))
          case Max(e) =>
            Some(AggregateExpression(Max(partialOf("max", Max(e), e)),
              Complete, isDistinct = false))
          case Average(e, _) if !e.dataType.isInstanceOf[DecimalType] =>
            Some(Divide(
              Cast(sumOf(partialOf("sum", Sum(e), e)), DoubleType),
              Cast(sumOf(partialOf("cnt", Count(Seq(e)), e)), DoubleType)))
          case _ => None
        }
      def rewriteExpr(e: Expression): Option[Expression] = e match {
        case ae: AggregateExpression => mergeOf(ae)
        case a: AttributeReference => Some(a) // grouping or dim column
        case other =>
          val kids = other.children.map(rewriteExpr)
          if (kids.exists(_.isEmpty)) None
          else Some(other.withNewChildren(kids.map(_.get)))
      }
      val rewritten = agg.aggregateExpressions.map {
        case a: AttributeReference => a
        case al @ Alias(child, name) =>
          Alias(rewriteExpr(child).getOrElse(return None), name)(
            exprId = al.exprId, qualifier = al.qualifier)
        case _ => return None
      }
      val preKeys: Seq[Attribute] = (factKeys ++ factGroupAttrs).distinct
      val preAgg = Aggregate(preKeys,
        preKeys.map(_.asInstanceOf[NamedExpression]) ++ partials.values, fact)
      val newJoin =
        if (factIsLeft) join.copy(left = preAgg)
        else join.copy(right = preAgg)
      // grouping expressions and output exprIds are preserved verbatim —
      // parents above the aggregate are untouched
      Some(Aggregate(agg.groupingExpressions, rewritten, newJoin))
    }
  }
}
