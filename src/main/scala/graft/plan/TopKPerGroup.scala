package graft.plan

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LogicalPlan, UnaryNode, Window => LWindow}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.apache.spark.sql.{GraftColumnBridge => Bridge}

/** Distributed top-k-per-group as a first-class operator: logical node +
  * optimizer rewrite + planner strategy + partial/final physical operators,
  * registered per-session (`TopKPerGroup.install`) or via
  * `spark.sql.extensions=graft.GraftSparkExtensions`.
  *
  * Why not the window formulation? Spark plans
  * `row_number().over(partitionBy K orderBy O) <= k` as
  * exchange → FULL SORT of every group → WindowExec streaming rank → filter:
  * every row of every group is shuffled and sorted to keep k of them. This
  * operator keeps a size-k heap per group on BOTH sides of the exchange:
  * the partial pass reduces each input partition to ≤ k rows per group
  * BEFORE the shuffle (the top-k analogue of map-side combine), the final
  * pass merges heaps after it — O(n log k) compute, no group-wide sort, and
  * shuffle volume bounded by partitions × groups × k instead of n. At
  * 100 TB with bounded k this is the difference between shuffling the
  * corpus and shuffling the answer.
  *
  * Memory: per-task state is (#groups in partition) × k row copies — the
  * operator is for the bounded-k regime (ranking dashboards, per-key
  * samples, argmax). [[RewriteWindowTopK]] refuses k > [[TopKPerGroup.MaxK]]
  * so a `rk <= 10_000_000` query silently stays on the sort-based window
  * path rather than OOMing a heap.
  */
case class TopKPerGroupNode(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Shared per-partition heap pass: reduce an iterator to its per-group
  * top-k. Rows are converted to UnsafeRow and copied on retention (input
  * rows are buffer-reused by upstream operators). */
private[plan] object TopKHeaps {
  def perGroup(iter: Iterator[InternalRow], input: Seq[Attribute],
               grouping: Seq[Expression], order: Seq[SortOrder], k: Int)
    : java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]] = {
    val keyProj = UnsafeProjection.create(grouping, input)
    val toUnsafe = UnsafeProjection.create(input.map(_.dataType).toArray)
    val ord = RowOrdering.create(order, input).asInstanceOf[Ordering[InternalRow]]
    // PriorityQueue with REVERSED ordering: head = worst retained row, so
    // a better row evicts it in O(log k)
    val worstFirst: java.util.Comparator[UnsafeRow] =
      (a: UnsafeRow, b: UnsafeRow) => ord.compare(b, a)
    val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[UnsafeRow](math.min(k, 16), worstFirst)
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) heap.add(toUnsafe(row).copy())
      else if (ord.compare(row, heap.peek()) < 0) {
        heap.poll()
        heap.add(toUnsafe(row).copy())
      }
    }
    heaps
  }
}

/** Pre-shuffle pass: each input partition emits at most k rows per group —
  * an unranked superset-free reduction (any global top-k row is a partition
  * top-k row). No distribution requirement; runs where the data already is. */
case class PartialTopKExec(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    val (grp, ord, kk, out) = (grouping, order, k, child.output)
    child.execute().mapPartitions({ iter =>
      import scala.jdk.CollectionConverters._
      TopKHeaps.perGroup(iter, out, grp, ord, kk)
        .values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKExec =
    copy(child = newChild)
}

/** Post-shuffle pass: groups are co-located (ClusteredDistribution), so the
  * per-partition heaps are the global answer; each group's heap drains in
  * order and rows are emitted with their 1-based rank appended. */
case class TopKPerGroupExec(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def requiredChildDistribution: Seq[Distribution] =
    if (grouping.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(grouping) :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    // locals only: referencing fields inside the closure would capture
    // `this` and serialize the whole operator subtree into every task
    val (grp, ordExprs, kk, out) = (grouping, order, k, child.output)
    val outTypes = (child.output :+ rankAttr).map(_.dataType).toArray
    child.execute().mapPartitions({ iter =>
      import scala.jdk.CollectionConverters._
      val ord = RowOrdering.create(ordExprs, out).asInstanceOf[Ordering[InternalRow]]
      val outProj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      TopKHeaps.perGroup(iter, out, grp, ordExprs, kk)
        .values().iterator().asScala.flatMap { heap =>
          val rows = heap.toArray(new Array[UnsafeRow](heap.size))
          java.util.Arrays.sort(rows, ord.asInstanceOf[java.util.Comparator[UnsafeRow]])
          rows.iterator.zipWithIndex.map { case (r, i) =>
            rankRow.setInt(0, i + 1)
            outProj(joined(r, rankRow))
          }
        }
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Plans [[TopKPerGroupNode]] as partial → (exchange inserted by
  * EnsureRequirements) → final. */
object TopKPerGroupStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TopKPerGroupNode =>
      TopKPerGroupExec(n.grouping, n.order, n.k, n.rankAttr,
        PartialTopKExec(n.grouping, n.order, n.k, planLater(n.child))) :: Nil
    case _ => Nil
  }
}

/** Rewrites `Filter(rk <= k, Window(row_number() as rk PARTITION BY ...))`
  * into [[TopKPerGroupNode]] — SQL-text and DSL window top-k queries get
  * the heap operator without code changes. Conservative by design: only a
  * lone row_number window expression, non-empty partition and order specs,
  * an integer-literal bound, and k within [[TopKPerGroup.MaxK]]; anything
  * else keeps the window plan. Extra filter conjuncts are preserved above
  * the new node. */
object RewriteWindowTopK extends Rule[LogicalPlan] with PredicateHelper {
  private def bound(rk: Attribute, e: Expression): Option[Int] = e match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rk) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rk) => Some(v - 1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute) if a.semanticEquals(rk) => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), a: Attribute) if a.semanticEquals(rk) => Some(v - 1)
    case EqualTo(a: Attribute, Literal(v: Int, IntegerType)) if v == 1 && a.semanticEquals(rk) => Some(1)
    case EqualTo(Literal(v: Int, IntegerType), a: Attribute) if v == 1 && a.semanticEquals(rk) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ LFilter(cond,
        w @ LWindow(Seq(alias @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          part, order, child, _))
        if part.nonEmpty && order.nonEmpty =>
      val rk = alias.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val hit = conjuncts.iterator.map(c => (c, bound(rk, c))).collectFirst {
        case (c, Some(kv)) => (c, kv)
      }
      hit match {
        case Some((used, kv)) if kv >= 1 && kv <= TopKPerGroup.MaxK =>
          val node = TopKPerGroupNode(part, order, kv, rk, child)
          val residual = conjuncts.filterNot(_ eq used)
          residual.reduceOption(And).map(LFilter(_, node)).getOrElse(node)
        case _ => f
      }
  }
}

object TopKPerGroup {
  /** Rewrite refuses larger bounds: heap state is groups × k rows per task. */
  val MaxK: Int = 100000

  /** Register the planner strategy (needed to execute the node) on this
    * session; idempotent. */
  def ensureStrategy(spark: SparkSession): Unit = {
    val exp = Bridge.experimental(spark)
    if (!exp.extraStrategies.contains(TopKPerGroupStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKPerGroupStrategy
  }

  /** Register strategy + the window-pattern rewrite rule; idempotent. After
    * this, existing `row_number over ... <= k` queries on the session plan
    * through the heap operator. */
  def install(spark: SparkSession): Unit = {
    ensureStrategy(spark)
    val exp = Bridge.experimental(spark)
    if (!exp.extraOptimizations.contains(RewriteWindowTopK))
      exp.extraOptimizations = exp.extraOptimizations :+ RewriteWindowTopK
  }

  /** Explicit API: top `k` rows of `df` per `groupBy` group under `orderBy`
    * (use `.desc`/`.asc` Columns), with a 1-based `rankName` column
    * appended — the heap-operator equivalent of
    * `row_number().over(Window.partitionBy(groupBy).orderBy(orderBy)) <= k`. */
  def apply(df: DataFrame, groupBy: Seq[Column], orderBy: Seq[Column], k: Int,
            rankName: String = "rk"): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val order = orderBy.map(Bridge.catalystExpression(spark, _) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    val node = TopKPerGroupNode(
      groupBy.map(Bridge.catalystExpression(spark, _)),
      order, k,
      AttributeReference(rankName, IntegerType, nullable = false)(),
      df.queryExecution.analyzed)
    Bridge.dataset(spark, node)
  }
}
