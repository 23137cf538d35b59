package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  BaseOrdering, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge

/** Whole-operator custom plan: top-k rows PER GROUP by a sort order —
  * the one operator shape in the suite where Spark's built-ins genuinely
  * can't express the efficient plan (SURVEY §7.5 preference order (c)).
  *
  * What Spark plans for the declarative form
  * (`row_number().over(Window.partitionBy(g).orderBy(o)) <= k`), as of
  * 3.5+: InferWindowGroupLimit inserts WindowGroupLimit(Partial) below
  * the map-side, so the SHUFFLE is already cut to ≤ groups×k rows per
  * partition — but each WindowGroupLimit phase still FULLY SORTS its
  * input on (g, o) before truncating (sort-then-take, O(n log n)
  * comparisons with the whole input through the sorter's memory
  * budget), and WindowExec still runs above the final phase to compute
  * the rn the filter consumes.
  *
  * This operator keeps a BOUNDED HEAP of k rows per group and never
  * sorts the input: O(n log k) comparisons, memory O(groups × k) rows
  * per task, no spill pressure from the data itself. It runs TWO-PHASE
  * like hash aggregation: a partial pass on the map side cuts each
  * partition to ≤ k rows per group BEFORE the exchange (the shuffle then
  * carries at most partitions × groups × k rows, not the corpus), and a
  * final pass after a ClusteredDistribution-induced exchange merges the
  * survivors. EnsureRequirements inserts the hash exchange; AQE coalesces
  * it like any aggregation shuffle.
  *
  * Semantics: with a TOTAL sort order (callers must include a unique
  * tiebreaker, the suite-wide oracle convention) the emitted row SET is
  * exactly the window-form's `rn <= k` set; per-group emission order is
  * heap order, so callers apply presentation ordering downstream —
  * queries here end in a total-order orderBy anyway. Nulls order per
  * SortOrder defaults (NULLS FIRST for ASC, LAST for DESC), matching the
  * oracle dialect.
  *
  * Scale honesty: the partial phase's state is bounded by (distinct
  * groups in the partition × k) rows — the same worst case as hash
  * aggregation's partial map, but WITHOUT spill support; a corpus whose
  * group count per partition is pathological (every row its own group)
  * gains nothing from the partial pass yet still pays its map. That is
  * the documented trade: like `spark.sql.aggregate.partialAggregate`
  * skipping, a production planner would bypass the partial when group
  * cardinality approaches row count. The final phase's state is bounded
  * by the OUTPUT size (groups-in-partition × k), the operator's floor.
  *
  * MEASURED CROSSOVER (sf10, 15M orders, local[32] — SCALING.md): the
  * operator earns its keep iff k ≪ group size. Low-cardinality
  * leaderboards (60 groups of ~180k rows, k=5, q41's shape): 1.2 s vs
  * the window form's 3.7 s — the partial phase shuffles ~300 rows per
  * partition where the window shuffles the corpus into ≤60 skewed
  * partitions and sorts it. High-cardinality tiny groups (1.5M
  * customers × ~10 orders, k=3): 6.4 s vs the window's 3.3 s — ~30% of
  * rows survive, so nothing prunes, and per-survivor row copies plus
  * hash-map traffic cost more than the window's optimized sort. A
  * first implementation using java.util.PriorityQueue lost EVERYWHERE
  * (per-node allocation + sift); the sorted bounded array below
  * replaced it. Use this operator for k ≪ group size; keep the window
  * plan when group size ≈ k.
  */
case class GroupTopKPlan(groupExprs: Seq[Expression], order: Seq[SortOrder],
                         k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"GroupTopK needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopKPlan =
    copy(child = newChild)
}

/** Plans [[GroupTopKPlan]] as partial-exchange-final [[GroupTopKExec]].
  * Registered per-session (see [[GroupTopK.topK]]) or at build time via
  * [[graft.functions.GraftExtensions]]. */
class GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKPlan(g, o, k, child) =>
      val partial = GroupTopKExec(g, o, k, planLater(child), partial = true)
      GroupTopKExec(g, o, k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

/** One phase of per-group bounded-heap top-k. `partial = true` runs on
  * whatever distribution the child has (map side); `partial = false`
  * requires clustering on the group keys, so EnsureRequirements inserts
  * the one hash exchange between the phases. */
case class GroupTopKExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
                         k: Int, child: SparkPlan, partial: Boolean)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String =
    if (partial) "GroupTopKPartial" else "GroupTopKFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = output
    val (g, ord, kk) = (groupExprs, order, k)
    val perPartition = (iter: Iterator[InternalRow]) => {
      val keyProj = UnsafeProjection.create(g, schema)
      val cmp: BaseOrdering = GenerateOrdering.generate(ord, schema)
      // Per-group state is a SORTED BOUNDED ARRAY (best..worst), not a
      // priority queue: the sf10 measurement (SCALING.md) showed the
      // first PriorityQueue implementation LOSING to the window form on
      // small groups (~10 rows, k=3) — per-row PQ node allocation and
      // sift cost swamped the saved sort. With the array, the hot path
      // for a non-qualifying row is ONE comparison against the current
      // worst, a qualifying row costs an O(k) shift insert, and full
      // groups allocate nothing. For the small k this operator targets
      // (top-k per group, k ≪ group), that is strictly cheaper than
      // both the PQ and the window's per-row log(run) sort comparisons.
      final class Grp {
        val rows = new Array[InternalRow](kk)
        var n = 0
      }
      val groups = new java.util.HashMap[UnsafeRow, Grp]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row) // reused buffer: copy only on first sight
        var grp = groups.get(key)
        if (grp == null) {
          grp = new Grp
          groups.put(key.copy(), grp)
        }
        val rows = grp.rows
        if (grp.n < kk) {
          // growing group: shift insert into the sorted prefix
          val copy = row.copy()
          var j = grp.n
          while (j > 0 && cmp.compare(copy, rows(j - 1)) < 0) {
            rows(j) = rows(j - 1); j -= 1
          }
          rows(j) = copy
          grp.n += 1
        } else if (cmp.compare(row, rows(kk - 1)) < 0) {
          // full group, candidate beats the worst: displace it
          val copy = row.copy()
          var j = kk - 1
          while (j > 0 && cmp.compare(copy, rows(j - 1)) < 0) {
            rows(j) = rows(j - 1); j -= 1
          }
          rows(j) = copy
        } // else: one comparison, no allocation — the hot path
      }
      groups.values().iterator().asScala.flatMap(g => g.rows.iterator.take(g.n))
    }
    child.execute().mapPartitions(perPartition, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)
}

/** DataFrame-facing surface. Columns are named (resolved against the
  * input's analyzed output), each order column paired with its
  * ascending flag; include a unique tiebreaker for a deterministic row
  * set. Prune/filter BEFORE calling: the logical node is opaque to
  * ColumnPruning, so upstream narrowing is the caller's contract (every
  * queries() use sites selects its columns first). */
/** OPT-IN optimizer rule (`graft.topk.rewrite=true`): rewrites the
  * declarative per-group top-k idiom —
  * `Project(Filter(row_number <= k, Window(row_number over (g, o))))`
  * where the filtered row-number column is projected away — into
  * [[GroupTopKPlan]], so a user who writes the textbook window form gets
  * the bounded-heap two-phase operator without knowing it exists. This
  * is the missing half of the custom-operator story: q41 exercises the
  * EXPLICIT API; this rule turns the idiom Spark users actually write
  * into the same plan.
  *
  * Deliberately conf-gated OFF by default: the crossover measured at
  * sf10 (GroupTopK scaladoc above) shows the rewrite LOSES on
  * high-cardinality tiny groups (per-customer ~10 rows: 6.4 s vs the
  * window's 3.3 s), and group cardinality is unknowable from the logical
  * plan without stats — exactly the class of rewrite that must be an
  * explicit knob, not a default (Spark's own topKSortFallbackThreshold
  * is the same spirit for the global case). With the flag on, the
  * rewrite fires only on the exact shape whose semantics it preserves:
  * one row_number window expression (ties are already nondeterministic
  * in the window form unless the order is total — the suite convention
  * is a unique tiebreaker, under which the row SET is identical), a
  * plain `rn <= k` / `rn < k` / `rn = 1` filter, and no downstream
  * reference to rn.
  */
case class GroupTopKRewrite(spark: org.apache.spark.sql.SparkSession)
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, CurrentRow,
    EqualTo, IntegerLiteral, LessThan, LessThanOrEqual, RowFrame, RowNumber,
    SpecifiedWindowFrame, UnboundedPreceding, WindowExpression}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window,
    WindowGroupLimit}

  private def kOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.exprId == rn.exprId => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.exprId == rn.exprId => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.exprId == rn.exprId => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!spark.conf.get("graft.topk.rewrite", "false").toBoolean) plan
    else plan.transformUp {
      case p @ Project(projList, Filter(cond, w: Window))
          if w.windowExpressions.size == 1 && w.orderSpec.nonEmpty =>
        w.windowExpressions.head match {
          case al @ Alias(WindowExpression(_: RowNumber,
              spec) , _) if spec.frameSpecification ==
                SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) =>
            val rn = al.toAttribute
            kOf(cond, rn) match {
              case Some(k) if k > 0 &&
                  !projList.exists(_.references.contains(rn)) =>
                // Spark's own InferWindowGroupLimit (an earlier optimizer
                // batch) will already have planted a WindowGroupLimit
                // below the Window — the built-in SORT-based per-group
                // rank limit. Strip it: GroupTopK subsumes it (heap
                // O(n log k) vs sort O(n log n)); leaving it would run
                // both, with the sort dominating.
                val base = w.child match {
                  case wgl: WindowGroupLimit => wgl.child
                  case c => c
                }
                Project(projList,
                  GroupTopKPlan(w.partitionSpec, w.orderSpec, k, base))
              case _ => p
            }
          case _ => p
        }
    }
}

object GroupTopK {
  private val lock = new Object

  /** Idempotently ensure the session can plan [[GroupTopKPlan]]. The
    * extraStrategies registration is the runtime path for sessions not
    * built with GraftExtensions (Verify/Bench/driver sessions); a
    * duplicate alongside an extensions-injected copy is harmless — the
    * planner uses the first strategy that yields a plan. */
  private def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    lock.synchronized {
      val em = Bridge.experimental(spark)
      if (!em.extraStrategies.exists(_.isInstanceOf[GroupTopKStrategy]))
        em.extraStrategies = em.extraStrategies :+ new GroupTopKStrategy
    }

  /** Idempotently register [[GroupTopKRewrite]] (plus the strategy it
    * plans through) on a running session — the runtime analog of
    * GraftExtensions' injectOptimizerRule for sessions built without
    * extensions. The rule itself stays inert until
    * `graft.topk.rewrite=true`, so registration is always safe. */
  def ensureRewrite(spark: org.apache.spark.sql.SparkSession): Unit =
    lock.synchronized {
      ensureStrategy(spark)
      val em = Bridge.experimental(spark)
      if (!em.extraOptimizations.exists(_.isInstanceOf[GroupTopKRewrite]))
        em.extraOptimizations = em.extraOptimizations :+ GroupTopKRewrite(spark)
    }

  def topK(df: DataFrame, groupCols: Seq[String],
           orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    ensureStrategy(df.sparkSession)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"GroupTopK: no column '$n' in ${analyzed.output.map(_.name).mkString(", ")}"))
    val order = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    Bridge.ofRows(df.sparkSession,
      GroupTopKPlan(groupCols.map(attr), order, k, analyzed))
  }
}
