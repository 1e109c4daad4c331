package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: execute the declarative top-k-per-group idiom on the
  * [[TopKPerKeyExec]] physical operator.
  *
  * The pattern every SQL user writes —
  *
  * {{{
  * SELECT ... FROM (
  *   SELECT ..., row_number() OVER (PARTITION BY k ORDER BY ...) AS rn
  *   FROM t) WHERE rn <= K      -- and rn is then dropped
  * }}}
  *
  * optimizes in stock Spark to Filter ← Window ← WindowGroupLimit:
  * the group-limit pre-filters each partition to K rows per key, but
  * the plan still pays a full per-partition SORT on both map and
  * reduce sides, plus the Window machinery, to compute a row number
  * the query immediately throws away. When the rank column does not
  * survive the projection, none of that is needed: the query IS
  * [[TopKPerKeyNode]] — one heap pass after the key exchange, no sort
  * (see SCALING.md §Sort/top-k).
  *
  * Fires only on exactly this shape, conservatively:
  *  - the Window computes a single `row_number()` (never rank/
  *    dense_rank — their tie semantics keep MORE than K rows, which
  *    the heap does not implement);
  *  - the filter is a simple `rn <= K` / `rn < K` / `rn = 1`
  *    comparison with a positive literal resolving against that
  *    row_number attribute;
  *  - the enclosing projection drops the rank column (if the query
  *    keeps `rn`, the window must actually run);
  *  - the partition spec is non-empty (a global top-k already plans
  *    as TakeOrderedAndProject).
  *
  * An InferWindowGroupLimit-inserted [[WindowGroupLimit]] below the
  * Window (same spec) is absorbed — the heap subsumes it. Its limit
  * is BOUND, not assumed: the heap runs at `min(groupLimit, k)`, so a
  * plan carrying a tighter group limit than the filter's K (stock
  * Spark never builds one, but a hand-built plan can) keeps its
  * tighter semantics instead of silently returning extra rows.
  * Under a non-total ORDER BY, row_number already returns one
  * arbitrary valid assignment among ties in stock Spark; the rewrite
  * stays within that same semantics class (and the certifying query's
  * order is total, so its result is engine-exact).
  *
  * MEMORY CONTRACT (inherited from [[TopKPerKeyExec]], restated here
  * because this rule moves user queries onto it silently): the
  * operator holds one K-row heap PER DISTINCT KEY in the partition in
  * an in-memory hash map with no spill path — worst-case task memory
  * is O(|keys in partition| · K · rowWidth). The window form it
  * replaces sorts (and therefore spills) instead. For K ≲ 100 the
  * heap is strictly cheaper than sorting every row of every group,
  * but a query with hundreds of millions of distinct keys per
  * partition AND a large K could OOM a task that previously completed
  * slowly; set `spark.graft.topkWindow.enabled=false` (this rule's
  * kill-switch, honored at optimization time) to fall back to the
  * stock sort+window plan.
  * Toggle with `spark.graft.topkWindow.enabled`.
  */
object TopKWindowRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.topkWindow.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "true") != "true") return plan
    plan.transformUp {
      case p @ Project(projectList,
            Filter(cond,
              Window(Seq(Alias(WindowExpression(_: RowNumber, spec), _)),
                partSpec, orderSpec, windowChild, _)))
          if partSpec.nonEmpty && orderSpec.nonEmpty &&
            spec.partitionSpec == partSpec && spec.orderSpec == orderSpec =>
        rewrite(p, projectList, cond, partSpec, orderSpec, windowChild)
          .getOrElse(p)
    }
  }

  private def rewrite(
      p: Project,
      projectList: Seq[NamedExpression],
      cond: Expression,
      partSpec: Seq[Expression],
      orderSpec: Seq[SortOrder],
      windowChild: LogicalPlan): Option[LogicalPlan] = {
    // the Window node's single output beyond the child's columns is
    // the row_number alias; resolve it from the Filter's references
    val childOut = windowChild.outputSet
    val rnAttrs = cond.references.filterNot(childOut.contains)
    if (rnAttrs.size != 1) return None
    val rn = rnAttrs.head

    val k = limitFrom(cond, rn).filter(_ > 0).getOrElse(return None)
    // the rank column must not survive the projection
    if (projectList.exists(_.references.contains(rn))) return None

    // absorb the stock group-limit if InferWindowGroupLimit already
    // fired on the same spec — binding its limit: the heap runs at
    // min(groupLimit, k) so a tighter group limit keeps its semantics
    val (child, kEff) = windowChild match {
      case WindowGroupLimit(ps, os, _: RowNumber, limit, inner)
          if ps == partSpec && os == orderSpec && limit > 0 =>
        (inner, math.min(limit, k))
      case other => (other, k)
    }
    Some(Project(projectList, TopKPerKeyNode(partSpec, orderSpec, kEff, child)))
  }

  /** K from the supported comparison shapes, in either operand order. */
  private def limitFrom(cond: Expression, rn: Attribute): Option[Int] = {
    object Rn { def unapply(e: Expression): Boolean = e match {
      case a: Attribute => a.semanticEquals(rn)
      case _ => false
    }}
    // the strict forms decrement only for v > 0 — Int.MinValue - 1
    // would wrap to Int.MaxValue and turn an always-false filter into
    // a keep-everything pass; non-positive literals fall through to
    // None (caller's `.filter(_ > 0)` would reject 0 anyway, the
    // guard here keeps the overflow impossible rather than filtered)
    cond match {
      case LessThanOrEqual(Rn(), Literal(v: Int, _)) => Some(v)
      case LessThan(Rn(), Literal(v: Int, _)) if v > 0 => Some(v - 1)
      case GreaterThanOrEqual(Literal(v: Int, _), Rn()) => Some(v)
      case GreaterThan(Literal(v: Int, _), Rn()) if v > 0 => Some(v - 1)
      case EqualTo(Rn(), Literal(1, _)) => Some(1)
      case EqualTo(Literal(1, _), Rn()) => Some(1)
      case _ => None
    }
  }
}
