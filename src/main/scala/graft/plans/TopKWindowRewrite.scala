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
  * Window (same spec, same limit) is absorbed — the heap subsumes it.
  * Under a non-total ORDER BY, row_number already returns one
  * arbitrary valid assignment among ties in stock Spark; the rewrite
  * stays within that same semantics class (and the certifying query's
  * order is total, so its result is engine-exact).
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
    // fired on the same spec (its limit equals k by construction)
    val child = windowChild match {
      case WindowGroupLimit(ps, os, _: RowNumber, _, inner)
          if ps == partSpec && os == orderSpec => inner
      case other => other
    }
    Some(Project(projectList, TopKPerKeyNode(partSpec, orderSpec, k, child)))
  }

  /** K from the supported comparison shapes, in either operand order. */
  private def limitFrom(cond: Expression, rn: Attribute): Option[Int] = {
    object Rn { def unapply(e: Expression): Boolean = e match {
      case a: Attribute => a.semanticEquals(rn)
      case _ => false
    }}
    cond match {
      case LessThanOrEqual(Rn(), Literal(v: Int, _)) => Some(v)
      case LessThan(Rn(), Literal(v: Int, _)) => Some(v - 1)
      case GreaterThanOrEqual(Literal(v: Int, _), Rn()) => Some(v)
      case GreaterThan(Literal(v: Int, _), Rn()) => Some(v - 1)
      case EqualTo(Rn(), Literal(1, _)) => Some(1)
      case EqualTo(Literal(1, _), Rn()) => Some(1)
      case _ => None
    }
  }
}
