package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DotProductExpr, LegacyPartitionExpr}

/** SparkSessionExtensions entry point: makes the engine's native
  * functions available to plain SQL on any session built with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`):
  *
  * {{{ SELECT legacy_partition(event_type, 4) FROM events }}}
  *
  * and injects [[graft.plans.RangeJoinRewrite]] and
  * [[graft.plans.TopKWindowRewrite]] into the operator optimization
  * batch (bounded-range joins upgraded to banded equi-joins; the
  * row_number-≤-k window idiom upgraded onto the heap operator) plus
  * [[graft.plans.TopKPerKeyStrategy]] into the planner (the bounded
  * top-k-per-key physical operator both rewrites target).
  *
  * This is the deployment-grade registration path (cluster-wide via
  * config, survives new sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    e.injectOptimizerRule(_ => graft.plans.TopKWindowRewrite)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    e.injectFunction((
      new FunctionIdentifier("legacy_partition"),
      new ExpressionInfo(classOf[LegacyPartitionExpr].getName, "legacy_partition"),
      (args: Seq[Expression]) => args match {
        case Seq(key, Literal(n: Int, _)) => LegacyPartitionExpr(key, n)
        case _ => throw new IllegalArgumentException(
          "usage: legacy_partition(key, numWorkers literal int)")
      }))
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProductExpr(a, b)
        case _ => throw new IllegalArgumentException(
          "usage: dot_product(array<double>, array<double>)")
      }))
  }
}
