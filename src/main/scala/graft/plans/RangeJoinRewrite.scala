package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: turn a bounded-range join into a banded equi-join.
  *
  * A join written the natural way —
  *
  * {{{ a JOIN b ON a.k = b.k AND b.t >= a.t AND b.t - a.t <= D }}}
  *
  * is planned by Spark as a hash/sort-merge join on `k` ALONE, with the
  * range predicate demoted to a post-join filter: every same-key pair is
  * materialized before the bound applies. Per key that is O(n²) work and
  * memory pressure, and at 100 TB a single hot key (one power user, one
  * hot entity) stalls the stage — the classic low-selectivity-equi-join
  * hazard. Databricks ships a dedicated range-join optimization for
  * exactly this shape; open-source Spark has none.
  *
  * This rule is the open-source-Spark counterpart, expressed as a LOGICAL
  * rewrite (custom-operator preference (c) without needing a physical
  * node — the target plan is expressible in relational algebra, so we
  * rewrite the logical plan and let the planner pick the physical join):
  *
  *  - left rows explode to 2 probe buckets `t div D` and `t div D + 1`;
  *  - right rows carry their own bucket `t div D`;
  *  - the bucket equality joins the equi keys, so rows only meet within
  *    ±1 bucket of width D instead of across the key's whole history;
  *  - the ORIGINAL range conjuncts are retained as join-condition
  *    filters, so semantics are exactly preserved (each qualifying pair
  *    meets in exactly one probe bucket: `a.t <= b.t <= a.t + D` pins
  *    `b`'s bucket to `a`'s or its successor — true for truncating
  *    division too, because every trunc-div cell spans >= D).
  *
  * Same construction as [[graft.operators.TemporalJoins.rangeJoinPairs]],
  * but applied BY THE OPTIMIZER to the query a user would naturally
  * write. Fires only on: inner join, at least one plain equi conjunct
  * (the shuffle key), both range endpoints bare LongType attributes, a
  * positive literal bound, and not already rewritten (the rule runs in
  * the fixed-point operator-optimization batch, so it must be
  * idempotent). Toggle with `spark.graft.rangeJoin.enabled`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.rangeJoin.enabled"
  /** Marker names double as the idempotence guard. */
  private val ProbeName = "graft_rj_probe"
  private val BucketName = "graft_rj_bucket"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "true") != "true") return plan
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _)
          if !cond.references.exists(_.name == ProbeName) =>
        rewrite(j, cond).getOrElse(j)
    }
  }

  private def rewrite(j: Join, cond: Expression): Option[LogicalPlan] = {
    val left = j.left
    val right = j.right
    val conjuncts = splitConjunctivePredicates(cond)

    def leftAttr(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference
          if a.dataType == LongType && left.outputSet.contains(a) => Some(a)
      case _ => None
    }
    def rightAttr(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference
          if a.dataType == LongType && right.outputSet.contains(a) => Some(a)
      case _ => None
    }

    // the shuffle key: at least one plain left=right equality must exist,
    // otherwise the banded join would shuffle on the bucket alone and a
    // dense time slice becomes its own hot key
    val hasEqui = conjuncts.exists {
      case EqualTo(l, r) =>
        (l.references.subsetOf(left.outputSet) && r.references.subsetOf(right.outputSet)) ||
          (r.references.subsetOf(left.outputSet) && l.references.subsetOf(right.outputSet))
      case _ => false
    }
    if (!hasEqui) return None

    // lower bounds b.t >= a.t, keyed by (a, b) expr ids
    val lowers: Set[(ExprId, ExprId)] = conjuncts.flatMap {
      case GreaterThanOrEqual(b, a) =>
        for (ba <- rightAttr(b); aa <- leftAttr(a)) yield (aa.exprId, ba.exprId)
      case LessThanOrEqual(a, b) =>
        for (ba <- rightAttr(b); aa <- leftAttr(a)) yield (aa.exprId, ba.exprId)
      case _ => None
    }.toSet
    if (lowers.isEmpty) return None

    def bound(e: Expression): Option[Long] = e match {
      case Literal(d: Long, LongType) if d > 0 => Some(d)
      case Literal(d: Int, _) if d > 0 => Some(d.toLong)
      case _ => None
    }
    // upper bounds b.t - a.t <= D  |  b.t <= a.t + D, paired with a lower
    val upper: Option[(AttributeReference, AttributeReference, Long)] =
      conjuncts.collectFirst(Function.unlift {
        case LessThanOrEqual(Subtract(b, a, _), lim) =>
          for {
            ba <- rightAttr(b); aa <- leftAttr(a); d <- bound(lim)
            if lowers.contains((aa.exprId, ba.exprId))
          } yield (aa, ba, d)
        case LessThanOrEqual(b, Add(a, lim, _)) =>
          for {
            ba <- rightAttr(b); aa <- leftAttr(a); d <- bound(lim)
            if lowers.contains((aa.exprId, ba.exprId))
          } yield (aa, ba, d)
        case _ => None
      })

    upper.map { case (aT, bT, d) =>
      val dLit = Literal(d)
      val aBucket = new IntegralDivide(aT, dLit)
      val probe = AttributeReference(ProbeName, LongType, nullable = true)()
      val exploded = Generate(
        Explode(CreateArray(Seq(aBucket, new Add(aBucket, Literal(1L))))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(probe), child = left)
      val bBucket = Alias(new IntegralDivide(bT, dLit), BucketName)()
      val bucketed = Project(right.output :+ bBucket, right)
      val newCond = (conjuncts :+ EqualTo(probe, bBucket.toAttribute)).reduce(And)
      Project(j.output, Join(exploded, bucketed, Inner, Some(newCond), j.hint))
    }
  }
}
