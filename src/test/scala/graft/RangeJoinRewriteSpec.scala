package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins
import graft.plans.RangeJoinRewrite

/** Pins for the RangeJoinRewrite optimizer rule: the naturally-written
  * bounded-range join must be rewritten to the banded equi-join, the
  * rewrite must be semantics-preserving (frame equality with the rule
  * disabled AND with the hand-bucketed composition), and the rule must
  * leave non-matching joins alone. */
class RangeJoinRewriteSpec extends AnyFunSuite with SharedSpark {

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("natural range join is rewritten to join on the time bucket") {
    val p = TemporalJoins.rangeJoinAuto(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("graft_rj_bucket") && p.contains("graft_rj_probe"),
      s"rule did not fire:\n$p")
    // the bucket is a JOIN KEY (in the hash-join key list beside
    // user_id — broadcast at this SF, shuffle keys at scale), not a
    // post-join filter
    assert(
      "HashJoin \\[[^\\]]*graft_rj_probe".r.findFirstIn(p).isDefined ||
        "hashpartitioning\\([^)]*graft_rj_".r.findFirstIn(p).isDefined,
      s"bucket not part of the join key:\n$p")
    assert(p.contains("explode"), s"probe-side explode missing:\n$p")
  }

  test("rewrite preserves semantics: equals rule-off run and hand-bucketed form") {
    val auto = sortedRows(TemporalJoins.rangeJoinAuto(spark, sfDir))
    val hand = sortedRows(TemporalJoins.rangeJoinPairs(spark, sfDir))
    assert(auto == hand, "auto-rewritten result differs from hand-bucketed")

    spark.conf.set(RangeJoinRewrite.EnabledKey, "false")
    try {
      val off = TemporalJoins.rangeJoinAuto(spark, sfDir)
      val offPlan = off.queryExecution.executedPlan.toString
      assert(!offPlan.contains("graft_rj_bucket"), s"rule fired while disabled:\n$offPlan")
      assert(sortedRows(off) == auto, "rule-off result differs")
    } finally spark.conf.set(RangeJoinRewrite.EnabledKey, "true")
  }

  test("joins without a bounded range predicate are untouched") {
    // plain equi join (no range conjuncts at all)
    val p = SparkEntry.queries("join_orders_customers")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("graft_rj_"), s"rule fired on a plain equi join:\n$p")
    // range join lacking an equi key (theta) must not be rewritten either:
    // the bucket alone would make a dense time slice its own hot key
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), expr("ts div 1000").as("t"))
    val ev2 = ev.select(col("event_id").as("id2"), col("t").as("t2"))
    val theta = ev.join(ev2,
      col("t2") >= col("t") && col("t2") - col("t") <= lit(1000L))
    val tp = theta.queryExecution.optimizedPlan.toString
    assert(!tp.contains("graft_rj_"), s"rule fired without an equi key:\n$tp")
  }
}
