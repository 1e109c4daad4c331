package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RangeJoinRewrite

/** Randomized equivalence check for RangeJoinRewrite: over seeded
  * random datasets — including NEGATIVE timestamps, where truncating
  * `div` buckets are irregular around zero (the Scaladoc's "every
  * trunc-div cell spans >= D" claim does the work) — and both
  * supported upper-bound spellings, the rewritten join must return
  * exactly the rows the un-rewritten join returns. */
class RangeJoinPropertySpec extends AnyFunSuite with SharedSpark {

  test("rule-on results equal rule-off results on random data, both bound forms") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val n = 150 + rnd.nextInt(150)
      val rows = (0 until n).map { i =>
        (rnd.nextInt(6).toLong, i.toLong, (rnd.nextInt(4000) - 2000).toLong)
      }
      val d = (1 + rnd.nextInt(400)).toLong
      val a = rows.toDF("k", "id", "t")
      val b = rows.toDF("k2", "id2", "t2")
      // alternate the two upper-bound spellings the rule matches
      val upper =
        if (trial % 2 == 0) col("t2") - col("t") <= lit(d)
        else col("t2") <= col("t") + lit(d)
      val joined = a.join(b,
        col("k") === col("k2") && col("id") =!= col("id2") &&
          col("t2") >= col("t") && upper)

      val pOn = joined.queryExecution.executedPlan.toString
      assert(pOn.contains("graft_rj_probe"), s"trial $trial: rule did not fire:\n$pOn")
      val on = joined.select("id", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

      spark.conf.set(RangeJoinRewrite.EnabledKey, "false")
      val off =
        try a.join(b,
            col("k") === col("k2") && col("id") =!= col("id2") &&
              col("t2") >= col("t") && upper)
          .select("id", "id2").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        finally spark.conf.set(RangeJoinRewrite.EnabledKey, "true")

      assert(on == off,
        s"trial $trial (n=$n, d=$d): rewrite changed the result " +
          s"(${on.size} vs ${off.size} rows)")
    }
  }
}
