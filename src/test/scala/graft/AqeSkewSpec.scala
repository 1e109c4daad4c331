package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.ShuffledJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Certification that AQE's `OptimizeSkewedJoin` actually fires on a
  * hot-key join in this engine's session config — not just that the
  * conf is set (VERDICT r7 #6).
  *
  * The salted-join/salted-agg forms (`operators/Skew.scala`) are the
  * static mitigations; AQE skew splitting is the runtime one. Both
  * must hold at 100 TB: AQE handles a partition it can observe and
  * split, salting handles the key so hot a single task would still
  * blow past memory. This spec builds a Zipf-ish corpus (60% of fact
  * rows on one key), drops the skew thresholds to test scale, runs the
  * PLAIN unsalted join, and pins:
  *
  *  1. the final adaptive plan contains a shuffled join with
  *     `isSkewJoin = true` (the skewed partition was split);
  *  2. the plain-AQE result is row-identical to the salted-join
  *     mitigation on the same data — the two paths are
  *     interchangeable, which is what lets an operator choose either
  *     at scale without a semantics audit.
  */
class AqeSkewSpec extends AnyFunSuite with SharedSpark {

  /** 300 k fact rows: ids ≡ 0..5 (mod 10) → key 0 (the hot key, 60%
    * of rows); the rest spread over 1 000 cold keys. Deterministic —
    * no rand(), so retries and reruns see identical bytes. */
  private def fact: DataFrame =
    spark.range(0, 300000).select(
      when(col("id") % 10 < 6, lit(0L))
        .otherwise(pmod(hash(col("id")), lit(1000)) + 1).as("k"),
      (col("id") % 97).cast("double").as("v"))

  private def dim: DataFrame =
    spark.range(0, 1001).select(
      col("id").as("dk"), (col("id") * 7 % 31).as("w"))

  /** The certified aggregate over the join — small, deterministic,
    * order-insensitive after sort. */
  private def rollup(joined: DataFrame): DataFrame =
    joined.groupBy(col("w"))
      .agg(sum(col("v").cast("decimal(18,2)")).cast("double").as("sv"),
        count(lit(1)).as("n"))

  private def collectSorted(df: DataFrame): Array[(Long, Double, Long)] = {
    import spark.implicits._
    df.as[(Long, Double, Long)].collect().sortBy(_._1)
  }

  /** Shuffled joins anywhere in a finalized adaptive plan. Query
    * stages are LEAF nodes wrapping their materialized subplan, so a
    * plain `collect` stops at the stage boundary — descend through
    * `QueryStageExec.plan` explicitly. */
  private def shuffledJoins(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffledJoin] =
    p.collect { case n => n }.flatMap {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        shuffledJoins(q.plan)
      case j: ShuffledJoin => Seq(j)
      case _               => Nil
    }

  private def withSkewConfs[A](body: => A): A = {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // no broadcast: the dim must arrive via shuffle or the skewed
      // exchange never exists; thresholds shrunk so the ~2 MB hot
      // partition registers as skewed at test scale (defaults target
      // 256 MB production partitions)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0")
      body
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("OptimizeSkewedJoin splits the hot-key partition in the adaptive plan") {
    withSkewConfs {
      // the plan walked below must be the very QueryExecution that ran —
      // AQE only finalizes (and marks skew splits on) a materialized
      // query, and any .as[...] / transform would wrap a fresh one
      val agg = rollup(fact.join(dim, col("k") === col("dk")))
      val rows = agg.collect()
      assert(rows.map(_.getLong(2)).sum == 300000L, "join must keep every fact row")

      val adaptive = agg.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }.getOrElse(fail("AQE not active on the join plan"))
      val shuffled = shuffledJoins(adaptive.executedPlan)
      assert(shuffled.nonEmpty,
        s"expected a shuffled join in the final plan:\n${adaptive.executedPlan}")
      assert(shuffled.exists(_.isSkewJoin),
        s"OptimizeSkewedJoin did not fire (isSkewJoin=false):\n${adaptive.executedPlan}")
    }
  }

  test("plain-AQE skew join and salted join agree row-for-row") {
    withSkewConfs {
      val plain = collectSorted(rollup(fact.join(dim, col("k") === col("dk"))))
      val salted = collectSorted(rollup(
        operators.Skew.saltedJoin(fact, dim, col("k"), col("dk"))))
      assert(plain.sameElements(salted),
        s"mitigation paths diverge:\nplain=${plain.take(5).mkString(",")}\n" +
          s"salted=${salted.take(5).mkString(",")}")
    }
  }
}
