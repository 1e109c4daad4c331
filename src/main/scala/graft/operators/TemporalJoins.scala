package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal join operators Spark has no native node for, composed from
  * built-ins with the right scale shape (SURVEY.md §2c "Joins" row —
  * ABSENT in the reference; custom-operator preference (a): compose).
  *
  * All timestamps are compared at MICROSECOND precision (`ts div 1000`
  * of the raw nanosecond long) because the DuckDB oracle reads the
  * parquet at µs — comparisons must truncate identically on both sides.
  *
  * As-of join — for each purchase, the latest same-user click at or
  * before it. NOT a range-explosion join: both sides union into one
  * stream, one shuffle on user_id, one within-partition sort, and a
  * running `last(click_id)` window carries the answer to each purchase
  * row. O(n log n) per user, no pair blowup, spills via the sort —
  * this survives arbitrarily long histories.
  *
  * Range join — pairs of same-user events within a bounded window
  * (attribution-style). Equi-bucketing the time axis turns the
  * inequality into an equi-join on (user, bucket) against self and the
  * successor bucket, so rows only meet within ±1 bucket instead of a
  * full per-user cross product. Bucket width = the range bound, the
  * standard construction. */
object TemporalJoins {

  private def eventsUs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"))

  /** For each purchase: most recent click_id of the same user with
    * click.ts_us <= purchase.ts_us; ties on ts_us break to the larger
    * event_id (same rule as the oracle's ORDER BY ... DESC LIMIT 1). */
  def asofPurchaseAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsUs(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      // clicks sort before purchases at equal ts_us so a same-instant
      // click is visible to the purchase (<= semantics); among clicks
      // at one instant the LAST in event_id order wins
      .withColumn("kind", when(col("event_type") === "click", 0).otherwise(1))
      .withColumn("click_id",
        when(col("event_type") === "click", col("event_id")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("attributed_click", last("click_id", ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("attributed_click"))
  }

  /** FORWARD as-of: for each click, the EARLIEST same-user purchase at
    * or after it (conversion attribution looking ahead). Mirror image
    * of [[asofPurchaseAttribution]]: same single-shuffle union-stream
    * plan, frame flipped to currentRow..unboundedFollowing and
    * `first(ignoreNulls)` instead of `last`. Purchases sort AFTER
    * clicks at an equal instant (kind 0 < 1) so a same-instant
    * purchase is visible to the click (>= semantics); among purchases
    * at one instant the smallest event_id wins, matching the oracle's
    * ORDER BY ts ASC, event_id ASC LIMIT 1. */
  def asofNextPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsUs(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("kind", when(col("event_type") === "click", 0).otherwise(1))
      .withColumn("purchase_id",
        when(col("event_type") === "purchase", col("event_id")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("kind"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ev.withColumn("next_purchase", first("purchase_id", ignoreNulls = true).over(w))
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("next_purchase"))
  }

  /** Count of same-user event pairs (a before-or-equal b, a != b)
    * within 5 minutes, per user. Bucket width == range bound: candidate
    * pairs only from (bucket, bucket) and (bucket, bucket+1). */
  val RangeUs: Long = 5L * 60 * 1000 * 1000

  def rangeJoinPairs(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsUs(spark, dir)
      .withColumn("bucket", expr(s"ts_us div $RangeUs"))
    // each left row probes its own bucket and the successor, so the join
    // is a PURE equi-join on (user, bucket) — a composite key the
    // planner hashes directly; an OR-of-buckets condition would demote
    // bucket to a post-join filter and leave user_id (skewable at
    // scale) as the only shuffle key. Each qualifying (a, b) pair
    // matches in exactly one probe bucket, so no dedup is needed.
    val probes = ev.select(col("user_id"), col("event_id"), col("ts_us"),
      explode(array(col("bucket"), col("bucket") + 1)).as("probe_bucket"))
    val succ = ev.select(col("user_id").as("u2"), col("event_id").as("id2"),
      col("ts_us").as("t2"), col("bucket").as("b2"))
    val pairs = probes.join(succ,
      col("user_id") === col("u2") && col("probe_bucket") === col("b2") &&
        col("event_id") =!= col("id2") &&
        col("t2") >= col("ts_us") && col("t2") - col("ts_us") <= RangeUs)
    pairs.groupBy("user_id").agg(count(lit(1)).as("n_pairs"))
  }

  /** The SAME range join written the natural way — equi key plus raw
    * range conjuncts, no hand-bucketing. [[graft.plans.RangeJoinRewrite]]
    * (injected by GraftExtensions) detects the shape in the optimizer
    * and applies the banded rewrite of [[rangeJoinPairs]] automatically,
    * so the user-facing query stays declarative while the executed plan
    * joins on (user, bucket). RangeJoinRewriteSpec pins plan + frame
    * equality with the rule on and off. */
  def rangeJoinAuto(spark: SparkSession, dir: String): DataFrame = {
    val a = eventsUs(spark, dir)
    val b = eventsUs(spark, dir).select(col("user_id").as("u2"),
      col("event_id").as("id2"), expr("ts_us").as("t2"))
    a.join(b,
        col("user_id") === col("u2") && col("event_id") =!= col("id2") &&
          col("t2") >= col("ts_us") && col("t2") - col("ts_us") <= lit(RangeUs))
      .groupBy("user_id").agg(count(lit(1)).as("n_pairs"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_purchase_attribution" -> (asofPurchaseAttribution _),
    "asof_next_purchase" -> (asofNextPurchase _),
    "range_join_pairs" -> (rangeJoinPairs _),
    "range_join_auto" -> (rangeJoinAuto _))

  val oracles: Map[String, String] = Map(
    "asof_next_purchase" ->
      """SELECT c.event_id,
        |       (SELECT p.event_id FROM events p
        |        WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
        |          AND p.ts >= c.ts
        |        ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS next_purchase
        |FROM events c WHERE c.event_type = 'click'""".stripMargin,
    "asof_purchase_attribution" ->
      """SELECT p.event_id,
        |       (SELECT c.event_id FROM events c
        |        WHERE c.user_id = p.user_id AND c.event_type = 'click'
        |          AND c.ts <= p.ts
        |        ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS attributed_click
        |FROM events p WHERE p.event_type = 'purchase'""".stripMargin,
    "range_join_pairs" ->
      """SELECT a.user_id, count(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id <> b.event_id
        | AND b.ts >= a.ts
        | AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000
        |GROUP BY a.user_id""".stripMargin,
    "range_join_auto" ->
      """SELECT a.user_id, count(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id <> b.event_id
        | AND b.ts >= a.ts
        | AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000
        |GROUP BY a.user_id""".stripMargin)
}
