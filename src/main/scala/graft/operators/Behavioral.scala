package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Behavioral event analytics — funnel and cohort-retention queries,
  * the product-analytics staples (ABSENT in the reference, whose only
  * workload is WordCount — `job/WordCount.java:14-53`; SURVEY.md §2d
  * north-star extension).
  *
  * Timestamps compare at microseconds (`ts div 1000`) like
  * [[TemporalJoins]] — the DuckDB oracle reads the same parquet at µs.
  *
  * Scale shape: every stage is a per-user aggregate (high-cardinality
  * key, map-side partials) or an equi-join on user_id; the funnel's
  * per-stage frames shrink monotonically (stage k+1 ≤ stage k users),
  * so each successive join carries less. No windows over the whole
  * event stream, no per-user sequence materialization. */
object Behavioral {

  private def eventsUs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"))

  /** Ordered view → click → purchase funnel: per stage, how many users
    * reached it IN ORDER (a click counts only at-or-after the user's
    * first view; a purchase only at-or-after that click). Classic
    * staged formulation: the stage-k frame is one row per surviving
    * user, joined into the raw events of stage k+1 — each join's build
    * side is the (shrinking) survivor set. */
  def funnelConversion(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsUs(spark, dir)
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_us").as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts_us") >= col("v_ts"))
      .groupBy("user_id").agg(min("ts_us").as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts_us") >= col("c_ts"))
      .groupBy("user_id").agg(min("ts_us").as("p_ts"))
    v.agg(count(lit(1)).as("n_viewed")).crossJoin(
        c.agg(count(lit(1)).as("n_clicked_after_view"))).crossJoin(
        p.agg(count(lit(1)).as("n_purchased_after_click")))
  }

  /** Day-7 cohort retention: users grouped by first-active day
    * (cohort); retained = active again 7+ days later. Two per-user
    * aggregates collapse each user to (first_day, last_day) — one
    * shuffle on user_id, one on the (tiny) cohort day. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame =
    eventsUs(spark, dir)
      .select(col("user_id"),
        expr("ts_us div 86400000000").as("day"))
      .groupBy("user_id")
      .agg(min("day").as("cohort_day"), max("day").as("last_day"))
      .groupBy("cohort_day")
      .agg(
        count(lit(1)).as("n_users"),
        sum(when(col("last_day") - col("cohort_day") >= 7, 1L)
          .otherwise(0L)).as("n_retained_7d"))

  /** Rolling 7-day active users (WAU) per observed day — the standard
    * engagement rollup. Each (day, user) event contributes to the 7
    * windows it falls in, via one `sequence` explode (×7 row growth,
    * constant factor); a (window-day, user) DISTINCT collapses
    * multiplicity, the semi-join against observed days drops windows
    * that extend past the data, and one count per window day finishes.
    * Two constant-width shuffles; no self-join of events against
    * events (the naive 7-day range join) and no per-day window
    * function over the whole event stream. At 100 TB the explode
    * factor is the window length — WAU=7, MAU=30 — and the distinct
    * is the dominant (linear) shuffle, exactly as at test scale. */
  def rollingActiveUsers(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsUs(spark, dir)
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
    val contrib = ev
      .select(col("user_id"),
        explode(expr("sequence(day, day + 6)")).as("wday"))
      .distinct()
    val days = ev.select(col("day").as("wday")).distinct()
    contrib.join(days, "wday")
      .groupBy("wday")
      .agg(count(lit(1)).as("wau"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "funnel_conversion" -> (funnelConversion _),
    "cohort_retention" -> (cohortRetention _),
    "rolling_active_users" -> (rollingActiveUsers _))

  val oracles: Map[String, String] = Map(
    "funnel_conversion" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |v AS (SELECT user_id, min(ts_us) AS v_ts FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(ts_us) AS c_ts FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND ts_us >= v_ts GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(ts_us) AS p_ts FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND ts_us >= c_ts GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_viewed,
        |       (SELECT count(*) FROM c) AS n_clicked_after_view,
        |       (SELECT count(*) FROM p) AS n_purchased_after_click""".stripMargin,
    "cohort_retention" ->
      """WITH d AS (SELECT user_id,
        |                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        |           FROM events),
        |u AS (SELECT user_id, min(day) AS cohort_day, max(day) AS last_day
        |      FROM d GROUP BY user_id)
        |SELECT cohort_day, count(*) AS n_users,
        |       CAST(SUM(CASE WHEN last_day - cohort_day >= 7 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_retained_7d
        |FROM u GROUP BY cohort_day""".stripMargin,
    "rolling_active_users" ->
      """WITH d AS (SELECT user_id,
        |                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
        |           FROM events),
        |contrib AS (SELECT DISTINCT user_id, day + o AS wday
        |            FROM d, range(0, 7) r(o)),
        |days AS (SELECT DISTINCT day AS wday FROM d)
        |SELECT wday, count(*) AS wau
        |FROM contrib JOIN days USING (wday)
        |GROUP BY wday""".stripMargin)
}
