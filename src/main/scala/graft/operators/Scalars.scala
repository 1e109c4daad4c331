package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Scalar-function coverage: JSON extraction, math builtins, and
  * timestamp bucketing over the nanosecond `events.ts` column.
  *
  * The reference's scalar surface is string split + SHA-1 only
  * (SURVEY.md §2c) — these queries certify the full builtin library a
  * user would expect when migrating. All are narrow transforms feeding
  * one aggregate.
  *
  * `events.ts` note: the parquet type is TIMESTAMP(NANOS), which this
  * engine reads as a raw nanosecond long (Spark's µs TimestampType
  * cannot hold it). `ts div 1000` is integer division to µs — a double
  * division would lose precision above 2^53 ns. DuckDB reads the same
  * column as its native timestamp and truncates to µs identically, so
  * day buckets agree. */
object Scalars {

  /** JSON field extraction + aggregate over the extracted value. */
  def jsonExtractEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))

  /** Math builtins with integer-exact outputs. */
  def scalarMath(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_linenumber")
      .agg(
        sum(ceil(col("l_quantity")).cast(LongType)).as("sum_ceil_qty"),
        sum(floor(col("l_discount") * 100).cast(LongType)).as("sum_disc_pct"),
        sum(pmod(col("l_orderkey"), lit(97L))).as("sum_mod"),
        max(abs(col("l_tax") - 0.04)).as("max_tax_dev"))

  /** Daily tumbling buckets over nanosecond timestamps. */
  def eventsPerDay(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(
        date_format(timestamp_micros(expr("ts div 1000")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"))

  /** Exact interpolated percentiles (both engines use the
    * rank = p·(n−1) linear-interpolation definition). */
  def valuePercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        percentile(col("value"), lit(0.5)).as("p50"),
        percentile(col("value"), lit(0.9)).as("p90"))

  /** Sketch percentiles: percentile_approx (GK/KLL-style summary) — the
    * 100 TB path where exact percentile's full sort-per-group is off
    * the table. No DuckDB oracle (sketch internals are engine-specific
    * by construction, like the HLL row); ScalarsSketchSpec pins the
    * approximation against the exact query instead. */
  def approxValuePercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50_approx"),
        percentile_approx(col("value"), lit(0.9), lit(10000)).as("p90_approx"))

  /** String builtin coverage: upper/substr/replace/concat/length. */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .select(
        col("c_custkey"),
        upper(col("c_mktsegment")).as("seg_upper"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("name_masked"),
        concat_ws("/", col("c_mktsegment"), col("c_name")).as("seg_name"),
        length(col("c_name")).cast(LongType).as("name_len"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "string_funcs" -> (stringFuncs _),
    "value_percentiles" -> (valuePercentiles _),
    "approx_value_percentiles" -> (approxValuePercentiles _),
    "json_extract_events" -> (jsonExtractEvents _),
    "scalar_math" -> (scalarMath _),
    "events_per_day" -> (eventsPerDay _))

  val oracles: Map[String, String] = Map(
    "string_funcs" ->
      """SELECT c_custkey,
        |       upper(c_mktsegment) AS seg_upper,
        |       substring(c_name, 1, 8) AS name_prefix,
        |       regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
        |       concat_ws('/', c_mktsegment, c_name) AS seg_name,
        |       length(c_name) AS name_len
        |FROM customer""".stripMargin,
    "value_percentiles" ->
      """SELECT event_type, quantile_cont(value, 0.5) AS p50,
        |       quantile_cont(value, 0.9) AS p90
        |FROM events GROUP BY event_type""".stripMargin,
    // NOTE: every integer SUM below is wrapped in an outer CAST(... AS
    // BIGINT). DuckDB's SUM(BIGINT) returns HUGEINT (int128), which the
    // driver's pandas fetch materializes as float64 — hashing 3.0 where
    // Spark hashes 3. The outer cast keeps the oracle dtype int64.
    "json_extract_events" ->
      """SELECT event_type,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "scalar_math" ->
      """SELECT l_linenumber,
        |       CAST(SUM(CAST(ceil(l_quantity) AS BIGINT)) AS BIGINT) AS sum_ceil_qty,
        |       CAST(SUM(CAST(floor(l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_disc_pct,
        |       CAST(SUM(l_orderkey % 97) AS BIGINT) AS sum_mod,
        |       MAX(abs(l_tax - 0.04)) AS max_tax_dev
        |FROM lineitem GROUP BY l_linenumber""".stripMargin,
    "events_per_day" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin)
}
