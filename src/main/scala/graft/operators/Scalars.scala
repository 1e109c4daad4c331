package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

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

  /** One-pass table profiling — the data-quality audit every pipeline
    * runs before training: row counts, per-column null counts, distinct
    * cardinalities, numeric min/max/mean. All partial-aggregating, one
    * reduce to a single row (countDistinct plans an expand+two-phase
    * agg — still one shuffle each). */
  def profileOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("o_totalprice"))).as("n_null_price"),
        countDistinct(col("o_custkey")).as("n_custkeys"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          / count(lit(1)), 6).as("avg_price"))

  /** Data-quality CONSTRAINT AUDIT (the Deequ-style validation gate a
    * pipeline runs before training on an ingest): named checks →
    * violation counts, one row per check. The two orders checks FUSE
    * into a single scan (one aggregate computing both counters,
    * unpivoted to long form with `stack`) — the shape that matters at
    * 100 TB, where each additional full-table check must ride an
    * existing pass, not add one; the referential check is one
    * broadcast anti-join. An all-zeros result is the point: the audit
    * certifies the fixtures' invariants, and any generator drift
    * flips a count. */
  def constraintAudit(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    val lineitem = Tables.load(spark, dir, "lineitem")
    val ordersChecks = orders
      .agg(
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("pk"),
        (count(lit(1)) - count(col("o_totalprice"))).as("nn"))
      .selectExpr(
        """stack(2, 'orders_pk_unique', pk,
          |         'orders_price_not_null', nn) AS (check_name, n_violations)"""
          .stripMargin)
    val fkOrphans = orders
      .join(broadcast(customer.select("c_custkey")),
        orders("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("orders_fk_customer").as("check_name"), col("n_violations"))
    val ranges = lineitem
      .agg(sum(when(col("l_quantity") <= 0 ||
          col("l_discount") < 0 || col("l_discount") > 1, 1L)
        .otherwise(0L)).as("n_violations"))
      .select(lit("lineitem_value_ranges").as("check_name"), col("n_violations"))
    ordersChecks.union(fkOrphans).union(ranges)
  }

  /** Z-SCORE OUTLIER AUDIT — the distribution-drift gate beside
    * [[profileOrders]]/[[constraintAudit]]: per event type, how many
    * values sit more than 3σ from the mean. Deliberately TWO-pass
    * (exact moments, then a broadcast of the 5-row stats frame over a
    * second narrow pass) rather than single-pass Welford: streaming
    * variance accumulates in partition order, which no cross-engine
    * oracle can replay — whereas Σx and Σx² in DECIMAL are exact and
    * order-free, and every double op after them (μ, σ, the 3σ
    * comparison) runs on identical operands in both engines. At
    * 100 TB both passes are full-scan-shaped but cheap: the first is
    * one partial-aggregating shuffle of 3 columns, the second a
    * broadcast join + aggregate that fuses with any other
    * per-row audit riding the same scan. */
  def outlierZscore(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("value"))
    val d = col("value").cast(DecimalType(18, 2))
    val moments = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(d).as("sx"), sum(d * d).as("sxx"))
    val mu = col("sx").cast(DoubleType) / col("n")
    val stats = moments.select(col("event_type"), mu.as("mu"),
      sqrt(col("sxx").cast(DoubleType) / col("n") - mu * mu).as("sigma"))
    ev.join(broadcast(stats), "event_type")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(when(abs(col("value") - col("mu")) > lit(3.0) * col("sigma"), 1L)
          .otherwise(0L)).as("n_outliers"),
        round(max(col("mu")), 6).as("mean_value"),
        round(max(col("sigma")), 6).as("std_value"))
  }

  /** ARGMAX/ARGMIN (max_by/min_by family) with DETERMINISTIC ties:
    * expressed as min/max over (value, id) structs — lexicographic
    * struct comparison breaks value ties on the unique event_id, where
    * bare max_by would be free to return any tied row (and the two
    * engines would disagree). Same partial-agg shuffle shape as any
    * min/max. */
  def argMaxMinEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        max(struct(col("value").as("v"), col("event_id").as("id"))).as("mx"),
        min(struct(col("value").as("v"), col("event_id").as("id"))).as("mn"))
      .select(col("event_type"),
        col("mx.id").as("top_event"), col("mx.v").as("top_value"),
        col("mn.id").as("bottom_event"), col("mn.v").as("bottom_value"))

  /** Zero-filled daily series — the reporting shape a sparse GROUP BY
    * cannot produce: generate the full [min-day, max-day] calendar with
    * `sequence`, cross the (tiny) day × type grid, left-join the real
    * counts, zero-fill the gaps. The grid is bounded by the date range
    * and type cardinality, never by row count — at 100 TB the generate
    * side is still a few thousand rows against one aggregated frame. */
  def eventsPerDayDense(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.load(spark, dir, "events")
      .select(
        date_format(timestamp_micros(expr("ts div 1000")), "yyyy-MM-dd").as("day"),
        col("event_type"))
    val counts = days.groupBy("day", "event_type").agg(count(lit(1)).as("cnt"))
    val allDays = days.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(sequence(to_date(col("lo")), to_date(col("hi")))).as("d"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"))
    val types = days.select("event_type").distinct()
    allDays.crossJoin(types)
      .join(counts, Seq("day", "event_type"), "left_outer")
      .select(col("day"), col("event_type"),
        coalesce(col("cnt"), lit(0L)).as("n"))
  }

  /** Fixed-width value histogram: bucket = floor(value / width). One
    * narrow kernel + one hash aggregate; the binning a numeric profile
    * or feature-distribution check runs at any scale. */
  val HistWidth = 50.0

  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(floor(col("value") / HistWidth).cast(LongType).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_lo", col("bucket") * HistWidth)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_per_day_dense" -> (eventsPerDayDense _),
    "value_histogram" -> (valueHistogram _),
    "string_funcs" -> (stringFuncs _),
    "value_percentiles" -> (valuePercentiles _),
    "approx_value_percentiles" -> (approxValuePercentiles _),
    "json_extract_events" -> (jsonExtractEvents _),
    "scalar_math" -> (scalarMath _),
    "profile_orders" -> (profileOrders _),
    "constraint_audit" -> (constraintAudit _),
    "outlier_zscore" -> (outlierZscore _),
    "arg_max_min_events" -> (argMaxMinEvents _),
    "events_per_day" -> (eventsPerDay _))

  val oracles: Map[String, String] = Map(
    "constraint_audit" ->
      """SELECT 'orders_pk_unique' AS check_name,
        |       count(*) - count(DISTINCT o_orderkey) AS n_violations FROM orders
        |UNION ALL
        |SELECT 'orders_price_not_null',
        |       count(*) - count(o_totalprice) FROM orders
        |UNION ALL
        |SELECT 'orders_fk_customer',
        |       (SELECT count(*) FROM orders o
        |        WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                          WHERE c.c_custkey = o.o_custkey))
        |UNION ALL
        |SELECT 'lineitem_value_ranges',
        |       (SELECT CAST(SUM(CASE WHEN l_quantity <= 0 OR l_discount < 0
        |                                  OR l_discount > 1
        |                             THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem)""".stripMargin,
    "outlier_zscore" ->
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |         SUM(CAST(value AS DECIMAL(18,2))) AS sx,
        |         SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS sxx
        |  FROM events GROUP BY event_type),
        |s AS (
        |  SELECT event_type,
        |         CAST(sx AS DOUBLE) / n AS mu,
        |         sqrt(CAST(sxx AS DOUBLE) / n
        |              - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)) AS sigma
        |  FROM m)
        |SELECT event_type, count(*) AS n,
        |       CAST(SUM(CASE WHEN abs(e.value - s.mu) > 3.0 * s.sigma
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       round(max(s.mu), 6) AS mean_value,
        |       round(max(s.sigma), 6) AS std_value
        |FROM events e JOIN s USING (event_type)
        |GROUP BY event_type""".stripMargin,
    "profile_orders" ->
      """SELECT count(*) AS n_rows,
        |       count(*) - count(o_totalprice) AS n_null_price,
        |       count(DISTINCT o_custkey) AS n_custkeys,
        |       count(DISTINCT o_orderpriority) AS n_priorities,
        |       min(o_totalprice) AS min_price,
        |       max(o_totalprice) AS max_price,
        |       round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |             / count(*), 6) AS avg_price
        |FROM orders""".stripMargin,
    "arg_max_min_events" ->
      """SELECT event_type,
        |       (max(struct_pack(v := value, id := event_id))).id AS top_event,
        |       (max(struct_pack(v := value, id := event_id))).v AS top_value,
        |       (min(struct_pack(v := value, id := event_id))).id AS bottom_event,
        |       (min(struct_pack(v := value, id := event_id))).v AS bottom_value
        |FROM events GROUP BY event_type""".stripMargin,
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
        |FROM events GROUP BY 1, 2""".stripMargin,
    "events_per_day_dense" ->
      """WITH days AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type FROM events),
        |counts AS (SELECT day, event_type, count(*) AS cnt FROM days GROUP BY 1, 2),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM days),
        |alld AS (SELECT strftime(d, '%Y-%m-%d') AS day
        |         FROM b, LATERAL unnest(generate_series(CAST(lo AS DATE),
        |                                                CAST(hi AS DATE),
        |                                                INTERVAL 1 DAY)) t(d)),
        |types AS (SELECT DISTINCT event_type FROM days)
        |SELECT day, event_type, COALESCE(cnt, 0) AS n
        |FROM alld CROSS JOIN types
        |LEFT JOIN counts USING (day, event_type)""".stripMargin,
    "value_histogram" ->
      """SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
        |       count(*) AS n,
        |       CAST(floor(value / 50.0) AS BIGINT) * 50.0 AS bucket_lo
        |FROM events GROUP BY 1""".stripMargin)
}
