package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew mitigation: two-stage (salted) aggregation.
  *
  * A `groupBy(key).agg(sum/count)` with a pathologically hot key puts
  * that key's entire row volume on one reducer. Salting splits each key
  * into `buckets` deterministic sub-keys, pre-aggregates per
  * (key, salt) — at most `buckets` rows per key survive stage one —
  * then finishes per key. Spark's map-side partial aggregation already
  * mitigates most of this; the explicit form matters when upstream
  * partitioning concentrates a key before the aggregate (e.g., after a
  * skewed join) or for aggregates without partial impl. AQE's
  * skew-join handling covers the join side; this covers the aggregate
  * side.
  *
  * The salt mixes the value hash with `spark_partition_id()`: hashing
  * the value ALONE sends a hot key whose rows all carry the same value
  * into one salt bucket — exactly the skew being mitigated — while a
  * per-row random/monotonic id would make map output NON-deterministic
  * across task retries (a recomputed map task would route rows to
  * different (key, salt) buckets than its lost output, double-counting
  * or dropping rows in the partial aggregate). The partition id is
  * stable under retry — a re-executed task keeps its partition — so
  * the shuffle routing is deterministic, and a hot key spreads across
  * min(buckets, input partitions) reducers. */
object Skew {

  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     buckets: Int = 16): DataFrame =
    df.select(key.as("key"), value.as("v"))
      .withColumn("salt",
        pmod(hash(col("v"), spark_partition_id()), lit(buckets)))
      .groupBy(col("key"), col("salt"))
      .agg(sum(col("v").cast("decimal(18,2)")).as("ps"), count(lit(1)).as("pc"))
      .groupBy(col("key"))
      .agg(sum("ps").cast("double").as("sum_value"), sum("pc").as("n"))

  /** Oracled certification of the salted aggregate: `events.value`
    * summed per `event_type` — a deliberately hot grouping (5 keys over
    * the whole table, the cardinality where one reducer would otherwise
    * own ~1/5 of all rows). The oracle is the PLAIN one-stage GROUP BY:
    * salting must be semantically invisible (decimal partial sums are
    * exact and associative, so the two-stage result is bit-identical). */
  def skewSaltedSum(spark: SparkSession, dir: String): DataFrame =
    saltedSumCount(Tables.load(spark, dir, "events"),
      col("event_type"), col("value"))

  /** Explicit two-sided join salting — the NON-AQE fallback for a
    * skewed fact⋈dim shuffle join whose dim is too big to broadcast
    * (AQE's OptimizeSkewedJoin needs runtime stats and only splits
    * sort-merge/shuffled-hash partitions it can observe; a static
    * plan, a non-adaptive engine, or a key so hot one partition still
    * exceeds a task's memory wants the salt in the KEY itself).
    *
    * Mechanism: the fact side gets a deterministic salt in
    * [0, buckets) — same retry-stable partition-id mix as
    * [[saltedSumCount]] — widening each hot key to `buckets` shuffle
    * keys; the dim side is REPLICATED `buckets`× via explode, once per
    * salt value, so every (key, salt) fact row finds its dim row. Dim
    * cost is buckets× its size — the knob trades dim duplication
    * against fact spread, so `buckets` stays small (8–32) and the dim
    * side must be the narrower table. Results are identical to the
    * unsalted join: every fact row matches exactly its one dim row,
    * just under a composite key. */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: Column, dimKey: Column,
                 buckets: Int = 16): DataFrame = {
    val f = fact.withColumn("_salt",
      pmod(hash(factKey, spark_partition_id()), lit(buckets)))
    val d = dim.withColumn("_salt",
      explode(array((0 until buckets).map(lit(_)): _*)))
    // shuffle_hash hint: the production scenario is a dim ABOVE the
    // broadcast threshold; without the hint this test-scale dim would
    // broadcast and the salt would never reach a shuffle
    f.join(d.hint("shuffle_hash"),
      f("_salt") === d("_salt") && factKey === dimKey)
      .drop("_salt")
  }

  /** Oracled certification of the salted join: events enriched with
    * their user's customer row, rolled up per customer nation. The
    * oracle is the PLAIN join + GROUP BY — salting must be
    * semantically invisible (one dim match per fact row, decimal
    * partial sums exact). 150 users over 10 k events is the
    * worst-case-ish fan-in the salt spreads; the rollup keeps the
    * certified output small and deterministic. */
  def skewSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val customer = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    saltedJoin(events, customer, col("user_id"), col("c_custkey"))
      .groupBy(col("c_nationkey").as("nation"))
      .agg(
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        count(lit(1)).as("n"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_salted_sum" -> (skewSaltedSum _),
    "skew_salted_join" -> (skewSaltedJoin _))

  val oracles: Map[String, String] = Map(
    "skew_salted_sum" ->
      """SELECT event_type AS key,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |       count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "skew_salted_join" ->
      """SELECT c.c_nationkey AS nation,
        |       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |       count(*) AS n
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c.c_nationkey""".stripMargin)
}
