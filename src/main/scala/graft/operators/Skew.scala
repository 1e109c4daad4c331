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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_salted_sum" -> (skewSaltedSum _))

  val oracles: Map[String, String] = Map(
    "skew_salted_sum" ->
      """SELECT event_type AS key,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |       count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin)
}
