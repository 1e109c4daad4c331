package graft.operators

import java.math.BigInteger
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference's shuffle-routing function, bit-exact.
  *
  * `job/WordCountContext.java:87-91,140-147`: a key routes to worker
  * `floor(sha1(key) * N / (2^160 - 1))` where `sha1(key)` is the SHA-1
  * digest interpreted as an unsigned 160-bit integer. Equal keys always
  * co-locate — that contract is what Spark's own HashPartitioner gives
  * every `repartition(n, key)` in this engine; this module exists to pin
  * the exact legacy placement for byte-parity checks and migration
  * scenarios (e.g., locating a key's legacy spool shard).
  *
  * Exactness: computed with BigInteger, not a truncated-hex
  * approximation, so boundary keys agree with the reference.
  * DuckDB 1.0 lacks sha1(), so `partition_histogram` is declared
  * without an oracle (rows-only driver check); exactness is instead
  * pinned by PartitioningSpec's independent reimplementation.
  */
object Partitioning {

  private val MAX_SHA1 = BigInteger.TWO.pow(160).subtract(BigInteger.ONE)

  /** Reference formula, exact (`WordCountContext.java:89`). */
  def legacyPartition(key: String, numWorkers: Int): Int = {
    val md = MessageDigest.getInstance("SHA-1")
    val digest = md.digest(key.getBytes(StandardCharsets.UTF_8))
    new BigInteger(1, digest)
      .multiply(BigInteger.valueOf(numWorkers.toLong))
      .divide(MAX_SHA1)
      .intValueExact()
  }

  def legacyPartitionUdf(numWorkers: Int): UserDefinedFunction =
    udf((key: String) => legacyPartition(key, numWorkers))

  /** Rows per legacy partition id for `event_type` keys, N=4 — the
    * SURVEY.md §2d `partition_histogram` query, via the codegen'd
    * [[graft.functions.LegacyPartitionExpr]]. The expression runs after
    * the per-key aggregate (5 distinct keys), not per row, so its cost
    * is nil at any scale regardless. */
  def partitionHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .select(
        graft.functions.LegacyPartitionExpr
          .legacy_partition(col("event_type"), 4).as("partition_id"),
        col("n"))
      .groupBy("partition_id")
      .agg(sum("n").as("n_rows"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "partition_histogram" -> (partitionHistogram _))

  /** DuckDB 1.0 has no sha1() — no oracle; see PartitioningSpec. */
  val oracles: Map[String, String] = Map.empty
}
