package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Z-order (Morton) multi-dimensional clustering — the data-layout
  * lever behind `OPTIMIZE ZORDER BY` in lakehouse table formats, built
  * from plain column algebra: interleave the bits of two dimensions so
  * that a range-partitioned write on the combined key gives EVERY
  * interleaved dimension file-level min/max locality, not just the
  * leading sort column. At 100 TB this is the difference between a
  * point-in-2D query scanning ~√F of F files versus all of them — a
  * linear sort can only prune its own leading dimension (ZOrderSpec
  * demonstrates exactly that contrast on disk).
  *
  * The interleave is pure integer bit algebra — shifts, masks, adds —
  * identical in Spark and DuckDB, so the kernel is fully oracled;
  * the declared query buckets rows by their coarse Z-cell and reports
  * per-cell extents, making the locality property itself the asserted
  * output (each 8-bit cell pins the high nibble of BOTH dimensions, so
  * every min/max pair must sit inside a 16-value band). */
object ZOrder {

  /** Bits per dimension; 2·Bits-bit Z values. */
  val Bits = 8
  val Mask = (1 << Bits) - 1

  /** Spark SQL text: Morton-interleave of prepared columns `u`, `v`
    * (both already masked into [0, 2^Bits)): u supplies even bits, v
    * odd bits. */
  def zSqlSpark(u: String, v: String): String =
    (0 until Bits).map { b =>
      s"(shiftleft(shiftright($u, $b) & 1, ${2 * b}) + shiftleft(shiftright($v, $b) & 1, ${2 * b + 1}))"
    }.mkString(" + ")

  /** The identical interleave in DuckDB's operator syntax (fully
    * parenthesized — precedence of `&`/`<<` differs across engines). */
  def zSqlDuck(u: String, v: String): String =
    (0 until Bits).map { b =>
      s"(((($u >> $b) & 1) << ${2 * b}) + ((($v >> $b) & 1) << ${2 * b + 1}))"
    }.mkString(" + ")

  /** Events mapped to the 2-D (user, value) grid with their Z value. */
  def zGrid(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(expr(s"user_id & $Mask").as("u"),
        expr(s"CAST(floor(value) AS BIGINT) & $Mask").as("v"))
      .withColumn("z", expr(zSqlSpark("u", "v")))

  def zorderCellStats(spark: SparkSession, dir: String): DataFrame =
    zGrid(spark, dir)
      .groupBy(expr(s"z div ${1 << Bits}").as("cell"))
      .agg(count(lit(1)).as("n"),
        min("u").as("min_u"), max("u").as("max_u"),
        min("v").as("min_v"), max("v").as("max_v"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zorder_cell_stats" -> (zorderCellStats _))

  val oracles: Map[String, String] = Map(
    "zorder_cell_stats" -> {
      val z = zSqlDuck("u", "v")
      s"""WITH t AS (SELECT user_id & $Mask AS u,
         |                  CAST(floor(value) AS BIGINT) & $Mask AS v
         |           FROM events),
         |g AS (SELECT u, v, $z AS z FROM t)
         |SELECT z // ${1 << Bits} AS cell, count(*) AS n,
         |       min(u) AS min_u, max(u) AS max_u,
         |       min(v) AS min_v, max(v) AS max_v
         |FROM g GROUP BY 1""".stripMargin
    })
}
