package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Skew, SqlSurface}

class SurfaceSpec extends AnyFunSuite with SharedSpark {

  test("registerViews exposes every table to ad-hoc SQL") {
    graft.operators.SqlSurface.registerViews(spark, sfDir)
    val n = spark.sql(
      """SELECT count(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey""".stripMargin)
      .head().getLong(0)
    assert(n > 0)
    Tables.names.foreach { t =>
      assert(spark.catalog.tableExists(t), s"view $t not registered")
    }
  }

  test("approx percentiles track the exact percentiles within 5%") {
    val exactRows = graft.operators.Scalars.valuePercentiles(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    val approxRows = graft.operators.Scalars.approxValuePercentiles(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .map(t => t._1 -> (t._2, t._3)).toMap
    exactRows.foreach { case (et, p50, p90) =>
      val (a50, a90) = approxRows(et)
      assert(math.abs(a50 - p50) <= math.abs(p50) * 0.05 + 1e-9,
        s"$et p50 approx $a50 vs exact $p50")
      assert(math.abs(a90 - p90) <= math.abs(p90) * 0.05 + 1e-9,
        s"$et p90 approx $a90 vs exact $p90")
    }
  }

  test("approx_count_distinct within 5% of exact per group") {
    import spark.implicits._
    val rows = SqlSurface.approxDistinctUsers(spark, sfDir)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, approx, exact) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"$et: approx=$approx exact=$exact")
    }
  }

  test("GraftExtensions registers legacy_partition for SQL") {
    // a fresh session (same SparkContext) picks up the extensions
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try {
      val got = s2.sql("SELECT legacy_partition('the', 4) AS p")
        .collect().head.getInt(0)
      assert(got == operators.Partitioning.legacyPartition("the", 4))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("salted aggregation equals direct aggregation") {
    import spark.implicits._
    val events = Tables.load(spark, sfDir, "events")
    val salted = Skew.saltedSumCount(events, col("event_type"), col("value"))
      .as[(String, Double, Long)].collect().map { case (k, s, n) => k -> ((s, n)) }.toMap
    val direct = events.groupBy("event_type")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("s"),
        count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().map { case (k, s, n) => k -> ((s, n)) }.toMap
    assert(salted == direct)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("warehouse").toString
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql(s"CREATE DATABASE IF NOT EXISTS bspec LOCATION '$wh'")
      Tables.load(spark, sfDir, "orders")
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("bspec.orders_b")
      Tables.load(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("bspec.lineitem_b")
      val joined = spark.table("bspec.orders_b").join(
        spark.table("bspec.lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == Tables.load(spark, sfDir, "lineitem").count())
    } finally {
      prev.foreach(spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      spark.sql("DROP TABLE IF EXISTS bspec.orders_b")
      spark.sql("DROP TABLE IF EXISTS bspec.lineitem_b")
      spark.sql("DROP DATABASE IF EXISTS bspec")
    }
  }
}
