package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink coverage beyond the legacy TSV adapter: CSV, JSON, and
  * parquet round-trips through DataFrameReader/Writer (the reference
  * reads only local text dirs — SURVEY.md §2c "Scans/sources"). */
class SourcesSpec extends AnyFunSuite with SharedSpark {

  private def sample = {
    import spark.implicits._
    Seq((1L, "alpha", 1.5), (2L, "beta", -2.0), (3L, "gamma, delta", 0.0))
      .toDF("id", "name", "score")
  }

  test("csv round-trip with header and quoting") {
    import spark.implicits._
    val dir = Files.createTempDirectory("csv").toString
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(back.as[(Long, String, Double)].collect().sortBy(_._1).toSeq ==
      sample.as[(Long, String, Double)].collect().sortBy(_._1).toSeq)
  }

  test("json lines round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("json").toString
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir).select("id", "name", "score")
    assert(back.as[(Long, String, Double)].collect().sortBy(_._1).toSeq ==
      sample.as[(Long, String, Double)].collect().sortBy(_._1).toSeq)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = Files.createTempDirectory("pq").toString
    Tables.load(spark, sfDir, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val one = spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"expected partition pruning in:\n$plan")
    assert(one.count() ==
      Tables.load(spark, sfDir, "events")
        .filter(org.apache.spark.sql.functions.col("event_type") === "click").count())
  }
}
