package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

/** One shared local session for all suites (getOrCreate reuses the
  * singleton; never stopped so suites can run in any order). */
trait SharedSpark { this: Suite =>
  lazy val spark: SparkSession = SharedSpark.session
  val sfDir = "/root/testdata/sf0.001"
}

object SharedSpark {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
