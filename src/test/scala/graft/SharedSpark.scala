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
    // the canonical engine config (incl. GraftExtensions so SQL-path
    // tests can call legacy_partition / dot_product)
    val s = Sessions.builder("local[4]", 4)
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
