package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark 4 runtime row-level filtering (bloom-filter injection): when a
  * shuffle join's build side carries a selective filter, the optimizer
  * plants a bloom filter of the build keys on the PROBE side's scan, so
  * non-matching fact rows drop before the shuffle instead of after it.
  * At 100 TB this is the shuffle-volume lever for fact ⋈ filtered-dim
  * joins too big to broadcast — the 10 GB default application-side
  * threshold exists because the bloom build costs a pass over the dim;
  * the spec lowers it to demonstrate the mechanics at test scale. The
  * engine's session config leaves the feature ON at defaults; this pin
  * proves the plans it produces compose with the injection. */
class RuntimeFilterSpec extends AnyFunSuite with SharedSpark {

  private def segmentCounts(): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val c = Tables.load(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
  }

  test("runtime bloom filter lands on the fact side of a shuffle join") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = segmentCounts()
      val p = df.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("bloom"),
        s"runtime bloom filter not injected:\n$p")
      val filtered = df.collect().map(_.toString).toSeq

      // feature off → same answer, bloom gone (it is an optimization,
      // never a semantic)
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      try {
        val off = segmentCounts()
        assert(!off.queryExecution.executedPlan.toString.toLowerCase.contains("bloom"))
        assert(off.collect().map(_.toString).toSeq == filtered)
      } finally spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
