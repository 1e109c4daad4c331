package graft

import org.scalatest.funsuite.AnyFunSuite

class BenchSpec extends AnyFunSuite with SharedSpark {

  test("F12 record counters observe a query's input rows") {
    val c = new RecordCounterListener
    spark.sparkContext.addSparkListener(c)
    try {
      val before = c.settled
      val (_, err) = Bench.timeQuery(spark,
        operators.Relational.queries("group_count_by_key"), sfDir)
      assert(err.isEmpty)
      val after = c.settled
      assert(after._1 - before._1 > 0, "no input records counted")
    } finally spark.sparkContext.removeSparkListener(c)
  }

  test("a failing query surfaces its error instead of a plausible timing") {
    val (_, err) = Bench.timeQuery(spark,
      (s, _) => s.read.parquet("/nonexistent_graft_path"), sfDir)
    assert(err.isDefined)
    assert(err.get.nonEmpty)
  }
}
