package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MergeUpsert

class MergeUpsertSpec extends AnyFunSuite with SharedSpark {

  test("merge_upsert_orders: updates win, inserts add, key space stays unique") {
    import spark.implicits._
    val base = Tables.load(spark, sfDir, "orders")
    val nBase = base.count()
    val nUpd = base.filter($"o_orderkey" % 10 === 0).count()
    val nIns = base.filter($"o_orderkey" % 100 === 0).count()
    val rows = MergeUpsert.mergeUpsertOrders(spark, sfDir)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    // every updated key now carries status 'U'; every insert 'I'
    assert(rows("U")._2 == nUpd, s"expected $nUpd updated rows: ${rows.get("U")}")
    assert(rows("I")._2 == nIns, s"expected $nIns inserted rows: ${rows.get("I")}")
    // total = base + inserts (updates replace, never duplicate)
    assert(rows.values.map(_._2).sum == nBase + nIns)
    // inserts carry the synthesized price exactly
    assert(math.abs(rows("I")._3 - nIns * 99.99) < 1e-6)
  }
}
