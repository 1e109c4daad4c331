package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

class PageRankSpec extends AnyFunSuite with SharedSpark {

  test("pagerank_trade_graph: teleport floor, hub concentration, stable reruns") {
    val rows = PageRank.pagerankTradeGraph(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every node keeps at least the teleport mass
    assert(rows.forall(_._2 >= PageRank.Teleport))
    // one rank per node, node ids are the 2c / 2s+1 encoding
    assert(rows.map(_._1).distinct.length == rows.length)
    // suppliers are ~10× rarer than customers in the trade graph, so
    // flow concentrates on them: mean supplier rank must exceed mean
    // customer rank (the property that makes the recurrence PageRank
    // and not a constant map)
    val (supp, cust) = rows.partition(_._1 % 2 == 1)
    assert(supp.nonEmpty && cust.nonEmpty)
    val meanS = supp.map(_._2).sum / supp.length
    val meanC = cust.map(_._2).sum / cust.length
    assert(meanS > meanC, s"no hub concentration: suppliers $meanS vs customers $meanC")
    // integer recurrence → bit-identical rerun
    val again = PageRank.pagerankTradeGraph(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(again.sorted.toSeq == rows.sorted.toSeq)
  }
}
