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

  test("pagerank_converged: tol=0 replays the static rounds bit-identically; a loose tol stops early") {
    def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // the convergence loop with the round budget as the only stop is
    // the SAME integer recurrence as the unrolled static form
    val static6 = asMap(PageRank.pagerankTradeGraph(spark, sfDir))
    val conv6 = asMap(PageRank.pagerankConverged(spark, sfDir,
      tol = 0L, maxRounds = PageRank.Rounds))
    assert(conv6 == static6, "converged(tol=0, maxRounds=6) diverged from the static 6-round form")

    // an unreachably-loose tolerance is satisfied by the first round's
    // delta, so the loop must stop after exactly one round
    val one = asMap(PageRank.pagerankConverged(spark, sfDir,
      tol = Long.MaxValue / 2, maxRounds = 50))
    val oneExact = asMap(PageRank.pagerankConverged(spark, sfDir,
      tol = 0L, maxRounds = 1))
    assert(one == oneExact, "loose tolerance did not stop after the first round")
    assert(one != static6, "fixture graph converged in one round — tolerance pin is vacuous")

    // every node survives every round and keeps the teleport floor
    assert(conv6.keySet == static6.keySet)
    assert(conv6.values.forall(_ >= PageRank.Teleport))
  }
}
