package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class RelationalSpec extends AnyFunSuite with SharedSpark {

  test("topk_per_group yields at most 3 rows per group, the max first") {
    import spark.implicits._
    val rows = Relational.topkPerGroup(spark, sfDir)
      .as[(String, Long, Double)].collect().groupBy(_._1)
    val maxima = Tables.load(spark, sfDir, "events")
      .groupBy("event_type").agg(max("value").as("m"))
      .as[(String, Double)].collect().toMap
    rows.foreach { case (et, grp) =>
      assert(grp.length <= 3)
      assert(grp.map(_._3).max == maxima(et))
    }
  }

  test("topk_per_group matches the window formulation, without a window plan") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val got = Relational.topkPerGroup(spark, sfDir)
      .as[(String, Long, Double)].collect().toSet
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id").asc)
    val want = Tables.load(spark, sfDir, "events")
      .select("event_type", "event_id", "value")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .as[(String, Long, Double)].collect().toSet
    assert(got == want)
    // the point of the rework: no full-table window over a 5-value
    // partition key anywhere in the physical plan
    val plan = Relational.topkPerGroup(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"plan still windows:\n$plan")
  }

  test("union_all_sources row multiplicity = orders + lineitem per key") {
    import spark.implicits._
    val n = Relational.unionAllSources(spark, sfDir)
      .agg(sum("n")).as[Long].head()
    val expected = Tables.load(spark, sfDir, "orders").count() +
      Tables.load(spark, sfDir, "lineitem").count()
    assert(n == expected)
  }

  test("semi + anti partition the left side") {
    val part = Tables.load(spark, sfDir, "part")
    val withL = Relational.partsWithLineitems(spark, sfDir)
      .agg(sum("n_parts")).head().getLong(0)
    val li = Tables.load(spark, sfDir, "lineitem")
    val anti = part.join(li, part("p_partkey") === li("l_partkey"), "left_anti").count()
    assert(withL + anti == part.count())
  }

  test("intersect_except_keys join form equals the bare intersect/except operators") {
    import spark.implicits._
    val (nInter, nExcept) = Relational.intersectExceptKeys(spark, sfDir)
      .as[(Long, Long)].head()
    val orderKeys = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey").as("k")).distinct()
    val custKeys = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("k")).distinct()
    assert(nInter == orderKeys.intersect(custKeys).count())
    assert(nExcept == custKeys.except(orderKeys).count())
  }

  test("setops_all_counts equals Spark's native intersectAll/exceptAll") {
    import spark.implicits._
    val (nInterAll, nOExceptAll, nCExceptAll) =
      Relational.setOpsAllCounts(spark, sfDir).as[(Long, Long, Long)].head()
    val o = Tables.load(spark, sfDir, "orders").select(col("o_custkey").as("k"))
    val c = Tables.load(spark, sfDir, "customer").select(col("c_custkey").as("k"))
    assert(nInterAll == o.intersectAll(c).count())
    assert(nOExceptAll == o.exceptAll(c).count())
    assert(nCExceptAll == c.exceptAll(o).count())
    // multiset identities: |A| = |A ∩all B| + |A ∖all B|
    assert(o.count() == nInterAll + nOExceptAll)
    assert(c.count() == nInterAll + nCExceptAll)
  }

  test("asof_next_purchase: every attribution is a later-or-equal same-user purchase") {
    import spark.implicits._
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"))
    val got = operators.TemporalJoins.asofNextPurchase(spark, sfDir)
    // row per click, exactly
    assert(got.count() == ev.filter(col("event_type") === "click").count())
    // each non-null attribution must be the MIN (ts_us, event_id) purchase
    // at-or-after its click for that user
    val clicks = ev.select(col("event_id").as("cid"),
      col("user_id").as("cu"), col("ts_us").as("cts"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"),
        col("ts_us").as("pts"))
    val want = clicks.join(purch,
        col("cu") === col("pu") && col("pts") >= col("cts"), "left_outer")
      .groupBy(col("cid").as("event_id"))
      .agg(min(struct(col("pts"), col("pid"))).as("m"))
      .select(col("event_id"), col("m.pid").as("next_purchase"))
    assert(got.join(want, Seq("event_id"))
      .filter(!(got("next_purchase") <=> want("next_purchase"))).count() == 0)
  }

  test("funnel stages shrink monotonically; cohort users total the distinct-user count") {
    import spark.implicits._
    val (nV, nC, nP) = operators.Behavioral.funnelConversion(spark, sfDir)
      .as[(Long, Long, Long)].head()
    assert(nV >= nC && nC >= nP, s"funnel must narrow: $nV >= $nC >= $nP")
    assert(nV > 0)
    val cohorts = operators.Behavioral.cohortRetention(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    cohorts.foreach { case (_, n, r) => assert(r <= n) }
    assert(cohorts.map(_._2).sum ==
      Tables.load(spark, sfDir, "events").select("user_id").distinct().count())
  }

  test("skew_salted_sum equals the plain one-stage aggregate") {
    import spark.implicits._
    val got = operators.Skew.skewSaltedSum(spark, sfDir)
      .as[(String, Double, Long)].collect()
      .map { case (k, s, n) => k -> ((s, n)) }.toMap
    val want = Tables.load(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("s"),
        count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect()
    want.foreach { case (k, s, n) =>
      assert(got(k) == ((s, n)), s"key $k: got ${got(k)}, want ($s, $n)")
    }
  }

  test("locf_gap_fill carries the most recent non-click value forward") {
    import spark.implicits._
    val got = Relational.locfGapFill(spark, sfDir)
      .as[(Long, Long, String, Option[Double])].collect()
    val events = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)].collect()
    assert(got.length == events.length)
    // driver-side truth: replay LOCF over (ts, event_id)-sorted history
    val want = events.groupBy(_._1).iterator.flatMap { case (u, evs) =>
      var carried: Option[Double] = None
      evs.sortBy(e => (e._2, e._3)).zipWithIndex.map { case (e, i) =>
        if (e._4 != "click") carried = Some(e._5)
        (u, i + 1L, e._4) -> carried
      }
    }.toMap
    got.foreach { case (u, seq, typ, filled) =>
      assert(want((u, seq, typ)) == filled,
        s"user $u seq $seq: got $filled, want ${want((u, seq, typ))}")
    }
    // the synthesized sparsity is real: some rows are clicks, and a
    // user's leading clicks stay null
    assert(got.exists(_._3 == "click"))
  }

  test("running_sum_per_user final value equals the user's total") {
    import spark.implicits._
    val last = Relational.runningSumPerUser(spark, sfDir)
      .groupBy("user_id").agg(max("running_value").as("final"))
      .as[(Long, Double)].collect().toMap
    val totals = Tables.load(spark, sfDir, "events")
      .groupBy("user_id")
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("t"))
      .as[(Long, Double)].collect().toMap
    // running max == total because values are positive in the fixture
    assert(last.keySet == totals.keySet)
    last.foreach { case (u, v) => assert(math.abs(v - totals(u)) < 1e-6) }
  }
}
