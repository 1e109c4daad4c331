package graft

import org.apache.spark.sql.functions._
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

  test("applyCdc: delete drops, delete-then-reinsert survives, update-then-delete drops") {
    import spark.implicits._
    val base = Seq(
      (1L, "O", 10.0), // untouched
      (2L, "O", 20.0), // update only
      (3L, "O", 30.0), // update then delete -> gone
      (4L, "O", 40.0), // delete then reinsert -> back with new payload
      (5L, "O", 50.0)  // delete only -> gone
    ).toDF("k", "status", "price")
    val feed = Seq(
      (2L, 1L, "U", "U", 21.0),
      (3L, 1L, "U", "U", 31.0),
      (3L, 2L, "D", "X", 0.0),
      (4L, 1L, "D", "X", 0.0),
      (4L, 2L, "U", "R", 44.0),
      (5L, 1L, "D", "X", 0.0)
    ).toDF("k", "v", "op", "status", "price")
    val out = MergeUpsert.applyCdc(base, feed)
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "O", 10.0), (2L, "U", 21.0), (4L, "R", 44.0)))
  }

  test("merge_cdc_tombstones: status populations match the modular feed arithmetic") {
    import spark.implicits._
    val base = Tables.load(spark, sfDir, "orders")
    val n = (m: Int) => base.filter($"o_orderkey" % m === 0).count()
    val rows = MergeUpsert.mergeCdcOrders(spark, sfDir)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    // updated (v1) and not later deleted: k%10 minus k%20
    assert(rows("U") == n(10) - n(20))
    // reinserted after delete: k%40
    assert(rows("R") == n(40))
    // deleted for good: k%20 minus k%40 keys are absent
    val total = rows.values.sum
    assert(total == base.count() - (n(20) - n(40)))
  }

  test("retraction: subtracted view equals recompute; fully-erased groups vanish at count zero") {
    import spark.implicits._
    import graft.operators.MergeUpsert
    import org.apache.spark.sql.functions.col
    val ev = Seq(
      ("click", 1L, 10.0), ("click", 2L, 20.0), ("click", 50L, 5.0),
      ("view", 50L, 7.0), ("view", 100L, 3.0), // view held ONLY by erased users
      ("buy", 3L, 9.5)).toDF("event_type", "user_id", "value")
    val got = MergeUpsert.retractionRollupOf(ev, col("user_id") % 50 === 0)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // view's only rows belonged to erased users -> the group VANISHES,
    // it does not linger as a zero-count tombstone row
    assert(!got.contains("view"), s"fully-erased group survived: $got")
    assert(got("click") == ((2L, 30.0)), s"click retraction wrong: $got")
    assert(got("buy") == ((1L, 9.5)))
  }

  test("snapshot_diff: categories tie out to the synthesized change batch, deltas exact") {
    import org.apache.spark.sql.functions.col
    val rows = MergeUpsert.snapshotDiff(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val base = Tables.load(spark, sfDir, "orders")
    val nBase = base.count()
    val nIns = base.filter(col("o_orderkey") % 100 === 0).count()
    val nUpd = base.filter(col("o_orderkey") % 10 === 0).count()
    // upsert-only merge: a key can never vanish
    assert(!rows.contains("removed"), s"merge dropped keys: $rows")
    assert(rows("added")._1 == nIns)
    // every updated key changes (price moves by exactly +10.00)
    assert(rows("changed")._1 == nUpd)
    assert(math.abs(rows("changed")._2 - 10.0 * nUpd) < 1e-6)
    assert(math.abs(rows("added")._2 - 99.99 * nIns) < 1e-6)
    assert(rows("unchanged")._1 == nBase - nUpd)
    assert(rows("unchanged")._2 == 0.0)
  }

  test("snapshot log: as-of reads shift across publishes, old generations undisturbed") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("snaplog").toFile
    def snap(v: String) = Seq((1L, v, 10.0), (2L, v, 20.0))
      .toDF("k", "status", "price")
    def readBack(b: Int) = MergeUpsert.readAsOf(spark, root, b)
      .select("k", "status", "price").as[(Long, String, Double)]
      .collect().sorted.toSeq

    assert(MergeUpsert.appendSnapshot(root, snap("A")) == 0)
    assert(readBack(0).forall(_._2 == "A"))

    // a publish: current shifts, the PREVIOUS generation stays readable
    // and byte-identical — the handoff the time-travel verb certifies
    assert(MergeUpsert.appendSnapshot(root, snap("B")) == 1)
    assert(readBack(0).forall(_._2 == "B"))
    assert(readBack(1).forall(_._2 == "A"))

    assert(MergeUpsert.appendSnapshot(root, snap("C")) == 2)
    assert(readBack(0).forall(_._2 == "C"))
    assert(readBack(1).forall(_._2 == "B"))
    assert(readBack(2).forall(_._2 == "A"))
    intercept[IllegalArgumentException] { readBack(3) }

    // the as-of read is a partition-pruned scan: the generation filter
    // lands in PartitionFilters (metadata-only), never a data filter
    val plan = MergeUpsert.readAsOf(spark, root, 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("(gen"),
      s"as-of generation filter did not prune partitions:\n$plan")
  }

  test("expireSnapshots: retention window readable, beyond it fails loudly, idempotent") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("snapexp").toFile
    def snap(v: String) = Seq((1L, v, 10.0), (2L, v, 20.0))
      .toDF("k", "status", "price")
    for (v <- Seq("A", "B", "C", "D")) MergeUpsert.appendSnapshot(root, snap(v))

    val survivors = MergeUpsert.expireSnapshots(root, keep = 2)
    assert(survivors == Seq(2, 3), s"expected gens 2,3 to survive, got $survivors")
    // within retention: both reads work, contents untouched, gen ids
    // NOT renumbered (an in-flight reader holding "gen=3" stays valid)
    def readBack(b: Int) = MergeUpsert.readAsOf(spark, root, b)
      .select("status").distinct().as[String].collect().toSeq
    assert(readBack(0) == Seq("D"))
    assert(readBack(1) == Seq("C"))
    // beyond retention: LOUD failure, never silently-wrong data
    intercept[IllegalArgumentException] { readBack(2) }
    // the expired directories are physically gone
    val dirs = root.listFiles().map(_.getName).filter(_.startsWith("gen=")).sorted
    assert(dirs.toSeq == Seq("gen=2", "gen=3"), s"on disk: ${dirs.toSeq}")
    // idempotent: a re-run drops nothing further
    assert(MergeUpsert.expireSnapshots(root, keep = 2) == Seq(2, 3))
    // a NEW publish after expiry continues the generation sequence
    assert(MergeUpsert.appendSnapshot(root, snap("E")) == 4)
    assert(readBack(0) == Seq("E"))
    // a keep that would empty the log is rejected up front
    intercept[IllegalArgumentException] {
      MergeUpsert.expireSnapshots(root, keep = 0)
    }
  }

  test("snapshot_expire: survivor census matches hand-derived merge states") {
    import spark.implicits._
    val got = MergeUpsert.snapshotExpire(spark, sfDir)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L), s"survivors ${got.map(_._1).toSeq}")
    // gen 1 = upsert merge: base keys + every-100th re-keyed insert
    val base = Tables.load(spark, sfDir, "orders")
    val nBase = base.count()
    val nIns = base.filter(col("o_orderkey") % 100 === 0).count()
    assert(got(0)._2 == nBase + nIns, s"gen-1 rows ${got(0)._2}")
    // gen 2 = CDC election: deletes (every 20th) drop, reinserts
    // (every 40th) come back
    val nDel = base.filter(col("o_orderkey") % 20 === 0
      && col("o_orderkey") % 40 =!= 0).count()
    assert(got(1)._2 == nBase - nDel, s"gen-2 rows ${got(1)._2}")
  }

  test("snapshot_read_asof: one generation back equals the pre-merge base") {
    import spark.implicits._
    val asOf = MergeUpsert.snapshotReadAsof(spark, sfDir)
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val base = Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("s"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(asOf == base, "as-of 1 diverged from the pre-merge snapshot")
  }
}
