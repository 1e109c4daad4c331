package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{EventRow, UserTotal}

class StreamingSpec extends AnyFunSuite with SharedSpark {

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("tumbling window counts over a MemoryStream, late data dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = EventStreams.tumblingCounts(mem.toDF(), "1 hour", "1 hour")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        EventRow(ts(10), 1, "click", 1.0),
        EventRow(ts(20), 2, "click", 1.0),
        EventRow(ts(70), 1, "view", 1.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first two windows
      mem.addData(EventRow(ts(300), 3, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(rows.contains((ts(0), "click", 2L)))
      assert(rows.contains((ts(60), "view", 1L)))
      // a record older than the watermark must be dropped silently
      mem.addData(EventRow(ts(5), 9, "late", 1.0))
      mem.addData(EventRow(ts(360), 3, "click", 1.0))
      q.processAllAvailable()
      val after = spark.table("tumbling").as[(Timestamp, String, Long)].collect()
      assert(!after.exists(_._2 == "late"))
    } finally q.stop()
  }

  test("sliding windows place each event in windowLen/slide windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = EventStreams.slidingCounts(mem.toDF(), "1 hour", "30 minutes", "1 hour")
      .writeStream.format("memory").queryName("sliding")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(EventRow(ts(40), 1, "click", 1.0)) // in [23:30,00:30) is invalid pre-epoch-day; windows [00:00,01:00) and [00:30,01:30)
      mem.addData(EventRow(ts(400), 9, "later", 1.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("sliding")
        .as[(Timestamp, String, Long)].collect().filter(_._2 == "click").toSet
      assert(rows == Set((ts(0), "click", 1L), (ts(30), "click", 1L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits one row per crossed threshold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = EventStreams.thresholdCrossings(mem.toDS(), step = 10.0)
      .writeStream.format("memory").queryName("crossings")
      .outputMode(OutputMode.Update()).start()
    try {
      // total 7 -> no crossing
      mem.addData(EventRow(ts(1), 9, "click", 7.0))
      q.processAllAvailable()
      assert(spark.table("crossings").as[EventStreams.Crossing]
        .collect().count(_.user_id == 9) == 0)
      // total 7 -> 31: crosses 10, 20, 30 in one batch (3 emissions)
      mem.addData(EventRow(ts(2), 9, "click", 24.0))
      q.processAllAvailable()
      val got = spark.table("crossings").as[EventStreams.Crossing]
        .collect().filter(_.user_id == 9).map(_.threshold).sorted
      assert(got.toSeq == Seq(10.0, 20.0, 30.0))
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates per-user state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = EventStreams.runningTotals(mem.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(EventRow(ts(1), 7, "click", 2.0), EventRow(ts(2), 7, "click", 3.0))
      q.processAllAvailable()
      mem.addData(EventRow(ts(3), 7, "click", 5.0))
      q.processAllAvailable()
      val latest = spark.table("running").as[UserTotal].collect()
        .filter(_.user_id == 7).maxBy(_.n)
      assert(latest == UserTotal(7, 3, 10.0))
    } finally q.stop()
  }

  test("stream-static broadcast enrichment joins each micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[EventRow]
    val q = EventStreams.enrich(mem.toDF(), dim)
      .select("user_id", "event_type", "tier")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(EventRow(ts(1), 1, "click", 1.0), EventRow(ts(2), 3, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .as[(Long, String, Option[String])].collect().toSet
      assert(rows == Set((1L, "click", Some("gold")), (3L, "view", None)))
    } finally q.stop()
  }

  test("foreachBatch sink + checkpoint: restart resumes without reprocessing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("out").toString
    def start(mem: MemoryStream[EventRow]) =
      mem.toDS().writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[EventRow], _: Long) =>
          batch.select("user_id").write.mode("append").parquet(out)
        }
        .start()

    val mem1 = MemoryStream[EventRow]
    val q1 = start(mem1)
    try {
      mem1.addData(EventRow(ts(1), 1, "click", 1.0), EventRow(ts(2), 2, "view", 1.0))
      q1.processAllAvailable()
    } finally q1.stop()

    // a new query instance on the SAME checkpoint continues the stream;
    // batch 0 must not run again even though mem2 re-serves its data
    val mem2 = MemoryStream[EventRow]
    mem2.addData(EventRow(ts(1), 1, "click", 1.0), EventRow(ts(2), 2, "view", 1.0))
    val q2 = start(mem2)
    try {
      mem2.addData(EventRow(ts(3), 3, "click", 1.0))
      q2.processAllAvailable()
    } finally q2.stop()

    val ids = spark.read.parquet(out).select("user_id")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), s"unexpected user ids (duplicates mean batch 0 re-ran): $ids")
  }

  test("streaming dedup drops repeats within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = EventStreams.dedupEvents(mem.toDF())
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        EventRow(ts(10), 1, "click", 1.0),
        EventRow(ts(10), 1, "click", 1.0), // same-batch dup
        EventRow(ts(11), 2, "view", 1.0))
      q.processAllAvailable()
      mem.addData(EventRow(ts(10), 1, "click", 1.0)) // cross-batch dup
      q.processAllAvailable()
      val rows = spark.table("deduped")
        .select("user_id", "ts").as[(Long, Timestamp)].collect().toSeq
      assert(rows.sorted == Seq((1L, ts(10)), (2L, ts(11))))
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks within the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[EventRow]
    val purchases = MemoryStream[EventRow]
    val q = EventStreams.clickAttribution(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attributed")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(
        EventRow(ts(10), 1, "click", 1.0),  // 4 min before -> attributed
        EventRow(ts(2), 1, "click", 1.0),   // 12 min before -> outside window
        EventRow(ts(11), 2, "click", 1.0))  // other user
      purchases.addData(EventRow(ts(14), 1, "purchase", 9.0))
      q.processAllAvailable()
      val rows = spark.table("attributed")
        .select("user_id", "purchase_ts", "click_ts")
        .as[(Long, Timestamp, Timestamp)].collect().toSet
      assert(rows == Set((1L, ts(14), ts(10))))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched purchases as nulls after watermark eviction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[EventRow]
    val purchases = MemoryStream[EventRow]
    val q = EventStreams.clickAttributionOuter(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attributed_outer")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(EventRow(ts(10), 1, "click", 1.0))
      purchases.addData(
        EventRow(ts(14), 1, "purchase", 9.0),  // matched within 5 min
        EventRow(ts(14), 3, "purchase", 7.0))  // no click at all
      q.processAllAvailable()
      // the matched row emits immediately; the unmatched one is held
      // in state until the watermark passes its join bound
      val early = spark.table("attributed_outer")
        .select("user_id").as[Long].collect().toSet
      assert(early == Set(1L), s"unmatched row emitted before eviction: $early")
      // advance event time on BOTH inputs so the global watermark
      // (min across inputs, minus the 10 min delay) passes 14+5 min
      clicks.addData(EventRow(ts(60), 9, "click", 1.0))
      purchases.addData(EventRow(ts(60), 9, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("attributed_outer")
        .select("user_id", "click_ts").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(rows.contains((1L, Some(ts(10)))), s"matched row lost: $rows")
      assert(rows.contains((3L, None)), s"unmatched purchase never emitted: $rows")
    } finally q.stop()
  }

  test("full-outer interval join emits unmatched rows from BOTH sides after eviction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[EventRow]
    val purchases = MemoryStream[EventRow]
    val q = EventStreams.clickAttributionFull(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attributed_full")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(
        EventRow(ts(10), 1, "click", 1.0),   // converts (purchase at 14)
        EventRow(ts(12), 5, "click", 1.0))   // never converts
      purchases.addData(
        EventRow(ts(14), 1, "purchase", 9.0),
        EventRow(ts(14), 3, "purchase", 7.0)) // organic, no click
      q.processAllAvailable()
      // advance event time on both inputs so the watermark evicts
      clicks.addData(EventRow(ts(60), 9, "click", 1.0))
      purchases.addData(EventRow(ts(60), 9, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("attributed_full")
        .select("user_id", "purchase_ts", "click_ts").collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
      assert(rows.contains((1L, Some(ts(14)), Some(ts(10)))), s"matched pair lost: $rows")
      assert(rows.contains((3L, Some(ts(14)), None)), s"organic purchase missing: $rows")
      assert(rows.contains((5L, None, Some(ts(12)))), s"non-converting click missing: $rows")
    } finally q.stop()
  }

  test("windowedCountsToParquet writes each closed window exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("wcp_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("wcp_out").toString
    val mem = MemoryStream[EventRow]
    val q = EventStreams.windowedCountsToParquet(
      mem.toDF(), out, ckpt, "1 hour", "1 hour")
    try {
      mem.addData(
        EventRow(ts(10), 1, "click", 1.0),
        EventRow(ts(20), 2, "click", 1.0),
        EventRow(ts(70), 1, "view", 1.0))
      q.processAllAvailable()
      mem.addData(EventRow(ts(300), 3, "click", 1.0)) // advance watermark
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(out)
      .select("window_start", "event_type", "n")
      .as[(Timestamp, String, Long)].collect().toSet
    assert(rows == Set((ts(0), "click", 2L), (ts(60), "view", 1L)))
  }

  test("file source + torn commit: restart replays the emitting batch, output stays exactly-once") {
    import spark.implicits._
    // end-to-end: a REAL file source (not MemoryStream) driving the
    // foreachBatch parquet sink through a crash-shaped restart. The
    // crash window foreachBatch leaves open is "sink write done,
    // checkpoint commit not yet recorded" — simulated deterministically
    // by deleting the last commits/<N> marker after a clean stop. On
    // restart Spark MUST re-run batch N from the offset WAL (same
    // files, same state-store version, same watermark), and the sink's
    // overwrite-own-batch-directory idempotence must absorb the replay.
    val inDir = java.nio.file.Files.createTempDirectory("fs_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("fs_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("fs_out").toString
    def addFile(rows: EventRow*): Unit =
      rows.toSeq.toDF().coalesce(1).write.mode("append").json(inDir)
    val schema = Seq.empty[EventRow].toDF().schema
    // one file per trigger → file boundaries are batch boundaries
    def start() = EventStreams.windowedCountsToParquet(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(inDir),
      out, ckpt, "1 hour", "1 hour")

    addFile(EventRow(ts(10), 1, "click", 1.0), EventRow(ts(20), 2, "click", 1.0))
    addFile(EventRow(ts(70), 1, "view", 1.0))
    addFile(EventRow(ts(300), 3, "click", 1.0)) // advances the watermark past both windows
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val expected = Set((ts(0), "click", 2L), (ts(60), "view", 1L))
    def readOut() = spark.read.parquet(out)
      .select("window_start", "event_type", "n")
      .as[(Timestamp, String, Long)].collect().toSeq
    assert(readOut().toSet == expected, "windows not emitted before the crash point")

    // tear the final commit — the batch that emitted both windows is
    // now write-complete but commit-missing, exactly the replay case
    val commits = new java.io.File(s"$ckpt/commits")
      .listFiles().filter(_.getName.forall(_.isDigit))
    val torn = commits.maxBy(_.getName.toInt)
    // the local checksum fs keeps a .N.crc sidecar beside each commit
    // marker — tear both, or the rewrite trips FileAlreadyExists and
    // Spark misreads it as a concurrent query on the checkpoint
    val tornCrc = new java.io.File(torn.getParent, s".${torn.getName}.crc")
    assert(torn.delete(), s"could not tear commit ${torn.getName}")
    if (tornCrc.exists()) assert(tornCrc.delete())

    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val rows = readOut()
    assert(rows.size == rows.toSet.size,
      s"replayed batch duplicated sink rows (sink not idempotent): $rows")
    assert(rows.toSet == expected, s"post-restart output diverged: $rows")
  }

  test("file-source sessionization: kill + restart restores RocksDB state, torn-commit replay stays exactly-once") {
    import spark.implicits._
    // VERDICT r7 #4 — the full production restart story on a REAL
    // directory source (not MemoryStream): open sessions live only in
    // the RocksDB state store when the query is killed; the restarted
    // query must (a) restore that state — a reset store would close
    // the sessions with n=0 or never fire their timers — and (b)
    // absorb a torn-commit replay of the emitting batch through the
    // idempotent overwrite-own-batch-directory sink.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val inDir = java.nio.file.Files.createTempDirectory("sess_in").toString
      val ckpt = java.nio.file.Files.createTempDirectory("sess_ckpt").toString
      val out = java.nio.file.Files.createTempDirectory("sess_out").toString
      def addFile(rows: EventRow*): Unit =
        rows.toSeq.toDF().coalesce(1).write.mode("append").json(inDir)
      val schema = Seq.empty[EventRow].toDF().schema
      def start() = EventStreams.sessionSummaries(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
            .json(inDir).as[EventRow])
        .writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[EventStreams.SessionSummary], id: Long) =>
          b.write.mode("overwrite").parquet(s"$out/batch=$id")
        }
        .start()
      def readOut() = spark.read.parquet(out)
        .select("user_id", "n").as[(Long, Long)].collect().toSeq

      // phase 1: two sessions open (timers at 3+5 and 2+5 min), then
      // the query dies with BOTH sessions still only in the state store
      addFile(EventRow(ts(1), 1, "click", 1.0),
        EventRow(ts(3), 1, "view", 1.0),
        EventRow(ts(2), 2, "click", 1.0))
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      assert(readOut().isEmpty, "session emitted before its timer could fire")

      // phase 2: restart from the checkpoint; a watermark-advancing
      // file (wm = 60−10 min, past both timers) must close BOTH
      // restored sessions with the pre-kill counts
      addFile(EventRow(ts(60), 9, "click", 1.0))
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val expected = Set((1L, 2L), (2L, 1L))
      val rows2 = readOut()
      assert(rows2.toSet == expected,
        s"state not restored across restart (lost events or timers): $rows2")
      assert(rows2.size == rows2.toSet.size, s"duplicated sessions: $rows2")

      // phase 3: tear the final commit marker (write-complete,
      // commit-missing — the crash window foreachBatch leaves open)
      // and restart; the replayed batch must overwrite, not duplicate
      val commits = new java.io.File(s"$ckpt/commits")
        .listFiles().filter(_.getName.forall(_.isDigit))
      val torn = commits.maxBy(_.getName.toInt)
      val tornCrc = new java.io.File(torn.getParent, s".${torn.getName}.crc")
      assert(torn.delete(), s"could not tear commit ${torn.getName}")
      if (tornCrc.exists()) assert(tornCrc.delete())
      val q3 = start()
      try q3.processAllAvailable() finally q3.stop()
      val rows3 = readOut()
      assert(rows3.size == rows3.toSet.size,
        s"torn-commit replay duplicated sink rows: $rows3")
      assert(rows3.toSet == expected, s"post-replay output diverged: $rows3")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("file-source interval join: buffered outer-side state survives kill + restart") {
    import spark.implicits._
    // Second half of VERDICT r7 #4: the left-outer stream-stream join
    // buffers an unmatched purchase in join state until the watermark
    // passes its bound. Kill the query while that row is ONLY in
    // state; after restart the advancing watermark must evict it as a
    // (purchase, null) emission — impossible if the join state reset.
    val clicksDir = java.nio.file.Files.createTempDirectory("ij_clicks").toString
    val purchDir = java.nio.file.Files.createTempDirectory("ij_purch").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ij_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("ij_out").toString
    def addTo(dir: String)(rows: EventRow*): Unit =
      rows.toSeq.toDF().coalesce(1).write.mode("append").json(dir)
    val schema = Seq.empty[EventRow].toDF().schema
    def src(dir: String) = spark.readStream.schema(schema).json(dir)
    def start() = EventStreams.clickAttributionOuter(src(clicksDir), src(purchDir))
      .writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$out/batch=$id")
      }
      .start()
    def readOut() = spark.read.parquet(out)
      .select("user_id", "click_ts").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSeq

    // phase 1: user 1 matches within the 5-min window and emits; the
    // organic user-3 purchase stays buffered in join state. Kill.
    addTo(clicksDir)(EventRow(ts(10), 1, "click", 1.0))
    addTo(purchDir)(EventRow(ts(14), 1, "purchase", 9.0),
      EventRow(ts(14), 3, "purchase", 7.0))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val early = readOut()
    assert(early.map(_._1).toSet == Set(1L),
      s"unmatched purchase emitted before eviction (or match lost): $early")

    // phase 2: restart; advancing BOTH watermarks past 14+5 min must
    // emit the restored user-3 row with a null click side
    addTo(clicksDir)(EventRow(ts(60), 9, "click", 1.0))
    addTo(purchDir)(EventRow(ts(60), 9, "purchase", 1.0))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = readOut()
    assert(rows.count(_ == (1L, Some(java.sql.Timestamp.valueOf("2024-01-01 00:10:00")))) == 1,
      s"matched row lost or duplicated across restart: $rows")
    assert(rows.count(_ == (3L, None)) == 1,
      s"buffered organic purchase not emitted exactly once after restart (join state reset?): $rows")
    assert(rows.size == rows.toSet.size, s"duplicate emissions: $rows")
  }

  test("transformWithState matches the mapGroupsWithState totals (RocksDB-backed)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the new arbitrary-state API refuses non-RocksDB providers —
    // the same provider swap the windowed-agg RocksDB test proves
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[EventRow]
      val q = EventStreams.runningTotalsTws(mem.toDS())
        .writeStream.format("memory").queryName("totals_tws")
        .outputMode(OutputMode.Update()).start()
      try {
        mem.addData(
          EventRow(ts(1), 1, "click", 2.0),
          EventRow(ts(2), 1, "click", 3.0),
          EventRow(ts(3), 2, "view", 7.0))
        q.processAllAvailable()
        mem.addData(EventRow(ts(4), 1, "view", 5.0))
        q.processAllAvailable()
        val emissions = spark.table("totals_tws")
          .as[EventStreams.UserTotal].collect().toSet
        // batch 1 emits (1, 2, 5.0) and (2, 1, 7.0); batch 2 folds the
        // restored ValueState forward to (1, 3, 10.0)
        val expected = Set(
          EventStreams.UserTotal(1L, 2L, 5.0),
          EventStreams.UserTotal(2L, 1L, 7.0),
          EventStreams.UserTotal(1L, 3L, 10.0))
        assert(emissions == expected, s"got $emissions")
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("event-time timers close sessions only after the watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[EventRow]
      val q = EventStreams.sessionSummaries(mem.toDS())
        .writeStream.format("memory").queryName("sessions_tws")
        .outputMode(OutputMode.Append()).start()
      try {
        mem.addData(
          EventRow(ts(1), 1, "click", 1.0),
          EventRow(ts(3), 1, "view", 1.0),   // same session, extends timer
          EventRow(ts(2), 2, "click", 1.0))
        q.processAllAvailable()
        // watermark still at minus-delay of max(ts) — nothing closed
        assert(spark.table("sessions_tws").isEmpty,
          "session emitted before its timer could fire")
        // advance event time far enough that wm (= 60 - 10 delay)
        // passes both timers (user 1: 3+5=8, user 2: 2+5=7)
        mem.addData(EventRow(ts(60), 9, "click", 1.0))
        q.processAllAvailable()
        val rows = spark.table("sessions_tws")
          .select("user_id", "n").as[(Long, Long)].collect().toSet
        assert(rows == Set((1L, 2L), (2L, 1L)), s"got $rows")
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stateful aggregation runs on the RocksDB state store with identical results") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // SCALING.md claims "state lives in RocksDB on a real cluster" —
    // prove the provider actually loads and serves a windowed agg in
    // THIS build (the provider is per-query, captured at start), with
    // output identical to the default HDFS-backed store
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[EventRow]
      val q = EventStreams.tumblingCounts(mem.toDF(), "1 hour", "1 hour")
        .writeStream.format("memory").queryName("rocks_counts")
        .outputMode(OutputMode.Append()).start()
      try {
        mem.addData(
          EventRow(ts(10), 1, "click", 1.0),
          EventRow(ts(20), 2, "click", 1.0),
          EventRow(ts(70), 1, "view", 1.0))
        q.processAllAvailable()
        mem.addData(EventRow(ts(300), 3, "click", 1.0))
        q.processAllAvailable()
        val got = spark.table("rocks_counts")
          .as[(Timestamp, String, Long)].collect().toSet
        assert(got == Set((ts(0), "click", 2L), (ts(60), "view", 1L)))
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("the same tumbling transform runs on a batch DataFrame") {
    import spark.implicits._
    val batch = Seq(
      EventRow(ts(10), 1, "click", 1.0),
      EventRow(ts(20), 2, "click", 1.0),
      EventRow(ts(70), 1, "view", 1.0)).toDF()
    val got = EventStreams.tumblingCounts(batch)
      .as[(Timestamp, String, Long)].collect().toSet
    assert(got == Set((ts(0), "click", 2L), (ts(60), "view", 1L)))
  }

  test("drift monitor: every micro-batch's sink PSI == batch-mode psiBetween on the same slice") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text", "n_chars")
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val slices = Seq(
      docs.filter(col("doc_id") % 6 === 1),
      docs.filter(col("doc_id") % 6 === 3))
    val sink = java.nio.file.Files.createTempDirectory("drift_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("drift_ckpt").toString
    val mem = MemoryStream[(Long, String, Long)]
    val q = graft.streaming.DriftMonitor.start(spark, ref,
      mem.toDF.toDF("doc_id", "text", "n_chars"), sink, ckpt)
    try {
      slices.foreach { s =>
        mem.addData(s.as[(Long, String, Long)].collect().toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    slices.zipWithIndex.foreach { case (s, id) =>
      val got = spark.read.parquet(s"$sink/batch=$id")
        .drop("batch").collect().map(_.toString).sorted.toSeq
      val want = graft.text.CorpusOps.psiBetween(spark,
          graft.text.CorpusOps.qualityFeats(ref),
          graft.text.CorpusOps.qualityFeats(s))
        .collect().map(_.toString).sorted.toSeq
      assert(got == want, s"batch $id: stream PSI diverged from batch PSI")
      assert(got.size == 20)
    }
  }
}
