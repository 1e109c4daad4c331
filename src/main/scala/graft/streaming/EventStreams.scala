package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, StreamingQuery, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured-Streaming operators over an event stream.
  *
  * The reference is strictly batch (SURVEY.md §2c: hard map→reduce
  * barrier, no streaming constructs) — this module is north-star
  * surface. Every transform takes a DataFrame/Dataset so the SAME code
  * runs over `spark.readStream` (incremental, watermarked, stateful)
  * and over a batch table (for oracle-style testing): Spark's unified
  * API is the design point, there is no separate streaming engine to
  * build.
  *
  * Scale: event-time windowed aggregation shuffles once on
  * (window, key); state for `runningTotals` is per-key constant-size
  * and lives in the state store (RocksDB-backed on a real cluster).
  * Watermarks bound state growth — without one, an unbounded-state
  * streaming agg is refused in append mode, which is exactly the
  * behavior you want at 100 TB/day. */
object EventStreams {

  case class EventRow(ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class UserTotal(user_id: Long, n: Long, total: Double)

  /** Tumbling event-time window counts; `watermark` bounds lateness
    * (and state). Works identically on batch input. */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Sliding event-time windows: each event lands in windowLen/slide
    * overlapping windows (here 2). State cost scales with the overlap
    * factor — the reason production defaults keep slide ≥ len/4. */
  def slidingCounts(events: DataFrame, windowLen: String = "1 hour",
                    slide: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Gap-based session windows per user. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n"))

  /** Stream–static enrichment: join the (unbounded) event stream with a
    * bounded dimension table. Spark broadcasts the static side per
    * micro-batch; no state, no watermark needed. */
  def enrich(events: DataFrame, dim: DataFrame, key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream–stream interval join: each purchase matched to the same
    * user's clicks within the preceding [[attributionWindow]] — the
    * streaming twin of the batch as-of/range joins
    * (operators.TemporalJoins). Watermarks on BOTH sides + the time
    * interval in the join condition are what let Spark expire buffered
    * rows; without them stream-stream join state grows forever. Both
    * input frames must have columns (ts, user_id, ...). */
  def attributionWindow: String = "5 minutes"

  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
                       watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("purchase_ts"), col("value"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $attributionWindow"))
      .select(col("user_id"), col("purchase_ts"), col("click_ts"), col("value"))
  }

  /** LEFT OUTER stream-stream interval join — the attribution query
    * that must ALSO emit unmatched purchases (organic conversions).
    * This is a different state-machine than the inner join: Spark
    * buffers each outer-side row until the watermark passes its join
    * bound, and only THEN emits the (purchase, null) row — so the
    * nulls are late by construction, exactly one per unmatched
    * purchase, and state is still bounded by the same watermark
    * eviction. Without the time bound in the condition an outer
    * stream-stream join is unplannable (state could never evict). */
  def clickAttributionOuter(clicks: DataFrame, purchases: DataFrame,
                            watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("purchase_ts"), col("value"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $attributionWindow"),
      "left_outer")
      .select(col("user_id"), col("purchase_ts"), col("click_ts"), col("value"))
  }

  /** FULL OUTER stream-stream interval join — completes the family:
    * unmatched rows from BOTH sides survive (purchases with no click
    * AND clicks that never converted), each emitted with nulls for
    * the other side once the watermark passes its join bound. Both
    * sides therefore need the time bound against the other (a side
    * with no bound could never evict, and Spark rejects the plan).
    * The click side keeps its own user column so an unmatched click
    * still carries its user id; the output coalesces the two. */
  def clickAttributionFull(clicks: DataFrame, purchases: DataFrame,
                           watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("purchase_ts"), col("value"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $attributionWindow"),
      "full_outer")
      .select(coalesce(col("user_id"), col("c_user")).as("user_id"),
        col("purchase_ts"), col("click_ts"), col("value"))
  }

  /** The one end-to-end runnable sink path: finalized tumbling-window
    * counts written to a parquet directory via `foreachBatch`, with
    * restart-safety from the checkpoint WAL (StreamingSpec pins the
    * no-reprocessing behavior). `foreachBatch` is AT-LEAST-once: a
    * crash between the write and the checkpoint commit replays the
    * batch, so the write must be IDEMPOTENT — each batch overwrites
    * its own `batch=<id>` partition directory (a plain append would
    * duplicate the replayed rows). Append mode + watermark means a
    * window is emitted in exactly one batch, so partitioning by
    * batchId never splits a window. Run it on a [[graft.Sessions]]-
    * configured session; on a cluster, point both dirs at
    * shared/object storage and this is the production shape. */
  def windowedCountsToParquet(events: DataFrame, outDir: String,
                              checkpointDir: String,
                              windowLen: String = "1 hour",
                              watermark: String = "2 hours"): StreamingQuery =
    tumblingCounts(events, windowLen, watermark)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()

  /** Streaming dedup: drop repeated (user_id, ts) events, keeping state
    * only within the watermark — the streaming face of the batch dedup
    * family (dedup.Dedup): exact dedup needs unbounded memory on an
    * unbounded stream, so the watermark IS the dedup horizon. At 100
    * TB/day this is the standard at-most-once-per-key ingestion guard. */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "ts")

  /** Arbitrary per-key state: running (count, total) per user via
    * mapGroupsWithState — the Spark-native form of the reference's
    * "user reduce with state" generalized to unbounded input. */
  def runningTotals(events: Dataset[EventRow]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(userId, 0L, 0.0))
          val next = rows.foldLeft(prev) { (acc, r) =>
            UserTotal(userId, acc.n + 1, acc.total + r.value)
          }
          state.update(next)
          next
      }
  }

  /** The SAME running totals on Spark 4's arbitrary-state API —
    * `transformWithState` supersedes mapGroupsWithState with named,
    * individually-encoded state handles (value/list/map), per-state
    * TTL, and event/processing-time timers, and requires the RocksDB
    * state store (the 100 TB posture baked into the API). One
    * `ValueState[UserTotal]` here; StreamingSpec pins emission parity
    * with [[runningTotals]] on the same input. */
  class RunningTotalsProcessor
      extends StatefulProcessor[Long, EventRow, UserTotal] {
    @transient private var totals: ValueState[UserTotal] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserTotal](
        "totals", Encoders.product[UserTotal], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventRow],
                                 timerValues: TimerValues): Iterator[UserTotal] = {
      val prev = if (totals.exists()) totals.get() else UserTotal(key, 0L, 0.0)
      val next = rows.foldLeft(prev) { (acc, r) =>
        UserTotal(key, acc.n + 1, acc.total + r.value)
      }
      totals.update(next)
      Iterator.single(next)
    }
  }

  def runningTotalsTws(events: Dataset[EventRow]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  case class SessionSummary(user_id: Long, n: Long, last_ts_ms: Long)

  /** EVENT-TIME TIMERS — the transformWithState capability the old
    * state APIs cannot express cleanly: a session closes and emits
    * ONLY when the watermark passes `gap` beyond the user's last
    * event, via an explicitly registered per-key timer. Each input
    * batch moves the key's single timer forward (delete + register —
    * timers are not keyed by name, so the old one must be removed);
    * `handleExpiredTimer` emits the summary and clears state, so an
    * idle user costs nothing after the timer fires. mapGroupsWithState
    * timeouts restart on EVERY invocation and cannot coexist with
    * other timer schedules; here the expiry is data-derived and the
    * state/timer lifecycle is explicit. */
  class SessionTimerProcessor(gapMs: Long)
      extends StatefulProcessor[Long, EventRow, SessionSummary] {
    @transient private var sess: ValueState[SessionSummary] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[SessionSummary](
        "session", Encoders.product[SessionSummary], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventRow],
                                 timerValues: TimerValues): Iterator[SessionSummary] = {
      val prev = if (sess.exists()) Some(sess.get()) else None
      val cur = rows.foldLeft(prev.getOrElse(SessionSummary(key, 0L, 0L))) {
        (acc, r) => SessionSummary(key, acc.n + 1,
          math.max(acc.last_ts_ms, r.ts.getTime))
      }
      prev.foreach(p => getHandle.deleteTimer(p.last_ts_ms + gapMs))
      getHandle.registerTimer(cur.last_ts_ms + gapMs)
      sess.update(cur)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionSummary] = {
      val out = if (sess.exists()) Iterator.single(sess.get()) else Iterator.empty
      sess.clear()
      out
    }
  }

  /** Sessions over a watermarked stream: emits one summary per user
    * session, `gapMs` after the last event (event time). */
  def sessionSummaries(events: Dataset[EventRow],
                       gapMs: Long = 5 * 60 * 1000L,
                       watermark: String = "10 minutes"): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class Crossing(user_id: Long, threshold: Double, total: Double)

  /** flatMapGroupsWithState (the 0..n-outputs state API
    * mapGroupsWithState cannot express): per user, emit one row each
    * time the running value total crosses another multiple of
    * `step` — a streaming threshold-alert stream. State is one
    * (count, total) per key, constant size; emission count varies per
    * batch, which is exactly why this needs flatMap semantics. Update
    * mode (each batch may re-emit for keys that advanced). */
  def thresholdCrossings(events: Dataset[EventRow],
                         step: Double = 100.0): Dataset[Crossing] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(userId, 0L, 0.0))
          val next = rows.foldLeft(prev) { (acc, r) =>
            UserTotal(userId, acc.n + 1, acc.total + r.value)
          }
          state.update(next)
          val from = math.floor(prev.total / step).toLong
          val to = math.floor(next.total / step).toLong
          ((from + 1) to to).iterator
            .map(k => Crossing(userId, k * step, next.total))
      }
  }
}
