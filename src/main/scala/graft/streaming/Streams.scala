package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` stream shape
  * (SURVEY.md §2.7: the reference has no streaming; this is the
  * declared extension). Every transform here takes a DataFrame that may
  * be either a readStream source or a batch frame — the plans are
  * identical, which is how the batch mirrors in
  * [[graft.operators.EventOps]] stay oracle-checkable while these run
  * incrementally with watermark-bounded state.
  *
  * Scale notes: state for windowed aggs is keyed by (window, type) /
  * session key and pruned by the watermark, so executor state stays
  * bounded no matter how long the stream runs; shuffle keys are the
  * group keys, same as the batch plans.
  */
object Streams {
  private val Dec = DecimalType(18, 2)

  /** Materialize the driver-side StateStoreCoordinator so BATCH-mode
    * stateful execution (transformWithState over a batch frame) can
    * resolve its ephemeral stores: Spark creates the coordinator only
    * through the streaming query manager, lazily. Primary path forces
    * the manager's `stateStoreCoordinator` accessor (private[sql] —
    * public bytecode, so plain reflection); if a Spark upgrade renames
    * that non-public member, the failure is caught LOUDLY and the
    * fallback materializes the coordinator through public API alone:
    * start-and-drain a zero-row no-op streaming query, whose
    * StreamExecution touches the same lazy on construction. Either
    * way the caller proceeds; StreamsSpec exercises the fallback
    * directly. */
  private[graft] def ensureStateStoreCoordinator(s: SparkSession): Unit =
    try s.streams.getClass.getMethod("stateStoreCoordinator")
      .invoke(s.streams)
    catch {
      case e @ (_: NoSuchMethodException | _: SecurityException |
                _: IllegalAccessException) =>
        System.err.println("[graft] StreamingQueryManager." +
          "stateStoreCoordinator is gone (" + e.getClass.getSimpleName +
          ") — the Spark-private accessor this build forced was " +
          "renamed; falling back to a no-op streaming-query warmup")
        warmupCoordinatorViaNoopStream(s)
    }

  /** Public-API coordinator warmup: one AvailableNow rate micro-batch
    * into the noop sink — starts and finishes immediately (rate has
    * nothing to serve), and query START is the part that counts. */
  private[graft] def warmupCoordinatorViaNoopStream(s: SparkSession): Unit = {
    val q = s.readStream.format("rate")
      .option("rowsPerSecond", "1").load()
      .writeStream.format("noop")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        graft.Fs.fastTempDir("graft_coordwarm").toString)
      .start()
    try q.awaitTermination(30000) finally q.stop()
  }

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-based stream source over an events directory (parquet parts
    * appear atomically → each new file is a micro-batch). */
  def readEventStream(s: SparkSession, dir: String): DataFrame =
    s.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling 1-hour window per event type; late rows beyond the
    * watermark are dropped and their window state reclaimed. Streaming
    * twin of EventOps.tumblingWindow. */
  def tumblingCounts(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(Dec)).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup: drop repeated event_ids, keeping per-key
    * state only inside the watermark horizon — the streaming twin of
    * batch dropDuplicates. Plain dropDuplicates on a stream holds
    * every key ever seen (unbounded state, the dedup scale-killer);
    * dropDuplicatesWithinWatermark expires a key's state once the
    * watermark passes its event time, so executor state is bounded by
    * the duplicate-arrival horizon — the right contract for at-least-
    * once sources, whose duplicates arrive close together. */
  def dedupedEvents(events: DataFrame,
      watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Sliding 1-hour window every 15 minutes — each event lands in 4
    * overlapping windows. */
  def slidingCounts(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n_events"))

  /** Native session windows: per-user sessions closed by a 10-minute
    * gap — the streaming twin of EventOps.sessionize (which assigns the
    * same sessions via lag/cumsum in batch). */
  def sessionWindows(events: DataFrame, gap: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(Dec)).cast(DoubleType).as("sum_value"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Stream-static enrichment join: each micro-batch joins against the
    * batch dim frame (re-read per batch if the dim's source updates —
    * no state, no watermark needed). `broadcastDim = true` hints the
    * dim broadcast (right for small reference data); pass false for a
    * dim too big to broadcast and let Catalyst plan the join — a
    * forced hint would OOM instead of falling back. */
  def enrichedByUser(events: DataFrame, userDim: DataFrame,
      broadcastDim: Boolean = true): DataFrame =
    events.join(if (broadcastDim) broadcast(userDim) else userDim,
      Seq("user_id"), "left_outer")

  /** Stream-stream join: views matched to clicks by the same user
    * within [view, view+15min]. Both sides carry watermarks and the
    * join condition bounds event time on both, so each side's buffered
    * state is provably prunable — without the time bound the engine
    * would have to keep every row forever. */
  def viewClickJoin(views: DataFrame, clicks: DataFrame,
      watermark: String = "30 minutes",
      window: String = "15 minutes"): DataFrame = {
    val v = views.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    v.join(c,
      v("user_id") === c("user_id") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $window"))
      .select(v("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** LEFT OUTER stream-stream join: every view survives; unclicked
    * views emit with null click columns — but only once the watermark
    * has passed the view's join window, because until then a matching
    * click could still arrive. That delayed-null emission is the
    * semantic difference from the inner join above (and from any batch
    * left join), and it's only well-defined because both the watermark
    * and the time-bound condition are present: the engine needs a
    * provable point after which "no match" is final. Same bounded
    * per-side state as the inner variant. */
  def viewClickLeftOuter(views: DataFrame, clicks: DataFrame,
      watermark: String = "30 minutes",
      window: String = "15 minutes"): DataFrame = {
    val v = views.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    v.join(c,
      v("user_id") === col("c_user_id") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $window"),
      "left_outer")
      .select(v("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  // ------------------------------------------------- custom state
  case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, sum_value: Double,
    last_us: Long)

  /** Custom keyed state via mapGroupsWithState: running per-user
    * totals — the escape hatch for session logic session_window can't
    * express (SURVEY §2.7). State is one small row per active user.
    * Pass idleTimeoutMs > 0 to evict idle users' state (emitting their
    * final totals); note a processing-time timeout keeps the trigger
    * firing empty batches, so leave it 0 for drain-and-stop jobs. */
  def runningUserTotals(events: Dataset[EventRow],
      idleTimeoutMs: Long = 0L): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    val timeoutConf = if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](timeoutConf) {
        case (uid, rows, state: GroupState[UserRunning]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0, 0L))
            val next = rows.foldLeft(prev) { (acc, e) =>
              UserRunning(uid, acc.n_events + 1, acc.sum_value + e.value,
                math.max(acc.last_us, micros(e.ts)))
            }
            state.update(next)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            next
          }
      }
  }

  /** transformWithState processor: per-user running (n, Σvalue) in a
    * single ValueState cell — the arbitrary-stateful-API-v2 twin of
    * [[runningUserTotals]]'s mapGroupsWithState. The new API is what
    * production state logic should target: typed state VARIABLES
    * (value/list/map per key, independently evolvable), event- and
    * processing-time timers, TTL per state, and initial-state
    * bootstrap — none of which the single-opaque-blob GroupState can
    * express. State here is one (long, double) per user, backed by the
    * RocksDB state-store provider the gate pins (changelog-
    * checkpointed at scale, not JVM-heap-resident like the default
    * HDFS-backed map — the difference between state bounded by disk
    * and state bounded by executor memory at 100 TB key counts). */
  class RunningTotalsProcessor
      extends StatefulProcessor[Long, (Long, String, Double),
        (Long, Long, Double, Long)] {
    @transient private var st: ValueState[(Long, Double)] = _
    // second, independently-typed state VARIABLE on the same key — the
    // capability GroupState's single opaque blob can't express: the
    // per-type tallies evolve (add a type, never rewrite the totals
    // cell), and at scale each map entry is its own store key
    @transient private var types: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[(Long, Double)]("totals",
        org.apache.spark.sql.Encoders.product[(Long, Double)],
        TTLConfig.NONE)
      types = getHandle.getMapState[String, Long]("types",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long,
        rows: Iterator[(Long, String, Double)],
        tv: TimerValues): Iterator[(Long, Long, Double, Long)] = {
      var cur = if (st.exists()) st.get() else (0L, 0.0)
      rows.foreach { r =>
        cur = (cur._1 + 1, cur._2 + r._3)
        types.updateValue(r._2,
          (if (types.containsKey(r._2)) types.getValue(r._2) else 0L) + 1L)
      }
      st.update(cur)
      var nTypes = 0L
      val it = types.keys()
      while (it.hasNext) { it.next(); nTypes += 1 }
      Iterator.single((key, cur._1, cur._2, nTypes))
    }
  }

  /** Running per-user totals through transformWithState (update mode:
    * each micro-batch re-emits the touched users' current totals, so
    * the LATEST row per user is the running answer — max n_events,
    * since the count is monotone). ValueState carries (n, Σvalue);
    * MapState carries per-event-type tallies, surfaced as the running
    * distinct-type count. */
  def runningTotalsTws(events: Dataset[(Long, String, Double)]): DataFrame = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_events", "sum_value", "n_types")
  }

  /** Epoch micros from a Timestamp — getTime() alone truncates to
    * millis (the sub-ms micros live in getNanos), which would disagree
    * with the batch paths' unix_micros on real event data. */
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  /** A session emitted by [[sessionsTwsTimers]]; `by_timer` marks
    * rows flushed by an event-time TIMER firing (the dangling final
    * session per user) vs closed in-line by a gap. */
  case class TwsSession(user_id: Long, start_us: Long, end_us: Long,
    n_events: Long, sum_value: Double, by_timer: Boolean)

  /** transformWithState sessionizer driven by EVENT-TIME TIMERS — the
    * arbitrary-state surface [[RunningTotalsProcessor]] leaves
    * unexercised (it runs TimeMode.None: no timers, no watermark
    * coupling). This is the production sessionizer shape on the new
    * API: per-key session state in a ValueState, and a REGISTERED
    * timer at (last event + gap) so the engine itself tells the
    * processor when the watermark has proven a session unextendable —
    * the tws twin of [[closedSessionsFlushed]]'s EventTimeTimeout,
    * but with timers as first-class SET-valued objects (register /
    * delete / list per key) rather than GroupState's single slot.
    *
    * Timer hygiene rules a production processor needs, both applied
    * here: (1) re-registering on new input must DELETE the stale
    * timer first — timers are a set, and an orphaned earlier expiry
    * would fire spuriously; (2) handleExpiredTimer must re-check the
    * flush condition against live state (watermark ≥ last + gap) —
    * defense in depth if a stale timer survives anyway, so a timer
    * can never flush a session that later input has extended. */
  class TimerSessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, EventRow, TwsSession] {
    @transient private var sess: ValueState[SessionState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[SessionState]("sess",
        org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        tv: TimerValues): Iterator[TwsSession] = {
      val prior = if (sess.exists()) Some(sess.get()) else None
      val (cur, closed) = foldSessions(key, rows, prior, gapMs)
      cur.foreach { st =>
        sess.update(st)
        // materialize before deleting: iterating a state-store iterator
        // while mutating the store is provider-defined behavior (RocksDB
        // snapshots it; another backend may not) — a one-element list
        // per key costs nothing and removes the dependency
        getHandle.listTimers().toList.foreach(getHandle.deleteTimer)
        // clamp above the current watermark: a late session already
        // behind it still needs a FUTURE firing to ever flush
        getHandle.registerTimer(
          math.max(st.last_us / 1000 + gapMs, tv.getCurrentWatermarkInMs() + 1))
      }
      closed.iterator.map(c => TwsSession(c.user_id, c.start_us, c.end_us,
        c.n_events, c.sum_value, by_timer = false))
    }
    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[TwsSession] = {
      if (!sess.exists()) return Iterator.empty
      val st = sess.get()
      if (tv.getCurrentWatermarkInMs() < st.last_us / 1000 + gapMs)
        return Iterator.empty // stale timer; the live one fires later
      sess.clear()
      Iterator.single(TwsSession(key, st.start_us, st.last_us, st.n, st.sum,
        by_timer = true))
    }
  }

  /** Gap-based sessionization through transformWithState event-time
    * timers (append mode: a session row is emitted exactly once, when
    * closed by a gap or flushed by its timer). Union of both emission
    * paths equals the batch sessionization of the same input. */
  def sessionsTwsTimers(events: Dataset[EventRow], gapMs: Long = 600000L,
      watermark: String = "30 minutes"): Dataset[TwsSession] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new TimerSessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** [[RunningTotalsProcessor]]'s per-user (n, Σvalue) fold, with the
    * third arbitrary-state capability the totals and timer processors
    * leave unexercised: INITIAL-STATE BOOTSTRAP. handleInitialState
    * seeds each key's ValueState from a batch-computed (n, Σ) row
    * BEFORE any stream input arrives — how a production stateful job
    * migrates (from an old pipeline's table), backfills, or restarts
    * without replaying history: the state's past comes from a batch
    * aggregate, only the increment streams. */
  class BootstrappedTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, (Long, String, Double), (Long, Long, Double), (Long, Double)] {
    @transient private var st: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double)]("totals",
        org.apache.spark.sql.Encoders.product[(Long, Double)],
        TTLConfig.NONE)
    override def handleInitialState(key: Long, initial: (Long, Double),
        tv: TimerValues): Unit =
      st.update(initial)
    override def handleInputRows(key: Long,
        rows: Iterator[(Long, String, Double)],
        tv: TimerValues): Iterator[(Long, Long, Double)] = {
      var cur = if (st.exists()) st.get() else (0L, 0.0)
      rows.foreach(r => cur = (cur._1 + 1, cur._2 + r._3))
      st.update(cur)
      Iterator.single((key, cur._1, cur._2))
    }
  }

  /** Running totals bootstrapped from a batch state: `initial` holds
    * one (n, Σvalue) per user (the past); `events` stream only the
    * increment. Update mode — latest row per user is the running
    * answer, which must equal the batch aggregate over past ∪
    * increment. */
  def bootstrappedTotalsTws(events: Dataset[(Long, String, Double)],
      initial: org.apache.spark.sql.KeyValueGroupedDataset[Long, (Long, Double)])
      : DataFrame = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new BootstrappedTotalsProcessor,
        TimeMode.None(), OutputMode.Update(), initial)
      .toDF("user_id", "n_events", "sum_value")
  }

  /** Per-user (n, Σvalue) fold whose ValueState carries a
    * processing-time TTL — the one state-lifecycle knob every other
    * processor here runs with TTLConfig.NONE. TTL is the state-GC
    * contract for keys that stop arriving (abandoned users, expired
    * devices): the store drops a key's value `ttl` after its last
    * WRITE, and the next input for that key folds from empty. TTL is
    * processing-time-based by definition, so its expiry cannot meet a
    * deterministic DuckDB oracle (a wall-clock race would flake the
    * driver gate) — the contract is pinned at spec level instead
    * (StreamsSpec: a controlled pause longer than the TTL between
    * batches ⇒ the key re-folds from empty; a TTL far longer than the
    * test ⇒ state survives), and the README capability matrix records
    * why this row is spec-only. */
  class TtlTotalsProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
    @transient private var st: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double)]("totals",
        org.apache.spark.sql.Encoders.product[(Long, Double)],
        new TTLConfig(ttl))
    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        tv: TimerValues): Iterator[(Long, Long, Double)] = {
      var cur = if (st.exists()) st.get() else (0L, 0.0)
      rows.foreach(r => cur = (cur._1 + 1, cur._2 + r._2))
      st.update(cur)
      Iterator.single((key, cur._1, cur._2))
    }
  }

  /** Running totals with a per-key state TTL; see
    * [[TtlTotalsProcessor]] for why this surface is spec-gated.
    * TimeMode.ProcessingTime is REQUIRED: TTL expiry is measured
    * against the batch's processing-time clock, so the engine rejects
    * a TTL state in TimeMode.None at init. */
  def ttlTotals(events: Dataset[(Long, Double)],
      ttl: java.time.Duration): DataFrame = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new TtlTotalsProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Update())
      .toDF("user_id", "n_events", "sum_value")
  }

  /** The last-K-per-key ListState window, DETERMINISTIC and exact, so
    * its output can meet a relational oracle row-for-row:
    *  - event-time ordered, not arrival-ordered: each batch's rows
    *    for a key are sorted by (ts_us, event_id) before appending,
    *    and the gate feeds time-split chunks (batch N's times all
    *    precede batch N+1's), so the buffer is globally the user's
    *    LAST K events by event time — a SQL row_number window can
    *    state the same thing;
    *  - integer cents, not doubles: values arrive as DECIMAL(18,2)
    *    scaled to Long cents, so the window sum is exact integer
    *    arithmetic — no fold-order ulp drift between engines.
    * Emits (key, n_seen, lastk_n, lastk_cents); n_seen is strictly
    * monotone per key, so "latest row per key" is max_by(n_seen). */
  class OrderedLastKProcessor(k: Int)
      extends StatefulProcessor[Long, (Long, Long, Long, Long),
        (Long, Long, Long, Long)] {
    @transient private var buf: ListState[Long] = _
    @transient private var seen: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[Long]("lastk",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, Long, Long)],
        tv: TimerValues): Iterator[(Long, Long, Long, Long)] = {
      val batch = rows.toArray.sortBy(r => (r._2, r._3)) // (ts_us, event_id)
      val prior = if (buf.exists()) buf.get().toArray else Array.empty[Long]
      val kept = (prior ++ batch.map(_._4)).takeRight(k)
      buf.put(kept)
      val n = (if (seen.exists()) seen.get() else 0L) + batch.length
      seen.update(n)
      Iterator.single((key, n, kept.length.toLong, kept.sum))
    }
  }

  /** Event-time last-K window per user over (user_id, ts_us,
    * event_id, cents) rows; see [[OrderedLastKProcessor]]. */
  def orderedLastK(events: Dataset[(Long, Long, Long, Long)],
      k: Int = 5): DataFrame = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new OrderedLastKProcessor(k),
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_seen", "lastk_n", "lastk_cents")
  }

  case class SessionState(start_us: Long, last_us: Long, n: Long, sum: Double)
  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
    n_events: Long, sum_value: Double)

  /** One invocation's worth of session folding, shared by both
    * sessionizers: events extend the prior session or close it when the
    * gap is exceeded. Events are sorted within the invocation, and an
    * event older than the session's last timestamp never moves it
    * backwards (max-guard). Returns (still-open session, closed ones). */
  private def foldSessions(uid: Long, rows: Iterator[EventRow],
      prior: Option[SessionState], gapMs: Long)
      : (Option[SessionState], Seq[ClosedSession]) = {
    val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    val closed = Seq.newBuilder[ClosedSession]
    var cur = prior
    sorted.foreach { e =>
      val us = micros(e.ts)
      cur match {
        case Some(st) if us - st.last_us <= gapMs * 1000 =>
          cur = Some(SessionState(st.start_us, math.max(st.last_us, us),
            st.n + 1, st.sum + e.value))
        case Some(st) =>
          closed += ClosedSession(uid, st.start_us, st.last_us, st.n, st.sum)
          cur = Some(SessionState(us, us, 1, e.value))
        case None =>
          cur = Some(SessionState(us, us, 1, e.value))
      }
    }
    (cur, closed.result())
  }

  /** Custom sessionization via flatMapGroupsWithState: events extend a
    * per-user session; a gap larger than gapMs CLOSES the current
    * session and emits it (0..n outputs per invocation — the shape
    * mapGroupsWithState can't express). True cross-batch late-data
    * correctness needs the watermarked session_window path
    * ([[sessionWindows]]); this exists for session logic that operator
    * can't express. NoTimeout ⇒ the final open session per user is
    * never emitted — use [[closedSessionsFlushed]] on watermarked
    * streams where that matters (i.e. almost always in production). */
  def closedSessions(events: Dataset[EventRow],
      gapMs: Long = 600000L): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[SessionState]) =>
          val (cur, closed) = foldSessions(uid, rows, state.getOption, gapMs)
          cur.foreach(state.update)
          closed.iterator
      }
  }

  /** [[closedSessions]] + EventTimeTimeout: when the event-time
    * watermark passes (session last event + gap), the session can never
    * be extended again, so the timeout fires and emits it — the final
    * dangling session per user is flushed instead of lost. Requires a
    * watermark (applied here); state per user is one small row, pruned
    * by its own timeout. */
  def closedSessionsFlushed(events: Dataset[EventRow],
      gapMs: Long = 600000L,
      watermark: String = "30 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(
              ClosedSession(uid, st.start_us, st.last_us, st.n, st.sum))
          } else {
            val (cur, closed) = foldSessions(uid, rows, state.getOption, gapMs)
            cur.foreach { st =>
              state.update(st)
              // fire once the watermark proves no extension is possible;
              // clamp above the current watermark — a session already
              // older than it (late data) must still get a future firing,
              // setTimeoutTimestamp rejects past timestamps
              state.setTimeoutTimestamp(
                math.max(st.last_us / 1000 + gapMs,
                  state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }

  /** End-to-end runner: file stream in → tumbling agg → parquet sink
    * with checkpointing (exactly-once file output). */
  def runTumblingToParquet(s: SparkSession, inDir: String, outDir: String,
      checkpointDir: String): Unit = {
    val q = tumblingCounts(readEventStream(s, inDir))
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
