package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.EventOps

/** Streaming transforms are the same plans as their batch mirrors —
  * asserted by feeding identical rows through MemoryStream and the
  * batch path and comparing results (complete output mode ⇒ watermark
  * dropping can't hide rows at this scale). */
class StreamsSpec extends SparkSpec {
  import Streams.EventRow

  private def mkEvents: Seq[EventRow] = {
    val h = 3600000L
    (0 until 40).map { i =>
      EventRow(i.toLong, new Timestamp(1700000000000L + i * (h / 8)),
        (i % 3).toLong, if (i % 2 == 0) "click" else "view", i * 1.5)
    }
  }

  test("streaming tumbling window equals batch groupBy on same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    mem.addData(mkEvents)
    val q = Streams.tumblingCounts(mem.toDF(), watermark = "10 hours")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("tumbling")
      .select("win_start", "event_type", "n_events", "sum_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = mkEvents.toDF()
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
      .select(col("window.start"), col("event_type"), col("n"), col("sv"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got === batch && got.nonEmpty)
  }

  test("streaming sliding window equals batch window(size, slide) on same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    mem.addData(mkEvents)
    val q = Streams.slidingCounts(mem.toDF(), watermark = "10 hours")
      .writeStream.format("memory").queryName("sliding")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sliding")
      .select("win_start", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    val batch = mkEvents.toDF()
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got === batch && got.nonEmpty)
    // every event contributes to exactly size/slide = 4 windows
    val total = spark.table("sliding")
      .agg(sum(col("n_events"))).head().getLong(0)
    assert(total === 4L * mkEvents.size)
  }

  test("streaming dedup drops repeated event ids across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    // duplicates both inside one batch and across batches: state must
    // survive the batch boundary (the watermark hasn't passed the keys)
    mem.addData(mkEvents ++ mkEvents.take(10))
    val q = Streams.dedupedEvents(mem.toDF(), watermark = "10 hours")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      mem.addData(mkEvents.take(25)) // second batch: all duplicates
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dedup_stream").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq === mkEvents.map(_.event_id).sorted.toSeq)
  }

  test("streaming session windows match batch sessionization boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // one user, two sessions split by a >10min gap
    val rows = Seq(
      EventRow(1, new Timestamp(1700000000000L), 7, "click", 1.0),
      EventRow(2, new Timestamp(1700000300000L), 7, "click", 2.0),  // +5m: same session
      EventRow(3, new Timestamp(1700001200000L), 7, "click", 3.0))  // +15m: new session
    val mem = MemoryStream[EventRow]
    mem.addData(rows)
    val q = Streams.sessionWindows(mem.toDF(), watermark = "10 hours")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sessions")
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((7L, 2L), (7L, 1L)))
  }

  test("stream-static join enriches events against a batch dim") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((0L, "gold"), (1L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[EventRow]
    mem.addData(mkEvents) // user_ids 0,1,2 — user 2 has no dim row
    val q = Streams.enrichedByUser(mem.toDF(), dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("enriched")
      .groupBy("user_id", "tier").count()
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got === Set((0L, Some("gold")), (1L, Some("silver")), (2L, None)))
  }

  test("stream-stream join matches clicks to views within the time bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    val views = MemoryStream[EventRow]
    val clicks = MemoryStream[EventRow]
    views.addData(Seq(
      EventRow(100, new Timestamp(t0), 7, "view", 0),
      EventRow(101, new Timestamp(t0), 8, "view", 0)))
    clicks.addData(Seq(
      EventRow(200, new Timestamp(t0 + 5 * 60000), 7, "click", 0),   // +5m: match
      EventRow(201, new Timestamp(t0 + 20 * 60000), 7, "click", 0),  // +20m: outside bound
      EventRow(202, new Timestamp(t0 + 60000), 9, "click", 0)))      // no view user
    val q = Streams.viewClickJoin(views.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("vc")
      .outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("vc").select("view_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((100L, 200L)))
  }

  test("AvailableNow trigger drains all input then terminates on its own") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_anow").toString
    try {
      val ev = mkEvents.toDF()
      ev.write.mode("overwrite").parquet(s"$base/in")
      val q = Streams.tumblingCounts(
        Streams.readEventStream(spark, s"$base/in"), watermark = "10 hours")
        .writeStream.format("memory").queryName("anow")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ckpt").start()
      // the batch-over-stream mode: processes everything available,
      // then STOPS — no explicit stop() needed, unlike processing
      // triggers. The operational shape of a scheduled incremental job.
      assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
      val got = spark.table("anow").agg(sum(col("n_events")))
        .head().getLong(0)
      assert(got === mkEvents.size)
    } finally graft.Fs.deleteRecursively(java.nio.file.Paths.get(base))
  }

  test("left-outer stream-stream join: unmatched views emit nulls after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    val views = MemoryStream[EventRow]
    val clicks = MemoryStream[EventRow]
    views.addData(Seq(
      EventRow(100, new Timestamp(t0), 7, "view", 0),   // will match
      EventRow(101, new Timestamp(t0), 8, "view", 0)))  // will NOT match
    clicks.addData(Seq(
      EventRow(200, new Timestamp(t0 + 5 * 60000), 7, "click", 0)))
    val q = Streams.viewClickLeftOuter(views.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("vclo")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      // the unmatched view's null row may only emit once the watermark
      // proves no click can still arrive: push far-future rows on BOTH
      // sides (the join watermark is the min), then one more batch so
      // the advanced watermark takes effect
      val far = t0 + 10 * 3600000L
      views.addData(Seq(EventRow(900, new Timestamp(far), 99, "view", 0)))
      clicks.addData(Seq(EventRow(901, new Timestamp(far), 99, "click", 0)))
      q.processAllAvailable()
      views.addData(Seq(EventRow(902, new Timestamp(far + 1000), 99, "view", 0)))
      clicks.addData(Seq(EventRow(903, new Timestamp(far + 1000), 99, "click", 0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("vclo")
      .filter(col("user_id").isin(7, 8))
      .select("view_id", "click_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(got === Set((100L, Some(200L)), (101L, None)))
  }

  test("mapGroupsWithState accumulates running per-user totals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    mem.addData(mkEvents)
    val q = Streams.runningUserTotals(mem.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode(OutputMode.Update).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("running")
      .groupBy("user_id").agg(max("n_events").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = mkEvents.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
    assert(got === expected)
  }

  test("file stream end-to-end: events dir -> tumbling agg -> parquet sink") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("fstream")
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    // two micro-batches: one file appears, then another
    val h = 3600000L
    def rows(offset: Int) = (0 until 20).map { i =>
      EventRow(offset + i.toLong,
        new Timestamp(1700000000000L + (offset + i) * (h / 4)),
        (i % 2).toLong, "click", 1.0)
    }
    rows(0).toDF().write.mode("append").parquet(in)
    Streams.runTumblingToParquet(spark, in, out, ckpt)
    rows(20).toDF().write.mode("append").parquet(in)
    Streams.runTumblingToParquet(spark, in, out, ckpt) // resumes from checkpoint
    val got = spark.read.parquet(out)
    // append mode with watermark only emits windows the watermark has
    // passed; at least the early windows must be present and correct
    assert(got.count() > 0)
    val batch = rows(0).concat(rows(20)).toDF()
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("n"))
    val joined = got.select(col("win_start"), col("n_events"))
      .join(batch, Seq("win_start"))
    assert(joined.filter(col("n_events") =!= col("n")).count() === 0)
  }

  test("flatMapGroupsWithState closes sessions on gap and emits them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    val rows = Seq(
      EventRow(1, new Timestamp(t0), 7, "c", 1.0),
      EventRow(2, new Timestamp(t0 + 300000), 7, "c", 2.0),   // +5m same session
      EventRow(3, new Timestamp(t0 + 1200000), 7, "c", 3.0),  // +20m: closes first
      EventRow(4, new Timestamp(t0 + 2400000), 7, "c", 4.0))  // +40m: closes second
    val mem = MemoryStream[EventRow]
    mem.addData(rows)
    val q = Streams.closedSessions(mem.toDS())
      .writeStream.format("memory").queryName("closed")
      .outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("closed")
      .select("user_id", "n_events", "sum_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // sessions 1 (events 1,2) and 2 (event 3) closed; session 3 still open
    assert(got === Set((7L, 2L, 3.0), (7L, 1L, 3.0)))
  }

  test("EventTimeTimeout flushes the final dangling session per user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    val mem = MemoryStream[EventRow]
    mem.addData(Seq(
      EventRow(1, new Timestamp(t0), 7, "c", 1.0),
      EventRow(2, new Timestamp(t0 + 300000), 7, "c", 2.0),  // +5m same session
      EventRow(3, new Timestamp(t0 + 1200000), 7, "c", 3.0))) // +20m: closes first
    val q = Streams.closedSessionsFlushed(mem.toDS(), watermark = "1 minute")
      .writeStream.format("memory").queryName("flushed")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      // push the watermark far past (last event + gap) with another
      // user's event; the NEXT batch's timeout fires user 7's open
      // session even though user 7 never sends another row
      mem.addData(Seq(EventRow(9, new Timestamp(t0 + 7200000), 8, "c", 9.0)))
      q.processAllAvailable()
      mem.addData(Seq(EventRow(10, new Timestamp(t0 + 7260000), 8, "c", 1.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("flushed")
      .select("user_id", "n_events", "sum_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // gap-closed session (events 1,2) AND the timeout-flushed dangler
    // (event 3) — the NoTimeout variant loses the latter
    assert(got.contains((7L, 2L, 3.0)), s"gap-closed session missing: $got")
    assert(got.contains((7L, 1L, 3.0)), s"dangling session not flushed: $got")
  }

  // tws needs RocksDB (state variables are column families); a child
  // session keeps the conf from leaking to other tests
  private def rocksSession() = {
    val iso = spark.newSession()
    iso.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    iso.conf.set("spark.sql.shuffle.partitions", "1")
    iso
  }

  test("transformWithState runs in BATCH mode through the same processor") {
    val iso = rocksSession()
    import iso.implicits._
    // batch-mode stateful exec resolves ephemeral stores through the
    // driver coordinator that only streaming normally materializes
    iso.streams.getClass.getMethod("stateStoreCoordinator")
      .invoke(iso.streams)
    val rows = mkEvents.map(e => (e.user_id, e.event_type, e.value))
    val out = Streams.runningTotalsTws(iso.createDataset(rows))
    // the plan must route through the stateful operator itself (the
    // unified-API claim), not some aggregate fallback
    assert(out.queryExecution.executedPlan.toString
      .contains("TransformWithState"))
    val got = out.collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    val expected = rows.groupBy(_._1).view.mapValues { es =>
      (es.size.toLong, es.map(_._3).sum, es.map(_._2).distinct.size.toLong)
    }.toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, (n, sv, nt)) =>
      assert(got(k)._1 === n && got(k)._3 === nt)
      assert(math.abs(got(k)._2 - sv) < 1e-9)
    }
  }

  test("ListState last-K window appends across batches, trims to K, " +
      "and sorts within-batch rows by event time") {
    val iso = rocksSession()
    import iso.implicits._
    implicit val sqlCtx = iso.sqlContext
    // rows are (user_id, ts_us, event_id, cents); batch 1 arrives
    // OUT of time order so the processor's in-batch sort is live
    val mem = MemoryStream[(Long, Long, Long, Long)]
    val q = Streams.orderedLastK(mem.toDS(), k = 3)
      .writeStream.format("memory").queryName("lastk")
      .outputMode(OutputMode.Update).start()
    try {
      // user 1: 2 values (unsorted arrival); user 2: 4 (already > K)
      mem.addData((1L, 20L, 2L, 200L), (1L, 10L, 1L, 100L),
        (2L, 1L, 3L, 10L), (2L, 2L, 4L, 20L),
        (2L, 3L, 5L, 30L), (2L, 4L, 6L, 40L))
      q.processAllAvailable()
      // batch 2: user 1's buffer must have SURVIVED — (100,200) +
      // (300,400) → kept (200,300,400)
      mem.addData((1L, 30L, 7L, 300L), (1L, 40L, 8L, 400L))
      q.processAllAvailable()
    } finally q.stop()
    // latest row per user = max n_seen
    val rows = iso.table("lastk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val u1 = rows.filter(_._1 == 1L).maxBy(_._2)
    assert(u1._3 === 3L && u1._4 === 900L,
      s"user 1 window wrong: $rows (ListState did not persist/trim/sort)")
    assert(rows.exists(t => t._1 == 2L && t._3 === 3L && t._4 === 90L),
      s"user 2 window wrong: $rows")
  }

  test("ValueState TTL: an expired key re-folds from empty; a long TTL survives") {
    // TTL forces TimeMode.ProcessingTime, and in that mode the engine
    // schedules timer-evaluation batches CONTINUOUSLY — neither
    // processAllAvailable nor an AvailableNow drain ever stabilizes
    // (the tws twin of the mapGroupsWithState ProcessingTimeTimeout
    // trap, measured: 2400+ empty batches in 2 min). Each step instead
    // runs its own query on a shared checkpoint (state carries across
    // restarts like the restart gate) and stops once the data batch's
    // output row has LANDED — a condition wait, not a drain; the empty
    // timer batches emit nothing, so the buffer converges.
    val iso = rocksSession()
    import iso.implicits._
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField,
      StructType}
    val schema = StructType(Seq(
      StructField("_1", LongType), StructField("_2", DoubleType)))
    def runCase(name: String, ttl: java.time.Duration,
        pauseMs: Long): Set[(Long, Long, Double)] = {
      val base = java.nio.file.Files.createTempDirectory(s"graft_ttl_$name")
      try {
        val inDir = s"$base/in"
        val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
        def drainOneRow(): Unit = {
          val before = got.synchronized(got.size)
          val q = Streams.ttlTotals(
              iso.readStream.schema(schema).parquet(inDir)
                .as[(Long, Double)](org.apache.spark.sql.Encoders
                  .product[(Long, Double)]), ttl)
            .writeStream.outputMode(OutputMode.Update)
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
              val rows = b.collect()
                .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
              got.synchronized { got ++= rows }
              ()
            }
            .option("checkpointLocation", s"$base/ckpt")
            .start()
          try {
            val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
            while (got.synchronized(got.size) == before &&
                System.nanoTime() < deadline)
              Thread.sleep(25)
            assert(got.synchronized(got.size) > before,
              s"$name run emitted no row within the deadline")
            // do NOT stop between the output landing and the batch
            // COMMIT: a torn run replays the data batch on the next
            // run's recovery, which rewrites the key's TTL clock and
            // (measured, rare) turns the expiry case into a fresh fold
            // — wait until the commit log catches the offset log
            def maxId(sub: String): Long = {
              val fs = new java.io.File(s"$base/ckpt/$sub").listFiles()
              if (fs == null) -1L
              else fs.flatMap(f =>
                scala.util.Try(f.getName.toLong).toOption)
                .foldLeft(-1L)(math.max)
            }
            while (maxId("commits") < maxId("offsets") &&
                System.nanoTime() < deadline)
              Thread.sleep(25)
          } finally q.stop()
        }
        Seq((1L, 10.0), (1L, 5.0)).toDF("_1", "_2")
          .coalesce(1).write.mode("append").parquet(inDir)
        drainOneRow()
        Thread.sleep(pauseMs)
        Seq((1L, 1.0)).toDF("_1", "_2")
          .coalesce(1).write.mode("append").parquet(inDir)
        drainOneRow()
        got.synchronized(got.toSet)
      } finally graft.Fs.deleteRecursively(base)
    }
    // expiry side: TTL 500 ms, a 2 s pause between runs GUARANTEES the
    // store's processing-time clock passes last-write + TTL — the
    // one-sided construction that makes a wall-clock contract
    // deterministic; the no-expiry side uses a TTL far longer than any
    // test run instead of racing the clock
    val short = runCase("short", java.time.Duration.ofMillis(500), 2000L)
    assert(short.contains((1L, 2L, 15.0)), s"pre-expiry fold wrong: $short")
    assert(short.contains((1L, 1L, 1.0)),
      s"state not expired — fold continued past TTL: $short")
    val long = runCase("long", java.time.Duration.ofHours(1), 0L)
    assert(long.contains((1L, 3L, 16.0)),
      s"long-TTL state did not survive the restart boundary: $long")
  }

  test("statestore change feed records clear() as a delete row") {
    // pins the changelog semantics stream_state_changefeed's
    // all-updates assertion rests on: a processor that CLEARS state
    // produces change_type="delete" for that (batch, key) — so a gate
    // seeing only "update" rows really is observing a clear-free run,
    // not a reader that collapses deletes away
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues,
      StatefulProcessor, TTLConfig, ValueState}
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField,
      StructType}
    class ClearOnSecondProcessor
        extends StatefulProcessor[Long, (Long, Double), (Long, Long)] {
      @transient private var st: ValueState[Long] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getValueState[Long]("cnt",
          org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
          tv: TimerValues): Iterator[(Long, Long)] = {
        val cur = (if (st.exists()) st.get() else 0L) + rows.size
        if (cur >= 2) { st.clear(); Iterator.single((key, -cur)) }
        else { st.update(cur); Iterator.single((key, cur)) }
      }
    }
    val iso = rocksSession()
    iso.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    import iso.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cfdel")
    try {
      val inDir = s"$base/in"
      val schema = StructType(Seq(
        StructField("_1", LongType), StructField("_2", DoubleType)))
      var q: org.apache.spark.sql.streaming.StreamingQuery = null
      try {
        Seq((1L, 10.0)).toDF("_1", "_2")
          .coalesce(1).write.mode("append").parquet(inDir)
        q = iso.readStream.schema(schema).parquet(inDir)
          .as[(Long, Double)]
          .groupByKey(_._1)
          .transformWithState(new ClearOnSecondProcessor,
            TimeMode.None(), OutputMode.Update())
          .toDF("k", "v")
          .writeStream.outputMode(OutputMode.Update())
          .format("memory").queryName("cfdel")
          .option("checkpointLocation", s"$base/ckpt").start()
        q.processAllAvailable() // batch 0: cnt 0→1, an update commit
        Seq((1L, 5.0)).toDF("_1", "_2")
          .coalesce(1).write.mode("append").parquet(inDir)
        q.processAllAvailable() // batch 1: cnt reaches 2 → clear()
      } finally if (q != null) q.stop()
      val feed = iso.read.format("statestore")
        .option("stateVarName", "cnt")
        .option("readChangeFeed", "true")
        .option("changeStartBatchId", "0")
        .load(s"$base/ckpt")
        .select(col("batch_id"), col("change_type"), col("key.value"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(feed.contains((0L, "update", 1L)),
        s"batch-0 update missing from change feed: $feed")
      assert(feed.contains((1L, "delete", 1L)),
        s"clear() did not surface as a delete row: $feed")
      assert(!feed.contains((1L, "update", 1L)),
        s"cleared batch must not also report an update: $feed")
    } finally graft.Fs.deleteRecursively(base)
  }

  test("batch sessionize agrees with streaming session count per user") {
    // EventOps.sessionize over testdata: session boundaries respect the gap
    val sess = EventOps.sessionize(spark, sfDir)
    val bad = sess.filter(col("start_us") > col("end_us"))
    assert(bad.count() === 0)
    assert(sess.count() > 0)
  }

  test("coordinator warmup fallback alone unblocks batch-mode transformWithState") {
    // the degrade path twsBatchUnified takes if a Spark bump renames
    // the private stateStoreCoordinator accessor: the PUBLIC-API
    // warmup (no-op streaming query) must leave the driver
    // coordinator materialized so batch-mode tws can resolve its
    // ephemeral stores — no reflection anywhere on this path
    val iso = spark.newSession()
    iso.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    Streams.warmupCoordinatorViaNoopStream(iso)
    import iso.implicits._
    val ev = Seq((1L, "a", 1.0), (1L, "b", 2.0), (2L, "a", 3.0))
      .toDS()
    val out = Streams.runningTotalsTws(ev.toDF()
        .as[(Long, String, Double)])
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n"), max(col("n_types")).as("nt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(out == Set((1L, 2L, 2L), (2L, 1L, 1L)),
      s"batch tws wrong after fallback warmup: $out")
    // and the guarded primary entry point stays callable end-to-end
    Streams.ensureStateStoreCoordinator(iso)
  }
}
