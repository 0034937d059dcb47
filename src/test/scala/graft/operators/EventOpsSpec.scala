package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins the session boundary comparator on BOTH engine formulations:
  * an exactly-gap-spaced pair MERGES (split only on silence strictly
  * greater than the gap). A review probe disproved an earlier claim of
  * half-open >= semantics for session_window — this spec keeps the
  * empirical fact from regressing into either implementation or its
  * oracle. */
class EventOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def evFrame(gapsMs: Seq[Long]) = {
    import spark.implicits._
    var t = 1700000000000L
    val rows = gapsMs.zipWithIndex.map { case (g, i) =>
      t += g
      (i.toLong, new Timestamp(t), 7L, "click", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("exactly-gap-spaced events merge; one microsecond over splits") {
    val gapMs = 10L * 60 * 1000
    // event 0, then exactly gap later, then gap+1ms later
    val df = evFrame(Seq(0L, gapMs, gapMs + 1))
    val lagSessions = EventOps.sessionizeOf(df).count()
    val nativeSessions = df
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .count()
    // events 0,1 merge (exact gap); event 2 splits (over gap) -> 2
    assert(lagSessions === 2, "lag/cumsum comparator drifted")
    assert(nativeSessions === 2, "session_window comparator drifted")
  }

  test("sliding windows: every event lands in exactly size/slide = 2 windows") {
    val d = "/root/testdata/sf0.001"
    val out = EventOps.slidingWindow(spark, d)
    val totalAssignments = out.agg(sum(col("n_events"))).head().getLong(0)
    val nEvents = graft.Tables.events(spark, d).count()
    assert(totalAssignments === 2 * nEvents)
    // starts are epoch-aligned to the 5-minute slide, never the 10-min size
    val misaligned = out
      .filter(pmod(col("win_start_us"), lit(300000000L)) =!= 0).count()
    assert(misaligned === 0)
  }

  test("sliding windows: an event is counted in both covering windows") {
    import spark.implicits._
    // t = 700s -> windows [300,900) and [600,1200)
    val one = Seq((1L, new Timestamp(700000L), 7L, "click", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = one
      .groupBy(org.apache.spark.sql.functions.window(
        col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_seconds(col("window.start")).as("s"))
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(300L, 600L))
  }

  test("triangleCount: K4 minus an edge, plus a pendant node") {
    import spark.implicits._
    // K4 over {a,b,c,d} without (c,d), plus pendant e hanging off d:
    // triangles {a,b,c} and {a,b,d} only
    val und = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("d", "e")).toDF("a", "b")
    val got = EventOps.triangleCountEdges(und)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 2L, "b" -> 2L, "c" -> 1L, "d" -> 1L, "e" -> 0L))
  }

  test("pageRank: dangling mass redistributed, ranks match driver reference") {
    import spark.implicits._
    // a -> b; b -> {a, c}; c dangling (no out-edges)
    val edges = Seq(("a", "b", 1.0), ("b", "a", 0.5), ("b", "c", 0.5))
      .toDF("src", "dst", "w")
    val got = EventOps.pageRankEdges(edges, iters = 8, damp = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    // driver-side reference: the identical op order and 12-decimal
    // per-step quantization the engine and the DuckDB oracle both use
    def q12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val inEdges = Map("a" -> Seq(("b", 0.5)), "b" -> Seq(("a", 1.0)),
      "c" -> Seq(("b", 0.5)))
    val base = (1.0 - 0.85) / 3.0
    var pr = Map("a" -> 1.0 / 3.0, "b" -> 1.0 / 3.0, "c" -> 1.0 / 3.0)
    for (_ <- 1 to 8) {
      val dm = pr("c")
      pr = inEdges.map { case (n, ins) =>
        val m = ins.map { case (u, w) => pr(u) * w }.sum
        n -> q12(base + 0.85 * (m + dm / 3.0))
      }
    }
    val want = pr.map { case (n, v) =>
      n -> BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got === want)
    // with dangling redistribution total mass is conserved
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
  }

  test("ohlc: open/close follow (ts, event_id) order, ties broken by id") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("ohlc").toString
    val t0 = 1700000000000L
    Seq( // two events share ts=t0: id 2 must win `open` over id 5
      (5L, new Timestamp(t0), 1L, "click", 30.0, "{}"),
      (2L, new Timestamp(t0), 1L, "click", 10.0, "{}"),
      (7L, new Timestamp(t0 + 1000), 1L, "click", 99.0, "{}"),
      (9L, new Timestamp(t0 + 2000), 1L, "click", 20.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = EventOps.ohlc(spark, d).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Double]("open") === 10.0)   // id 2, not id 5
    assert(row.getAs[Double]("high") === 99.0)
    assert(row.getAs[Double]("low") === 10.0)
    assert(row.getAs[Double]("close") === 20.0)
    assert(row.getAs[Long]("n_events") === 4L)
  }

  test("bfs: cycles, diamond shortcuts, unreachable nodes, hop cap") {
    import spark.implicits._
    // 0-1-2-3-0 cycle, diamond 1-4 / 2-4, chain 4-5-6, island 9-10
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (1L, 4L),
      (2L, 4L), (4L, 5L), (5L, 6L), (9L, 10L))
    val edges = (und ++ und.map(e => (e._2, e._1))).toDF("src", "dst")
    val got = CoreOps.bfsFrom(edges, 0L, maxHops = 8).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(0L -> 0, 1L -> 1, 3L -> 1, 2L -> 2, 4L -> 2,
      5L -> 3, 6L -> 4), s"wrong distances: $got")
    // hop cap truncates the frontier, never corrupts settled nodes
    val capped = CoreOps.bfsFrom(edges, 0L, maxHops = 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(capped === got.filter(_._2 <= 2))
  }

  test("ab_ttest: arms partition each group; t sign follows the mean gap") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = EventOps.abTtest(spark, sfDir).collect()
    val totals = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === totals(r.getString(0)))
      val gap = r.getDouble(3) - r.getDouble(4)
      val t = r.getDouble(5)
      assert(math.signum(gap) === math.signum(t) || gap == 0.0,
        s"t sign disagrees with mean gap in $r")
      assert(!t.isInfinite, s"degenerate t in $r")
      assert(r.getDouble(6) > 0.0, s"nonpositive Welch df in $r")
    }
  }

  private def syntheticEvents(evs: Seq[(Long, Long, Long, Double)],
      parts: Int): org.apache.spark.sql.DataFrame = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    evs.toDF("user_id", "event_id", "ts_us", "value")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("ts_us")).as("ts"), col("value"))
      .repartition(parts)
  }

  private def driverEwma(evs: Seq[(Long, Long, Long, Double)], alpha: Double)
      : Map[(Long, Long), Double] =
    evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      var prev = 0.0; var first = true
      es.sortBy(e => (e._3, e._2)).map { case (u, id, _, x) =>
        prev = if (first) { first = false; x } else alpha * x + (1 - alpha) * prev
        (u, id) -> prev
      }
    }.toMap

  test("affineScan: single-chunk histories are BIT-identical to the fold") {
    val evs = (0 until 4).flatMap { u =>
      (0 until 50).map(i =>
        (u.toLong, i.toLong, i.toLong * 1000000L, math.sin(u * 100 + i) * 37.5))
    }
    val df = syntheticEvents(evs, 7)
    // chunk width far above the whole span -> one chunk per user
    val got = EventOps.affineScanOf(df, EventOps.EwmaRec(0.2), 1L << 60)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val want = driverEwma(evs, 0.2)
    assert(got.size === want.size)
    want.foreach { case (k, v) => assert(got(k) === v, s"bit mismatch at $k") }
  }

  test("affineScan: partition-invariant bitwise under adversarial partitionings") {
    val evs = (0 until 6).flatMap { u =>
      (0 until 80).map(i =>
        (u.toLong, i.toLong, i.toLong * 500000L, math.cos(u * 31 + i) * 12.25))
    }
    // multi-chunk on purpose: W = 5 s of event time over a 40 s span
    val w = 5000000L
    val ref = EventOps.affineScanOf(syntheticEvents(evs, 1),
        EventOps.HoltRec(0.5, 0.25), w)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    for (parts <- Seq(2, 13)) {
      val got = EventOps.affineScanOf(
          syntheticEvents(scala.util.Random.shuffle(evs), parts),
          EventOps.HoltRec(0.5, 0.25), w)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getDouble(2), r.getDouble(3)))).toMap
      assert(got === ref, s"partitioning $parts changed the scan output")
    }
  }

  test("affineScan: multi-chunk carries stay within the contraction bound") {
    // adversarial: every event its own chunk (W=1us of event time) ->
    // the ENTIRE chain runs through composed carries
    val evs = (0 until 5).flatMap { u =>
      (0 until 200).map(i =>
        (u.toLong, i.toLong, i.toLong * 1000000L,
          math.sin(u * 7 + i * 1.3) * 1000.0))
    }
    val df = syntheticEvents(evs, 5)
    val gotE = EventOps.affineScanOf(df, EventOps.EwmaRec(0.2), 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val wantE = driverEwma(evs, 0.2)
    wantE.foreach { case (k, v) =>
      assert(math.abs(gotE(k) - v) < 1e-9 * math.max(1.0, math.abs(v)),
        s"ewma drift at $k: ${gotE(k)} vs $v") }
    // Holt, same adversarial chunking, two-state bound
    val gotH = EventOps.affineScanOf(df, EventOps.HoltRec(0.5, 0.25), 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    evs.groupBy(_._1).foreach { case (_, es) =>
      var level = 0.0; var trend = 0.0; var first = true
      es.sortBy(e => (e._3, e._2)).foreach { case (u, id, _, x) =>
        if (first) { first = false; level = x; trend = 0.0 }
        else {
          val prev = level
          level = 0.5 * x + 0.5 * (level + trend)
          trend = 0.25 * (level - prev) + 0.75 * trend
        }
        val (gl, gt) = gotH((u, id))
        assert(math.abs(gl - level) < 1e-9 * math.max(1.0, math.abs(level)) &&
          math.abs(gt - trend) < 1e-9 * math.max(1.0, math.abs(trend)),
          s"holt drift at ($u,$id): ($gl,$gt) vs ($level,$trend)")
      }
    }
  }

  test("affineScan: first-event reset lands in the user's earliest chunk") {
    // users whose first event sits just before a chunk boundary, so the
    // reset and the boundary interact; also a single-event user
    val evs = Seq(
      (1L, 0L, 999999L, 42.0), (1L, 1L, 1000001L, -7.0), (1L, 2L, 2500000L, 3.0),
      (2L, 0L, 5000000L, 11.0))
    val got = EventOps.affineScanOf(syntheticEvents(evs, 3),
        EventOps.EwmaRec(0.2), 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val want = driverEwma(evs, 0.2)
    assert(got.size === want.size)
    want.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 1e-12, s"reset mismatch at $k") }
  }

  test("scanGate: all booleans true on the corpus") {
    val r = EventOps.scanGate(SparkTestSession.spark, "/root/testdata/sf0.001").head()
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2),
      s"scan gate failed: $r")
    assert(r.getLong(3) > 0)
  }

  test("holt: two-state recurrence matches a driver-side fold per user") {
    val sfDir = "/root/testdata/sf0.001"
    val got = EventOps.holt(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    val want = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).toSeq.flatMap { case (_, evs) =>
        var level = 0.0; var trend = 0.0; var first = true
        evs.sortBy(e => (e._3, e._2)).map { case (u, id, _, x) =>
          if (first) { first = false; level = x; trend = 0.0 }
          else {
            val prev = level
            level = 0.5 * x + 0.5 * (level + trend)
            trend = 0.25 * (level - prev) + 0.75 * trend
          }
          (u, id) -> ((level, trend))
        }
      }.toMap
    assert(got.size === want.size)
    // unrounded output: the typed fold must be BIT-identical
    want.foreach { case (k, (l, t)) =>
      assert(got(k) === ((l, t)), s"mismatch at $k: ${got(k)} vs ($l, $t)") }
  }

  test("ewma: recurrence matches a driver-side fold per user") {
    val sfDir = "/root/testdata/sf0.001"
    val got = EventOps.ewma(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val want = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).toSeq.flatMap { case (_, evs) =>
        var prev = 0.0; var first = true
        evs.sortBy(e => (e._3, e._2)).map { case (u, id, _, x) =>
          prev = if (first) { first = false; x } else 0.2 * x + 0.8 * prev
          // same HALF_UP decimal rounding as Spark's round() on doubles
          (u, id) -> java.math.BigDecimal.valueOf(prev)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        }
      }
    assert(got.size === want.size)
    want.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 1e-9, s"mismatch at $k: ${got(k)} vs $v") }
  }
}
