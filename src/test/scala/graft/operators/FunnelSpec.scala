package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins the funnel's step-ordering semantics — the whole point of the
  * operator is that a click only counts AT OR AFTER the user's first
  * view, and a purchase at or after that click. Each case here is an
  * ordering an unordered count-per-type query would get wrong.
  */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ev(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.map { case (user, tMs, typ) =>
      (user * 1000 + tMs, new Timestamp(1700000000000L + tMs * 1000),
        user, typ, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def counts(df: org.apache.spark.sql.DataFrame) = {
    val r = EventOps.funnelOf(df).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("click strictly before the first view does not convert") {
    val d = ev((1L, 10L, "click"), (1L, 20L, "view"))
    assert(counts(d) == ((1L, 1L, 0L, 0L)))
  }

  test("click at exactly the first-view timestamp converts (inclusive)") {
    val d = ev((1L, 10L, "view"), (1L, 10L, "click"))
    assert(counts(d) == ((1L, 1L, 1L, 0L)))
  }

  test("purchase between view and first valid click does not complete") {
    // view@10, purchase@15, click@20: purchase precedes t2=20 -> no full funnel
    val d = ev((1L, 10L, "view"), (1L, 15L, "purchase"), (1L, 20L, "click"))
    assert(counts(d) == ((1L, 1L, 1L, 0L)))
  }

  test("full ordered funnel completes; first-touch view is the anchor") {
    // views at 50 and 10 -> t1=10; click@20 >= 10 counts; purchase@30 >= 20
    val d = ev((1L, 50L, "view"), (1L, 10L, "view"),
      (1L, 20L, "click"), (1L, 30L, "purchase"))
    assert(counts(d) == ((1L, 1L, 1L, 1L)))
  }

  test("users without a view still count as users, nothing else") {
    val d = ev((1L, 10L, "click"), (1L, 20L, "purchase"),
      (2L, 10L, "view"))
    assert(counts(d) == ((2L, 1L, 0L, 0L)))
  }

  test("steps can share one timestamp all the way through") {
    val d = ev((1L, 10L, "view"), (1L, 10L, "click"), (1L, 10L, "purchase"))
    assert(counts(d) == ((1L, 1L, 1L, 1L)))
  }

  test("funnel plan shuffles once: a single user_id exchange feeds all stages") {
    val plan = EventOps.funnelOf(
      ev((1L, 10L, "view"), (2L, 20L, "click")))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // one hash exchange on user_id (+ the final SinglePartition for the
    // global count, which is not a hashpartitioning)
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$plan")
  }

  test("topPaths orders by time with event_id tie-break; short paths kept") {
    import spark.implicits._
    val rows = Seq(
      // user 1: arrival order differs from time order -> "view>click>error"
      (10L, 2000L, 1L, "click"), (11L, 1000L, 1L, "view"),
      (12L, 3000L, 1L, "error"), (13L, 4000L, 1L, "signup"), // 4th: dropped
      // user 2: ts tie at 1000 broken by event_id -> "view>click"
      (21L, 1000L, 2L, "view"), (22L, 1000L, 2L, "click"),
      // user 3: same shape as user 2
      (31L, 1000L, 3L, "view"), (32L, 1000L, 3L, "click")
    ).map { case (eid, ms, u, ty) =>
      (eid, new Timestamp(1700000000000L + ms), u, ty, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_paths").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.topPaths(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("view>click", 2L), ("view>click>error", 1L)))
  }

  test("transition probabilities sum to 1 per source type; pairs follow time") {
    import spark.implicits._
    // user 1: A@1 -> B@2 -> A@3 (written out of order); user 2: A@1 -> A@2
    val rows = Seq(
      (3L, 3000L, 1L, "A"), (1L, 1000L, 1L, "A"), (2L, 2000L, 1L, "B"),
      (11L, 1000L, 2L, "A"), (12L, 2000L, 2L, "A")
    ).map { case (eid, ms, u, ty) =>
      (eid, new Timestamp(1700000000000L + ms), u, ty, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_trans").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.transitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // from A: ->B once (user1 A@1->B@2), ->A once (user2): p=0.5 each
    assert(out(("A", "B")) == ((1L, 0.5)))
    assert(out(("A", "A")) == ((1L, 0.5)))
    // from B: ->A once (user1 B@2->A@3): p=1
    assert(out(("B", "A")) == ((1L, 1.0)))
    assert(out.size == 3)
  }

  test("gapFill densifies the full type x day grid with explicit zeros") {
    import spark.implicits._
    val day = 86400000L
    val base = 1700006400000L // day 0, 00:00 UTC
    // type A on days 0 and 3 (gap days 1-2); type B only on day 1
    val rows = Seq(
      (401L, base, "A"), (802L, base + 3 * day, "A"),
      (1203L, base + day, "B"),
      (7L, base + 9 * day, "C") // NOT divisible by 401: thinned out
    ).map { case (eid, ms, ty) =>
      (eid, new Timestamp(ms), 1L, ty, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_gap").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.gapFill(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    // span = days 0..3 (C's day-9 event was thinned away), 2 types x 4 days
    assert(out.length == 8)
    val m = out.map(t => (t._1, t._2) -> t._3).toMap
    assert(m(("A", "2023-11-15")) == 1L && m(("A", "2023-11-18")) == 1L)
    assert(m(("A", "2023-11-16")) == 0L && m(("A", "2023-11-17")) == 0L)
    assert(m(("B", "2023-11-16")) == 1L)
    assert(out.count { case (_, _, n) => n == 0L } == 5)
  }

  test("retention counts day offsets across UTC midnight correctly") {
    import spark.implicits._
    val base = 1700006400000L // 2023-11-15 00:00:00 UTC
    val rows = Seq(
      // user 1: first active 23:59 on day D — 62 s later is already
      // D+1 (day offset by calendar day, not 24h elapsed); returns
      // again at exactly D+7 00:01 and at D+8 (which must NOT count)
      (1L, new Timestamp(base + 86340000L)),
      (2L, new Timestamp(base + 86400000L + 60000L)),
      (3L, new Timestamp(base + 7L * 86400000L + 60000L)),
      (4L, new Timestamp(base + 8L * 86400000L + 60000L)),
      // user 2: a separate cohort 3 days later, active once
      (10L, new Timestamp(base + 3L * 86400000L))
    ).map { case (id, ts) => (id, ts, if (id < 10) 1L else 2L, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_ret").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.retention(spark, dir)
      .orderBy("cohort_day").collect()
    assert(out.length == 2)
    val Array(c1, c2) = out
    assert(c1.getLong(1) == 1L && c1.getLong(2) == 1L && c1.getLong(3) == 1L,
      s"cohort 1 (n_users, d1, d7) was $c1")
    assert(c2.getLong(1) == 1L && c2.getLong(2) == 0L && c2.getLong(3) == 0L,
      s"cohort 2 (n_users, d1, d7) was $c2")
  }
}
