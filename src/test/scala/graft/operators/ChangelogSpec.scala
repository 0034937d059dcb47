package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The max_by compaction must pick the unique latest row per key —
  * including the tie rule (equal ts → max event_id) the oracle
  * mirrors — and must not depend on input partitioning. */
class ChangelogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ev(rows: Seq[(Long, Long, Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ms", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_millis(col("ms")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
  }

  test("latest row per key; equal-ts ties go to max event_id") {
    val df = ev(Seq(
      (1L, 1000L, 7L, "a", 1.0),
      (2L, 2000L, 7L, "b", 2.0),   // later ts wins...
      (3L, 2000L, 7L, "c", 3.0),   // ...and on equal ts, higher id
      (9L, 500L, 8L, "z", 9.0)))   // single-row key passes through
    val got = Changelog.latestByKeyOf(df)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
      .toSet
    assert(got === Set((7L, 3L, "c"), (8L, 9L, "z")))
  }

  test("scd2: consecutive equal values collapse; intervals chain; last is open") {
    val df = ev(Seq(
      (1L, 1000L, 7L, "a", 0.0),
      (2L, 2000L, 7L, "a", 0.0),  // same value -> absorbed into v1
      (3L, 3000L, 7L, "b", 0.0),  // change -> v2
      (4L, 4000L, 7L, "a", 0.0))) // back to a -> v3 (history, not dedup)
    val got = Changelog.scd2IntervalsOf(df)
      .collect().map(r => (r.getInt(2),
        (r.getString(1), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(got(1) === (("a", 1000000L, Some(3000000L))))
    assert(got(2) === (("b", 3000000L, Some(4000000L))))
    assert(got(3) === (("a", 4000000L, None)))
  }

  test("scd2: equal-ts changes order by event_id; null values versionize") {
    val base = Seq(
      (1L, 1000L, 7L, "a", 0.0),
      (2L, 1000L, 7L, "b", 0.0)) // same ts: id order decides a -> b
    val got = Changelog.scd2IntervalsOf(ev(base)).collect()
      .map(r => (r.getInt(2), r.getString(1))).toMap
    assert(got === Map(1 -> "a", 2 -> "b"))

    import spark.implicits._
    val withNull = Seq((1L, 1000L, 7L, Some("a")), (2L, 2000L, 7L, None),
      (3L, 3000L, 7L, None), (4L, 4000L, 7L, Some("a")))
      .toDF("event_id", "ms", "user_id", "event_type")
      .select(col("event_id"), timestamp_millis(col("ms")).as("ts"),
        col("user_id"), col("event_type"))
    val vs = Changelog.scd2IntervalsOf(withNull).collect()
      .map(r => (r.getInt(2), Option(r.getString(1)))).toMap
    // a -> null -> a : three versions, the null run collapsed to one
    assert(vs === Map(1 -> Some("a"), 2 -> None, 3 -> Some("a")))
  }

  test("scd2: change filter reuses the sort — exactly one exchange") {
    val plan = Changelog.scd2Intervals(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val n = "Exchange".r.findAllIn(plan).size
    assert(n === 1, s"expected 1 exchange (shared across both windows), got $n:\n$plan")
  }

  test("mergeUpsert: unique keys, all actions legal, deletions really gone") {
    val sfDir = "/root/testdata/sf0.001"
    val df = Changelog.mergeUpsert(spark, sfDir).cache()
    try {
      val n = df.count()
      assert(df.select("user_id").distinct().count() === n)
      assert(df.filter(!col("action").isin("keep", "update", "insert"))
        .count() === 0)
      // reconstruct the delete set independently: latest second-half
      // event per user>=30 with value < 5 must NOT appear in the output
      val ev = graft.Tables.events(spark, sfDir)
      val r = ev.agg(min(unix_micros(col("ts"))),
        max(unix_micros(col("ts")))).head()
      val mid = (r.getLong(0) + r.getLong(1)) / 2
      val deleted = Changelog.latestByKeyOf(
        ev.filter(unix_micros(col("ts")) > mid && col("user_id") >= 30))
        .filter(col("value") < 5.0).select("user_id")
      assert(df.join(deleted, Seq("user_id"), "left_semi").count() === 0)
    } finally df.unpersist()
  }

  test("result is invariant to partitioning (map-side partial agg)") {
    val rows = (1L to 500L).map { i =>
      (i, (i * 37) % 100 * 1000, i % 13, s"t${i % 5}", i.toDouble)
    }
    val once = Changelog.latestByKeyOf(ev(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val shuffled = Changelog.latestByKeyOf(ev(rows).repartition(17))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(once === shuffled)
    assert(once.size === 13)
  }
}
