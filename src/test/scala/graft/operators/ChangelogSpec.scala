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
