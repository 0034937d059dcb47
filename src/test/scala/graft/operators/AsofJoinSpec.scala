package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the as-of join's tie/boundary semantics — the subtleties a
  * DuckDB ASOF LEFT JOIN oracle also enforces at the query level
  * (`asof_purchase_attribution`), checked here on hand-built frames
  * where every edge case is explicit. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // right side: clicks for user 1 at 10:00 (ids 100, 101 — a tie),
  // 10:30 (id 102); user 2 has no clicks at all
  private def clicks = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100L),
    (1L, ts("2024-01-01 10:00:00"), 101L),
    (1L, ts("2024-01-01 10:30:00"), 102L)
  ).toDF("user_id", "click_ts", "click_id")

  private def run(purchases: Seq[(Long, Long, Timestamp)]) =
    AsofJoin.asofJoin(
      purchases.toDF("purchase_id", "user_id", "ts"), clicks,
      key = "user_id", leftTs = "ts", rightTs = "click_ts",
      rightTie = "click_id", rightCols = Seq("click_id", "click_ts"))
      .select(col("purchase_id"), col("click_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("as-of is inclusive: a right row at exactly the left ts matches") {
    val got = run(Seq((7L, 1L, ts("2024-01-01 10:30:00"))))
    assert(got(7L) === Some(102L))
  }

  test("most recent prior right row wins, not the first") {
    val got = run(Seq((8L, 1L, ts("2024-01-01 11:00:00"))))
    assert(got(8L) === Some(102L))
  }

  test("multiple right rows at the same (key, ts): max tie-column wins") {
    val got = run(Seq((9L, 1L, ts("2024-01-01 10:10:00"))))
    assert(got(9L) === Some(101L))
  }

  test("no prior right row (or no right rows at all for the key) -> null") {
    val got = run(Seq(
      (10L, 1L, ts("2024-01-01 09:00:00")), // before every click
      (11L, 2L, ts("2024-01-01 12:00:00")))) // user with zero clicks
    assert(got(10L) === None)
    assert(got(11L) === None)
  }

  test("left rows are never lost or duplicated (left-asof cardinality)") {
    val purchases = Seq(
      (20L, 1L, ts("2024-01-01 09:00:00")),
      (21L, 1L, ts("2024-01-01 10:00:00")),
      (22L, 1L, ts("2024-01-01 10:00:00")), // two lefts at same ts
      (23L, 2L, ts("2024-01-01 10:00:00")))
    val out = run(purchases)
    assert(out.keySet === Set(20L, 21L, 22L, 23L))
    assert(out(21L) === Some(101L) && out(22L) === Some(101L))
  }

  test("purchaseAttribution gap is non-negative and null iff unmatched") {
    val df = AsofJoin.purchaseAttribution(spark, sfDir)
    val bad = df.filter(
      (col("click_id").isNotNull && col("gap_us") < 0) ||
        (col("click_id").isNull =!= col("gap_us").isNull)).count()
    assert(bad === 0)
    assert(df.count() > 0)
  }

  // ---- forward variant: next right row at-or-after the left ts ----

  private def runFwd(lefts: Seq[(Long, Long, Timestamp)]) =
    AsofJoin.asofJoinForward(
      lefts.toDF("probe_id", "user_id", "ts"), clicks,
      key = "user_id", leftTs = "ts", rightTs = "click_ts",
      rightTie = "click_id", rightCols = Seq("click_id", "click_ts"))
      .select(col("probe_id"), col("click_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("forward as-of is inclusive and takes the EARLIEST following row") {
    val got = runFwd(Seq(
      (1L, 1L, ts("2024-01-01 10:30:00")), // exactly at a click
      (2L, 1L, ts("2024-01-01 10:10:00")), // between clicks -> 10:30 one
      (3L, 1L, ts("2024-01-01 09:00:00")))) // before all -> first (tie)
    assert(got(1L) === Some(102L))
    assert(got(2L) === Some(102L))
    assert(got(3L) === Some(101L)) // equal-ts rights: max tie wins
  }

  test("forward as-of: no following right row (or no rows for key) -> null") {
    val got = runFwd(Seq(
      (4L, 1L, ts("2024-01-01 11:00:00")), // after every click
      (5L, 2L, ts("2024-01-01 09:00:00")))) // user with zero clicks
    assert(got(4L) === None)
    assert(got(5L) === None)
  }

  test("clickNextPurchase: gap within [0, tolerance], null parity, left cardinality") {
    val df = AsofJoin.clickNextPurchase(spark, sfDir)
    val tol = 12L * 3600 * 1000000
    val bad = df.filter(
      (col("purchase_id").isNotNull &&
        (col("gap_us") < 0 || col("gap_us") > tol)) ||
        (col("purchase_id").isNull =!= col("gap_us").isNull)).count()
    assert(bad === 0)
    val nClicks = graft.Tables.events(spark, sfDir)
      .filter(col("event_type") === "click").count()
    assert(df.count() === nClicks) // every click survives, matched or not
  }

  test("forward as-of plans as union+window: no join operator at all") {
    val plan = AsofJoin.clickNextPurchase(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"forward as-of grew a join:\n$plan")
  }

  test("nearest as-of: closer side wins, backward wins exact ties") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("asofnear").toString
    val t0 = 1700000000000L
    def ev(id: Long, offMs: Long, typ: String) =
      (id, new Timestamp(t0 + offMs), 1L, typ, 1.0, "{}")
    Seq(
      ev(1, 1000, "purchase"),  // 4s before click A
      ev(2, 5000, "click"),     // A: nearest is purchase id 3 (+2s fwd)
      ev(3, 7000, "purchase"),
      ev(4, 20000, "click"),    // B: equidistant 3s both ways -> backward
      ev(5, 17000, "purchase"),
      ev(6, 23000, "purchase"),
      ev(7, 90000, "click"),    // C: only earlier purchases exist
      (8L, new Timestamp(t0), 2L, "click", 1.0, "{}")) // D: user 2, no purchase
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = AsofJoin.clickNearestPurchase(spark, d).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None
        else Some((r.getLong(3), r.getLong(5))))).toMap
    assert(got === Map(
      2L -> Some((3L, 2000000L)),   // forward, +2s
      4L -> Some((5L, -3000000L)),  // tie -> backward, -3s
      7L -> Some((6L, -67000000L)), // only backward available
      8L -> None))
  }
}
