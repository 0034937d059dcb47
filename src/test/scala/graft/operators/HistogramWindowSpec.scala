package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

class HistogramWindowSpec extends SparkSpec {
  test("a17 histogram buckets partition the table and respect bin ranges") {
    val h = CoreOps.a17Histogram(spark, sfDir)
    assert(h.agg(sum("n_orders")).head.getLong(0) ===
      Tables.orders(spark, sfDir).count())
    val bad = h.filter(col("bucket") < 0 || col("bucket") > 19 ||
      col("lo") > col("hi") ||
      // an interior bucket's observed range stays inside its bin;
      // bucket 19 is the open-ended clamp so only its floor holds
      (col("bucket") < 19 && (col("lo") < col("bucket") * 30000.0 ||
        col("hi") >= (col("bucket") + 1) * 30000.0)) ||
      (col("bucket") === 19 && col("lo") < 19 * 30000.0))
    assert(bad.count() === 0)
  }

  test("w5 RANGE frame: same-day peers share one value; 7-day boundary exact") {
    import spark.implicits._
    def ts(day: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf("1995-01-01").getTime + day * 86400000L)
    // customer 1: orders on days 0, 0 (peer pair), 6, 7
    val rows = Seq(
      (101L, 1L, ts(0), 10.0), (102L, 1L, ts(0), 20.0),
      (103L, 1L, ts(6), 5.0), (104L, 1L, ts(7), 1.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graft_w5").toString
    rows.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = CoreOps.w5RangeFrame(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // day-0 peers BOTH see 30 (RANGE includes ties, unlike ROWS)
    assert(out(101L) == 30.0 && out(102L) == 30.0)
    // day 6 is within 6 days of day 0: 10+20+5
    assert(out(103L) == 35.0)
    // day 7 no longer sees day 0, only days 1..7: 5+1
    assert(out(104L) == 6.0)
  }

  test("ev_anomaly flags exactly the values beyond k sigma") {
    import spark.implicits._
    // type A: three 10s and one 100 -> mean 32.5, sigma ~38.97:
    // at k=1 only the 100 deviates (67.5 > 38.97); at k=3 nothing does
    val rows = Seq(10.0, 10.0, 10.0, 100.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000), 1L, "A", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_anom").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    def anomalies(k: Double) =
      EventOps.anomalyZscore(spark, dir, k).head().getLong(3)
    assert(anomalies(1.0) == 1L)
    assert(anomalies(3.0) == 0L)
  }

  test("a19 correlation lands in [-1,1] and matches a direct computation") {
    val rows = CoreOps.a19Corr(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0 && c <= 1.0, s"corr out of range: $r")
    }
    // direct single-threaded check for one group
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select("l_quantity", "l_extendedprice").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val n = li.length.toDouble
    val (sx, sy) = (li.map(_._1).sum, li.map(_._2).sum)
    val sxy = li.map(t => t._1 * t._2).sum
    val sxx = li.map(t => t._1 * t._1).sum
    val syy = li.map(t => t._2 * t._2).sum
    val want = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val got = rows.find(_.getString(0) == "R").get.getDouble(2)
    assert(math.abs(got - want) < 1e-4, s"engine $got vs direct $want")
  }

  test("a20 mode takes the most frequent value, smallest on ties") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_mode").toString
    // group G: B x2, A x2 (tie -> A); group H: Z x1
    Seq(("G", "B"), ("G", "B"), ("G", "A"), ("G", "A"), ("H", "Z"))
      .zipWithIndex.map { case ((g, v), i) =>
        (i.toLong, i.toLong, g, new java.sql.Timestamp(0L), v, 0.0, "k")
      }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
        "o_orderpriority", "o_totalprice", "o_comment")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val out = CoreOps.a20Mode(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out("G") == (("A", 2L)))
    assert(out("H") == (("Z", 1L)))
  }

  test("w4 ntile quartiles are balanced; lead gaps match the desc order") {
    val w = CoreOps.w4NtileLead(spark, sfDir)
    // tile sizes within a segment differ by at most 1 and all 4 exist
    val spread = w.groupBy("c_mktsegment", "quartile").count()
      .groupBy("c_mktsegment")
      .agg((max("count") - min("count")).as("spread"),
        countDistinct("quartile").as("nq"))
    assert(spread.filter(col("spread") > 1 || col("nq") =!= 4).count() === 0)
    // descending order means every gap to the next row is >= 0, and
    // exactly the last row of each segment has no successor
    assert(w.filter(col("gap_next") < 0).count() === 0)
    assert(w.filter(col("gap_next").isNull).count() ===
      w.select("c_mktsegment").distinct().count())
  }

  test("a28 winsorized mean: clipping bounds hold, mean between p05 and p95") {
    val pct = Tables.lineitem(spark, sfDir).groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.05)").as("p05"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    CoreOps.a28WinsorizedMean(spark, sfDir).collect().foreach { r =>
      val (p05, p95) = pct(r.getString(0))
      val m = r.getDouble(3)
      assert(m >= p05 && m <= p95, s"winsorized mean $m outside [$p05,$p95]")
      // ~10% of each group sits outside the 5th..95th percentile band
      val frac = r.getLong(2).toDouble / r.getLong(1)
      assert(frac > 0.05 && frac < 0.15, s"clip fraction $frac implausible")
    }
  }

  test("a31 weighted median: crossing row, heavy tail, exact-half tie") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("wmed").toString
    Seq(
      // group A: weights 1,1,10 -> total 12, crossing at value 3.0
      ("A", 1.0, 1L, 1, 1.0), ("A", 2.0, 2L, 1, 1.0), ("A", 3.0, 3L, 1, 10.0),
      // group B: heavy head 5,1,1 -> crossing at the FIRST value
      ("B", 1.0, 4L, 1, 5.0), ("B", 2.0, 5L, 1, 1.0), ("B", 3.0, 6L, 1, 1.0),
      // group C: exact half at row 1 (2*1 >= 2) -> lower value wins
      ("C", 10.0, 7L, 1, 1.0), ("C", 20.0, 8L, 1, 1.0))
      .toDF("l_returnflag", "l_extendedprice", "l_orderkey",
        "l_linenumber", "l_quantity")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val got = CoreOps.a31WeightedMedian(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got === Map("A" -> ((3.0, 12L)), "B" -> ((1.0, 7L)),
      "C" -> ((10.0, 2L))), s"wrong weighted medians: $got")
  }

  test("w11 islands: consecutive days merge, any silent day splits") {
    val rows = CoreOps.w11GapsIslands(spark, sfDir).collect()
    // island internal consistency: span == n_days (no gap inside)
    rows.foreach { r =>
      val span = r.getDate(2).toLocalDate.toEpochDay -
        r.getDate(1).toLocalDate.toEpochDay + 1
      assert(span === r.getLong(3), s"gap inside island $r")
    }
    // islands of one user never touch: next start > prior end + 1
    rows.groupBy(_.getLong(0)).foreach { case (_, is) =>
      val sorted = is.sortBy(_.getDate(1).toLocalDate.toEpochDay).toSeq
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        assert(pair(1).getDate(1).toLocalDate.toEpochDay >
          pair(0).getDate(2).toLocalDate.toEpochDay + 1, "adjacent islands")
      }
    }
    // total island days == distinct (user, day) pairs
    val tot = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts"))).distinct().count()
    assert(rows.map(_.getLong(3)).sum === tot)
  }
}
