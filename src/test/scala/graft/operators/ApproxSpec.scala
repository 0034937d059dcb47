package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Sketch-based aggregates (declared built-in surface, SURVEY §2.4):
  * approx_count_distinct's HLL++ must land within its rsd bound —
  * at 100 TB it replaces exact distinct's full shuffle with a
  * fixed-size mergeable sketch per partition. */
class ApproxSpec extends SparkSpec {
  test("approx_count_distinct within 5% of exact") {
    val r = Tables.lineitem(spark, sfDir)
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .collect().head
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("approx_percentile brackets the exact median") {
    val r = Tables.orders(spark, sfDir)
      .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("ap"),
        expr("median(o_totalprice)").as("ex"))
      .collect().head
    val ap = r.getDouble(0); val ex = r.getDouble(1)
    assert(math.abs(ap - ex) / ex < 0.05, s"approx median $ap vs exact $ex")
  }

  test("count-min gate holds: bounds, and merged == direct exactly") {
    val r = graft.functions.Gates.countMinGate(spark, sfDir).head()
    assert(r.getBoolean(0), "merged sketch broke the CMS bound")
    assert(r.getBoolean(1), "direct sketch broke the CMS bound")
    assert(r.getBoolean(2), "per-month merge diverged from one-pass sketch")
  }

  test("sliding 7-day distinct: windowed sketch union tracks the exact referee") {
    val r = graft.functions.Gates.slidingDistinctGate(spark, sfDir).head()
    assert(r.getBoolean(0),
      "a day's windowed HLL-union estimate left the relative-error band")
    assert(r.getLong(1) > 5, "too few days to exercise the rolling window")
  }

  test("heavy hitters: exact and partition-invariant on adversarial skew") {
    import spark.implicits._
    // 3 hot keys (300/200/150 of 1000 rows), 350 singletons; phi=0.1
    // ⇒ threshold 100 ⇒ exactly the 3 hot keys qualify. Interleave the
    // hot keys with singleton noise so SpaceSaving evicts constantly.
    val rows: Seq[Long] =
      (0 until 300).map(_ => 1L) ++ (0 until 200).map(_ => 2L) ++
        (0 until 150).map(_ => 3L) ++ (0 until 350).map(i => 1000L + i)
    val shuffled = new scala.util.Random(7).shuffle(rows)
    val want = Map(1L -> 300L, 2L -> 200L, 3L -> 150L)
    for (nPart <- Seq(1, 2, 7, 16)) {
      val ds = spark.sparkContext.parallelize(shuffled, nPart).toDS()
      val got = CoreOps.heavyHittersOf(ds, 0.1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"wrong hitter set at $nPart partitions")
    }
  }

  test("heavy hitters: exact-threshold key spread evenly survives nomination") {
    import spark.implicits._
    // the strict-inequality boundary: key 1 has EXACTLY ceil(phi*N)
    // occurrences (100 of N=1000 at phi=0.1) spread exactly evenly —
    // 10 per partition, arriving LAST after 90 singletons have filled
    // and churned the sketch. cap = floor(1/phi)+1 makes n_p/cap
    // strictly below the local count, so retention is guaranteed;
    // at cap = 1/phi exactly, this construction could evict it.
    val perPart = (0 until 10).map { p =>
      (0 until 90).map(i => 10000L + p * 90 + i) ++ Seq.fill(10)(1L)
    }
    val rdd = spark.sparkContext.makeRDD(
      perPart.map(_.toSeq), 10).flatMap(identity)
    val got = CoreOps.heavyHittersOf(rdd.toDS(), 0.1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 100L), s"boundary key lost: $got")
  }

  test("hll intersection gate: bounds hold, referee matches direct count") {
    val r = graft.functions.Gates.hllIntersectionGate(spark, sfDir).head()
    val direct = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "view"))
      .groupBy(col("user_id"))
      .agg(countDistinct(col("event_type")).as("nt"))
      .filter(col("nt") === 2).count()
    assert(r.getLong(0) === direct)
    assert(r.getBoolean(1), "inclusion-exclusion estimate out of bound")
    assert(r.getBoolean(2), "union estimate out of bound")
  }
}
