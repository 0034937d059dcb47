package graft.operators

import org.apache.spark.sql.functions._

/** Diagnostic mains (not specs) behind the affineScan precision and
  * scale numbers recorded in BASELINE.md.
  *
  * [[ScanParityCheck]] measures composed-carry deviation of the
  * chunked scan vs the single-task fold on the real corpus at the
  * 6-decimal canonicalization the oracle compare applies — the
  * evidence behind EWMA's 1-day vs Holt's 90-day default chunk.
  *
  * [[ScanHotUserProbe]] runs ONE user with 10⁶ events (the history
  * the single-task fold can only hold by luck) through the scan at
  * 1000-chunk granularity and verifies it against the fold.
  * Run: sbt "Test/runMain graft.operators.ScanParityCheck" /
  *      sbt "Test/runMain graft.operators.ScanHotUserProbe". */
object ScanParityCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestSession.spark
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val w = EventOps.DefaultChunkMicros
      val se = EventOps.affineScan(spark, d, EventOps.EwmaRec(0.2), w)
        .select(col("user_id"), col("event_id"), round(col("s0"), 6).as("a"))
      val fe = EventOps.ewmaFold(spark, d)
        .select(col("user_id"), col("event_id"), round(col("s0"), 6).as("b"))
      val de = se.join(fe, Seq("user_id", "event_id"))
        .select(max(abs(col("a") - col("b"))).as("maxd"),
          sum(when(col("a") =!= col("b"), 1L).otherwise(0L)).as("flips"))
        .head()
      println(s"$sf EWMA @1d rounded: maxDiff=${de.getDouble(0)} flips=${de.getLong(1)}")
      val sh = EventOps.affineScan(spark, d, EventOps.HoltRec(0.5, 0.25), w)
        .select(col("user_id"), col("event_id"),
          col("s0").as("l1"), col("s1").as("t1"))
      val fh = EventOps.holtFold(spark, d)
        .select(col("user_id"), col("event_id"),
          col("s0").as("l2"), col("s1").as("t2"))
      val j = sh.join(fh, Seq("user_id", "event_id")).cache()
      val bit = j.filter(col("l1") =!= col("l2") || col("t1") =!= col("t2")).count()
      def canon(c: org.apache.spark.sql.Column) = round(c, 6)
      val flips = j.filter(canon(col("l1")) =!= canon(col("l2")) ||
        canon(col("t1")) =!= canon(col("t2"))).count()
      val maxd = j.select(max(greatest(abs(col("l1") - col("l2")),
        abs(col("t1") - col("t2"))))).head().getDouble(0)
      println(s"$sf HOLT @1d: bitDiffs=$bit round6Flips=$flips maxDiff=$maxd")
      j.unpersist()
    }
    spark.stop()
  }
}

object ScanHotUserProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val n = 1000000
    // one user, 10⁶ events, 1 second apart -> ~11.6 event-days;
    // W = 1000 s gives ~1000 chunks of ~1000 events each
    val w = 1000L * 1000000L
    val ev = spark.range(n.toLong)
      .select(lit(7L).as("user_id"), col("id").as("event_id"),
        timestamp_micros(col("id") * 1000000L).as("ts"),
        (sin(col("id").cast("double") * 0.37) * 100.0).as("value"))
      .repartition(8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ev.count()
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (scanOut, tScan) = time {
      EventOps.affineScanOf(ev.toDF(), EventOps.EwmaRec(0.2), w)
        .select(col("event_id"), col("s0")).collect()
    }
    println(f"scan:  $tScan%.2f s, rows=${scanOut.length}")
    // fold referee: whole history in ONE task (works at 10⁶; the point
    // of the scan is that it never has to)
    val (foldOut, tFold) = time {
      ev.select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("value"))
        .as[(Long, Long, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (_, it) =>
          val evs = it.toArray.sortBy(e => (e._3, e._2))
          var prev = 0.0; var first = true
          evs.iterator.map { case (_, id, _, x) =>
            prev = if (first) { first = false; x } else 0.2 * x + 0.8 * prev
            (id, prev)
          }
        }.collect()
    }
    println(f"fold:  $tFold%.2f s, rows=${foldOut.length}")
    val f = foldOut.toMap
    var maxd = 0.0
    scanOut.foreach { r =>
      val d = math.abs(r.getDouble(1) - f(r.getLong(0)))
      if (d > maxd) maxd = d
    }
    println(s"maxAbsDiff=$maxd (contraction bound ~1e-13 at |v|~100)")
    assert(maxd < 1e-9, "hot-user scan diverged from fold")
    spark.stop()
  }
}
