package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `truncate(w, col)` clustering (integer range-binning / string
  * prefix layout) and the dv-ratio compaction policy
  * (`min_deleted_ratio`). */
class SegTruncateSpec extends SparkSpec {

  private def cat(tag: String): (SparkSession, String) = {
    val iso = spark.newSession()
    val wh = graft.Fs.fastTempDir(s"graft_truncspec_$tag").toString
    iso.conf.set("spark.sql.catalog.tc", "graft.sources.SegCatalog")
    iso.conf.set("spark.sql.catalog.tc.warehouse", wh)
    iso.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    iso.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    iso.conf.set("spark.sql.adaptive.enabled", "false")
    iso.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    (iso, wh)
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size

  test("truncate(w, BIGINT): range-binned layout, zero-exchange SPJ, " +
      "zone maps prune bins") {
    val (iso, wh) = cat("int")
    iso.sql("CREATE TABLE tc.ns.a (k BIGINT, v BIGINT) USING gseg " +
      "PARTITIONED BY (truncate(100, k))")
    iso.sql("CREATE TABLE tc.ns.b (k BIGINT, w BIGINT) USING gseg " +
      "PARTITIONED BY (truncate(100, k))")
    iso.range(500).select(col("id").as("k"), col("id").as("v"))
      .writeTo("tc.ns.a").append()
    iso.range(500).select(col("id").as("k"), (col("id") * 2).as("w"))
      .writeTo("tc.ns.b").append()
    val dirA = s"$wh/ns/a"
    assert(SegSource.listSegments(dirA).size == 5) // bins 0,100,...,400
    SegSource.listSegments(dirA).foreach { f =>
      val c = SegSource.headerOf(f).cols.find(_.name == "k").get
      assert(SegSource.truncateOf(100, c.minVal.get) ==
        SegSource.truncateOf(100, c.maxVal.get))
    }
    val j = iso.table("tc.ns.a").join(iso.table("tc.ns.b"), "k")
    assert(shuffles(j) == 0,
      s"truncate-binned SPJ shuffled:\n${j.queryExecution.executedPlan}")
    assert(j.count() == 500L)
    // a bin-range predicate file-prunes through the raw column's
    // zone maps — key-grouped scans prune per file inside groups
    assert(iso.table("tc.ns.a").filter(col("k") >= 400).count() == 100L)
  }

  test("truncate(w, STRING): prefix layout from ASCII string stats") {
    val (iso, wh) = cat("str")
    iso.sql("CREATE TABLE tc.ns.t (s STRING, v BIGINT) USING gseg " +
      "PARTITIONED BY (truncate(4, s))")
    iso.range(600).select(
      concat(lit("pfx"), (col("id") % 5).cast("string"),
        lit("-"), col("id").cast("string")).as("s"),
      col("id").as("v"))
      .writeTo("tc.ns.t").append()
    val dir = s"$wh/ns/t"
    assert(SegSource.listSegments(dir).size == 5) // pfx0..pfx4
    val j = iso.table("tc.ns.t").as("x")
      .join(iso.table("tc.ns.t").as("y"), "s")
    assert(shuffles(j) == 0,
      s"prefix-laid self-SPJ shuffled:\n${j.queryExecution.executedPlan}")
    assert(iso.table("tc.ns.t").count() == 600L)
    // truncate math: codepoints, not bytes; ints floor-bin negatives
    import org.apache.spark.unsafe.types.UTF8String
    assert(SegSource.truncateOf(2, UTF8String.fromString("héllo")) ==
      UTF8String.fromString("hé"))
    assert(SegSource.truncateOf(8, UTF8String.fromString("abc")) ==
      UTF8String.fromString("abc"))
    assert(SegSource.truncateOf(100, java.lang.Long.valueOf(-1L)) ==
      java.lang.Long.valueOf(-100L))
    assert(SegSource.truncateOf(100, java.lang.Integer.valueOf(250)) ==
      java.lang.Integer.valueOf(200))
  }

  test("min_deleted_ratio compaction: heavily vectored segments " +
      "rewrite, clean and lightly vectored files stay shared") {
    val (iso, wh) = cat("purge")
    iso.sql("CREATE TABLE tc.ns.t (k BIGINT, v BIGINT) USING gseg " +
      "PARTITIONED BY (truncate(100, k)) " +
      "TBLPROPERTIES('gseg.delete.mode'='merge_on_read')")
    iso.range(400).select(col("id").as("k"), col("id").as("v"))
      .writeTo("tc.ns.t").append()
    val dir = s"$wh/ns/t"
    // bin [0,100): delete 50% (heavy); bin [100,200): delete 2% (light)
    iso.sql("DELETE FROM tc.ns.t WHERE k < 50")
    iso.sql("DELETE FROM tc.ns.t WHERE k >= 100 AND k < 102")
    val before = SegManifest.readManifest(dir).get
    assert(before.dvs.size == 2)
    val lightSeg = before.dvs.keys.find { n =>
      SegDv.countOf(s"$dir/${before.dvs(n)}") == 2 }.get
    graft.Counters.clear()
    iso.sql("CALL tc.compact('ns.t', 1, min_deleted_ratio => 0.25)")
    val after = SegManifest.readManifest(dir).get
    // the heavy segment was rewritten (purged); the light one kept
    // its name AND its vector; the two clean bins shared untouched
    assert(graft.Counters.peek("gseg_compact_rewritten") == 1L)
    assert(graft.Counters.peek("gseg_compact_shared") == 3L)
    assert(after.names.contains(lightSeg))
    assert(after.dvs.keySet == Set(lightSeg))
    assert(iso.table("tc.ns.t").count() == 348L)
    assert(iso.sql("SELECT min(k) FROM tc.ns.t").head().getLong(0) == 50L)
    // a second pass is a no-op (nothing reaches the threshold)
    val g = after.gen
    iso.sql("CALL tc.compact('ns.t', 1, min_deleted_ratio => 0.25)")
    assert(SegManifest.readManifest(dir).get.gen == g)
    // and the layout survived the selective rewrite
    val j = iso.table("tc.ns.t").as("x")
      .join(iso.table("tc.ns.t").as("y"), "k")
    assert(shuffles(j) == 0, "layout must survive the purge pass")
  }

  test("guards: truncate over DOUBLE/DATE rejected; cluster_by " +
      "cannot combine with min_deleted_ratio; bad ratios rejected") {
    val (iso, _) = cat("guard")
    intercept[Exception](iso.sql(
      "CREATE TABLE tc.ns.b1 (d DOUBLE) USING gseg " +
        "PARTITIONED BY (truncate(4, d))"))
    intercept[Exception](iso.sql(
      "CREATE TABLE tc.ns.b2 (d DATE) USING gseg " +
        "PARTITIONED BY (truncate(4, d))"))
    iso.sql("CREATE TABLE tc.ns.t (k BIGINT) USING gseg")
    iso.sql("INSERT INTO tc.ns.t VALUES (1), (2)")
    intercept[Exception](iso.sql(
      "CALL tc.compact('ns.t', 1, min_deleted_ratio => 0.0)"))
    intercept[Exception](iso.sql(
      "CALL tc.compact('ns.t', 1, min_deleted_ratio => 1.5)"))
    intercept[Exception](iso.sql(
      "CALL tc.compact('ns.t', cluster_by => 'k', " +
        "min_deleted_ratio => 0.5)"))
  }
}
