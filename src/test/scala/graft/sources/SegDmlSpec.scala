package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SQL DML on gseg (SegCatalog + group-based row-level operations):
  * the adversarial cases the driver gates don't exercise —
  * group-pruning evidence, the all-rows-in-a-file delete, the
  * everything-deleted table, catalog lifecycle, TRUNCATE. */
class SegDmlSpec extends SparkSpec {
  import org.apache.spark.sql.SparkSession

  private def dml(tag: String): (SparkSession, String) = {
    val iso = spark.newSession()
    val wh = graft.Fs.fastTempDir(s"graft_dmlspec_$tag").toString
    iso.conf.set("spark.sql.catalog.tc", "graft.sources.SegCatalog")
    iso.conf.set("spark.sql.catalog.tc.warehouse", wh)
    (iso, wh)
  }

  test("DELETE prunes non-matching groups and leaves their bytes alone") {
    val (iso, wh) = dml("prune")
    import iso.implicits._
    // 4 segments with disjoint key ranges (range layout on k)
    SegSource.write(
      iso.range(0, 400).select($"id".as("k"), ($"id" % 7).as("v"))
        .repartitionByRange(4, $"k"),
      s"$wh/ns/t")
    val before = SegSource.listSegments(s"$wh/ns/t")
      .map(f => f -> java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(f))).toMap
    assert(before.size == 4)
    graft.Counters.drain()
    // k >= 390 lives in the top range file only (range boundaries are
    // sample-derived, but no boundary lands that high on 400 uniform
    // keys) — zone maps must prune the other three
    iso.sql("DELETE FROM tc.ns.t WHERE k >= 390")
    val c = graft.Counters.drain()
    assert(c.getOrElse("gseg_rlo_files_total", -1L) == 4L)
    assert(c.getOrElse("gseg_rlo_candidates", -1L) == 1L)
    assert(c.getOrElse("gseg_rlo_replaced_files", -1L) == 1L)
    // the three pruned segments are the SAME files, untouched
    val after = SegSource.listSegments(s"$wh/ns/t")
    val survivors = after.filter(before.contains)
    assert(survivors.size == 3)
    survivors.foreach(f => assert(
      java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(f)) == before(f)))
    assert(iso.table("tc.ns.t").count() == 390)
    assert(iso.table("tc.ns.t").agg(max($"k")).head().getLong(0) == 389)
  }

  test("DELETE with an unpushable predicate stays correct (all groups rewritten)") {
    val (iso, wh) = dml("residual")
    import iso.implicits._
    SegSource.write(
      iso.range(0, 100).select($"id".as("k"), ($"id" * 2).as("v"))
        .repartitionByRange(4, $"k"),
      s"$wh/ns/t")
    graft.Counters.drain()
    // modulo is not a supported pushdown shape: candidates = all 4,
    // correctness comes from the rewrite plan's own row filter
    iso.sql("DELETE FROM tc.ns.t WHERE k % 10 = 0")
    val c = graft.Counters.drain()
    assert(c.getOrElse("gseg_rlo_candidates", -1L) == 4L)
    assert(iso.table("tc.ns.t").count() == 90)
    assert(iso.table("tc.ns.t").filter($"k" % 10 === 0).count() == 0)
  }

  test("deleting every row leaves a loadable empty table") {
    val (iso, wh) = dml("empty")
    import iso.implicits._
    SegSource.write(iso.range(0, 50).select($"id".as("k")), s"$wh/ns/t")
    iso.sql("DELETE FROM tc.ns.t WHERE k >= 0")
    assert(iso.table("tc.ns.t").count() == 0)
    assert(iso.table("tc.ns.t").schema.fieldNames.toSeq == Seq("k"))
  }

  test("UPDATE rewrites only candidate groups, carries unmatched rows") {
    val (iso, wh) = dml("upd")
    import iso.implicits._
    SegSource.write(
      iso.range(0, 200).select($"id".as("k"), lit(1L).as("v"))
        .repartitionByRange(4, $"k"),
      s"$wh/ns/t")
    graft.Counters.drain()
    iso.sql("UPDATE tc.ns.t SET v = 99 WHERE k < 10")
    val c = graft.Counters.drain()
    assert(c.getOrElse("gseg_rlo_candidates", -1L) == 1L)
    val agg = iso.table("tc.ns.t")
      .agg(sum($"v"), count(lit(1))).head()
    assert(agg.getLong(1) == 200)
    assert(agg.getLong(0) == 10L * 99 + 190L)
  }

  test("MERGE handles matched-only, insert-only, and mixed keys atomically") {
    val (iso, wh) = dml("merge")
    import iso.implicits._
    SegSource.write(
      iso.range(0, 10).select($"id".as("k"), lit(1L).as("v")),
      s"$wh/ns/t")
    iso.range(5, 15).select($"id".as("k"), lit(10L).as("v"))
      .createOrReplaceTempView("mspec_src")
    iso.sql(
      """MERGE INTO tc.ns.t t USING mspec_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = t.v + s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"""
        .stripMargin)
    val rows = iso.table("tc.ns.t").orderBy($"k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (0L to 4L).map(k => (k, 1L)) ++
      (5L to 9L).map(k => (k, 11L)) ++ (10L to 14L).map(k => (k, 10L))
    assert(rows == want)
  }

  test("MERGE runtime-prunes to the groups the source actually touches") {
    val (iso, wh) = dml("mprune")
    import iso.implicits._
    // 4 range files on k; the corrections feed touches [10,20) only —
    // plan-time zone maps CANNOT prune (the ON condition references
    // the source), so build-time candidates = 4; the runtime group
    // filter must narrow the rewrite to the single file holding the
    // touched range, leaving the other three as untouched bytes
    SegSource.write(
      iso.range(0, 400).select($"id".as("k"), lit(1L).as("v"))
        .repartitionByRange(4, $"k"),
      s"$wh/ns/t")
    val before = SegSource.listSegments(s"$wh/ns/t")
      .map(f => f -> java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(f))).toMap
    assert(before.size == 4)
    iso.range(10, 20).select($"id".as("k"), lit(100L).as("v"))
      .createOrReplaceTempView("mprune_src")
    graft.Counters.drain()
    iso.sql(
      """MERGE INTO tc.ns.t t USING mprune_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = t.v + s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)"""
        .stripMargin)
    val c = graft.Counters.drain()
    assert(c.getOrElse("gseg_rlo_candidates", -1L) == 4L)
    assert(c.getOrElse("gseg_rlo_runtime_candidates", -1L) == 1L)
    assert(c.getOrElse("gseg_rlo_replaced_files", -1L) == 1L)
    val after = SegSource.listSegments(s"$wh/ns/t")
    val survivors = after.filter(before.contains)
    assert(survivors.size == 3)
    survivors.foreach(f => assert(
      java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(f)) == before(f)))
    val agg = iso.table("tc.ns.t").agg(sum($"v"), count(lit(1))).head()
    assert(agg.getLong(1) == 400)
    assert(agg.getLong(0) == 400L + 10 * 100)
  }

  test("runtime group filter narrows where zone maps cannot (unpushable one-group DELETE)") {
    val (iso, wh) = dml("rtone")
    import iso.implicits._
    SegSource.write(
      iso.range(0, 400).select($"id".as("k"), ($"id" % 7).as("v"))
        .repartitionByRange(4, $"k"),
      s"$wh/ns/t")
    graft.Counters.drain()
    // k % 400 = 395 holds for k=395 only — top file; modulo is not a
    // pushdown shape, so build-time candidates stay 4 and the exact
    // one-file narrowing is the runtime filter's work alone
    iso.sql("DELETE FROM tc.ns.t WHERE k % 400 = 395")
    val c = graft.Counters.drain()
    assert(c.getOrElse("gseg_rlo_candidates", -1L) == 4L)
    assert(c.getOrElse("gseg_rlo_runtime_candidates", -1L) == 1L)
    assert(c.getOrElse("gseg_rlo_replaced_files", -1L) == 1L)
    assert(iso.table("tc.ns.t").count() == 399)
    assert(iso.table("tc.ns.t").filter($"k" === 395).count() == 0)
  }

  test("a DML matching nothing rewrites nothing") {
    val (iso, wh) = dml("nomatch")
    import iso.implicits._
    SegSource.write(
      iso.range(0, 400).select($"id".as("k"), ($"id" % 7).as("v"))
        .repartitionByRange(4, $"k"),
      s"$wh/ns/t")
    val before = SegSource.listSegments(s"$wh/ns/t")
      .map(f => f -> java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(f))).toMap
    graft.Counters.drain()
    // unpushable and never true: the runtime In-set is EMPTY, the
    // effective group set empties, and the commit replaces zero files
    iso.sql("DELETE FROM tc.ns.t WHERE k % 1000 = 777")
    val c = graft.Counters.drain()
    assert(c.getOrElse("gseg_rlo_candidates", -1L) == 4L)
    assert(c.getOrElse("gseg_rlo_runtime_candidates", -1L) == 0L)
    assert(c.getOrElse("gseg_rlo_replaced_files", -1L) == 0L)
    assert(c.getOrElse("gseg_rlo_new_files", -1L) == 0L)
    val after = SegSource.listSegments(s"$wh/ns/t")
    assert(after.toSet == before.keySet)
    after.foreach(f => assert(
      java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(f)) == before(f)))
    assert(iso.table("tc.ns.t").count() == 400)
  }

  test("_file metadata column is selectable and group-complete") {
    val (iso, wh) = dml("filecol")
    import iso.implicits._
    SegSource.write(
      iso.range(0, 400).select($"id".as("k"), ($"id" % 7).as("v"))
        .repartitionByRange(4, $"k"),
      s"$wh/ns/t")
    val rows = iso.sql(
      "SELECT _file, count(*) AS n FROM tc.ns.t GROUP BY _file")
      .collect()
    assert(rows.length == 4)
    assert(rows.map(_.getLong(1)).sum == 400L)
    val names = SegSource.listSegments(s"$wh/ns/t").toSet
    rows.foreach(r => assert(names.contains(r.getString(0))))
  }

  test("TRUNCATE TABLE empties but keeps the table loadable; catalog lifecycle works") {
    val (iso, wh) = dml("cat")
    import iso.implicits._
    SegSource.write(iso.range(0, 30).select($"id".as("k")), s"$wh/ns/t")
    iso.sql("TRUNCATE TABLE tc.ns.t")
    assert(iso.table("tc.ns.t").count() == 0)
    // CREATE TABLE persists schema via sidecar; INSERT INTO appends
    iso.sql("CREATE TABLE tc.ns.fresh (a BIGINT, b DOUBLE) USING gseg")
    iso.sql("INSERT INTO tc.ns.fresh VALUES (1, 1.5), (2, 2.5)")
    assert(iso.table("tc.ns.fresh").count() == 2)
    assert(iso.sql("SHOW TABLES IN tc.ns").collect()
      .map(_.getString(1)).toSet.contains("fresh"))
    iso.sql("DROP TABLE tc.ns.fresh")
    assert(!iso.catalog.tableExists("tc.ns.fresh"))
  }
}
