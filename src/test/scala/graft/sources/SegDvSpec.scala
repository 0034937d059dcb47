package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Merge-on-read DELETE (positional deletion vectors): the delta
  * row-level path, the v4 manifest dv map, reader masking, time
  * travel/rollback, vacuum lifecycle, compaction materialization,
  * changefeed integration, and the guards. */
class SegDvSpec extends SparkSpec {

  private def cat(tag: String): (SparkSession, String) = {
    val iso = spark.newSession()
    val wh = graft.Fs.fastTempDir(s"graft_dvspec_$tag").toString
    iso.conf.set("spark.sql.catalog.tc", "graft.sources.SegCatalog")
    iso.conf.set("spark.sql.catalog.tc.warehouse", wh)
    (iso, wh)
  }

  private def morTable(iso: SparkSession, name: String,
      parts: Int = 4, rows: Int = 400): Unit = {
    iso.sql(s"CREATE TABLE tc.ns.$name (id BIGINT, v BIGINT) USING gseg " +
      "TBLPROPERTIES('gseg.delete.mode'='merge_on_read')")
    iso.range(rows).select(col("id"), (col("id") * 10).as("v"))
      .repartition(parts).writeTo(s"tc.ns.$name").append()
  }

  test("mor DELETE: rows masked, segments byte-identical, vectors in " +
      "the manifest") {
    val (iso, wh) = cat("basic")
    morTable(iso, "t")
    val dir = s"$wh/ns/t"
    val before = SegManifest.readManifest(dir).get
    assert(before.dvs.isEmpty)
    val sizes = before.names.map(n => n -> Files.size(Paths.get(dir, n))).toMap

    graft.Counters.clear()
    iso.sql("DELETE FROM tc.ns.t WHERE id % 10 = 3")
    assert(graft.Counters.peek("gseg_dv_deleted_rows") == 40L)
    assert(graft.Counters.peek("gseg_dv_vectors_written") >= 1L)

    val after = SegManifest.readManifest(dir).get
    // every segment SURVIVES under its old name, byte-identical —
    // the whole point of merge-on-read
    assert(after.names.sorted == before.names.sorted)
    after.names.foreach(n =>
      assert(Files.size(Paths.get(dir, n)) == sizes(n)))
    assert(after.dvs.nonEmpty)
    after.dvs.values.foreach(d =>
      assert(Files.exists(Paths.get(dir, d)) && d.endsWith(".gdv")))

    // masked read: deleted rows gone, everything else intact
    assert(iso.table("tc.ns.t").count() == 360L)
    assert(iso.sql("SELECT count(*) c FROM tc.ns.t WHERE id % 10 = 3")
      .head().getLong(0) == 0L)
    assert(iso.sql("SELECT sum(v) s FROM tc.ns.t").head().getLong(0) ==
      (0L until 400L).filterNot(_ % 10 == 3).map(_ * 10).sum)
  }

  test("second DELETE merges into one vector per segment; vacuum " +
      "reclaims the superseded vector") {
    val (iso, wh) = cat("merge")
    morTable(iso, "t")
    val dir = s"$wh/ns/t"
    iso.sql("DELETE FROM tc.ns.t WHERE id < 50")
    val dv1 = SegManifest.readManifest(dir).get.dvs
    iso.sql("DELETE FROM tc.ns.t WHERE id >= 350")
    val dv2 = SegManifest.readManifest(dir).get.dvs
    assert(iso.table("tc.ns.t").count() == 300L)
    // at most ONE vector per segment — merged, not chained
    assert(dv2.keys.toSet.subsetOf(
      SegManifest.readManifest(dir).get.names.toSet))
    // the merged vector holds BOTH deletes' ordinals
    val touchedBoth = dv1.keySet & dv2.keySet
    touchedBoth.foreach { n =>
      assert(dv1(n) != dv2(n), "second DELETE must write a NEW vector")
      assert(SegDv.read(s"$dir/${dv2(n)}").length >
        SegDv.read(s"$dir/${dv1(n)}").length)
    }
    // superseded vectors retire with their generation
    val gone = SegManifest.vacuum(dir)
    dv1.values.foreach(d => assert(gone.contains(d),
      s"superseded vector $d should be reclaimed"))
    dv2.values.foreach(d => assert(!gone.contains(d),
      s"live vector $d must survive vacuum"))
    assert(iso.table("tc.ns.t").count() == 300L)
  }

  test("a fully deleted segment is DROPPED from the generation, " +
      "never 100%-masked") {
    val (iso, wh) = cat("full")
    iso.sql("CREATE TABLE tc.ns.t (k BIGINT, v BIGINT) USING gseg " +
      "PARTITIONED BY (k) " +
      "TBLPROPERTIES('gseg.delete.mode'='merge_on_read')")
    iso.range(100).select((col("id") % 4).as("k"), col("id").as("v"))
      .writeTo("tc.ns.t").append()
    val dir = s"$wh/ns/t"
    val before = SegManifest.readManifest(dir).get
    assert(before.names.size == 4) // one per key
    iso.sql("DELETE FROM tc.ns.t WHERE k = 2")
    val after = SegManifest.readManifest(dir).get
    assert(after.names.size == 3)
    assert(after.dvs.isEmpty, "a full-segment delete needs no vector")
    assert(iso.table("tc.ns.t").count() == 75L)
  }

  test("time travel serves each generation's own vectors; rollback " +
      "resurrects") {
    val (iso, wh) = cat("tt")
    morTable(iso, "t")
    val dir = s"$wh/ns/t"
    val preGen = SegManifest.readManifest(dir).get.gen
    iso.sql("DELETE FROM tc.ns.t WHERE id < 100")
    assert(iso.table("tc.ns.t").count() == 300L)
    // the pre-delete generation still serves every row
    assert(iso.sql(s"SELECT count(*) FROM tc.ns.t VERSION AS OF $preGen")
      .head().getLong(0) == 400L)
    // and the post-delete generation is itself travelable
    val postGen = SegManifest.readManifest(dir).get.gen
    assert(iso.sql(s"SELECT count(*) FROM tc.ns.t VERSION AS OF $postGen")
      .head().getLong(0) == 300L)
    // rollback restores the pre-delete dv map (empty) wholesale
    iso.sql(s"CALL tc.rollback('ns.t', $preGen)")
    assert(iso.table("tc.ns.t").count() == 400L)
    assert(SegManifest.readManifest(dir).get.dvs.isEmpty)
  }

  test("copy-on-write UPDATE on a vectored table does not resurrect " +
      "masked rows; rewritten files shed their vectors") {
    val (iso, wh) = cat("cow")
    morTable(iso, "t", parts = 2)
    val dir = s"$wh/ns/t"
    iso.sql("DELETE FROM tc.ns.t WHERE id % 2 = 1")
    assert(SegManifest.readManifest(dir).get.dvs.nonEmpty)
    // UPDATE rewrites both segments (copy-on-write, group-based) —
    // the rewrite reads MASKED, so deleted rows must stay dead
    iso.sql("UPDATE tc.ns.t SET v = v + 1 WHERE id % 2 = 0")
    val after = SegManifest.readManifest(dir).get
    assert(after.dvs.isEmpty,
      "rewritten segments start vector-free (mask applied in rewrite)")
    assert(iso.table("tc.ns.t").count() == 200L)
    assert(iso.sql("SELECT count(*) FROM tc.ns.t WHERE id % 2 = 1")
      .head().getLong(0) == 0L)
    assert(iso.sql("SELECT sum(v) FROM tc.ns.t").head().getLong(0) ==
      (0L until 400L).filter(_ % 2 == 0).map(_ * 10 + 1).sum)
  }

  test("CALL compact materializes vectors back to clean segments") {
    val (iso, wh) = cat("cmp")
    morTable(iso, "t")
    val dir = s"$wh/ns/t"
    iso.sql("DELETE FROM tc.ns.t WHERE id < 40")
    assert(SegManifest.readManifest(dir).get.dvs.nonEmpty)
    iso.sql("CALL tc.compact('ns.t', 1)")
    val after = SegManifest.readManifest(dir).get
    assert(after.dvs.isEmpty, "compaction applies the mask and drops vectors")
    assert(after.names.size == 1)
    assert(iso.table("tc.ns.t").count() == 360L)
    assert(iso.sql("SELECT min(id) FROM tc.ns.t").head().getLong(0) == 40L)
  }

  test("changefeed: a dv commit arrives as delete rows; the initial " +
      "stream snapshot masks; rollback reads as resurrection") {
    val (iso, wh) = cat("cdf")
    morTable(iso, "t", parts = 2, rows = 100)
    val dir = s"$wh/ns/t"
    val preGen = SegManifest.readManifest(dir).get.gen
    iso.sql("DELETE FROM tc.ns.t WHERE id >= 90")
    val dvGen = SegManifest.readManifest(dir).get.gen

    // batch CDF over exactly the dv commit: 10 deletes, nothing else
    val changes = iso.read.format("gseg")
      .option(SegCdf.FromOption, dvGen.toString)
      .option(SegCdf.ToOption, dvGen.toString)
      .option(SegCdf.KeysOption, "id")
      .load(dir)
    val byType = changes.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("delete" -> 10L), s"got $byType")
    assert(changes.filter(col("_change_type") === "delete")
      .agg(min("id")).head().getLong(0) == 90L)

    // a delete-only consumer's filter also PLANS only the dv work
    graft.Counters.clear()
    val delOnly = iso.read.format("gseg")
      .option(SegCdf.FromOption, preGen.toString)
      .option(SegCdf.ToOption, dvGen.toString)
      .option(SegCdf.KeysOption, "id")
      .load(dir)
      .filter(col("_change_type") === "delete")
    assert(delOnly.count() == 10L)
    assert(graft.Counters.peek("gseg_cdf_steps_skipped") >= 1L,
      "append steps should be skipped for a delete-only consumer")

    // endpoint diff (SegChangeFeed) across the dv commit
    val ep = SegChangeFeed.changes(iso, dir,
      iso.table("tc.ns.t").schema, preGen, dvGen, Seq("id"))
    val epTypes = ep.groupBy(SegChangeFeed.ChangeTypeCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(epTypes == Map("delete" -> 10L), s"endpoint diff got $epTypes")

    // rollback: the dv shrinks away — the changefeed reads inserts
    iso.sql(s"CALL tc.rollback('ns.t', $preGen)")
    val rbGen = SegManifest.readManifest(dir).get.gen
    val rb = iso.read.format("gseg")
      .option(SegCdf.FromOption, rbGen.toString)
      .option(SegCdf.KeysOption, "id")
      .load(dir)
    val rbTypes = rb.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rbTypes == Map("insert" -> 10L), s"resurrection got $rbTypes")
  }

  test("file-level generation stream treats a dv commit as a CHANGE " +
      "commit (loud, or skipped on request)") {
    val (iso, wh) = cat("gen")
    morTable(iso, "t", parts = 2, rows = 100)
    val dir = s"$wh/ns/t"
    val g0 = SegManifest.readManifest(dir).get.gen
    iso.sql("DELETE FROM tc.ns.t WHERE id < 10")
    val g1 = SegManifest.readManifest(dir).get.gen
    assert(g1 == g0 + 1)
    val loud = new SegGenMicroBatchStream(dir,
      iso.table("tc.ns.t").schema, Array.empty, skipChangeCommits = false)
    val ex = intercept[IllegalStateException] {
      loud.planInputPartitions(SegGenOffset(g0), SegGenOffset(g1))
    }
    assert(ex.getMessage.contains("deletion vectors changed"))
    val lenient = new SegGenMicroBatchStream(dir,
      iso.table("tc.ns.t").schema, Array.empty, skipChangeCommits = true)
    assert(lenient.planInputPartitions(
      SegGenOffset(g0), SegGenOffset(g1)).isEmpty)
    // and the initial snapshot masks the vectors
    val parts = lenient.planInputPartitions(
      SegGenOffset(-1L), SegGenOffset(g1))
    assert(parts.collect {
      case SegInputPartition(_, Some(_)) => 1 }.nonEmpty,
      "initial snapshot partitions must carry the dv mask")
  }

  test("metadata columns: (_file, _pos) are selectable and address " +
      "stored ordinals") {
    val (iso, wh) = cat("meta")
    morTable(iso, "t", parts = 1, rows = 10)
    iso.sql("DELETE FROM tc.ns.t WHERE id = 3")
    val rows = iso.sql(
      "SELECT id, _pos, _file FROM tc.ns.t ORDER BY id").collect()
    assert(rows.length == 9)
    // _pos is the STORED ordinal (pre-mask): one 10-row segment, so
    // the surviving rows carry 9 DISTINCT ordinals in [0, 10) — the
    // deleted row's slot stays skipped, never renumbered
    val poss = rows.map(_.getLong(1)).toSet
    assert(poss.size == 9 && poss.forall(p => p >= 0 && p < 10))
    rows.foreach(r => assert(r.getString(2).endsWith(".gseg")))
  }

  test("header aggregates decline on vectored generations; counts " +
      "come from the masked scan") {
    val (iso, wh) = cat("agg")
    morTable(iso, "t", parts = 2, rows = 100)
    val dir = s"$wh/ns/t"
    // pre-delete: header COUNT pushdown serves
    val pre = iso.sql("SELECT count(*) FROM tc.ns.t")
    assert(pre.queryExecution.executedPlan.toString.contains(
      "PushedAggregates"))
    assert(pre.head().getLong(0) == 100L)
    iso.sql("DELETE FROM tc.ns.t WHERE id < 7")
    val post = iso.sql("SELECT count(*) FROM tc.ns.t")
    assert(!post.queryExecution.executedPlan.toString.contains(
      "PushedAggregates"),
      "header aggregates must decline once vectors exist")
    assert(post.head().getLong(0) == 93L)
    // min/max would be wrong from headers too
    assert(iso.sql("SELECT min(id) FROM tc.ns.t").head().getLong(0) == 7L)
  }

  test("crash injection: a DELETE killed before the swap leaves the " +
      "table unchanged and orphan vectors for vacuum") {
    val (iso, wh) = cat("crash")
    morTable(iso, "t", parts = 2, rows = 100)
    val dir = s"$wh/ns/t"
    val preGen = SegManifest.readManifest(dir).get.gen
    SegDml.commitHook = stage =>
      if (stage == "staged") throw new RuntimeException("injected crash")
    try intercept[Exception] {
      iso.sql("DELETE FROM tc.ns.t WHERE id < 10")
    } finally SegDml.commitHook = _ => ()
    // the table still serves the OLD generation completely
    assert(SegManifest.readManifest(dir).get.gen == preGen)
    assert(iso.table("tc.ns.t").count() == 100L)
    // the stranded vector is an orphan vacuum reclaims
    val orphans = SegSourceTestHooks.listByExt(dir, ".gdv")
    assert(orphans.nonEmpty, "the crashed commit staged a vector")
    val gone = SegManifest.vacuum(dir)
    orphans.foreach(o => assert(gone.contains(o)))
    // the retried DELETE succeeds
    iso.sql("DELETE FROM tc.ns.t WHERE id < 10")
    assert(iso.table("tc.ns.t").count() == 90L)
  }

  test("guards: property validation, UPDATE stays copy-on-write, " +
      "ALTER SET/UNSET round-trips the mode") {
    val (iso, wh) = cat("guard")
    intercept[Exception] {
      iso.sql("CREATE TABLE tc.ns.bad (id BIGINT) USING gseg " +
        "TBLPROPERTIES('gseg.delete.mode'='sideways')")
    }
    intercept[Exception] {
      iso.sql("CREATE TABLE tc.ns.bad2 (id BIGINT) USING gseg " +
        "TBLPROPERTIES('gseg.nonsense'='x')")
    }
    // default mode: DELETE is copy-on-write (segments REWRITTEN)
    iso.sql("CREATE TABLE tc.ns.cow (id BIGINT) USING gseg")
    iso.range(100).writeTo("tc.ns.cow").append()
    val cowDir = s"$wh/ns/cow"
    iso.sql("DELETE FROM tc.ns.cow WHERE id < 10")
    assert(SegManifest.readManifest(cowDir).get.dvs.isEmpty)
    // ALTER TABLE SET flips the mode for later DELETEs
    iso.sql("ALTER TABLE tc.ns.cow SET TBLPROPERTIES(" +
      "'gseg.delete.mode'='merge_on_read')")
    iso.sql("DELETE FROM tc.ns.cow WHERE id < 20")
    assert(SegManifest.readManifest(cowDir).get.dvs.nonEmpty)
    assert(iso.table("tc.ns.cow").count() == 80L)
    iso.sql("ALTER TABLE tc.ns.cow UNSET TBLPROPERTIES(" +
      "'gseg.delete.mode')")
    iso.sql("DELETE FROM tc.ns.cow WHERE id < 30")
    // back to copy-on-write: the rewrite materialized the vectors
    assert(SegManifest.readManifest(cowDir).get.dvs.isEmpty)
    assert(iso.table("tc.ns.cow").count() == 70L)
  }

  test("mor UPDATE: old versions vector-masked, new versions appended " +
      "— no segment rewritten") {
    val (iso, wh) = cat("morupd")
    iso.sql("CREATE TABLE tc.ns.t (id BIGINT, v BIGINT) USING gseg " +
      "TBLPROPERTIES('gseg.update.mode'='merge_on_read')")
    iso.range(400).select(col("id"), (col("id") * 10).as("v"))
      .repartition(4).writeTo("tc.ns.t").append()
    val dir = s"$wh/ns/t"
    val before = SegManifest.readManifest(dir).get
    graft.Counters.clear()
    iso.sql("UPDATE tc.ns.t SET v = v + 1 WHERE id % 8 = 3")
    val after = SegManifest.readManifest(dir).get
    // every ORIGINAL segment survives untouched; the new versions
    // live in freshly appended `dlt-` segments
    assert(before.names.toSet.subsetOf(after.names.toSet))
    val appended = after.names.toSet -- before.names.toSet
    assert(appended.nonEmpty && appended.forall(_.startsWith("dlt-")))
    assert(after.dvs.nonEmpty)
    assert(graft.Counters.peek("gseg_dv_deleted_rows") == 50L)
    assert(graft.Counters.peek("gseg_dv_appended_files") ==
      appended.size.toLong)
    // values: updated rows carry v+1, everything else untouched,
    // no duplicates
    assert(iso.table("tc.ns.t").count() == 400L)
    assert(iso.sql("SELECT count(*) FROM tc.ns.t " +
      "WHERE id % 8 = 3 AND v = id * 10 + 1").head().getLong(0) == 50L)
    assert(iso.sql("SELECT count(*) FROM tc.ns.t " +
      "WHERE id % 8 <> 3 AND v = id * 10").head().getLong(0) == 350L)
    assert(iso.sql("SELECT sum(v) FROM tc.ns.t").head().getLong(0) ==
      (0L until 400L).map(i => i * 10 + (if (i % 8 == 3) 1 else 0)).sum)
  }

  test("mor MERGE: matched updates decompose to vector + append, " +
      "not-matched rows insert; CDF reads delete+insert") {
    val (iso, wh) = cat("mormrg")
    iso.sql("CREATE TABLE tc.ns.t (id BIGINT, v BIGINT) USING gseg " +
      "TBLPROPERTIES('gseg.merge.mode'='merge_on_read')")
    iso.range(100).select(col("id"), (col("id") * 10).as("v"))
      .repartition(2).writeTo("tc.ns.t").append()
    val dir = s"$wh/ns/t"
    val before = SegManifest.readManifest(dir).get
    // source: updates ids 0..19 (to v = -id), inserts ids 100..109
    iso.range(0, 20).select(col("id"), (-col("id")).as("v"))
      .union(iso.range(100, 110).select(col("id"), (-col("id")).as("v")))
      .createOrReplaceTempView("graft_mor_src")
    iso.sql("""MERGE INTO tc.ns.t t USING graft_mor_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
    val after = SegManifest.readManifest(dir).get
    assert(before.names.toSet.subsetOf(after.names.toSet),
      "MERGE must not rewrite any original segment")
    assert(after.dvs.nonEmpty)
    assert(iso.table("tc.ns.t").count() == 110L)
    assert(iso.sql("SELECT sum(v) FROM tc.ns.t WHERE id < 20")
      .head().getLong(0) == -(0L until 20L).sum)
    assert(iso.sql("SELECT count(*) FROM tc.ns.t WHERE id >= 100")
      .head().getLong(0) == 10L)
    // the changefeed reads the mor MERGE as delete+insert rows (the
    // positional decomposition — stated CDF semantics for vector DML)
    val mergeGen = after.gen
    val ch = iso.read.format("gseg")
      .option(SegCdf.FromOption, mergeGen.toString)
      .option(SegCdf.ToOption, mergeGen.toString)
      .option(SegCdf.KeysOption, "id")
      .load(dir)
    val byType = ch.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("delete" -> 20L, "insert" -> 30L),
      s"mor MERGE changefeed got $byType")
  }

  test("CALL changes reports a dv commit as dv_changed rows with the " +
      "ordinal delta") {
    val (iso, wh) = cat("changes")
    morTable(iso, "t", parts = 2, rows = 100)
    val dir = s"$wh/ns/t"
    val g0 = SegManifest.readManifest(dir).get.gen
    iso.sql("DELETE FROM tc.ns.t WHERE id < 8")
    val g1 = SegManifest.readManifest(dir).get.gen
    val rows = iso.sql(s"CALL tc.changes('ns.t', $g0, $g1)").collect()
    assert(rows.forall(_.getString(1) == "dv_changed"))
    assert(rows.map(_.getLong(2)).sum == 8L,
      "the ordinal delta must sum to the deleted-row count")
  }

  test("CALL history reports per-generation vector counts and masked " +
      "rows") {
    val (iso, wh) = cat("hist")
    morTable(iso, "t", parts = 2, rows = 100)
    iso.sql("DELETE FROM tc.ns.t WHERE id < 6")
    iso.sql("DELETE FROM tc.ns.t WHERE id >= 95")
    val rows = iso.sql("CALL tc.history('ns.t')").collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(5)))).toMap
    // gen 1 = the append (clean), gen 2 = first DELETE (6 masked),
    // gen 3 = second DELETE (11 masked cumulative)
    assert(rows(1L) == ((0L, 0L)))
    assert(rows(2L)._2 == 6L)
    assert(rows(3L)._2 == 11L)
    assert(rows(3L)._1 >= 1L)
  }

  test("limit/TopN planning accounts net-of-vector counts: pushdown " +
      "takes enough files to actually cover k") {
    val (iso, wh) = cat("limit")
    iso.sql("CREATE TABLE tc.ns.t (id BIGINT, v BIGINT) USING gseg " +
      "TBLPROPERTIES('gseg.delete.mode'='merge_on_read')")
    // three 50-row segments in id order (range-laid by repartitionByRange
    // through the path writer, then migrated)
    import iso.implicits._
    SegSource.write(
      iso.range(150).select($"id", ($"id" * 2).as("v"))
        .repartitionByRange(3, $"id"),
      s"$wh/ns/t")
    iso.table("tc.ns.t").count() // migrate: manifest + sidecar
    // vector away MOST of the first segment: a header-count limit
    // planner would take only file 1 for LIMIT 30 and deliver 10 rows
    iso.sql("DELETE FROM tc.ns.t WHERE id < 40")
    val dir = s"$wh/ns/t"
    assert(SegManifest.readManifest(dir).get.dvs.nonEmpty)
    graft.Counters.clear()
    val got = iso.table("tc.ns.t").limit(30).collect()
    assert(got.length == 30, s"LIMIT 30 returned ${got.length} rows")
    // TopN ASC on id: the boundary pigeonhole must also use the
    // masked counts (understated non-nulls keep more files — sound)
    val top = iso.sql(
      "SELECT id FROM tc.ns.t ORDER BY id ASC LIMIT 20").collect()
    assert(top.length == 20 && top.head.getLong(0) == 40L &&
      top.last.getLong(0) == 59L)
  }

  test("dv file format: torn and foreign files fail loudly; union " +
      "merges ascending") {
    val d = graft.Fs.fastTempDir("graft_dvfmt")
    SegDv.write(d, "a.gdv", Array(1, 5, 9))
    assert(SegDv.read(s"$d/a.gdv").toSeq == Seq(1, 5, 9))
    assert(SegDv.countOf(s"$d/a.gdv") == 3)
    assert(SegDv.union(Array(1, 5, 9), Array(0, 5, 7)).toSeq ==
      Seq(0, 1, 5, 7, 9))
    assert(SegDv.union(Array.emptyIntArray, Array(2)).toSeq == Seq(2))
    intercept[IllegalArgumentException] {
      SegDv.write(d, "bad.gdv", Array(3, 3))
    }
    Files.write(Paths.get(s"$d/torn.gdv"),
      java.util.Arrays.copyOf(Files.readAllBytes(Paths.get(s"$d/a.gdv")), 14))
    intercept[IllegalArgumentException] { SegDv.read(s"$d/torn.gdv") }
    Files.write(Paths.get(s"$d/foreign.gdv"), "not a vector".getBytes)
    intercept[IllegalArgumentException] { SegDv.read(s"$d/foreign.gdv") }
  }
}

/** Tiny test-only filesystem helper kept out of prod code. */
private[sources] object SegSourceTestHooks {
  def listByExt(dir: String, ext: String): Seq[String] = {
    val s = Files.list(Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.endsWith(ext) && !n.startsWith(".")).toSeq.sorted
    } finally s.close()
  }
}
