package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `CALL clone`: zero-copy (hard-link) table clones — inode identity,
  * independent histories, vector/layout/schema carriage, guards. */
class SegCloneSpec extends SparkSpec {

  private def cat(tag: String): (SparkSession, String) = {
    val iso = spark.newSession()
    val wh = graft.Fs.fastTempDir(s"graft_clonespec_$tag").toString
    iso.conf.set("spark.sql.catalog.tc", "graft.sources.SegCatalog")
    iso.conf.set("spark.sql.catalog.tc.warehouse", wh)
    iso.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    iso.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    iso.conf.set("spark.sql.adaptive.enabled", "false")
    iso.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    (iso, wh)
  }

  private def ino(p: String): Any =
    Files.getAttribute(Paths.get(p), "unix:ino")

  test("clone is zero-copy (shared inodes) and fully independent") {
    val (iso, wh) = cat("basic")
    iso.sql("CREATE TABLE tc.ns.src (id BIGINT, v BIGINT) USING gseg")
    iso.range(200).select(col("id"), (col("id") * 2).as("v"))
      .repartition(3).writeTo("tc.ns.src").append()
    val r = iso.sql("CALL tc.clone('ns.src', 'ns.dst')").head()
    assert(r.getLong(3) == 3L && r.getLong(4) == 3L && r.getLong(5) == 0L,
      s"expected 3 hard-linked files, got $r")
    assert(iso.table("tc.ns.dst").count() == 200L)
    // zero-copy proof: every cloned file shares its source's inode
    val srcDir = s"$wh/ns/src"; val dstDir = s"$wh/ns/dst"
    val srcInos = SegManifest.read(srcDir).get._2
      .map(n => ino(s"$srcDir/$n")).toSet
    val dstNames = SegManifest.read(dstDir).get._2
    assert(dstNames.forall(_.startsWith(".ctas-cl-")))
    assert(dstNames.map(n => ino(s"$dstDir/$n")).toSet == srcInos)
    // the clone starts its own history at generation 0
    assert(SegManifest.read(dstDir).get._1 == 0L)
    // independence: DML on the clone leaves the source untouched...
    iso.sql("DELETE FROM tc.ns.dst WHERE id < 100")
    assert(iso.table("tc.ns.dst").count() == 100L)
    assert(iso.table("tc.ns.src").count() == 200L)
    // ...and vacuuming the source (after a rewrite) cannot break the
    // clone: unlinking the source's name leaves the shared inode live
    iso.sql("UPDATE tc.ns.src SET v = v + 1 WHERE id >= 0")
    SegManifest.vacuum(srcDir)
    assert(iso.table("tc.ns.dst").count() == 100L)
    assert(iso.sql("SELECT sum(v) FROM tc.ns.dst").head().getLong(0) ==
      (100L until 200L).map(_ * 2).sum)
  }

  test("clone of a PAST generation carries its file set and vectors") {
    val (iso, wh) = cat("past")
    iso.sql("CREATE TABLE tc.ns.src (id BIGINT, v BIGINT) USING gseg " +
      "TBLPROPERTIES('gseg.delete.mode'='merge_on_read')")
    iso.range(100).select(col("id"), col("id").as("v"))
      .repartition(2).writeTo("tc.ns.src").append()
    iso.sql("DELETE FROM tc.ns.src WHERE id < 30") // vector commit
    val dvGen = SegManifest.readManifest(s"$wh/ns/src").get.gen
    iso.sql("DELETE FROM tc.ns.src WHERE id >= 90")
    // clone the mid-history generation: 70 live rows, vectors carried
    iso.sql(s"CALL tc.clone('ns.src', 'ns.mid', $dvGen)")
    assert(iso.table("tc.ns.mid").count() == 70L)
    assert(SegManifest.readManifest(s"$wh/ns/mid").get.dvs.nonEmpty)
    assert(iso.sql("SELECT min(id) FROM tc.ns.mid").head().getLong(0) == 30L)
    // the mor property rode along in the pinned metadata
    iso.sql("DELETE FROM tc.ns.mid WHERE id = 40")
    val mid = SegManifest.readManifest(s"$wh/ns/mid").get
    assert(mid.names.forall(_.startsWith(".ctas-cl-")),
      "a mor DELETE on the clone must not rewrite any linked segment")
    assert(iso.table("tc.ns.mid").count() == 69L)
    // the source is where it was
    assert(iso.table("tc.ns.src").count() == 60L)
  }

  test("clone preserves a declared layout: source and clone SPJ " +
      "without an exchange") {
    val (iso, wh) = cat("layout")
    iso.sql("CREATE TABLE tc.ns.src (k BIGINT, v BIGINT) USING gseg " +
      "PARTITIONED BY (k)")
    iso.range(400).select((col("id") % 8).as("k"), col("id").as("v"))
      .writeTo("tc.ns.src").append()
    iso.sql("CALL tc.clone('ns.src', 'ns.dst')")
    val j = iso.table("tc.ns.src").join(iso.table("tc.ns.dst"), "k")
    val shuffles = j.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size
    assert(shuffles == 0,
      s"source⋈clone SPJ shuffled:\n${j.queryExecution.executedPlan}")
    assert(j.count() == 400L * 400 / 8)
  }

  test("guards: existing target and unretained generation rejected") {
    val (iso, wh) = cat("guard")
    iso.sql("CREATE TABLE tc.ns.src (id BIGINT) USING gseg")
    iso.sql("INSERT INTO tc.ns.src VALUES (1)")
    iso.sql("CREATE TABLE tc.ns.taken (id BIGINT) USING gseg")
    intercept[Exception](iso.sql("CALL tc.clone('ns.src', 'ns.taken')"))
    intercept[Exception](iso.sql("CALL tc.clone('ns.src', 'ns.x', 99)"))
  }
}
