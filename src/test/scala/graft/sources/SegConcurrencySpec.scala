package graft.sources

import java.nio.file.Paths
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Optimistic concurrency: commutable commits (appends, vector
  * deletes) RETRY a lost CAS and land; non-commutable interleavings
  * (a candidate file replaced or re-vectored mid-DML) fail loudly
  * with the lost-update guard instead of silently undoing the foreign
  * commit. The commit hook is the deterministic interleaving seam. */
class SegConcurrencySpec extends SparkSpec {

  private def cat(tag: String): (SparkSession, String) = {
    val iso = spark.newSession()
    val wh = graft.Fs.fastTempDir(s"graft_concspec_$tag").toString
    iso.conf.set("spark.sql.catalog.tc", "graft.sources.SegCatalog")
    iso.conf.set("spark.sql.catalog.tc.warehouse", wh)
    (iso, wh)
  }

  /** Fire `foreign` exactly once, at the named commit stage. */
  private def onceAtStaged(foreign: () => Unit): Unit = {
    val fired = new AtomicBoolean(false)
    SegDml.commitHook = stage =>
      if (stage == "staged" && fired.compareAndSet(false, true)) foreign()
  }

  test("withConflictRetry: retries CAS losses, propagates past the " +
      "budget") {
    graft.Counters.clear()
    var n = 0
    val out = SegManifest.withConflictRetry("t") {
      n += 1
      if (n < 3) throw new SegManifest.CommitConflictException("lost")
      42
    }
    assert(out == 42 && n == 3)
    assert(graft.Counters.peek("gseg_commit_retries") == 2L)
    intercept[SegManifest.CommitConflictException] {
      SegManifest.withConflictRetry("t", maxRetries = 2) {
        throw new SegManifest.CommitConflictException("always")
      }
    }
  }

  test("parallel appenders all land: no lost updates, one generation " +
      "per commit") {
    val (iso, wh) = cat("par")
    iso.sql("CREATE TABLE tc.ns.t (id BIGINT, src INT) USING gseg")
    val dir = s"$wh/ns/t"
    val g0 = SegManifest.read(dir).get._1
    val threads = (0 until 6).map { i =>
      new Thread(() =>
        iso.range(100).select(col("id"), lit(i).as("src"))
          .repartition(2).writeTo("tc.ns.t").append())
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(iso.table("tc.ns.t").count() == 600L)
    assert(iso.table("tc.ns.t").groupBy("src").count().count() == 6L)
    assert(SegManifest.read(dir).get._1 == g0 + 6,
      "each append must commit exactly one generation")
  }

  test("COW UPDATE retries across a foreign APPEND (commutes) and " +
      "keeps both commits") {
    val (iso, wh) = cat("upapp")
    iso.sql("CREATE TABLE tc.ns.t (id BIGINT, v BIGINT) USING gseg")
    iso.range(100).select(col("id"), col("id").as("v"))
      .writeTo("tc.ns.t").append()
    val dir = s"$wh/ns/t"
    graft.Counters.clear()
    onceAtStaged { () =>
      // a foreign append lands between the UPDATE's read and its swap
      iso.range(100, 110).select(col("id"), lit(-1L).as("v"))
        .writeTo("tc.ns.t").append()
    }
    try iso.sql("UPDATE tc.ns.t SET v = v + 1000 WHERE id < 50")
    finally SegDml.commitHook = _ => ()
    assert(graft.Counters.peek("gseg_commit_retries") >= 1L,
      "the UPDATE's commit must have retried the lost CAS")
    // both commits visible: the update applied AND the append kept
    assert(iso.table("tc.ns.t").count() == 110L)
    assert(iso.sql("SELECT count(*) FROM tc.ns.t WHERE v >= 1000")
      .head().getLong(0) == 50L)
    assert(iso.sql("SELECT count(*) FROM tc.ns.t WHERE v = -1")
      .head().getLong(0) == 10L)
  }

  test("COW UPDATE fails LOUDLY when a foreign DELETE re-vectors a " +
      "candidate mid-DML (lost-update guard)") {
    val (iso, wh) = cat("updv")
    iso.sql("CREATE TABLE tc.ns.t (id BIGINT, v BIGINT) USING gseg " +
      "TBLPROPERTIES('gseg.delete.mode'='merge_on_read')")
    iso.range(100).select(col("id"), col("id").as("v"))
      .repartition(1).writeTo("tc.ns.t").append()
    val dir = s"$wh/ns/t"
    onceAtStaged { () =>
      // a foreign merge-on-read DELETE vectors the UPDATE's candidate
      // segment: the rewrite (computed under the old mask) would
      // resurrect these rows if it committed
      val live = SegManifest.readManifest(dir).get
      val seg = live.names.head
      val dv = SegDv.freshName()
      SegDv.write(Paths.get(dir), dv, Array(0, 1, 2))
      SegManifest.swap(dir, live.names,
        expectGen = Some(Some(live.gen)), dvs = Some(Map(seg -> dv)))
    }
    val ex = try intercept[Exception] {
      iso.sql("UPDATE tc.ns.t SET v = v + 1000 WHERE id >= 0")
    } finally SegDml.commitHook = _ => ()
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("deletion vector mid-DML")),
      s"wanted the lost-update guard, got: ${messages(ex)}")
    // the foreign DELETE survives; the UPDATE did not half-apply
    assert(iso.table("tc.ns.t").count() == 97L)
    assert(iso.sql("SELECT count(*) FROM tc.ns.t WHERE v >= 1000")
      .head().getLong(0) == 0L)
  }

  test("vector DELETE retries across a foreign APPEND; fails loudly " +
      "when its segment was replaced") {
    val (iso, wh) = cat("dvapp")
    iso.sql("CREATE TABLE tc.ns.t (id BIGINT, v BIGINT) USING gseg " +
      "TBLPROPERTIES('gseg.delete.mode'='merge_on_read')")
    iso.range(100).select(col("id"), col("id").as("v"))
      .repartition(1).writeTo("tc.ns.t").append()
    graft.Counters.clear()
    onceAtStaged { () =>
      iso.range(100, 120).select(col("id"), col("id").as("v"))
        .writeTo("tc.ns.t").append()
    }
    try iso.sql("DELETE FROM tc.ns.t WHERE id < 10")
    finally SegDml.commitHook = _ => ()
    assert(graft.Counters.peek("gseg_commit_retries") >= 1L)
    assert(iso.table("tc.ns.t").count() == 110L)

    // now a foreign COMPACTION replaces the vectored segment mid-DELETE
    onceAtStaged { () => iso.sql("CALL tc.compact('ns.t', 1)") }
    val ex = try intercept[Exception] {
      iso.sql("DELETE FROM tc.ns.t WHERE id >= 110")
    } finally SegDml.commitHook = _ => ()
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("retry the DELETE")),
      s"wanted the replaced-segment guard, got: ${messages(ex)}")
    // the compaction won; nothing was deleted by the failed DELETE
    assert(iso.table("tc.ns.t").count() == 110L)
    // and the retried DELETE (fresh scan against the compacted table)
    // succeeds
    iso.sql("DELETE FROM tc.ns.t WHERE id >= 110")
    assert(iso.table("tc.ns.t").count() == 100L)
  }

  /** Run `body` under an injected [[CommitProvider]], always
    * restoring POSIX — the provider models the filesystem and is
    * process-global. */
  private def withProvider[T](p: CommitProvider)(body: => T): T =
    try { SegManifest.commitProvider = p; body }
    finally SegManifest.commitProvider = PosixCommitProvider

  test("CommitProvider seam: transient exclusive-create failures " +
      "retry through; commits land unchanged") {
    val (iso, wh) = cat("cpflaky")
    iso.sql("CREATE TABLE tc.ns.t (id BIGINT) USING gseg")
    // the store's conditional PUT flakes (spurious precondition
    // failure, the eventual-consistency shape) twice per acquisition
    // — the lock loop's spin-and-recreate must ride over it
    val flakes = new java.util.concurrent.atomic.AtomicInteger(0)
    val p = new CommitProvider {
      override def createExclusive(path: java.nio.file.Path,
          body: Array[Byte]): Unit = {
        if (flakes.getAndIncrement() % 3 != 2)
          throw new java.nio.file.FileAlreadyExistsException(path.toString)
        PosixCommitProvider.createExclusive(path, body)
      }
      override def publish(dir: java.nio.file.Path,
          path: java.nio.file.Path, body: Array[Byte]): Unit =
        PosixCommitProvider.publish(dir, path, body)
    }
    withProvider(p) {
      iso.range(50).writeTo("tc.ns.t").append()
      iso.range(50, 100).writeTo("tc.ns.t").append()
    }
    assert(iso.table("tc.ns.t").count() == 100L)
    assert(SegManifest.read(s"$wh/ns/t").get._1 == 2L)
  }

  test("CommitProvider seam: a NON-ATOMIC publish (torn mid-write " +
      "crash) is detected loudly, never served silently") {
    val (iso, wh) = cat("cptorn")
    iso.sql("CREATE TABLE tc.ns.t (id BIGINT) USING gseg")
    iso.range(100).repartition(4).writeTo("tc.ns.t").append()
    val dir = s"$wh/ns/t"
    assert(iso.table("tc.ns.t").count() == 100L)
    // a fake FS whose second publish of the commit (the LIVE manifest
    // pointer; the first is the snapshot copy) writes a PREFIX
    // in place — no temp, no rename — then dies: the torn-rename
    // shape POSIX forbids and a misconfigured store might not
    var calls = 0
    val p = new CommitProvider {
      override def createExclusive(path: java.nio.file.Path,
          body: Array[Byte]): Unit =
        PosixCommitProvider.createExclusive(path, body)
      override def publish(dir: java.nio.file.Path,
          path: java.nio.file.Path, body: Array[Byte]): Unit = {
        calls += 1
        if (calls == 2) {
          java.nio.file.Files.write(path,
            java.util.Arrays.copyOf(body, (body.length * 3) / 4))
          throw new java.io.IOException("fake store died mid-PUT")
        }
        PosixCommitProvider.publish(dir, path, body)
      }
    }
    withProvider(p) {
      intercept[Exception](
        iso.range(100, 200).repartition(4).writeTo("tc.ns.t").append())
    }
    assert(calls == 2, s"expected the tear on publish #2, saw $calls")
    // the damage is LOUD everywhere downstream: the framing checks
    // (declared count vs body) reject the torn manifest on every
    // read and every subsequent commit — never a silent subset
    val read = intercept[Exception](SegManifest.read(dir))
    assert(read.getMessage.contains("torn manifest"),
      s"got: ${read.getMessage}")
    val commit = intercept[Exception](
      iso.range(200, 300).writeTo("tc.ns.t").append())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(commit).exists(_.contains("torn manifest")),
      s"got: ${messages(commit)}")
    // operator repair: the snapshot copy published ATOMICALLY before
    // the pointer tore — restoring it recovers the committed history
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(dir, ".manifest.v1"),
      java.nio.file.Paths.get(dir, ".manifest"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    assert(iso.table("tc.ns.t").count() == 100L)
  }

  test("branch commit crash seams: a death on either publish strands " +
      "only invisible orphans; vacuum reclaims, a retry lands") {
    val (iso, wh) = cat("brcrash")
    iso.sql("CREATE TABLE tc.ns.t (id BIGINT) USING gseg")
    iso.range(50).writeTo("tc.ns.t").append() // gen 1
    iso.sql("CALL tc.branch('ns.t', 'wap')")
    val dir = s"$wh/ns/t"
    val mainBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, ".manifest"))
    def dieOn(prefix: String): CommitProvider = new CommitProvider {
      override def createExclusive(path: java.nio.file.Path,
          body: Array[Byte]): Unit =
        PosixCommitProvider.createExclusive(path, body)
      override def publish(d: java.nio.file.Path,
          path: java.nio.file.Path, body: Array[Byte]): Unit = {
        if (path.getFileName.toString.startsWith(prefix))
          throw new java.io.IOException(s"fake store died on $prefix")
        PosixCommitProvider.publish(d, path, body)
      }
    }
    iso.conf.set(SegManifest.WapBranchConf, "wap")
    try {
      // seam 1: die on the SNAPSHOT publish — no snapshot, no ref
      // move; only unreferenced final-named segments strand
      withProvider(dieOn(".manifest.v")) {
        intercept[Exception](
          iso.range(50, 80).writeTo("tc.ns.t").append())
      }
      assert(SegManifest.refs(dir)("wap") == ((1L, 1L)),
        "a failed snapshot publish must not move the ref")
      assert(iso.sql("SELECT * FROM tc.ns.t VERSION AS OF 'wap'")
        .count() == 50)
      // seam 2: die on the REF CAS (.refs) — the snapshot exists but
      // is ref-less: above live, not a head ⇒ invisible everywhere
      withProvider(dieOn(".refs")) {
        intercept[Exception](
          iso.range(50, 80).writeTo("tc.ns.t").append())
      }
      assert(SegManifest.refs(dir)("wap") == ((1L, 1L)))
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, ".manifest.v2")),
        "seam-2 fixture: the orphan snapshot must exist")
      intercept[Exception](
        iso.sql("SELECT * FROM tc.ns.t VERSION AS OF 2").collect())
      assert(iso.sql("CALL tc.history('ns.t')").collect()
        .forall(_.getLong(0) != 2L),
        "a ref-less above-live snapshot is not history")
      // main never moved a byte through either crash
      assert(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, ".manifest"))
        .sameElements(mainBytes))
      // vacuum reclaims both strand kinds (orphan segments + the
      // doomed snapshot), keeping gen 1 and the branch intact
      iso.conf.unset(SegManifest.WapBranchConf)
      iso.sql("CALL tc.vacuum('ns.t', keep_last => 1)")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, ".manifest.v2")),
        "vacuum must reclaim the ref-less snapshot")
      assert(iso.table("tc.ns.t").count() == 50)
      // the RETRIED branch commit lands cleanly after the crashes
      iso.conf.set(SegManifest.WapBranchConf, "wap")
      iso.range(50, 80).writeTo("tc.ns.t").append()
      assert(iso.table("tc.ns.t").count() == 80) // branch view
      assert(SegManifest.refs(dir)("wap")._2 == 1L &&
        SegManifest.refs(dir)("wap")._1 > 1L)
    } finally iso.conf.unset(SegManifest.WapBranchConf)
    iso.sql("CALL tc.fast_forward('ns.t', 'wap')")
    assert(iso.table("tc.ns.t").count() == 80)
  }
}
