package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import scala.jdk.CollectionConverters._

/** Per-table GENERATION MANIFEST: one small dot-file naming the live
  * segment set, so every commit against a catalog table is a single
  * atomic pointer swap instead of a delete-then-rename choreography.
  *
  * Why it exists (the 100 TB durability argument): a copy-on-write
  * DML rewrites thousands of files per commit. Any protocol that
  * mutates the DIRECTORY as its source of truth has a window — after
  * the first delete, before the last rename — where a driver crash
  * leaves the table serving a partial generation with no recovery
  * pointer. The manifest closes it the way every lakehouse format
  * does (Iceberg snapshots, Delta's log): stage the whole new
  * generation under names no reader resolves, fsync, then swap ONE
  * file with an atomic rename. A crash strictly before the swap
  * leaves the old generation fully live (the staged files are
  * invisible orphans, reclaimed by [[vacuum]]); a crash strictly
  * after serves the new generation completely (the old files are
  * orphans, same reclaim). There is no intermediate state.
  *
  * Scope and migration: CATALOG tables ([[SegCatalog]]) always have a
  * manifest — `createTable` writes one and `loadTable` synthesizes
  * one from the directory listing the first time it sees a dir
  * created by path-based writes. Plain path-based dirs (no manifest)
  * keep the original listing protocol untouched;
  * [[SegSource.resolveSegments]] picks per-dir. Concurrency contract:
  * SINGLE WRITER per table — the swap is atomic against readers and
  * against a crash of the writer itself, not against a second
  * concurrent committer (last swap wins; a production catalog would
  * CAS on the generation number through its metastore).
  *
  * Format (text, one token per line — segment names are this
  * writer's own `[A-Za-z0-9._-]` names, and [[swap]] rejects anything
  * that could break line framing):
  * {{{
  *   gseg-manifest-v1
  *   <generation counter>
  *   <segment file name>     (zero or more, sorted)
  * }}}
  */
object SegManifest {
  private[sources] val FileName = ".manifest"

  def manifestPath(dir: String): Path = Paths.get(dir).resolve(FileName)
  def exists(dir: String): Boolean = Files.exists(manifestPath(dir))

  /** (generation, segment file NAMES) — None when the dir carries no
    * manifest (path-based dir: callers fall back to the listing). */
  def read(dir: String): Option[(Long, Seq[String])] = {
    val p = manifestPath(dir)
    if (!Files.exists(p)) return None
    val lines = Files.readAllLines(p, UTF_8).asScala.toSeq
    require(lines.nonEmpty && lines.head == "gseg-manifest-v1",
      s"gseg: unrecognized manifest header in $p")
    Some((lines(1).toLong, lines.drop(2).filter(_.nonEmpty)))
  }

  /** The live generation as absolute segment paths, sorted. */
  def segments(dir: String): Option[Seq[String]] =
    read(dir).map(_._2.sorted.map(n => s"$dir/$n"))

  /** THE commit point: write the next generation to a hidden temp,
    * fsync it, and atomically rename it over the manifest. Returns
    * the new generation number. Readers see the old set or the new
    * set, never a mixture. A SNAPSHOT copy (`.manifest.v<gen>`) is
    * written BEFORE the pointer moves, so every committed generation
    * is time-travelable (`VERSION AS OF` resolves through it) until
    * [[vacuum]] retires it; a crash between snapshot and swap leaves
    * a harmless never-committed snapshot that the retried commit
    * overwrites under the same generation number. */
  def swap(dir: String, names: Seq[String]): Long = {
    names.foreach(n => require(
      n.nonEmpty && !n.exists(c => c == '\n' || c == '\r' || c == '/'),
      s"gseg: segment name breaks manifest framing: '$n'"))
    val gen = read(dir).map(_._1 + 1).getOrElse(0L)
    val body = ("gseg-manifest-v1" +: gen.toString +: names.sorted)
      .mkString("\n").getBytes(UTF_8)
    def writeFsynced(target: Path, viaTmp: Boolean): Unit = {
      val tmp = if (viaTmp) Paths.get(dir).resolve(
        s".manifest.tmp-${java.util.UUID.randomUUID.toString.take(8)}")
        else target
      val ch = java.nio.channels.FileChannel.open(tmp,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE,
        StandardOpenOption.TRUNCATE_EXISTING)
      try {
        ch.write(java.nio.ByteBuffer.wrap(body))
        ch.force(true)
      } finally ch.close()
      if (viaTmp)
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
    }
    writeFsynced(snapshotPath(dir, gen), viaTmp = false)
    writeFsynced(manifestPath(dir), viaTmp = true)
    // best-effort directory fsync so the rename itself is durable
    try {
      val dch = java.nio.channels.FileChannel.open(Paths.get(dir),
        StandardOpenOption.READ)
      try dch.force(true) finally dch.close()
    } catch { case _: Exception => () }
    gen
  }

  // ---------------- snapshots (time travel) ----------------

  private[sources] def snapshotPath(dir: String, gen: Long): Path =
    Paths.get(dir).resolve(s".manifest.v$gen")

  /** Segment NAMES of a committed generation, if its snapshot is
    * still retained (vacuum retires snapshots whose files it
    * reclaims). */
  def readSnapshot(dir: String, gen: Long): Option[Seq[String]] = {
    val p = snapshotPath(dir, gen)
    if (!Files.exists(p)) return None
    val lines = Files.readAllLines(p, UTF_8).asScala.toSeq
    require(lines.nonEmpty && lines.head == "gseg-manifest-v1",
      s"gseg: unrecognized manifest header in $p")
    Some(lines.drop(2).filter(_.nonEmpty))
  }

  /** Retained (generation, snapshot mtime millis), ascending — the
    * TIMESTAMP AS OF resolution table. */
  def listSnapshots(dir: String): Seq[(Long, Long)] = {
    val l = Files.list(Paths.get(dir))
    try l.iterator().asScala.flatMap { p =>
      val n = p.getFileName.toString
      if (n.startsWith(".manifest.v") && !n.contains("tmp"))
        scala.util.Try(n.stripPrefix(".manifest.v").toLong).toOption
          .map(g => (g, Files.getLastModifiedTime(p).toMillis))
      else None
    }.toSeq.sortBy(_._1)
    finally l.close()
  }

  /** Synthesize the manifest from the directory listing if absent —
    * the migration moment for dirs created by path-based writes
    * before they are first served through the catalog. */
  def ensure(dir: String): Unit =
    if (!exists(dir)) {
      swap(dir, SegSource.listSegments(dir)
        .map(f => Paths.get(f).getFileName.toString))
    }

  /** Reclaim `.gseg` files outside the LIVE generation — superseded
    * generations retained for time travel, the orphans a crashed
    * commit strands (staged-but-unswapped), stale staging temps — and
    * RETIRE the snapshots that reference any reclaimed file, so a
    * later `VERSION AS OF` fails with "snapshot retired" instead of a
    * dangling-file read (the Delta/Iceberg retention model: vacuum
    * bounds the time-travel window; the current generation's snapshot
    * references only live files and always survives). Safe at any
    * time under the single-writer contract — nothing outside the
    * manifest is reader-reachable except through snapshots, which
    * retire BEFORE their files go. Returns the deleted segment
    * names. */
  def vacuum(dir: String): Seq[String] = {
    val live = read(dir) match {
      case Some((_, names)) => names.toSet
      case None => return Nil
    }
    val l = Files.list(Paths.get(dir))
    val junk =
      try l.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        (n.endsWith(".gseg") && !n.startsWith(".") && !live.contains(n)) ||
          n.startsWith(".tmp-") || n.startsWith(".manifest.tmp-")
      }.toList
      finally l.close()
    val junkNames = junk.map(_.getFileName.toString).toSet
    listSnapshots(dir).foreach { case (gen, _) =>
      if (readSnapshot(dir, gen).exists(_.exists(junkNames.contains)))
        Files.deleteIfExists(snapshotPath(dir, gen))
    }
    junk.foreach(p => Files.deleteIfExists(p))
    junkNames.toSeq.sorted
  }
}
