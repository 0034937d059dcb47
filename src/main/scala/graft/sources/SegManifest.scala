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
  * [[SegSource.resolveSegments]] picks per-dir.
  *
  * Concurrency contract: the swap is OPTIMISTIC — a committer reads
  * the generation it is replacing and passes it as `expectGen`; the
  * swap re-checks under a per-table lock and throws a retryable
  * [[SegManifest.CommitConflictException]] if the live pointer moved
  * in between, so two racing committers can never silently
  * last-swap-wins each other's files out of the table. The lock is
  * JVM-wide (all Spark drivers in local mode share it); a
  * multi-driver deployment would route the same compare-and-swap
  * through its metastore — the protocol shape here is exactly that
  * CAS, with the filesystem rename as the publish step.
  *
  * Format v2 (text, one token per line — segment names are this
  * writer's own `[A-Za-z0-9._-]` names, and [[swap]] rejects anything
  * that could break line framing):
  * {{{
  *   gseg-manifest-v2
  *   <generation counter>
  *   <commit epoch millis>       (the embedded commit clock)
  *   <segment count>             (torn-write detector)
  *   <segment file name>         (exactly count lines, sorted)
  * }}}
  * v1 files (no clock, no count) remain readable: the clock falls
  * back to file mtime and the count check is skipped — strictly the
  * old guarantees for old files, never a refusal to read them.
  */
object SegManifest {
  private[sources] val FileName = ".manifest"

  /** A racing writer moved the live pointer between this committer's
    * read and its swap. Retryable: re-read the manifest, re-resolve
    * conflicts, commit again. */
  class CommitConflictException(msg: String)
    extends RuntimeException(msg)

  /** Parsed manifest/snapshot body. `commitMs` is None for v1 files
    * (callers fall back to file mtime). */
  private[sources] case class Manifest(gen: Long, commitMs: Option[Long],
      names: Seq[String])

  // per-table commit lock: closes the read-check-rename window for
  // same-JVM committers (local mode = every committer); see the
  // concurrency contract above
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(dir: String): Object =
    locks.computeIfAbsent(
      Paths.get(dir).toAbsolutePath.normalize.toString, _ => new Object)

  def manifestPath(dir: String): Path = Paths.get(dir).resolve(FileName)
  def exists(dir: String): Boolean = Files.exists(manifestPath(dir))

  /** Parse a manifest body, v1 or v2. Throws loudly on a torn or
    * foreign file — a v2 body whose name count disagrees with its
    * header is a detected partial write, never a partial read. */
  private[sources] def parse(lines: Seq[String], where: String): Manifest = {
    require(lines.nonEmpty, s"gseg: empty manifest $where")
    lines.head match {
      case "gseg-manifest-v1" =>
        Manifest(lines(1).toLong, None, lines.drop(2).filter(_.nonEmpty))
      case "gseg-manifest-v2" =>
        require(lines.length >= 4, s"gseg: truncated manifest $where")
        val names = lines.drop(4).filter(_.nonEmpty)
        val declared = lines(3).toInt
        require(names.length == declared,
          s"gseg: torn manifest $where — header declares $declared " +
            s"segment(s), body carries ${names.length}")
        Manifest(lines(1).toLong, Some(lines(2).toLong), names)
      case other => throw new IllegalArgumentException(
        s"gseg: unrecognized manifest header '$other' in $where")
    }
  }

  private def parseFile(p: Path): Manifest =
    parse(Files.readAllLines(p, UTF_8).asScala.toSeq, p.toString)

  private[sources] def readManifest(dir: String): Option[Manifest] = {
    val p = manifestPath(dir)
    if (Files.exists(p)) Some(parseFile(p)) else None
  }

  /** (generation, segment file NAMES) — None when the dir carries no
    * manifest (path-based dir: callers fall back to the listing). */
  def read(dir: String): Option[(Long, Seq[String])] =
    readManifest(dir).map(m => (m.gen, m.names))

  /** The live generation as absolute segment paths, sorted. */
  def segments(dir: String): Option[Seq[String]] =
    read(dir).map(_._2.sorted.map(n => s"$dir/$n"))

  /** THE commit point: write the next generation to a hidden temp,
    * fsync it, and atomically rename it over the manifest. Returns
    * the new generation number. Readers see the old set or the new
    * set, never a mixture. A SNAPSHOT copy (`.manifest.v<gen>`) is
    * written (same tmp + ATOMIC_MOVE discipline — a crash can strand
    * a stale temp for vacuum, never a torn snapshot) BEFORE the
    * pointer moves, so every committed generation is time-travelable
    * until [[vacuum]] retires it; a crash between snapshot and swap
    * leaves a never-committed snapshot for gen = live+1, which every
    * resolution path rejects (gen above the live pointer) and the
    * retried commit overwrites under the same generation number.
    *
    * `expectGen` is the optimistic-concurrency check: the generation
    * this committer READ when it started (None = a fresh table with
    * no manifest yet). A mismatch under the lock throws
    * [[CommitConflictException]] and writes nothing. */
  def swap(dir: String, names: Seq[String],
      expectGen: Option[Option[Long]] = None): Long = {
    names.foreach(n => require(
      n.nonEmpty && !n.exists(c => c == '\n' || c == '\r' || c == '/'),
      s"gseg: segment name breaks manifest framing: '$n'"))
    lockFor(dir).synchronized {
      val live = readManifest(dir).map(_.gen)
      expectGen.foreach { e =>
        if (e != live) throw new CommitConflictException(
          s"gseg: concurrent commit on $dir — this committer read " +
            s"generation ${e.getOrElse("<none>")} but the live " +
            s"generation is now ${live.getOrElse("<none>")}; " +
            "re-read the table and retry the commit")
      }
      val gen = live.map(_ + 1).getOrElse(0L)
      val sorted = names.sorted
      val body = ("gseg-manifest-v2" +: gen.toString +:
        System.currentTimeMillis.toString +:
        sorted.length.toString +: sorted).mkString("\n").getBytes(UTF_8)
      def writeFsynced(target: Path): Unit = {
        val tmp = Paths.get(dir).resolve(
          s".manifest.tmp-${java.util.UUID.randomUUID.toString.take(8)}")
        val ch = java.nio.channels.FileChannel.open(tmp,
          StandardOpenOption.CREATE, StandardOpenOption.WRITE,
          StandardOpenOption.TRUNCATE_EXISTING)
        try {
          ch.write(java.nio.ByteBuffer.wrap(body))
          ch.force(true)
        } finally ch.close()
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
      }
      writeFsynced(snapshotPath(dir, gen))
      writeFsynced(manifestPath(dir))
      // best-effort directory fsync so the rename itself is durable
      try {
        val dch = java.nio.channels.FileChannel.open(Paths.get(dir),
          StandardOpenOption.READ)
        try dch.force(true) finally dch.close()
      } catch { case _: Exception => () }
      gen
    }
  }

  // ---------------- snapshots (time travel) ----------------

  private[sources] def snapshotPath(dir: String, gen: Long): Path =
    Paths.get(dir).resolve(s".manifest.v$gen")

  /** Segment NAMES of a COMMITTED generation, if its snapshot is
    * still retained (vacuum retires snapshots whose files it
    * reclaims). Generations above the live pointer are rejected as
    * never-committed even when a snapshot file exists — the artifact
    * a crash between snapshot write and manifest swap strands. Torn
    * snapshot bodies throw (v2 count check), never partial-read. */
  def readSnapshot(dir: String, gen: Long): Option[Seq[String]] = {
    val p = snapshotPath(dir, gen)
    if (!Files.exists(p)) return None
    if (!readManifest(dir).exists(_.gen >= gen)) return None
    Some(parseFile(p).names)
  }

  /** Retained COMMITTED (generation, commit-clock millis), ascending —
    * the TIMESTAMP AS OF / history resolution table. The clock is the
    * v2 snapshot's embedded commit timestamp (file mtime for v1
    * legacy snapshots); staged-but-never-swapped generations (above
    * the live pointer) and unreadable snapshots are excluded. */
  def listSnapshots(dir: String): Seq[(Long, Long)] = {
    val live = readManifest(dir).map(_.gen).getOrElse(return Nil)
    rawSnapshotGens(dir).filter(_ <= live).flatMap { g =>
      val p = snapshotPath(dir, g)
      scala.util.Try(parseFile(p)).toOption.map(m =>
        (g, m.commitMs.getOrElse(Files.getLastModifiedTime(p).toMillis)))
    }.sortBy(_._1)
  }

  /** EVERY `.manifest.v<gen>` on disk, committed or not, readable or
    * not — the reclaim-side view ([[vacuum]] judges each one). */
  private def rawSnapshotGens(dir: String): Seq[Long] = {
    val l = Files.list(Paths.get(dir))
    try l.iterator().asScala.flatMap { p =>
      val n = p.getFileName.toString
      if (n.startsWith(".manifest.v") && !n.contains("tmp"))
        scala.util.Try(n.stripPrefix(".manifest.v").toLong).toOption
      else None
    }.toSeq.sorted
    finally l.close()
  }

  /** Synthesize the manifest from the directory listing if absent —
    * the migration moment for dirs created by path-based writes
    * before they are first served through the catalog. */
  def ensure(dir: String): Unit =
    lockFor(dir).synchronized {
      if (!exists(dir)) {
        swap(dir, SegSource.listSegments(dir)
          .map(f => Paths.get(f).getFileName.toString),
          expectGen = Some(None))
      }
    }

  /** Reclaim storage outside the RETAINED time-travel window. The
    * PROTECTED set is the live generation plus the `keepLast - 1`
    * most recent committed generations before it (default 1 = live
    * only); every segment file no protected generation references is
    * reclaimed: superseded generations past the window, the orphans
    * a crashed commit strands on either side of its swap
    * (staged-but-unswapped files, phantom snapshots above the live
    * pointer), stale `.tmp-` / `.manifest.tmp-` staging temps, and
    * `.compact-tmp-` directories a driver crash stranded mid-CALL
    * compact. Snapshots retire only when a file they reference is
    * reclaimed (a snapshot whose files are all still live costs one
    * small file and stays travelable — the copy-on-write sharing
    * model), when they are phantom (gen above the live pointer), or
    * when they are unreadable — torn legacy snapshots are DELETED,
    * not thrown on: the reclaim procedure must never be blocked by
    * the very corruption it exists to clean up. Snapshots retire
    * BEFORE their files go, so no retained snapshot ever references
    * a deleted file. Returns the reclaimed names, sorted. */
  def vacuum(dir: String, keepLast: Int = 1): Seq[String] = {
    require(keepLast >= 1, s"gseg vacuum: keep_last $keepLast < 1")
    lockFor(dir).synchronized {
      val live = readManifest(dir) match {
        case Some(m) => m
        case None => return Nil
      }
      val raw = rawSnapshotGens(dir)
      val readable: Map[Long, Seq[String]] =
        raw.flatMap(g => scala.util.Try(parseFile(snapshotPath(dir, g)))
          .toOption.map(m => g -> m.names)).toMap
      val keptGens = (readable.keys.filter(_ <= live.gen).toSeq :+ live.gen)
        .distinct.sorted.takeRight(keepLast).toSet
      val protectedNames = live.names.toSet ++
        keptGens.flatMap(g => readable.getOrElse(g, Nil))
      // reclaim-side listing: files outside every protected
      // generation, plus stranded staging temps/dirs
      val l = Files.list(Paths.get(dir))
      val junk =
        try l.iterator().asScala.filter { p =>
          val n = p.getFileName.toString
          (n.endsWith(".gseg") && !n.startsWith(".") &&
            !protectedNames.contains(n)) ||
            // CTAS/RTAS publish dot-hidden segment names through the
            // manifest; unprotected ones are crashed-commit strands
            (n.startsWith(".ctas-") && n.endsWith(".gseg") &&
              !protectedNames.contains(n)) ||
            n.startsWith(".tmp-") || n.startsWith(".manifest.tmp-") ||
            n.startsWith(".compact-tmp-") || n.startsWith(".ctas-tmp-")
        }.toList
        finally l.close()
      val junkNames = junk.map(_.getFileName.toString).toSet
      // retire doomed snapshots BEFORE any file goes
      raw.foreach { g =>
        val doomed = g > live.gen || !readable.contains(g) ||
          readable(g).exists(junkNames.contains)
        if (doomed && g != live.gen)
          Files.deleteIfExists(snapshotPath(dir, g))
      }
      junk.foreach { p =>
        if (Files.isDirectory(p)) graft.Fs.deleteRecursively(p)
        else Files.deleteIfExists(p)
      }
      junkNames.toSeq.sorted
    }
  }
}
