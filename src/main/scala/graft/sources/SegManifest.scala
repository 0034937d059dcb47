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
    * set, never a mixture. */
  def swap(dir: String, names: Seq[String]): Long = {
    names.foreach(n => require(
      n.nonEmpty && !n.exists(c => c == '\n' || c == '\r' || c == '/'),
      s"gseg: segment name breaks manifest framing: '$n'"))
    val gen = read(dir).map(_._1 + 1).getOrElse(0L)
    val body = ("gseg-manifest-v1" +: gen.toString +: names.sorted)
      .mkString("\n")
    val tmp = Paths.get(dir).resolve(
      s".manifest.tmp-${java.util.UUID.randomUUID.toString.take(8)}")
    val ch = java.nio.channels.FileChannel.open(tmp,
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    try {
      ch.write(java.nio.ByteBuffer.wrap(body.getBytes(UTF_8)))
      ch.force(true)
    } finally ch.close()
    Files.move(tmp, manifestPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // best-effort directory fsync so the rename itself is durable
    try {
      val dch = java.nio.channels.FileChannel.open(Paths.get(dir),
        StandardOpenOption.READ)
      try dch.force(true) finally dch.close()
    } catch { case _: Exception => () }
    gen
  }

  /** Synthesize the manifest from the directory listing if absent —
    * the migration moment for dirs created by path-based writes
    * before they are first served through the catalog. */
  def ensure(dir: String): Unit =
    if (!exists(dir)) {
      swap(dir, SegSource.listSegments(dir)
        .map(f => Paths.get(f).getFileName.toString))
    }

  /** Reclaim orphans: `.gseg` files outside the live generation
    * (staged by a commit that died before its swap, or superseded by
    * one that died before its GC) plus stale staging temps. Safe at
    * any time under the single-writer contract — nothing outside the
    * manifest is reachable by a reader. Returns the deleted names. */
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
    junk.foreach(p => Files.deleteIfExists(p))
    junk.map(_.getFileName.toString).sorted
  }
}
