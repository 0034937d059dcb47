package graft.sources

import java.nio.ByteBuffer
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

/** Positional DELETION VECTORS — the merge-on-read half of gseg's
  * row-level DELETE (the copy-on-write half is [[SegReplaceDataWrite]]).
  *
  * Why they exist (the 100 TB argument): copy-on-write rewrites every
  * segment that loses a row, so `DELETE WHERE id = 7` against a 1 GB
  * segment costs a 1 GB read + 1 GB write + the old file retained as
  * history. A deletion vector records the deleted ROW ORDINALS in a
  * sidecar a few bytes per row, leaves the segment byte-identical,
  * and lets every reader mask the ordinals on the way out — the
  * Iceberg v2 position-delete / Delta deletion-vector model. DELETE
  * cost becomes O(rows deleted), never O(bytes resident).
  *
  * File format (`dv-<uuid>.gdv`, referenced from the generation
  * manifest — v4 lines bind `segment.gseg -> dv-x.gdv`):
  * {{{
  *   int32  magic  0x47445631 ("GDV1")
  *   int32  count
  *   int32[count]  deleted row ordinals, strictly ascending
  * }}}
  * Ordinals address the segment's STORED rows (0-based, pre-mask), so
  * vectors from successive DELETEs union by position without reading
  * the segment. The whole file is length-checkable (8 + 4*count
  * bytes): a torn write is detected, never partially applied.
  *
  * int32 ordinals cap a segment at 2^31-1 stored rows. That cap is
  * not a free-standing assumption: the segment FORMAT itself carries
  * `int nRows`, and every segment's rows pass through ONE in-memory
  * buffer ([[SegDataWriter]]'s ArrayBuffer → `writeSegment`'s
  * IndexedSeq, whose size IS an Int) — a segment with more rows than
  * an ordinal can address is unrepresentable upstream of this file,
  * independent of the byte-budget roll policy. If the format ever
  * grows a 64-bit row count, these ordinals must widen with it.
  *
  * Lifecycle invariants:
  *  - a generation holds AT MOST ONE vector per segment (successive
  *    DELETEs write a merged vector; the superseded one stays with
  *    its generation's snapshot until vacuum);
  *  - vectors never shrink within a lineage — a smaller set only ever
  *    appears by ROLLBACK, which restores an older generation's map
  *    wholesale (the changefeed reads that as resurrection);
  *  - a vector covering every stored row is never written — the
  *    commit drops the segment from the manifest instead;
  *  - segments and vectors are immutable once published: a rewrite
  *    (copy-on-write DML, compaction) applies the mask and the new
  *    file starts vector-free.
  */
object SegDv {
  private val Magic = 0x47445631 // "GDV1"

  /** File-name convention. Dot-free and `[A-Za-z0-9.-]` so manifest
    * line framing holds; `.gdv` keeps [[SegSource.listSegments]] and
    * plain-dir protocols blind to vectors (they are meaningless
    * without the manifest binding them to a segment). */
  def freshName(): String =
    s"dv-${java.util.UUID.randomUUID.toString.take(8)}.gdv"

  def isDvName(n: String): Boolean = n.endsWith(".gdv")

  /** Deleted ordinals, strictly ascending. Throws loudly on a torn,
    * truncated or foreign file — a half-read vector must never
    * half-mask a segment. */
  def read(path: String): Array[Int] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    require(bytes.length >= 8,
      s"gseg dv: $path truncated (${bytes.length} bytes)")
    val bb = ByteBuffer.wrap(bytes)
    require(bb.getInt() == Magic, s"gseg dv: $path is not a deletion vector")
    val n = bb.getInt()
    require(n >= 0 && bytes.length == 8 + 4L * n,
      s"gseg dv: $path torn — header declares $n ordinal(s), " +
        s"body carries ${(bytes.length - 8) / 4}")
    val out = new Array[Int](n)
    var i = 0
    var prev = -1
    while (i < n) {
      out(i) = bb.getInt()
      require(out(i) > prev,
        s"gseg dv: $path ordinals not strictly ascending at index $i")
      prev = out(i)
      i += 1
    }
    out
  }

  /** Deleted-row COUNT without materializing the ordinals — what
    * plan-time statistics and limit/TopN accounting read per file.
    * The length identity (8 + 4*count) doubles as the torn check. */
  def countOf(path: String): Int = {
    val p = Paths.get(path)
    val size = Files.size(p)
    require(size >= 8 && (size - 8) % 4 == 0,
      s"gseg dv: $path has torn length $size")
    ((size - 8) / 4).toInt
  }

  /** Write a vector under its FINAL name (fsync'd temp + atomic
    * rename, the same publish discipline as segments): the name is
    * unreferenced until the manifest swap, so a crash strands an
    * orphan for vacuum, never a live torn file. */
  def write(dir: Path, name: String, positions: Array[Int]): Unit = {
    require(positions.nonEmpty, "gseg dv: refusing to write an empty vector")
    var i = 1
    while (i < positions.length) {
      require(positions(i) > positions(i - 1),
        "gseg dv: ordinals must be strictly ascending")
      i += 1
    }
    val bb = ByteBuffer.allocate(8 + 4 * positions.length)
    bb.putInt(Magic)
    bb.putInt(positions.length)
    positions.foreach(bb.putInt)
    bb.flip()
    val tmp = dir.resolve(
      s".tmp-dv-${java.util.UUID.randomUUID.toString.take(8)}")
    val ch = java.nio.channels.FileChannel.open(tmp,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.TRUNCATE_EXISTING)
    try {
      ch.write(bb)
      ch.force(true)
    } finally ch.close()
    Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Union of an existing vector (if any) with newly deleted
    * ordinals — what a DELETE against an already-vectored segment
    * commits. Both inputs ascending; output ascending, deduplicated. */
  def union(existing: Array[Int], added: Array[Int]): Array[Int] = {
    val out = new Array[Int](existing.length + added.length)
    var i = 0; var j = 0; var k = 0
    while (i < existing.length && j < added.length) {
      val c = Integer.compare(existing(i), added(j))
      if (c < 0) { out(k) = existing(i); i += 1 }
      else if (c > 0) { out(k) = added(j); j += 1 }
      else { out(k) = existing(i); i += 1; j += 1 }
      k += 1
    }
    while (i < existing.length) { out(k) = existing(i); i += 1; k += 1 }
    while (j < added.length) { out(k) = added(j); j += 1; k += 1 }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }
}
