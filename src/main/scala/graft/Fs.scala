package graft

/** Tiny filesystem helpers shared across the engine's scratch-dir
  * lifecycles (format-roundtrip queries, streaming gates, specs) so
  * the repo carries ONE recursive delete instead of per-site copies
  * that drift on symlink/error handling. */
object Fs {
  /** Best-effort recursive delete: children before parents, individual
    * failures swallowed (scratch cleanup must never fail the caller —
    * a half-deleted temp dir is strictly better than a crashed gate or
    * shutdown hook). Missing paths are a no-op. Does not follow
    * symlinks (Files.walk default). */
  def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => try java.nio.file.Files.delete(f)
          catch { case _: Throwable => () })
      finally walk.close()
    }

  def deleteRecursively(dir: String): Unit =
    deleteRecursively(java.nio.file.Paths.get(dir))
}
