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

  // per-JVM tag on scratch dirs: a concurrent second JVM on the same sf
  // dir (Verify overlapping Bench on a contended box) must not overwrite
  // files the first is mid-scan on
  private val jvmTag =
    Integer.toHexString(java.lang.management.ManagementFactory
      .getRuntimeMXBean.getName.hashCode)

  /** Scratch dir for write-then-read-back queries, keyed by
    * (prefix, dataset, JVM, SESSION): two sessions in one JVM running
    * the same query concurrently get disjoint dirs (an overwrite would
    * race a scan already planned on the other session), while same-
    * session reruns reuse one dir instead of accreting a copy per run
    * (Bench passes the suite multiple times). Registered for deletion
    * on JVM exit — no reads can be in flight once the JVM is down. */
  def scratchDir(s: org.apache.spark.sql.SparkSession, prefix: String,
      d: String): String = {
    val dir = sys.props("java.io.tmpdir") + s"/${prefix}_" +
      d.replaceAll("[^A-Za-z0-9.]", "_") + "_" + jvmTag + "_" +
      Integer.toHexString(System.identityHashCode(s))
    cleanupOnExit(dir)
    dir
  }

  /** tmpfs-backed base for KB-scale gate scaffolding (stream-gate
    * inputs, checkpoints, external state stores): each micro-batch
    * writes offset/commit logs and state files whose fsync latency on
    * a disk-backed /tmp dominates the gates' fixed floor; on /dev/shm
    * it's a memory write. Falls back to java.io.tmpdir when no
    * writable tmpfs exists. Production checkpoints belong on durable
    * storage — this is for the parity gates' throwaway dirs only,
    * which are deleted within the query that made them. */
  lazy val fastTmpBase: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (java.nio.file.Files.isDirectory(shm) &&
        java.nio.file.Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
    base
  }

  /** Temp dir on the fast base (see [[fastTmpBase]]). */
  def fastTempDir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(fastTmpBase, prefix)

  private val exitCleanup =
    java.util.Collections.synchronizedSet(new java.util.HashSet[String]())
  private def cleanupOnExit(dir: String): Unit =
    if (exitCleanup.add(dir)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        deleteRecursively(dir)))
    }
}
