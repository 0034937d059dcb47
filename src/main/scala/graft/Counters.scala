package graft

import java.util.concurrent.ConcurrentHashMap

/** Driver-side named counters for per-query execution diagnostics the
  * SparkListener can't see — iterative-loop round counts, adaptive
  * path choices. Operators record here; [[Bench]] snapshots the
  * registry after each query and writes the values into
  * `target/bench_metrics.json` under that query's entry, so a
  * driver-vs-local divergence (e.g. more CC propagation rounds after a
  * corpus regeneration changed the dup-graph diameter) is
  * self-diagnosing from the metrics line alone.
  *
  * All recording happens on the driver thread that builds/materializes
  * the query (the loops run in driver code; executors never touch
  * this), so the ConcurrentHashMap is only defending against the
  * listener-thread snapshot, not racing writers.
  */
object Counters {
  private val reg = new ConcurrentHashMap[String, Long]()

  /** Accumulate `n` into counter `name` (loops that may run more than
    * once per query — e.g. two connectedComponents calls — sum up). */
  def add(name: String, n: Long): Unit =
    reg.merge(name, n, (a, b) => a + b)

  /** Non-destructive read of one counter (0 when unset) — lets a gate
    * assert on a counter mid-query without stealing it from Bench's
    * per-query drain. */
  def peek(name: String): Long = reg.getOrDefault(name, 0L)

  def snapshot(): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    reg.asScala.toMap
  }

  def clear(): Unit = reg.clear()

  /** Snapshot-then-clear, for per-query attribution. */
  def drain(): Map[String, Long] = {
    val s = snapshot(); clear(); s
  }
}
