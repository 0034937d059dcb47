package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query once, emits ONE JSON
  * line with per-query wall-clock seconds PLUS per-query execution
  * metrics from a SparkListener (jobs, stages, tasks, shuffle bytes,
  * spill, GC, executor time). Wall-clock alone can't distinguish "the
  * plan regressed" from "the box was contended" — after two rounds of
  * driver-vs-local bench mysteries on dedup_corpus, the metrics make
  * the next divergence diagnosable in-round: same jobs/shuffle-bytes
  * but 10× wall-clock = contention; more jobs or spill = a real plan
  * regression. */
object Bench {
  /** Per-query execution counters, attributed via job group. */
  private final class QMetrics {
    var jobs, stages, tasks = 0L
    var shuffleRead, shuffleWrite, memSpill, diskSpill = 0L
    var gcMs, execMs = 0L
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val metrics = new ConcurrentHashMap[String, QMetrics]()
    val stageOwner = new ConcurrentHashMap[Int, String]()
    val knownQueries = SparkEntry.queries.keySet
    @volatile var current = "warmup"
    def forQuery(name: String): QMetrics =
      metrics.computeIfAbsent(name, _ => new QMetrics)
    // jobs carry the query name as their job group; stages inherit it
    // through the job that submitted them. A job group that is NOT a
    // registered query name still maps to the current query — Spark's
    // own machinery overwrites the group on threads it owns (e.g.
    // StreamExecution sets the stream's runId UUID), and those
    // micro-batch jobs belong to whichever query is running
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val name = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
          .filter(knownQueries.contains)
          .getOrElse(current)
        val m = forQuery(name)
        m.synchronized { m.jobs += 1 }
        j.stageInfos.foreach(si => stageOwner.put(si.stageId, name))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = forQuery(stageOwner.getOrDefault(si.stageId, current))
        val tm = si.taskMetrics
        if (tm != null) m.synchronized {
          m.stages += 1
          m.tasks += si.numTasks
          m.shuffleRead += tm.shuffleReadMetrics.totalBytesRead
          m.shuffleWrite += tm.shuffleWriteMetrics.bytesWritten
          m.memSpill += tm.memoryBytesSpilled
          m.diskSpill += tm.diskBytesSpilled
          m.gcMs += tm.jvmGCTime
          m.execMs += tm.executorRunTime
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // absorb one-time JVM/codegen/reader init so the first timed query
    // isn't charged for session warmup
    SparkEntry.queries.get("a5_global_agg").foreach(_(spark, sfDir).count())
    // a failed query records -1, never a bogus elapsed time
    val results = SparkEntry.queries.map { case (name, fn) =>
      // queries that persist intermediates (dedup/LSH) must not leak
      // cached blocks into later queries: a full storage pool evicts
      // blocks mid-query and recompute cascades (round-1 dedup_corpus)
      spark.catalog.clearCache()
      current = name
      spark.sparkContext.setJobGroup(name, name, interruptOnCancel = false)
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
      }
      spark.sparkContext.clearJobGroup()
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // listener events are delivered async; wait until the counters
    // stop moving (two consecutive stable snapshots) before reading —
    // a fixed sleep undercounts exactly when the box is contended,
    // which is when these numbers matter most
    def snapshot(): (Long, Long) = {
      var j = 0L; var st = 0L
      metrics.forEach { (_, m) => m.synchronized { j += m.jobs; st += m.stages } }
      (j, st)
    }
    var prev = snapshot()
    var stable = 0
    var waited = 0
    while (stable < 2 && waited < 15000) {
      Thread.sleep(250); waited += 250
      val cur = snapshot()
      if (cur == prev) stable += 1 else { stable = 0; prev = cur }
    }

    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def mb(b: Long): Double = math.round(b / 1048.576) / 1000.0
    val ms = results.keys.map { k =>
      val m = metrics.getOrDefault(k, new QMetrics)
      s""""$k":{"jobs":${m.jobs},"stages":${m.stages},"tasks":${m.tasks},""" +
        s""""shuffle_read_mb":${mb(m.shuffleRead)},"shuffle_write_mb":${mb(m.shuffleWrite)},""" +
        s""""spill_mem_mb":${mb(m.memSpill)},"spill_disk_mb":${mb(m.diskSpill)},""" +
        s""""gc_ms":${m.gcMs},"exec_ms":${m.execMs}}"""
    }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","metrics":$ms}""")
    spark.stop()
  }
}
