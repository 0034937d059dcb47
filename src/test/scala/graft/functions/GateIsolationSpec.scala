package graft.functions

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The conf-mutating gates (bloom-join pins, stream gates' shuffle-
  * partition pin) run on a gate-private `newSession()` child. This
  * spec proves the isolation property they exist for: a query running
  * CONCURRENTLY on the caller's session keeps its broadcast plan even
  * while the gate has broadcasts force-disabled on its child — under
  * the old shared-session set/restore, this loop would observe
  * SortMergeJoin plans whenever it raced the gate's pinned window. */
class GateIsolationSpec extends SparkSpec {
  test("bloom gate's broadcast-off pin is invisible to concurrent queries") {
    val gate = Future(Gates.bloomJoinGate(spark, sfDir).collect())
    var checked = 0
    while (!gate.isCompleted && checked < 200) {
      val plan = Tables.lineitem(spark, sfDir)
        .join(Tables.nation(spark, sfDir).limit(5), // tiny side: must broadcast
          col("l_suppkey") === col("n_nationkey"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        "caller-session plan lost its broadcast while the gate ran")
      checked += 1
    }
    val row = Await.result(gate, 120.seconds)
    assert(row(0).getBoolean(0) && row(0).getBoolean(1))
    assert(checked > 0, "gate finished before any concurrent plan was built")
  }

  test("bloom gate leaves the caller session's confs untouched") {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val before = keys.map(k => spark.conf.getOption(k))
    Gates.bloomJoinGate(spark, sfDir).collect()
    assert(keys.map(k => spark.conf.getOption(k)) === before)
  }
}
