package graft.operators

import graft.SparkSpec

class BucketedJoinSpec extends SparkSpec {
  test("bucketed join needs no shuffle once broadcast is off the table") {
    // at tiny SF Catalyst rightly broadcasts; force the at-scale shape
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = CoreOps.b1BucketedJoin(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // everything under the join must read pre-bucketed data: no
      // Exchange between the join and its scans
      val belowJoin = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!belowJoin.contains("Exchange"),
        s"bucketed join inputs were shuffled:\n$belowJoin")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
  }
}
