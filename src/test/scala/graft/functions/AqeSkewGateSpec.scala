package graft.functions

import graft.SparkSpec

/** The AQE skew gate must really take the skew path at unit scale too
  * (the driver checks the booleans at sf0.01; this catches a silent
  * skew-rule disengagement — threshold drift, a lost repartition —
  * at test time). */
class AqeSkewGateSpec extends SparkSpec {
  test("adaptive skew join engages and preserves results") {
    val row = Gates.aqeSkewJoinGate(spark, sfDir).collect()
    assert(row.length === 1)
    assert(row(0).getBoolean(0), "AQE did not take the skew-join path")
    assert(row(0).getBoolean(1), "skew-split result diverged from default plan")
    assert(row(0).getLong(2) > 0)
  }
}
