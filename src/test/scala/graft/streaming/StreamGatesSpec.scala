package graft.streaming

import graft.SparkSpec

/** The driver checks the gate's booleans against a constant-true
  * oracle at sf0.01; this pins the same result at sf0.001 so a parity
  * break is caught at unit-test time, not round time. */
class StreamGatesSpec extends SparkSpec {
  test("stream==batch parity gate returns all-true booleans") {
    val row = StreamGates.streamBatchParity(spark, sfDir).collect()
    assert(row.length === 1)
    assert(row(0).getBoolean(0), "tumbling window stream != batch")
    assert(row(0).getBoolean(1), "flushed sessions stream != batch")
  }

  test("native session_window stream == batch sessions, gate true") {
    val row = StreamGates.streamSessionParity(spark, sfDir).collect()
    assert(row.length === 1)
    assert(row(0).getBoolean(0), "session_window stream != batch")
    assert(row(0).getLong(1) > 0, "no sessions finalized")
  }

  test("AvailableNow gate: two incremental drains reconstruct the batch exactly") {
    val row = StreamGates.streamAvailableNowParity(spark, sfDir).collect()
    assert(row.length === 1)
    assert(row(0).getBoolean(0),
      "incremental AvailableNow drains != one-shot batch")
    assert(row(0).getLong(1) > 0)
  }

  test("incremental near-dup stream matches the batch LSH referee") {
    val row = StreamGates.streamNearDupParity(spark, sfDir).collect()
    assert(row.length === 1)
    assert(row(0).getBoolean(0),
      "streamed near-dup decisions != arrival-oriented batch LSH pairs")
    assert(row(0).getBoolean(1), "stream did not run as 2 micro-batches")
    assert(row(0).getLong(2) > 0)
  }

  test("micro-batch quantile grids merge within the rank-error contract") {
    val row = StreamGates.streamQuantileParity(spark, sfDir).collect()
    assert(row.length === 1)
    assert(row(0).getBoolean(0),
      "merged per-batch quantile grids broke the p·N ± εN rank bound")
    assert(row(0).getLong(1) === 2L, "stream did not run as 2 micro-batches")
    assert(row(0).getLong(2) > 0)
  }

  test("stream-stream join pairs equal the batch join across micro-batches") {
    graft.Counters.clear()
    val row = StreamGates.streamJoinParity(spark, sfDir).collect()
    assert(row.length === 1)
    assert(row(0).getBoolean(0),
      "watermarked stream-stream join pairs != batch join pairs")
    assert(row(0).getLong(1) > 0, "no view->click pairs joined")
    // the pair-anchored cut guarantees at least one match spans the
    // micro-batch boundary — the cross-batch-state claim is not
    // allowed to be vacuous (recorded synchronously by the gate)
    assert(graft.Counters.peek("sjp_cross_batch_pairs") >= 1L,
      "no matched pair straddled the batch cut")
    assert(row(0).getBoolean(2),
      "join state was not served by the pinned RocksDB provider " +
        "(checkpoint on-disk shapes)")
  }

  test("transformWithState running totals equal the batch aggregate") {
    val row = StreamGates.streamTwsParity(spark, sfDir).collect()
    assert(row.length === 1)
    assert(row(0).getBoolean(0),
      "transformWithState per-user totals != batch aggregate")
    assert(row(0).getLong(1) > 0, "no users streamed")
    assert(row(0).getBoolean(2),
      "tws state was not served by the pinned RocksDB provider")
  }

  test("tws event-time timers flush exactly the dangling final sessions") {
    graft.Counters.clear()
    val row = StreamGates.streamTwsTimerParity(spark, sfDir).collect()
    assert(row.length === 1)
    assert(row(0).getBoolean(0),
      "timer-driven tws sessions != batch sessionization, or a timer " +
        "flushed a non-final session")
    // non-vacuity: registered-in-batch-1 timers really fired in the
    // sentinel batches — at least one flush, recorded for bench
    assert(row(0).getLong(1) >= 1L, "no timer-fired flush happened")
    assert(graft.Counters.peek("stt_timer_flushed") >= 1L,
      "timer-flush count not counter-recorded")
    assert(row(0).getLong(2) >= row(0).getLong(1),
      "sessions must be at least the flushed finals")
  }

  test("tws initial state seeds the fold; stream continues from the batch past") {
    val row = StreamGates.streamTwsInitParity(spark, sfDir).collect()
    assert(row.length === 1)
    assert(row(0).getBoolean(0),
      "bootstrapped totals != batch aggregate over past ∪ increment")
    assert(row(0).getLong(1) > 0, "no users streamed the increment")
    // ≥1 user must have state seeded by handleInitialState AND then
    // extended by stream input — otherwise the bootstrap is vacuous
    assert(row(0).getLong(2) >= 1L, "no seeded-then-extended user")
  }

  test("last-K window relation: tail cut forces cross-batch ListState reads") {
    graft.Counters.clear()
    val rows = StreamGates.streamLastKParity(spark, sfDir).collect()
    assert(rows.nonEmpty, "no per-user last-K rows emitted")
    // every user's window is bounded by K and non-empty
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 5),
      "lastk_n outside [1, K]")
    // the tail cut must make the cross-batch buffer handoff
    // load-bearing for at least one user (in practice: most)
    assert(graft.Counters.peek("lastk_cross_batch_users") >= 1L,
      "no user's window provably spanned the batch boundary")
  }

  test("tws state survives a query restart from the checkpoint") {
    val row = StreamGates.streamTwsRestartParity(spark, sfDir).collect()
    assert(row.length === 1)
    assert(row(0).getBoolean(0),
      "run 2's totals != whole-slice batch aggregate (state not " +
        "recovered), or run 2 reprocessed already-committed files")
    assert(row(0).getLong(1) > 0, "no users emitted in run 2")
    assert(row(0).getLong(2) >= 1L,
      "no user had state seeded by run 1 and extended by run 2")
  }

  test("left-outer stream-stream join flushes unmatched views as nulls") {
    val row = StreamGates.streamOuterJoinParity(spark, sfDir).collect()
    assert(row.length === 1)
    assert(row(0).getBoolean(0),
      "left-outer stream-stream join rows != batch left join")
    assert(row(0).getLong(1) > 0, "no rows emitted")
    assert(row(0).getBoolean(2),
      "outer-join state (incl. live eviction) was not served by the " +
        "pinned RocksDB provider")
  }

  test("gates leave the caller session's shuffle partitions untouched") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    StreamGates.streamAvailableNowParity(spark, sfDir).collect()
    assert(spark.conf.get("spark.sql.shuffle.partitions") === before)
  }

  test("gseg micro-batch source: per-generation and final parity hold") {
    val row = StreamGates.streamSegParity(spark, sfDir).collect()
    assert(row.length === 1)
    assert(row(0).getBoolean(0),
      "first micro-batch did not equal slice A's batch aggregate")
    assert(row(0).getBoolean(1),
      "final complete-mode aggregate diverged from the full batch")
    assert(row(0).getLong(2) > 0)
  }
}
