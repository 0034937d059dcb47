package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Changelog compaction [UPSERT]: reduce an append-only event/CDC
  * stream to the LATEST record per key — the merge step behind every
  * mutable-table-on-immutable-files pattern (SCD type 1, upsert
  * snapshots, feature-store "current value" reads).
  *
  * The scale-defining choice: `max_by(payload, (ts, id))` — an
  * AGGREGATE, not the textbook `row_number() OVER (PARTITION BY key
  * ORDER BY ts DESC) = 1` window. The window formulation shuffles and
  * SORTS the entire changelog (at 100 TB: the whole history moves,
  * then sorts per key); the aggregate is partially applied map-side,
  * so each partition forwards ONE candidate row per key it has seen —
  * shuffle volume is bounded by keys × partitions regardless of how
  * deep the history is. Ties on ts resolve by max event_id, making the
  * result deterministic and oracle-comparable.
  */
object Changelog {
  /** Latest event per user from the events changelog: key = user_id,
    * recency = (ts, event_id). Micros BIGINT out (timestamp-precision
    * hashing parity with the oracle, as in the as-of join). */
  def upsertLatest(s: SparkSession, d: String): DataFrame =
    latestByKeyOf(Tables.events(s, d))

  /** MERGE-INTO application [MERGE]: apply a compacted changes batch to
    * a compacted snapshot with full upsert semantics — matched rows
    * UPDATE, unmatched-by-target rows INSERT, and changes flagged as
    * deletions remove the key; untouched snapshot rows survive as
    * `keep`. The CDC-apply step between [[latestByKeyOf]] compactions:
    * ONE full-outer hash join on the key (both sides already one row
    * per key, so the join is bounded by live keys, not history), then
    * pure row-local CASE logic — the same plan MERGE INTO compiles to
    * on table formats that don't index.
    *
    * Demo slices: the snapshot is first-half activity of users < 120,
    * the changes batch is second-half activity of users ≥ 30, deletion
    * = changes value < 5 — so keep / update / insert / delete all fire
    * on the synthetic corpus. The epoch-midpoint cutoff is two driver
    * longs, deterministic and oracle-reproducible. */
  def mergeUpsert(s: SparkSession, d: String,
      deleteBelow: Double = 5.0): DataFrame = {
    val ev = Tables.events(s, d)
    val r = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val mid = (r.getLong(0) + r.getLong(1)) / 2
    val base = latestByKeyOf(
      ev.filter(unix_micros(col("ts")) <= mid && col("user_id") < 120))
    val chg = latestByKeyOf(
      ev.filter(unix_micros(col("ts")) > mid && col("user_id") >= 30))
      .withColumn("is_delete", col("value") < deleteBelow)
    val b = base.select(base.columns.map(c => col(c).as(s"b_$c")): _*)
    val c = chg.select(chg.columns.map(c0 => col(c0).as(s"c_$c0")): _*)
    b.join(c, col("b_user_id") === col("c_user_id"), "full_outer")
      .filter(col("c_user_id").isNull || !col("c_is_delete"))
      .select(
        coalesce(col("c_user_id"), col("b_user_id")).as("user_id"),
        coalesce(col("c_ts_us"), col("b_ts_us")).as("ts_us"),
        coalesce(col("c_event_id"), col("b_event_id")).as("event_id"),
        coalesce(col("c_event_type"), col("b_event_type")).as("event_type"),
        coalesce(col("c_value"), col("b_value")).as("value"),
        when(col("c_user_id").isNull, "keep")
          .when(col("b_user_id").isNull, "insert")
          .otherwise("update").as("action"))
  }

  /** SCD type-2 compaction [SCD2]: turn the per-user event_type
    * changelog into versioned validity intervals — consecutive equal
    * values collapse into one row carrying [valid_from, valid_to) and a
    * version number; the current value's valid_to is NULL. The other
    * half of the upsert story: type 1 keeps the latest row, type 2
    * keeps the full history as intervals a point-in-time join can probe.
    *
    * Shape at scale: one shuffle-sort on user_id feeds BOTH windows —
    * the change filter (lag) preserves the partitioning and sort, so
    * the lead/row_number pass reuses the exchange instead of shuffling
    * again (pinned by PlanShapeSpec). Window state is one row. */
  def scd2Intervals(s: SparkSession, d: String): DataFrame =
    scd2IntervalsOf(Tables.events(s, d))

  /** Same over any events-shaped frame. Null-safe change test
    * (IS DISTINCT FROM) so a null-valued attribute versionizes too. */
  def scd2IntervalsOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val changes = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("_prev", lag(col("event_type"), 1).over(w))
      .where(not(col("_prev") <=> col("event_type")))
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("_next_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type"), col("version"),
        unix_micros(col("ts")).as("valid_from_us"),
        unix_micros(col("_next_ts")).as("valid_to_us"))
  }

  /** Merge two already-compacted states (outputs of [[latestByKeyOf]]
    * or of previous merges) into one: per key, the row with the
    * greater (ts_us, event_id) wins. Compaction is a semilattice —
    * merge(compact(A), compact(B)) == compact(A ∪ B) — which is what
    * makes the foreachBatch incremental-upsert sink correct however
    * the stream happens to be micro-batched (gated by
    * stream_upsert_parity; ChangelogProps sweeps the algebra). */
  def mergeCompacted(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("ts_us"), col("event_id"), col("event_type"), col("value")),
        struct(col("ts_us"), col("event_id"))).as("r"))
      .select(col("user_id"), col("r.ts_us").as("ts_us"),
        col("r.event_id").as("event_id"),
        col("r.event_type").as("event_type"),
        col("r.value").as("value"))

  /** Same over any events-shaped frame — specs drive this with
    * adversarial tie distributions. */
  def latestByKeyOf(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("ts"), col("event_id"), col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("r"))
      .select(col("user_id"),
        unix_micros(col("r.ts")).as("ts_us"),
        col("r.event_id").as("event_id"),
        col("r.event_type").as("event_type"),
        col("r.value").as("value"))
}
