package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables

/** Event-time operators over the `events` table — the batch-side
  * equivalents of the streaming queries in graft.streaming.Streams
  * (SURVEY.md §2.7 extension). Timestamps are micros on both engine
  * and oracle side (Tables.events floors parquet nanos the same way
  * DuckDB's TIMESTAMP cast does).
  */
object EventOps {
  private val Dec = DecimalType(18, 2)

  /** Tumbling 1-hour event-time window aggregation per event type.
    * Uses window() (not date_trunc) so the same expression carries to
    * the streaming variant; epoch-aligned 1h windows ≡ date_trunc. */
  def tumblingWindow(s: SparkSession, d: String): DataFrame =
    tumblingWindowOf(Tables.events(s, d))

  /** Same aggregation over a caller-provided event frame (lets the
    * streaming parity gate run batch and stream on one filtered set). */
  def tumblingWindowOf(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(Dec)).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sessionization (gaps-and-islands): a new session starts after a
    * >10-minute silence per user. Batch mirror of session_window /
    * flatMapGroupsWithState; windows are per-user partitioned so the
    * shuffle key is user_id and state never crosses executors. */
  def sessionize(s: SparkSession, d: String, gapMinutes: Int = 10): DataFrame =
    sessionizeOf(Tables.events(s, d), gapMinutes)

  /** Native session_window sessionization [ev_session_native]: the
    * same sessions as [[sessionizeOf]] but via Spark's built-in
    * session_window aggregate — ONE hash aggregate with merging
    * session state instead of a window-sort + lag + running-sum +
    * second aggregate. At scale this halves the shuffles (no sort
    * pass) and is the expression that carries unchanged to streaming.
    * Boundary semantics verified by probe: an exactly-gap-spaced pair
    * MERGES — session_window splits only when the silence is strictly
    * > gap, the SAME comparator as the lag mirror — so both queries'
    * oracles use `>`. (An earlier draft claimed half-open `>=`
    * semantics; a live session_window probe disproved it.) */
  def sessionizeNative(s: SparkSession, d: String,
      gapMinutes: Int = 10): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("start_us"),
        unix_micros(max(col("ts"))).as("end_us"),
        sum(col("value").cast(Dec)).cast(DoubleType).as("sum_value"))
      .select(col("user_id"), col("n_events"), col("start_us"),
        col("end_us"), col("sum_value"))

  /** Same sessionization over a caller-provided event frame. */
  def sessionizeOf(events: DataFrame, gapMinutes: Int = 10): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_seq",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("start_us"),
        unix_micros(max(col("ts"))).as("end_us"),
        sum(col("value").cast(Dec)).cast(DoubleType).as("sum_value"))
      .select(col("user_id"), col("session_seq").cast(IntegerType).as("session_seq"),
        col("n_events"), col("start_us"), col("end_us"), col("sum_value"))
  }
}
