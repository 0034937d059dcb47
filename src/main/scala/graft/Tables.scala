package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). All queries take the scale-factor
  * directory as a parameter so the same code runs at sf0.001 → 100 TB:
  * the parquet scan is partition-parallel and Catalyst pushes filters
  * and column pruning into it.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some rounds
    * and TIMESTAMP(MICROS, isAdjustedToUTC=false) in others. Normalize
    * every encoding to a session-TZ TIMESTAMP (sessions here run UTC)
    * so downstream `unix_micros` / `Row.getTimestamp` semantics are
    * stable regardless of how the driver generated the files:
    * - NANOS: Spark's reader rejects it outright; read nanos as long
    *   (legacy conf, set at read time so it works under any session)
    *   and floor-convert to micros — the same truncation DuckDB
    *   applies, so oracle comparisons line up.
    * - MICROS without UTC adjustment: Spark reads TIMESTAMP_NTZ; cast
    *   to TIMESTAMP interprets the wall clock in the session TZ (UTC),
    *   exactly how DuckDB treats its naive TIMESTAMP. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so users can drive the engine
    * with raw `spark.sql` (the events view goes through the same
    * nanos→micros normalization as the typed loader). */
  def registerAll(s: SparkSession, d: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => load(s, d, t).createOrReplaceTempView(t))
    events(s, d).createOrReplaceTempView("events")
  }
}
