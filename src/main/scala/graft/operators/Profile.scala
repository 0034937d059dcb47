package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Table profiling [PROFILE]: per-column null count, distinct count
  * and min/max in ONE pass over the table — the data-quality sweep a
  * pipeline runs on every new 100 TB drop before anything joins
  * against it. The naive formulation (one query per column) rescans
  * the table N_cols times; this one computes every column's aggregates
  * in a single wide aggregate (Catalyst plans the multi-countDistinct
  * via one Expand: still one scan), then unpivots the 1-row result
  * with stack() into the (column, stats...) long form a catalog
  * stores.
  *
  * Bench note: at local SF the whole table is one parquet split, so
  * the Expand (N_cols+1 projections of every row) runs in a single
  * task and dominates this query's wall-clock (~2.7 s at sf0.1). That
  * is an artifact of the tiny input, not the plan: at real scale the
  * scan has thousands of splits and the Expand parallelizes with them.
  * Repartitioning first would "fix" the local number by adding a
  * full-table shuffle — exactly the wrong trade at 100 TB.
  *
  * min/max surface as strings so one schema fits every column type;
  * doubles route through DECIMAL(18,2) first because JVM and C++
  * float-to-string formats disagree ("1.0E7" vs "10000000.0") while
  * decimal rendering is exact on both engines.
  */
object Profile {
  /** Order-independent table fingerprint [FINGERPRINT]: one 3-number
    * signature (row count, XOR signature, modular SUM signature) that
    * two clusters / two snapshots / engine-vs-oracle can compare to
    * decide "same content?" without moving or sorting a single row.
    * Per row: canonicalize columns to strings — integers render
    * identically everywhere, so money doubles fingerprint as INTEGER
    * CENTS (`round(x*100)` cast to long) and timestamps as INTEGER
    * EPOCH DAYS, leaving zero float/decimal/date rendering surface
    * between engines (NULL → a sentinel so NULL ≠ ''). md5 the joined
    * row, fold the digest's first 8 hex chars into a <2^63 integer
    * with pure `ascii(substr)` arithmetic — every function in the
    * chain exists with identical semantics in Spark and DuckDB, which
    * is what makes the fingerprint ENGINE-PORTABLE (Spark's xxhash64
    * would be cheaper but proprietary to Spark). All three combiners
    * are commutative+associative, so the aggregate partial-combines
    * map-side, shuffles ONE row per partition, and never sorts:
    * scan-speed at 100 TB. XOR alone is blind to duplicate-pair
    * insertion (x ⊕ x = 0); the SUM catches exactly that, and COUNT
    * anchors cardinality. The SUM is folded mod 2^61−1 (a Mersenne
    * prime) and cast to BIGINT so the OUTPUT dtype is plain int64 on
    * both engines — no DECIMAL(38,0)/HUGEINT dtype class for a
    * driver-side hasher to render differently. The widening happens
    * only INSIDE the aggregate (Spark decimal accumulator / DuckDB
    * HUGEINT accumulator — exact up to ~10^19 rows), and the final
    * `% 2^61−1` collapses it back to a value < 2^61 that int64 holds
    * exactly.
    *
    * FORMAT BREAK (signature v2, 2026-08): the r06 canonicalization
    * changed the wire format — sum_sig became the mod-2^61−1 BIGINT
    * residue (previously an unreduced DECIMAL(38,0)), and
    * [[keyBucket]] now coalesces NULL key columns to the ' ' sentinel
    * where concat_ws previously SKIPPED them (a NULL key component
    * now occupies a '|' slot). Fingerprints and bucket assignments
    * recorded under the v1 scheme are NOT comparable to v2 output:
    * cross-snapshot reconciliation across the boundary reports
    * spurious diffs. Re-fingerprint stored baselines once with the
    * current code before trusting a cross-version comparison. */
  /** Mersenne-prime modulus 2^61−1 for the engine-portable modular
    * SUM combiner: both engines do exact integer arithmetic below it,
    * and the final residue always fits a BIGINT. */
  val FpMod = 2305843009213693951L
  /** Engine-portable 60-bit row signature: md5 of the
    * '|'-joined canonical strings (NULL → ' ' sentinel), first 8 hex
    * chars folded with ascii·256^i arithmetic. Hex ascii < 128, so the
    * fold stays well under Long.MaxValue. */
  def rowSig(cols: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column = {
    val h = md5(concat_ws("|", cols.map(c => coalesce(c, lit(" "))): _*))
    (0 until 8).map { i =>
      ascii(substring(h, i + 1, 1)).cast("long") * lit(1L << (8 * i))
    }.reduce(_ + _)
  }

  /** Decoded value of one md5 hex digit — plain arithmetic (`ascii`,
    * compare, multiply) that evaluates identically in Spark and
    * DuckDB. '0'-'9' → 0-9, 'a'-'f' → 10-15. */
  private def hexDigit(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ascii(c) - lit(48) - when(ascii(c) >= 97, lit(39)).otherwise(lit(0))

  /** Key-derived bucket id in [0, nBuckets): first 4 md5 hex chars of
    * the '|'-joined KEY (not the payload — an edited row must land in
    * the same bucket on both snapshots), decoded with portable
    * hex-digit arithmetic into a uniform value in [0, 65536) and
    * reduced mod nBuckets. For power-of-two nBuckets (65536 % n == 0)
    * the buckets are exactly uniform over the md5's first two bytes. */
  def keyBucket(keyCols: Seq[org.apache.spark.sql.Column], nBuckets: Int): org.apache.spark.sql.Column = {
    val h = md5(concat_ws("|", keyCols.map(c => coalesce(c, lit(" "))): _*))
    (0 until 4).map { i =>
      hexDigit(substring(h, i + 1, 1)).cast("long") * lit(1L << (4 * (3 - i)))
    }.reduce(_ + _) % nBuckets
  }

  /** Modular SUM combiner: widen inside the aggregate, collapse the
    * final residue to a plain BIGINT (see object Scaladoc). */
  private def modSum(sig: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (sum((sig % FpMod).cast("decimal(38,0)")) % FpMod).cast("long")

  def tableFingerprint(t: DataFrame, cols: Seq[org.apache.spark.sql.Column]): DataFrame =
    t.select(rowSig(cols).as("sig"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(sig)").as("xor_sig"),
        modSum(col("sig")).as("sum_sig"))

  /** Canonical fingerprint columns for lineitem's business key +
    * measures + dates: every column renders as an integer or a raw
    * string on both engines. */
  private[graft] def lineitemCanonCols: Seq[org.apache.spark.sql.Column] = Seq(
    col("l_orderkey").cast("string"),
    col("l_linenumber").cast("string"),
    round(col("l_quantity") * 100).cast("long").cast("string"),
    round(col("l_extendedprice") * 100).cast("long").cast("string"),
    datediff(col("l_shipdate").cast("date"), lit("1970-01-01").cast("date"))
      .cast("string"),
    col("l_returnflag"), col("l_linestatus"))

  /** Demo [table_fingerprint]: fingerprint of lineitem's business key
    * + measures + dates — the reconciliation check after a migration
    * copies the fact table. */
  def lineitemFingerprint(s: SparkSession, d: String): DataFrame =
    tableFingerprint(Tables.lineitem(s, d), lineitemCanonCols)

  /** Bucketed fingerprint [fingerprint_buckets]: the reconciliation
    * DRILL-DOWN. When two snapshots' table fingerprints disagree, the
    * per-bucket vector (keyBucket over the BUSINESS KEY, so an edited
    * row lands in the same bucket on both sides) answers "WHICH shard
    * differs" from the two 64-row artifacts alone — no row shipping.
    * Same one-scan / partial-agg / one-row-per-partition-per-bucket
    * shuffle discipline as the global fingerprint. */
  def fingerprintBuckets(t: DataFrame, keyCols: Seq[org.apache.spark.sql.Column],
      cols: Seq[org.apache.spark.sql.Column], nBuckets: Int): DataFrame =
    t.select(keyBucket(keyCols, nBuckets).as("bucket"), rowSig(cols).as("sig"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(sig)").as("xor_sig"),
        modSum(col("sig")).as("sum_sig"))

  def lineitemFingerprintBuckets(s: SparkSession, d: String): DataFrame =
    fingerprintBuckets(Tables.lineitem(s, d),
      Seq(col("l_orderkey").cast("string"), col("l_linenumber").cast("string")),
      lineitemCanonCols, 64)

  /** Profile of the orders table's key/status/price columns. */
  def ordersProfile(s: SparkSession, d: String): DataFrame =
    profileOf(Tables.orders(s, d)
        .withColumn("o_totalprice",
          col("o_totalprice").cast("decimal(18,2)")),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority"))

  /** One-pass column profile of any frame: (col_name, n_null,
    * n_distinct, min_val, max_val) per requested column. */
  def profileOf(t: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    val stackArgs = cols
      .map(c => s"'$c', n_rows - cnt_$c, nd_$c, min_$c, max_$c")
      .mkString(", ")
    t.agg(count(lit(1)).as("n_rows"), aggs: _*)
      .select(expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_null, n_distinct, min_val, max_val)"))
  }
}
