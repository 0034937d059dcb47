package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (time-travel) join: match each left row to the most recent
  * right row with the same key and `rightTs <= leftTs`.
  *
  * Spark has no native ASOF JOIN (DuckDB/kdb/Flink do), and the naive
  * formulation — inequality join + argmax — explodes into a per-key
  * cross product before aggregating. The scale-safe shape used here is
  * the union-and-scan trick: tag both sides, union them, and run ONE
  * window over (key ORDER BY ts) carrying the last-seen right-side
  * values forward with `last_value(ignoreNulls)`. That is a single
  * shuffle on the key, no join, no state bigger than one row per
  * right column — at 100 TB it is exactly one sort-shuffle of
  * (|left|+|right|) rows, the minimum any as-of semantics needs.
  *
  * Tie rules (made deterministic so results are partition-order-free):
  * a right row at ts == left ts IS visible (inclusive as-of), and among
  * right rows sharing (key, ts) the one with the greatest `rightTie`
  * wins — the sort is (ts, tag, tie) with right tagged 0 < left 1.
  */
object AsofJoin {
  /** Generic as-of join. `rightCols` are carried from the matched right
    * row (null where no right row precedes the left row). */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightTie: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag 0 = right (visible first at equal ts), 1 = left
    val rTagged = right.select(
      (col(key).as(key) +: col(rightTs).as("_asof_ts") +: lit(0).as("_tag") +:
        col(rightTie).as("_tie") +:
        rightCols.map(c => col(c).as(s"_r_$c")) ++:
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val lTagged = left.select(
      (col(key).as(key) +: col(leftTs).as("_asof_ts") +: lit(1).as("_tag") +:
        lit(null).cast(right.schema(rightTie).dataType).as("_tie") +:
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")) ++:
        leftCols.filterNot(_ == key).map(col)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_asof_ts").asc, col("_tag").asc, col("_tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(rTagged.unionByName(lTagged)) { (df, c) =>
      df.withColumn(s"_m_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    carried.where(col("_tag") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"_m_$c").as(c)): _*)
  }

  /** Forward as-of join: match each left row to the EARLIEST right row
    * with the same key and `rightTs >= leftTs` — the "next event after"
    * lookup (next purchase after a click, next reading after a fault).
    * Same union-and-scan shape as [[asofJoin]] with the scan reversed:
    * one shuffle-sort on the key, descending ts, so "last non-null
    * seen" is the nearest FOLLOWING right row. At equal ts the right
    * row is visible (inclusive); among right rows sharing (key, ts) the
    * greatest `rightTie` wins, mirroring the backward join's rule. */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightTie: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rTagged = right.select(
      (col(key).as(key) +: col(rightTs).as("_asof_ts") +: lit(0).as("_tag") +:
        col(rightTie).as("_tie") +:
        rightCols.map(c => col(c).as(s"_r_$c")) ++:
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val lTagged = left.select(
      (col(key).as(key) +: col(leftTs).as("_asof_ts") +: lit(1).as("_tag") +:
        lit(null).cast(right.schema(rightTie).dataType).as("_tie") +:
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")) ++:
        leftCols.filterNot(_ == key).map(col)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_asof_ts").desc, col("_tag").asc, col("_tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(rTagged.unionByName(lTagged)) { (df, c) =>
      df.withColumn(s"_m_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    carried.where(col("_tag") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"_m_$c").as(c)): _*)
  }

  /** Demo query [ASOF-FWD]: for each click, the user's next purchase
    * at-or-after it within a 12-hour attribution window. Purchases
    * are pre-deduped to MIN event_id per (user, ts) in both engine and
    * oracle, so the forward tie rule never has to fire — the oracle's
    * row_number formulation could not reproduce an engine-internal tie
    * choice. Matches beyond the tolerance null out (the row survives —
    * left-asof semantics — so downstream sees "click, unattributed").
    * The oracle deliberately uses the naive inequality-join + argmin
    * shape (fine for DuckDB at oracle scale); the engine's
    * union-and-scan computes the same relation with one shuffle and no
    * per-key cross product. */
  def clickNextPurchase(s: SparkSession, d: String,
      toleranceUs: Long = 12L * 3600 * 1000000): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("purchase_ts"))
      .agg(min(col("event_id")).as("purchase_id"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val inTol = unix_micros(col("purchase_ts")) - unix_micros(col("ts")) <= toleranceUs
    asofJoinForward(clicks, purchases,
      key = "user_id", leftTs = "ts", rightTs = "purchase_ts",
      rightTie = "purchase_id", rightCols = Seq("purchase_id", "purchase_ts"))
      .select(col("click_id"), col("user_id"),
        unix_micros(col("ts")).as("click_us"),
        when(inTol, col("purchase_id")).as("purchase_id"),
        when(inTol, unix_micros(col("purchase_ts"))).as("purchase_us"),
        when(inTol,
          unix_micros(col("purchase_ts")) - unix_micros(col("ts"))).as("gap_us"))
  }

  /** Demo query [ASOF]: attribute each purchase event to the user's
    * most recent click at-or-before it (inclusive). Clicks sharing
    * (user, ts) resolve to the max event_id — the engine's max-`_tie`
    * rule; the oracle dedupes identically before its ASOF join —
    * purchases with no prior click keep null click columns (left-asof
    * semantics). Timestamps surface as epoch-micros BIGINTs so the
    * DuckDB `ASOF LEFT JOIN` oracle hash-compares exactly. */
  def purchaseAttribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    asofJoin(purchases, clicks,
      key = "user_id", leftTs = "ts", rightTs = "click_ts",
      rightTie = "click_id", rightCols = Seq("click_id", "click_ts"))
      .select(col("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"),
        col("click_id"),
        unix_micros(col("click_ts")).as("click_us"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
  }

  /** Nearest-either-direction as-of [asof_nearest]: each click joins
    * the user's CLOSEST purchase in time, backward or forward — the
    * "nearest observation" variant sensor alignment and attribution
    * both need. Composes the two directed as-ofs (each one
    * union-and-scan shuffle) and resolves per row by |gap| with the
    * backward side winning exact ties; purchases are pre-deduped to
    * one row per (user, ts), so |gap| + direction pins a unique
    * match and the oracle's argmin over the raw candidate set agrees
    * exactly. Signed gap output (negative = purchase before click). */
  def clickNearestPurchase(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("purchase_ts"))
      .agg(min(col("event_id")).as("purchase_id"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(col("click_id"),
        col("purchase_id").as(s"pid_$tag"),
        unix_micros(col("purchase_ts")).as(s"pus_$tag"))
    val back = side(asofJoin(clicks, purchases,
      key = "user_id", leftTs = "ts", rightTs = "purchase_ts",
      rightTie = "purchase_id", rightCols = Seq("purchase_id", "purchase_ts")), "b")
    val fwd = side(asofJoinForward(clicks, purchases,
      key = "user_id", leftTs = "ts", rightTs = "purchase_ts",
      rightTie = "purchase_id", rightCols = Seq("purchase_id", "purchase_ts")), "f")
    val cUs = unix_micros(col("ts"))
    val gapB = cUs - col("pus_b") // >= 0 when present
    val gapF = col("pus_f") - cUs
    val takeBack = col("pus_b").isNotNull &&
      (col("pus_f").isNull || gapB <= gapF)
    clicks.join(back, Seq("click_id"), "left")
      .join(fwd, Seq("click_id"), "left")
      .select(col("click_id"), col("user_id"), cUs.as("click_us"),
        when(takeBack, col("pid_b")).otherwise(col("pid_f")).as("purchase_id"),
        when(takeBack, col("pus_b")).otherwise(col("pus_f")).as("purchase_us"),
        (when(takeBack, col("pus_b")).otherwise(col("pus_f")) - cUs).as("gap_us"))
  }
}
