package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Sliding (hopping) event-time windows [SLIDE]: 10-minute windows
    * every 5 minutes, so each event lands in exactly size/slide = 2
    * windows. Spark's window(ts, size, slide) expands map-side to the
    * covering window set and feeds ONE hash aggregate — shuffle volume
    * is (events × 2) partial rows combined map-side, not a self-join.
    * The streaming twin is the same expression under a watermark; the
    * oracle enumerates both covering window starts per event and
    * aggregates identically. */
  def slidingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(Dec)).cast(DoubleType).as("sum_value"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n_events"), col("sum_value"))

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

  /** Sequential funnel analysis [ev_funnel]: of the users who ever
    * `view`, how many `click` AT OR AFTER their first view, and then
    * `purchase` at or after that click — first-touch attribution with
    * strict step ordering, the conversion query every event pipeline
    * runs. The stream is thinned deterministically (event_id % thin)
    * because the synthetic corpus is so dense every user completes
    * every funnel — the thinned stream has real drop-off (at sf0.01:
    * 148 users → 79 view → 24 view+click → 8 full funnel), so an
    * engine that ignored the ordering constraint would not match.
    *
    * ONE shuffle end-to-end: three unordered windows chained over the
    * same user_id partitioning (t2's predicate reads t1, t3's reads
    * t2 — each is a full-partition min, no sort-order dependence), and
    * the per-user collapse + global count reuse that clustering. A
    * join-per-step formulation would re-shuffle the fact table once
    * per funnel stage. */
  def funnel(s: SparkSession, d: String, thin: Int = 17): DataFrame =
    funnelOf(Tables.events(s, d).filter(col("event_id") % thin === 0))

  /** Same funnel over a caller-provided event frame (specs drive this
    * with hand-built orderings: click-before-view, ts ties, partial
    * funnels). */
  def funnelOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val staged = events
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts") >= col("t1"),
          col("ts"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts") >= col("t2"),
          col("ts"))).over(w))
    staged.groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
        max(col("t3")).as("t3"))
      .agg(count(lit(1)).as("n_users"), count(col("t1")).as("n_view"),
        count(col("t2")).as("n_view_click"),
        count(col("t3")).as("n_full_funnel"))
  }

  /** Cohort retention [ev_retention]: users grouped by first-active
    * day; how many return exactly 1 and 7 days later. Two partial-
    * agg'd aggregates and one user-keyed join — the distinct
    * (user, day) frame is tiny next to the event stream at any scale,
    * and the final rollup is bounded by the calendar. */
  def retention(s: SparkSession, d: String): DataFrame = {
    val days = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val first = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    days.join(first, Seq("user_id"))
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("off"))
      .groupBy(col("cohort_day"))
      .agg(count(when(col("off") === 0, 1)).as("n_users"),
        count(when(col("off") === 1, 1)).as("d1_retained"),
        count(when(col("off") === 7, 1)).as("d7_retained"))
  }

  /** Event-type transition matrix [ev_transitions]: P(next type | type)
    * from per-user event sequences — the first-order Markov view of
    * user behavior that funnels (fixed target sequence) and paths
    * (initial prefix only) don't give. lag() over the user window with
    * a full (ts, event_id) tie-break makes every (from → to) pair
    * deterministic; the matrix rollup is a partial-agg'd count over at
    * most |types|² groups, and probabilities are exact-count ratios
    * divided once in DOUBLE — identical IEEE on both engines. */
  def transitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val pairs = Tables.events(s, d)
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    pairs.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n") / col("n_from"), 6).as("p"))
  }

  /** Time-series gap filling [ev_gap_fill]: daily event counts per
    * type with MISSING days materialized as zero rows — the
    * densification every reporting/forecasting consumer needs (a
    * missing row and a zero mean different things downstream). The
    * grid is generated, not stored: observed types × one
    * sequence(min_day, max_day) explode, left-joined to the actual
    * daily rollup — generator-join shape, so the only full-table work
    * is the partial-agg'd daily count; the grid is |types|·|days|
    * rows at any corpus size. Thinned (event_id % thin) so the grid
    * has real holes to fill at test SFs. */
  def gapFill(s: SparkSession, d: String, thin: Int = 401): DataFrame = {
    val ev = Tables.events(s, d).filter(col("event_id") % thin === 0)
      .select(col("event_type"), to_date(col("ts")).as("day"))
    val daily = ev.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"))
    val span = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = daily.select(col("event_type")).distinct()
      .crossJoin(span)
      .select(col("event_type"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    grid.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** Path analysis [ev_top_paths]: the most common initial event-type
    * sequences (first `depth` events per user in time order, joined
    * "view>click>…") — the navigation-pattern rollup behind onboarding
    * and drop-off dashboards, and the sequence-mining shape the other
    * event ops don't cover. Per-user ordering is a user-partitioned
    * window with a full (ts, event_id) tie-break so the path strings
    * are deterministic; the path frequency count is a partial-agg'd
    * hash aggregate (distinct paths ≤ |event types|^depth, tiny at any
    * scale) and the final top-k is TakeOrdered. */
  def topPaths(s: SparkSession, d: String, depth: Int = 3, k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= depth)
      .groupBy(col("user_id"))
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col("rn"), col("event_type")))),
        x => x.getField("event_type"))).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path").asc)
      .limit(k)
  }

  /** Statistical outlier detection [ev_anomaly]: per event type, count
    * values beyond k·σ of the type's mean — the value-distribution
    * quality filter a training pipeline runs before trusting a metric
    * column. Everything is exact until the final IEEE comparison:
    * sums and sums-of-squares accumulate in DECIMAL (partition-order
    * independent — a double sum would make the 3σ boundary flicker
    * with partitioning at scale), cast to DOUBLE once, and both
    * engines evaluate the identical mean/variance arithmetic on those
    * exact inputs, so the anomaly booleans are bit-reproducible. One
    * partial-agg'd pass for stats, a broadcast join back (5 rows), and
    * a second partial-agg'd rollup — map-side everywhere. */
  def anomalyZscore(s: SparkSession, d: String, k: Double = 3.0): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), col("value"),
      col("value").cast(DecimalType(18, 6)).as("v"))
    val stats = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("v")).cast(DoubleType).as("sd"),
        sum(col("v") * col("v")).cast(DoubleType).as("s2d"))
      .select(col("event_type"), col("n"), (col("sd") / col("n")).as("mean"),
        ((col("s2d") - col("sd") * col("sd") / col("n")) / col("n"))
          .as("variance"))
    ev.join(broadcast(stats), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_events"),
        round(max(col("mean")), 6).as("mean_value"),
        count(when(abs(col("value") - col("mean")) >
          lit(k) * sqrt(col("variance")), 1)).as("n_anomalies"))
  }

  /** Weighted PageRank over the event-type transition graph — the
    * iterative-numeric graph companion to g1RecursiveReach's
    * reachability. Scale shape: the fact table is scanned EXACTLY
    * ONCE (the same lag-window + groupBy that feeds ev_transitions),
    * collapsing 100 TB of events to ≤|types|² weighted edges; the
    * power iteration then loops on that tiny frame with the edge side
    * broadcast, so per-step cost is independent of fact-table size —
    * the dedup_corpus propagation design applied to a numeric
    * fixpoint. Dangling mass (a type with no out-transition) is
    * redistributed uniformly each step, so ranks sum to 1 on any
    * input, not just this dataset's complete transition graph.
    *
    * Determinism: ranks are quantized to 12 decimals per iteration on
    * BOTH engines (the oracle unrolls the identical loop as a CTE
    * chain, constants cast to DOUBLE so each step is the same IEEE
    * op sequence), pinning the two float pipelines together far below
    * the driver's 6-decimal compare surface. */
  def pageRank(s: SparkSession, d: String, iters: Int = 8,
               damp: Double = 0.85): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val edges = Tables.events(s, d)
      .withColumn("src", lag(col("event_type"), 1).over(byUser))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("n"))
      .withColumn("w",
        col("n") / sum(col("n")).over(Window.partitionBy(col("src"))))
      .select(col("src"), col("dst"), col("w"))
    pageRankEdges(edges, iters, damp)
  }

  /** Power iteration over a caller-provided (src, dst, w) edge frame
    * whose weights sum to 1 per src. The returned frame reads from the
    * final generation's eager localCheckpoint (block-manager blocks,
    * ≤|nodes| rows; the ContextCleaner reclaims earlier generations),
    * so its plan is iteration-count-free. */
  def pageRankEdges(edgeFrame: DataFrame, iters: Int, damp: Double): DataFrame = {
    val edges = edgeFrame
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val srcs = edges.select(col("src").as("node")).distinct()
    val nN = nodes.count().toDouble // bounded by |node labels|, not |facts|
    var rank = nodes.withColumn("pr", lit(1.0 / nN))
    for (_ <- 1 to iters) {
      val contrib = rank.join(broadcast(edges), rank("node") === edges("src"))
        .groupBy(col("dst")).agg(sum(col("pr") * col("w")).as("m"))
      // mass parked on dangling nodes this step, as a 1-row frame the
      // next-rank projection cross-joins (stays distributed; no collect)
      val dang = rank.join(broadcast(srcs), Seq("node"), "left_anti")
        .agg(coalesce(sum(col("pr")), lit(0.0)).as("dm"))
      // localCheckpoint (eager), NOT persist: each step reads `rank`
      // twice (contrib + dangling), so without lineage TRUNCATION the
      // analyzed plan doubles per iteration — 2^iters copies of the
      // fact-table agg took the driver down before any executor ran.
      // The checkpointed frame is ≤|types| rows; recompute-on-loss is
      // a non-issue at that size.
      rank = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .crossJoin(dang)
        .select(nodes("node"),
          round(lit((1.0 - damp) / nN) +
            lit(damp) * (coalesce(col("m"), lit(0.0)) + col("dm") / lit(nN)),
            12).as("pr"))
        .localCheckpoint()
    }
    val out = rank.select(col("node"), round(col("pr"), 6).as("pr"))
      .orderBy(col("pr").desc, col("node").asc)
    graft.Counters.add("pr_iters", iters.toLong)
    edges.unpersist(); nodes.unpersist()
    out
  }

  /** Per-node triangle counts over the undirected event-type
    * transition graph — the clustering-structure companion to
    * [[pageRank]]'s centrality. The fact table is scanned ONCE (the
    * same lag window as ev_transitions) and collapses to ≤|types|²
    * distinct undirected edges before any graph work.
    *
    * The enumeration is the degree-ordered wedge algorithm (Suri &
    * Vassilvitskii, WWW'11): orient every edge from its lower- to its
    * higher-(degree, name) endpoint, generate wedges only at each
    * triangle's LOWEST-ranked corner, and close them with one join
    * back to the oriented edge set. Orientation bounds oriented
    * out-degrees by O(√m), so wedge volume is O(m^1.5) instead of the
    * Σ deg² a naive neighbor self-join pays — on a power-law graph at
    * 100 TB that is the difference between the hub node generating
    * deg² ≈ 10¹² wedges and the same hub generating ~m. All three
    * steps are shuffle equi-joins on node keys (rank comparison rides
    * as a residual), so the same code distributes unchanged over a
    * billion-edge user-user graph via [[triangleCountEdges]]. */
  def triangleCount(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val und = Tables.events(s, d)
      .withColumn("src", lag(col("event_type"), 1).over(byUser))
      .filter(col("src").isNotNull && col("src") =!= col("event_type"))
      .select(least(col("src"), col("event_type")).as("a"),
        greatest(col("src"), col("event_type")).as("b"))
      .distinct()
    triangleCountEdges(und)
  }

  /** Same count over a caller-provided undirected edge frame
    * (a, b) with a < b, one row per edge. Returns (node, n_tri) for
    * every node, zeros included. */
  def triangleCountEdges(und: DataFrame): DataFrame = {
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // total order on nodes by (degree, name); ties broken by name so
    // the orientation is deterministic on any input
    val e = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
      .select(when(
        struct(col("da").as("d"), col("a").as("n")) <
          struct(col("db").as("d"), col("b").as("n")),
        struct(col("a").as("u"), col("b").as("v"),
          struct(col("db").as("d"), col("b").as("n")).as("rv")))
        .otherwise(
          struct(col("b").as("u"), col("a").as("v"),
            struct(col("da").as("d"), col("a").as("n")).as("rv")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.rv").as("rv"))
    // wedges at the lowest-ranked corner only: both edges leave u, and
    // the two far ends are rank-ordered so each wedge forms once
    val wedges = e.as("e1").join(e.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.rv") < col("e2.rv"))
      .select(col("e1.u").as("c"), col("e1.v").as("x"), col("e2.v").as("y"))
    // close the wedge: (x, y) must itself be an oriented edge — rank(x)
    // < rank(y) by construction, matching e's orientation exactly
    val tri = wedges.join(e.select(col("u"), col("v")),
        col("x") === col("u") && col("y") === col("v"))
      .select(col("c"), col("x"), col("y"))
    val corners = tri.select(col("c").as("node"))
      .union(tri.select(col("x").as("node")))
      .union(tri.select(col("y").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.select(col("node")).join(corners, Seq("node"), "left")
      .select(col("node"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .orderBy(col("node").asc)
  }

  /** Daily OHLC bars per event type [OHLC]: the time-series
    * downsample (candlestick / resample-and-aggregate) shape. ONE
    * hash aggregate does all five statistics: open/close are
    * min_by/max_by with a composite (ts, event_id) ordering struct —
    * an O(1)-state aggregate that partial-aggregates map-side, NOT a
    * first_value window (which would sort every (day,type) partition
    * through a single task before reducing). At 100 TB the shuffle
    * carries one 5-field row per (day,type,partition), not the raw
    * ticks; the unique event_id tie-break makes open/close
    * deterministic under any partitioning. The oracle states the
    * same bars with row_number windows — affordable there, wrong
    * shape here. */
  def ohlc(s: SparkSession, d: String): DataFrame = {
    val ord = struct(col("ts"), col("event_id"))
    Tables.events(s, d)
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"),
        col("event_type"))
      .agg(min_by(col("value"), ord).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max_by(col("value"), ord).as("close"),
        count(lit(1)).as("n_events"))
  }

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

  /** A/B experiment readout [AB]: per event_type, Welch's unequal-
    * variance t statistic between two deterministic arms (user_id
    * parity — the hash-bucket assignment of a real experiment). ONE
    * conditional aggregate computes n/Σx/Σx² for both arms in a
    * single pass (no per-arm scans, no join); the moment sums ride
    * DECIMAL so they are exact and order-independent, and t/df are
    * then a fixed double formula over identical inputs on both
    * engines. The 100 TB story is the single-pass shape: group count
    * × 6 numbers cross the wire, never data. */
  def abTtest(s: SparkSession, d: String): DataFrame = {
    // DECIMAL(18,6) moments: the a24 discipline (and its proven
    // cross-engine product/sum widening) — (18,6)² widens inside both
    // engines' 38-digit budget. Arms are (% 2 == 0) vs (% 2 != 0):
    // both engines give % the dividend's sign, so `= 1` would drop
    // negative ids from BOTH arms while !isA keeps them — the
    // inequality keeps engine and oracle membership identical for
    // any id sign.
    val isA = col("user_id") % 2 === 0
    val x = col("value").cast(DecimalType(18, 6))
    val agg = Tables.events(s, d).groupBy(col("event_type")).agg(
      count(when(isA, 1)).as("n_a"),
      sum(when(isA, x)).cast(DoubleType).as("sx_a"),
      sum(when(isA, x * x)).cast(DoubleType).as("sxx_a"),
      count(when(!isA, 1)).as("n_b"),
      sum(when(!isA, x)).cast(DoubleType).as("sx_b"),
      sum(when(!isA, x * x)).cast(DoubleType).as("sxx_b"))
    def mean(sx: Column, n: Column) = sx / n
    def vars(sxx: Column, sx: Column, n: Column) =
      greatest(lit(0.0), (sxx - sx * sx / n) / (n - 1))
    agg.select(col("event_type"), col("n_a"), col("n_b"),
        round(mean(col("sx_a"), col("n_a")), 6).as("mean_a"),
        round(mean(col("sx_b"), col("n_b")), 6).as("mean_b"),
        (vars(col("sxx_a"), col("sx_a"), col("n_a")) / col("n_a")).as("va"),
        (vars(col("sxx_b"), col("sx_b"), col("n_b")) / col("n_b")).as("vb"),
        (mean(col("sx_a"), col("n_a")) - mean(col("sx_b"), col("n_b")))
          .as("diff"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        col("mean_a"), col("mean_b"),
        round(col("diff") / sqrt(col("va") + col("vb")), 6).as("t_welch"),
        round((col("va") + col("vb")) * (col("va") + col("vb")) /
          (col("va") * col("va") / (col("n_a") - 1) +
            col("vb") * col("vb") / (col("n_b") - 1)), 4).as("df_welch"))
  }

  /** Exponentially-weighted moving average per user [EWMA]:
    * ewmaᵢ = α·xᵢ + (1−α)·ewmaᵢ₋₁ over each user's events in
    * (ts, event_id) order — the smoothing/decay primitive behind
    * anomaly baselines and rate estimators. A genuine sequential
    * recurrence (the closed-form window rewrite Σ xⱼ·(1−α)^(rn−j)
    * overflows (1−α)^(−rn) past a few hundred rows per key) — but an
    * AFFINE one (state' = A·state + b), so per-chunk transforms
    * compose and the two-phase chunked scan in [[affineScan]] runs it
    * with per-task memory bounded by the CHUNK, not the user's whole
    * history. Arithmetic inside each chunk is the literal
    * α·x + (1−α)·prev, left to right, matching the oracle's recursive
    * CTE; 6-decimal round on both sides (see [[affineScan]] for the
    * chunk-carry precision contract). */
  def ewma(s: SparkSession, d: String, alpha: Double = 0.2,
      chunkMicros: Long = DefaultChunkMicros): DataFrame =
    affineScan(s, d, EwmaRec(alpha), chunkMicros)
      .select(col("user_id"), col("event_id"),
        round(col("s0"), 6).as("ewma"))

  /** Holt double-exponential smoothing per user [HOLT]: the
    * level+trend recurrence (levelᵢ = α·xᵢ + (1−α)(levelᵢ₋₁+trendᵢ₋₁);
    * trendᵢ = β(levelᵢ−levelᵢ₋₁) + (1−β)trendᵢ₋₁) — the two-state
    * sibling of [[ewma]], same [[affineScan]] execution. α=0.5 and
    * β=0.25 are BINARY-EXACT constants, so the in-chunk multiplies
    * are reproducible to the bit and the oracle's two-column
    * recursive CTE replays the identical double chain.
    *
    * Emitted UNROUNDED: the dyadic α/β keep the state a dyadic
    * rational, so values genuinely land on exact .xxxxxx5 decimal
    * boundaries where the engines' round() implementations differ
    * (exact-decimal HALF_UP vs a ×10⁶ double multiply — measured on
    * this corpus); the raw doubles agree on both engines, so the
    * compare canonicalizes them identically. */
  def holt(s: SparkSession, d: String, alpha: Double = 0.5,
      beta: Double = 0.25,
      chunkMicros: Long = HoltChunkMicros): DataFrame =
    affineScan(s, d, HoltRec(alpha, beta), chunkMicros, anchorToMin = true)
      .select(col("user_id"), col("event_id"),
        col("s0").as("level"), col("s1").as("trend"))

  /** Single-task-per-user reference folds — the REFEREES the property
    * suite checks [[affineScan]] against (bit-parity where the scan's
    * contract promises it, bounded ulp drift where it doesn't). Kept
    * out of the query surface: their per-task memory is the user's
    * whole history, exactly the bound the scan removes. */
  private[graft] def ewmaFold(s: SparkSession, d: String,
      alpha: Double = 0.2): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("value"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (user, it) =>
        val evs = it.toArray.sortBy(e => (e._3, e._2))
        var prev = 0.0
        var first = true
        evs.iterator.map { case (_, eventId, _, x) =>
          prev = if (first) { first = false; x } else alpha * x + (1 - alpha) * prev
          (user, eventId, prev)
        }
      }
      .toDF("user_id", "event_id", "s0")
  }

  private[graft] def holtFold(s: SparkSession, d: String,
      alpha: Double = 0.5, beta: Double = 0.25): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("value"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (user, it) =>
        val evs = it.toArray.sortBy(e => (e._3, e._2))
        var level = 0.0; var trend = 0.0; var first = true
        evs.iterator.map { case (_, eventId, _, x) =>
          if (first) { first = false; level = x; trend = 0.0 }
          else {
            val prev = level
            level = alpha * x + (1 - alpha) * (level + trend)
            trend = beta * (level - prev) + (1 - beta) * trend
          }
          (user, eventId, level, trend)
        }
      }
      .toDF("user_id", "event_id", "s0", "s1")
  }

  /** Default chunk width for [[affineScan]]: one event-time day.
    * On the test corpus (30 days) this makes typical users genuinely
    * multi-chunk, so the driver rows exercise the composed-carry path,
    * while a hot user's per-task bound is its busiest DAY, not its
    * lifetime. */
  val DefaultChunkMicros: Long = 86400L * 1000000L

  /** Holt's oracle-facing chunk width: one event-time QUARTER, sized
    * so the 30-day corpus stays single-chunk per user. Measured
    * necessity, not caution: Holt's dyadic α/β park state values
    * EXACTLY on .xxxxxx5 decimal boundaries (the c409956 round-tie
    * trap), where the composed carry's O(ε) rounding difference vs the
    * fold — harmless for any non-boundary value — flips the oracle's
    * 6-decimal canonicalization (17 of 100k rows flipped at sf0.1 with
    * 1-day chunks; EWMA's non-dyadic α measured ZERO flips at both
    * SFs, hence its tighter default). Multi-chunk Holt is exercised by
    * the [ev_scan_gate] driver row and EventOpsSpec at 1-day/1-hour
    * widths under the documented O(ε/α) tolerance.
    *
    * The single-chunk guarantee holds for ANY corpus dates because the
    * holt path anchors the chunk grid to the corpus min timestamp
    * (`anchorToMin` in [[affineScanOf]]) — with the epoch-aligned grid
    * it held only when the corpus didn't straddle a multiple-of-90-days
    * boundary (the r8 corpus cleared the next one by just ~47 days, so
    * a regenerated corpus at shifted dates could have silently split
    * users into two chunks and re-exposed the round-tie flips). */
  val HoltChunkMicros: Long = 90L * 86400L * 1000000L

  /** Gate query [ev_scan_gate]: the chunked scan's precision contract,
    * proven in-engine where no SQL oracle can replay it (same booleans
    * +constant-oracle pattern as the stream gates). Both recurrences
    * run MULTI-CHUNK (1-day chunks over the 30-day corpus — the
    * composed-carry path genuinely engages, pinned by the multi_chunk
    * boolean) against the single-task folds:
    *  - ewma_round6_exact: EWMA's 6-decimal surface is IDENTICAL to
    *    the fold's — the contraction keeps carry drift orders below
    *    the round (measured zero flips; this gate keeps it that way);
    *  - holt_within_tol: Holt's raw doubles stay within 1e-9 absolute
    *    of the fold (the O(ε/α) contract — bit-parity is only
    *    promised single-chunk, see [[HoltChunkMicros]]);
    *  - multi_chunk: the corpus really split into more chunks than
    *    users, so the above was not vacuously single-chunk.
    * n_rows anchors the oracle relationally (= events count). */
  def scanGate(s: SparkSession, d: String): DataFrame = {
    val w = DefaultChunkMicros
    val ew = affineScan(s, d, EwmaRec(0.2), w)
      .select(col("user_id"), col("event_id"), round(col("s0"), 6).as("a"))
      .join(ewmaFold(s, d)
        .select(col("user_id"), col("event_id"), round(col("s0"), 6).as("b")),
        Seq("user_id", "event_id"))
      .agg(sum(when(col("a") =!= col("b"), 1L).otherwise(0L)).as("ewma_flips"),
        count(lit(1)).as("n_ewma"))
    val ho = affineScan(s, d, HoltRec(0.5, 0.25), w)
      .select(col("user_id"), col("event_id"), col("s0").as("l1"), col("s1").as("t1"))
      .join(holtFold(s, d)
        .select(col("user_id"), col("event_id"), col("s0").as("l2"), col("s1").as("t2")),
        Seq("user_id", "event_id"))
      .agg(max(greatest(abs(col("l1") - col("l2")), abs(col("t1") - col("t2"))))
        .as("holt_dev"), count(lit(1)).as("n_holt"))
    val chunks = Tables.events(s, d)
      .agg(countDistinct(col("user_id"),
          floor(unix_micros(col("ts")) / w)).as("n_chunks"),
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
    val out = ew.crossJoin(ho).crossJoin(chunks)
      .select(
        (col("ewma_flips") === 0 && col("n_ewma") === col("n_events"))
          .as("ewma_round6_exact"),
        (col("holt_dev") < 1e-9 && col("n_holt") === col("n_events"))
          .as("holt_within_tol"),
        (col("n_chunks") > col("n_users")).as("multi_chunk"),
        col("n_events").as("n_rows"))
    val rows = out.collect()
    s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** An affine per-user recurrence sᵢ = M(xᵢ)·sᵢ₋₁ + b(xᵢ), with the
    * user's FIRST event resetting the state. `dim` ≤ 2 here; `step`
    * is the literal fold arithmetic (the op sequence the oracle
    * replays), `mat`/`vec` the same step as an explicit affine map. */
  private[graft] sealed trait AffineRec extends Serializable {
    def dim: Int
    def init(x: Double): Array[Double]
    def step(st: Array[Double], x: Double): Unit // in place, fold ops
    def mat(x: Double): Array[Double]            // dim×dim row-major
    def vec(x: Double): Array[Double]
  }
  private[graft] final case class EwmaRec(alpha: Double) extends AffineRec {
    val dim = 1
    def init(x: Double) = Array(x)
    def step(st: Array[Double], x: Double): Unit =
      st(0) = alpha * x + (1 - alpha) * st(0)
    def mat(x: Double) = Array(1 - alpha)
    def vec(x: Double) = Array(alpha * x)
  }
  private[graft] final case class HoltRec(alpha: Double, beta: Double)
      extends AffineRec {
    val dim = 2
    def init(x: Double) = Array(x, 0.0)
    def step(st: Array[Double], x: Double): Unit = {
      val prev = st(0)
      st(0) = alpha * x + (1 - alpha) * (st(0) + st(1))
      st(1) = beta * (st(0) - prev) + (1 - beta) * st(1)
    }
    // level' = (1−α)·level + (1−α)·trend + α·x
    // trend' = −αβ·level + (1−αβ)·trend + αβ·x
    def mat(x: Double) = Array(1 - alpha, 1 - alpha, -alpha * beta,
      1 - alpha * beta)
    def vec(x: Double) = Array(alpha * x, alpha * beta * x)
  }

  /** One event-time chunk of one user's history: the composed affine
    * transform (m·s + b) of the whole chunk for a started state, the
    * chunk's exit state when the user STARTS here (first event resets),
    * and the chunk's sorted events for the final replay. */
  private[graft] final case class ChunkSum(user: Long, chunk: Long,
      m: Array[Double], b: Array[Double], resetOut: Array[Double],
      evs: Array[(Long, Long, Double)])

  /** Two-phase chunked execution of an affine per-user recurrence
    * [SCAN] — the scale-out form of the classic parallel prefix over
    * an associative operator (affine maps compose:
    * (M₂,b₂)∘(M₁,b₁) = (M₂M₁, M₂b₁+b₂)):
    *
    *  1. CHUNK: events shuffle once on (user, ⌊ts/W⌋); each task sorts
    *     only its chunk (per-task memory = one user-DAY by default,
    *     never a lifetime history — the bound the single-task fold
    *     could only document).
    *  2. CARRY: per chunk, the composed affine map (dim ≤ 2: a handful
    *     of doubles) flows to a per-user prefix fold over CHUNK
    *     SUMMARIES — n_chunks tiny rows per user, not events.
    *  3. REPLAY: carries join back (co-partitioned equi-join on
    *     (user, chunk)) and each chunk replays its events from its
    *     carry-in with the LITERAL fold arithmetic.
    *
    * Precision contract: within a chunk the op sequence is exactly
    * the sequential fold's, so a user whose history fits one chunk is
    * BIT-IDENTICAL to the fold (and to the oracle's recursive CTE).
    * Across chunks the carry is the composed-map value, whose
    * rounding differs from the fold's by O(ε) — and because both
    * recurrences are CONTRACTIONS (|spectral radius| = 1−α for EWMA,
    * √(1−αβ... ) ≈ 0.71 for Holt at the defaults), a carry
    * perturbation decays geometrically with every subsequent event:
    * the deviation vs the fold is O(ε/α) relative, independent of
    * history length — orders of magnitude inside the 6-decimal
    * round both oracle gates apply (EventOpsSpec pins bit-parity for
    * single-chunk histories, partition-invariance bitwise, and the
    * ulp bound on adversarial multi-chunk inputs). */
  private[graft] def affineScan(s: SparkSession, d: String, rec: AffineRec,
      chunkMicros: Long, anchorToMin: Boolean = false): DataFrame =
    affineScanOf(Tables.events(s, d), rec, chunkMicros, anchorToMin)

  /** Same scan over a caller-provided events frame (lets the property
    * suite drive adversarial histories and partitionings).
    *
    * `anchorToMin` anchors the chunk grid to the corpus min timestamp
    * (chunk = ⌊(ts − min ts)/W⌋ instead of the epoch-aligned
    * ⌊ts/W⌋), making "corpus span < W ⇒ single-chunk" hold for any
    * dates. Computed IN-PLAN as a broadcast one-row aggregate over the
    * pruned ts column (a cheap extra stage, no eager driver job), so
    * the returned frame stays a lazy description. */
  private[graft] def affineScanOf(events: DataFrame, rec: AffineRec,
      chunkMicros: Long, anchorToMin: Boolean = false): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val dim = rec.dim
    def compose(m2: Array[Double], b2: Array[Double],
        m1: Array[Double], b1: Array[Double]): (Array[Double], Array[Double]) = {
      val m = new Array[Double](dim * dim)
      val b = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) {
          var acc = 0.0
          var k = 0
          while (k < dim) { acc += m2(i * dim + k) * m1(k * dim + j); k += 1 }
          m(i * dim + j) = acc
          j += 1
        }
        var accB = b2(i)
        var k = 0
        while (k < dim) { accB += m2(i * dim + k) * b1(k); k += 1 }
        b(i) = accB
        i += 1
      }
      (m, b)
    }
    def apply(m: Array[Double], b: Array[Double],
        st: Array[Double]): Array[Double] = {
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var acc = b(i)
        var k = 0
        while (k < dim) { acc += m(i * dim + k) * st(k); k += 1 }
        out(i) = acc
        i += 1
      }
      out
    }

    val base = events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("value"))
    val anchored =
      if (anchorToMin)
        base.crossJoin(org.apache.spark.sql.functions.broadcast(
          base.agg(min(col("ts_us")).as("anchor_us"))))
      else base.withColumn("anchor_us", lit(0L))
    val chunked = anchored
      .as[(Long, Long, Long, Double, Long)]
      .groupByKey(t => (t._1, Math.floorDiv(t._3 - t._5, chunkMicros)))
      .mapGroups { (key: (Long, Long), it: Iterator[(Long, Long, Long, Double, Long)]) =>
        val (user, chunk) = key
        val evs = it.toArray.sortBy(e => (e._3, e._2))
        // identity map ∘ element maps, left to right
        var m = Array.tabulate(dim * dim)(i => if (i % (dim + 1) == 0) 1.0 else 0.0)
        var b = new Array[Double](dim)
        val reset = rec.init(evs(0)._4)
        var i = 0
        while (i < evs.length) {
          val x = evs(i)._4
          val (m2, b2) = compose(rec.mat(x), rec.vec(x), m, b)
          m = m2; b = b2
          if (i > 0) rec.step(reset, x)
          i += 1
        }
        ChunkSum(user, chunk, m, b, reset,
          evs.map(e => (e._2, e._3, e._4)))
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // phase 2: per-user prefix over chunk summaries (n_chunks tiny
    // rows per user — per-task memory is the summary count, events
    // never pass through this stage). Empty carry array = "user
    // starts in this chunk" (the reset path).
    val carries = chunked
      .map(c => (c.user, c.chunk, c.m, c.b, c.resetOut))
      .groupByKey(_._1)
      .flatMapGroups { (user, it) =>
        val sums = it.toArray.sortBy(_._2)
        var started = false
        var st: Array[Double] = null
        sums.iterator.map { case (_, chunk, m, b, reset) =>
          val carryIn = if (started) st else Array.empty[Double]
          st = if (!started) { started = true; reset } else apply(m, b, st)
          (user, chunk, carryIn)
        }
      }
      .toDF("user_id", "chunk", "carry")

    // phase 3: replay each chunk from its carry-in with fold ops
    val out = chunked
      .joinWith(carries.as[(Long, Long, Array[Double])],
        chunked("user") === carries("user_id") &&
          chunked("chunk") === carries("chunk"))
      .flatMap { case (cs, (_, _, carry)) =>
        var st: Array[Double] = null
        var i = 0
        val res = new Array[(Long, Long, Double, Double)](cs.evs.length)
        while (i < cs.evs.length) {
          val (eid, _, x) = cs.evs(i)
          if (i == 0 && carry.isEmpty) st = rec.init(x)
          else {
            if (i == 0) st = carry.clone()
            rec.step(st, x)
          }
          res(i) = (cs.user, eid, st(0), if (dim > 1) st(1) else 0.0)
          i += 1
        }
        res
      }
      .toDF("user_id", "event_id", "s0", "s1")
    // the persisted chunk frame is read twice (summaries + replay);
    // Bench's per-query clearCache releases it, matching the other
    // persist-using operators' discipline
    out.select(
      (col("user_id") +: col("event_id") +:
        (0 until dim).map(i => col(s"s$i"))): _*)
  }
}
