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
    * anomaly baselines and rate estimators. This is a GENUINE
    * sequential recurrence, the rare case where typed per-group
    * imperative code beats SQL: the closed-form window rewrite
    * (Σ xⱼ·(1−α)^(rn−j) via pow) overflows (1−α)^(−rn) past a few
    * hundred rows per key, and no associative aggregate computes it.
    * groupByKey shuffles by user_id once; each group sorts its OWN
    * history in memory (state is per-user history — the identical
    * boundedness contract as sessionization's flatMapGroupsWithState;
    * hot users salt-split upstream if a single history outgrows a
    * task). Arithmetic is the literal α·x + (1−α)·prev, left to
    * right, so the oracle's recursive CTE reproduces every double
    * bit-for-bit; 6-decimal round on both sides. */
  /** Holt double-exponential smoothing per user [HOLT]: the
    * level+trend recurrence (levelᵢ = α·xᵢ + (1−α)(levelᵢ₋₁+trendᵢ₋₁);
    * trendᵢ = β(levelᵢ−levelᵢ₋₁) + (1−β)trendᵢ₋₁) — the two-state big
    * sibling of [[ewma]], same typed sorted-group fold and the same
    * boundedness contract. α=0.5 and β=0.25 are BINARY-EXACT
    * constants, so every multiply is reproducible to the bit and the
    * oracle's two-column recursive CTE replays the identical double
    * chain. */
  def holt(s: SparkSession, d: String, alpha: Double = 0.5,
      beta: Double = 0.25): DataFrame = {
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
      .toDF("user_id", "event_id", "level", "trend")
      // emitted UNROUNDED: the dyadic α/β keep the state a dyadic
      // rational, so values genuinely land on exact .xxxxxx5 decimal
      // boundaries where the engines' round() implementations differ
      // (exact-decimal HALF_UP vs a ×10⁶ double multiply — measured on
      // this corpus); the raw doubles are bit-identical on both
      // engines, so the compare canonicalizes them identically
      .select(col("user_id"), col("event_id"), col("level"), col("trend"))
  }

  def ewma(s: SparkSession, d: String, alpha: Double = 0.2): DataFrame = {
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
      .toDF("user_id", "event_id", "ewma")
      .select(col("user_id"), col("event_id"), round(col("ewma"), 6).as("ewma"))
  }
}
