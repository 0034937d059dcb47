package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.CoreOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one declared operator from SURVEY.md §2
  * (the key names carry the §2 IDs); [[oracleSql]] holds the equivalent
  * DuckDB SQL over the same parquet tables. Column names AND types are
  * aligned on both sides because the driver sorts columns by name and
  * hash-compares values. Money aggregates run through DECIMAL(18,2) on
  * both sides so sums are exact and order-independent (double sums would
  * vary with partitioning at scale), then surface as DOUBLE.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreOps.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> CoreOps.q1PricingSummary _,
    "f2_filter_project"  -> CoreOps.f2FilterProject _,
    "f3_prefix_filter"   -> CoreOps.f3PrefixFilter _,
    "j1_agg_join"        -> CoreOps.j1AggJoin _,
    "j2_semi_join"       -> CoreOps.j2SemiJoin _,
    "j2_anti_join"       -> CoreOps.j2AntiJoin _,
    "j3_fact_dim_join"   -> CoreOps.j3FactDimJoin _,
    "j4_topk_rejoin"     -> CoreOps.j4TopkRejoin _,
    "a5_global_agg"      -> CoreOps.a5GlobalAgg _,
    "a6_composite_agg"   -> CoreOps.a6CompositeAgg _,
    "a7_pivot"           -> CoreOps.a7Pivot _,
    "a8_count_distinct"  -> CoreOps.a8CountDistinct _,
    "a9_rollup"          -> CoreOps.a9Rollup _,
    "t1_topk"            -> CoreOps.t1TopK _,
    "t2_top1"            -> CoreOps.t2Top1 _,
    "t3_sort_asc"        -> CoreOps.t3SortAsc _,
    "t4_limit"           -> CoreOps.t4Limit _,
    "x3_month_format"    -> CoreOps.x3MonthFormat _,
    "x9_json_extract"    -> CoreOps.x9JsonExtract _,
    "x12_explode_array"  -> CoreOps.x12ExplodeArray _,
    "x_scalar_suite"     -> CoreOps.xScalarSuite _,
    "w1_window_rank"     -> CoreOps.w1WindowRank _,
    "w2_running_sum"     -> CoreOps.w2RunningSum _,
  )

  private val decPrice = "CAST(l_extendedprice AS DECIMAL(18,2))"
  private val decDisc  = "(1 - CAST(l_discount AS DECIMAL(18,2)))"
  private val decTotal = "CAST(o_totalprice AS DECIMAL(18,2))"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  SUM(l_quantity) AS sum_qty,
         |  CAST(SUM($decPrice) AS DOUBLE) AS sum_base_price,
         |  CAST(SUM($decPrice * $decDisc) AS DOUBLE) AS sum_disc_price,
         |  AVG(l_quantity) AS avg_qty,
         |  CAST(SUM($decPrice) AS DOUBLE) / COUNT(*) AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "f2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_quantity >= 30 AND l_discount > 0.02
        |  AND l_shipdate < TIMESTAMP '1998-01-01'""".stripMargin,
    "f3_prefix_filter" ->
      """SELECT p_partkey, p_name, p_brand, p_type FROM part
        |WHERE p_name LIKE 'small%' AND p_brand LIKE 'Brand#1%'""".stripMargin,
    "j1_agg_join" ->
      s"""WITH sums AS (
         |  SELECT strftime(o_orderdate, '%m-%Y') AS month,
         |         SUM($decTotal) AS sum_price_dec
         |  FROM orders GROUP BY 1),
         |counts AS (
         |  SELECT strftime(o_orderdate, '%m-%Y') AS month,
         |         COUNT(*) AS n_orders
         |  FROM orders GROUP BY 1)
         |SELECT sums.month, CAST(sum_price_dec AS DOUBLE) AS sum_price, n_orders,
         |       CAST(sum_price_dec AS DOUBLE) / n_orders AS avg_price
         |FROM sums JOIN counts USING (month)""".stripMargin,
    "j2_semi_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM customer
        |              WHERE c_custkey = o_custkey AND c_acctbal > 5000)""".stripMargin,
    "j2_anti_join" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)""".stripMargin,
    "j3_fact_dim_join" ->
      s"""SELECT p_brand,
         |  CAST(SUM($decPrice * $decDisc) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand""".stripMargin,
    "j4_topk_rejoin" ->
      s"""WITH top10 AS (
         |  SELECT o_custkey FROM orders GROUP BY o_custkey
         |  ORDER BY SUM($decTotal) DESC, o_custkey ASC LIMIT 10)
         |SELECT strftime(o_orderdate, '%m-%Y') AS month,
         |       COUNT(*) AS n_orders,
         |       CAST(SUM($decTotal) AS DOUBLE) AS sum_price
         |FROM orders WHERE o_custkey IN (SELECT o_custkey FROM top10)
         |GROUP BY 1""".stripMargin,
    "a5_global_agg" ->
      s"""SELECT COUNT(*) AS n_rows, SUM(l_quantity) AS sum_qty,
         |       CAST(SUM($decPrice) AS DOUBLE) AS sum_price
         |FROM lineitem""".stripMargin,
    "a6_composite_agg" ->
      s"""SELECT strftime(o_orderdate, '%m-%Y') AS month, o_orderpriority,
         |       COUNT(*) AS n_orders,
         |       CAST(SUM($decTotal) AS DOUBLE) AS sum_price
         |FROM orders GROUP BY 1, 2""".stripMargin,
    "a7_pivot" ->
      """SELECT l_returnflag,
        |  SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS F,
        |  SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS O
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a8_count_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "a9_rollup" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, o_orderpriority,
        |       COUNT(*) AS n_orders
        |FROM orders GROUP BY ROLLUP(o_year, o_orderpriority)""".stripMargin,
    "t1_topk" ->
      s"""SELECT l_partkey, CAST(rev AS DOUBLE) AS revenue FROM (
         |  SELECT l_partkey, SUM($decPrice * $decDisc) AS rev
         |  FROM lineitem GROUP BY l_partkey
         |  ORDER BY rev DESC, l_partkey ASC LIMIT 10)""".stripMargin,
    "t2_top1" ->
      s"""SELECT o_custkey, CAST(spend_dec AS DOUBLE) AS spend FROM (
         |  SELECT o_custkey, SUM($decTotal) AS spend_dec
         |  FROM orders GROUP BY o_custkey
         |  ORDER BY spend_dec DESC, o_custkey ASC LIMIT 1)""".stripMargin,
    "t3_sort_asc" ->
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |ORDER BY s_acctbal ASC, s_suppkey ASC""".stripMargin,
    "t4_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_orderkey ASC LIMIT 100""".stripMargin,
    "x3_month_format" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%m-%Y') AS month_dash,
        |  strftime(o_orderdate, '%m/%Y') AS month_slash,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders""".stripMargin,
    "x9_json_extract" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "x12_explode_array" ->
      """SELECT vec_id,
        |  CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
        |  CAST(unnest(embedding) AS DOUBLE) AS val
        |FROM embeddings WHERE vec_id < 20""".stripMargin,
    "x_scalar_suite" ->
      """SELECT p_partkey,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  upper(p_brand) AS brand_upper,
        |  substring(p_type, 1, 4) AS type_prefix,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  p_size * 2 + 1 AS size_calc,
        |  CAST(p_size AS VARCHAR) AS size_str,
        |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS price_x2
        |FROM part""".stripMargin,
    "w1_window_rank" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
        |       CAST(rn AS INTEGER) AS rn
        |FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
        |        row_number() OVER (PARTITION BY l_suppkey
        |          ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
        |      FROM lineitem)
        |WHERE rn <= 3""".stripMargin,
    "w2_running_sum" ->
      s"""SELECT o_custkey, o_orderkey, CAST(order_seq AS INTEGER) AS order_seq,
         |       CAST(run_dec AS DOUBLE) AS run_spend
         |FROM (SELECT o_custkey, o_orderkey,
         |        row_number() OVER w AS order_seq,
         |        SUM($decTotal) OVER (PARTITION BY o_custkey
         |          ORDER BY o_orderdate, o_orderkey
         |          ROWS UNBOUNDED PRECEDING) AS run_dec
         |      FROM orders
         |      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))""".stripMargin,
  )
}
