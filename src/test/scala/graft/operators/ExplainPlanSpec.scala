package graft.operators

import graft.SparkSpec

/** Plan-SHAPE regression guards (mirrors BucketedJoinSpec's
  * no-Exchange assertion): these queries' 100 TB viability rests on a
  * specific physical plan — partition pruning reaching the scan,
  * dims broadcasting instead of shuffling the fact — and a refactor
  * that silently loses the shape would still pass the value oracle at
  * test SF. Assert the shape itself. */
class ExplainPlanSpec extends SparkSpec {
  test("p1: year predicate reaches the scan as a PartitionFilter") {
    val plan = CoreOps.p1PartitionPruning(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no PartitionFilters in:\n$plan")
    val pf = plan.substring(plan.indexOf("PartitionFilters"))
      .takeWhile(_ != ']')
    assert(pf.contains("o_year") && pf.contains("1995"),
      s"year predicate not pushed to partition pruning: $pf")
  }

  test("p2: the join-derived year filter prunes partitions dynamically") {
    val plan = CoreOps.p2DynamicPruning(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamicpruningexpression in PartitionFilters:\n$plan")
  }

  test("q6: all three range predicates reach the parquet scan") {
    val plan = CoreOps.q6ForecastRevenue(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), s"no PushedFilters in:\n$plan")
    val pushed = plan.substring(plan.indexOf("PushedFilters"))
      .takeWhile(_ != ']')
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(pushed.contains(c), s"$c predicate not pushed to the scan: $pushed")
    }
    // the scan must read exactly the four touched columns
    val rs = plan.substring(plan.indexOf("ReadSchema")).takeWhile(_ != '>')
    Seq("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
      .foreach(c => assert(rs.contains(c), s"$c missing from ReadSchema: $rs"))
    assert(!rs.contains("l_orderkey") && !rs.contains("l_returnflag"),
      s"untouched columns survived into ReadSchema: $rs")
  }

  test("q19: the hand-derived envelopes reach both scans under the OR") {
    val plan = CoreOps.q19DiscountedRevenue(spark, sfDir)
      .queryExecution.executedPlan.toString
    // each disjunct constrains columns from BOTH sides, so nothing
    // pushes automatically — the explicit per-side envelope filters
    // must survive into the scans' PushedFilters
    val scans = "PushedFilters: \\[[^\\]]*".r.findAllIn(plan).toSeq
    assert(scans.exists(_.contains("p_brand")),
      s"brand envelope not pushed to the part scan:\n${scans.mkString("\n")}")
    assert(scans.exists(_.contains("l_quantity")),
      s"quantity envelope not pushed to the lineitem scan:\n${scans.mkString("\n")}")
  }

  test("q5: the dim chain broadcasts — no shuffle on the dim side") {
    val plan = CoreOps.q5StarJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts >= 2,
      s"expected >=2 broadcast joins (nation-region chain, supplier dim), got $broadcasts:\n$plan")
  }

  test("t1: top-k plans as TakeOrderedAndProject, not a total sort") {
    val plan = CoreOps.t1TopK(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k lost its TakeOrderedAndProject shape:\n$plan")
  }

  test("upsert_latest: max_by compaction aggregates, never window-sorts") {
    val plan = Changelog.upsertLatest(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"changelog compaction regressed to a window sort:\n$plan")
    assert(plan.contains("max_by"), s"expected a max_by aggregate:\n$plan")
  }

  test("range_join_binned: a real equi-join on the bin, no theta fallback") {
    val plan = RangeJoin.priceBandDemo(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join fell into the theta-join trap:\n$plan")
    // the positive half: some hash/merge equi-join must be present —
    // a refactor that drops the _bin key entirely must not pass
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"no equi-join in the binned range join plan:\n$plan")
  }

  test("j6: full outer join runs over aggregates, not raw facts") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val lp = CoreOps.j6FullOuter(spark, sfDir).queryExecution.optimizedPlan
    val joins = lp.collect { case j: Join => j }
    assert(joins.size == 1, s"expected exactly one join:\n$lp")
    assert(joins.head.children.forall(
      _.collectFirst { case a: Aggregate => a }.isDefined),
      s"a join input lost its pre-aggregation (join-then-aggregate " +
        s"would shuffle the raw facts):\n$lp")
  }

  test("a17: histogram combines map-side — the shuffle carries buckets") {
    val plan = CoreOps.a17Histogram(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"),
      s"histogram lost its partial aggregation (the shuffle would " +
        s"carry raw rows, not <=nBuckets rows per partition):\n$plan")
    assert(plan.contains("ReadSchema: struct<o_totalprice:double>"),
      s"histogram scan reads more than the bucketed column:\n$plan")
  }

  test("pii scrub stays map-only inside whole-stage codegen") {
    val plan = graft.functions.TextOps.piiScrub(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"a pure row-local scrub must not shuffle:\n$plan")
    assert(plan.contains("WholeStageCodegen") || plan.contains("*(1)"),
      s"scrub fell out of codegen:\n$plan")
  }

  test("p3: the bloom-filter gate sees injection and unchanged results") {
    val r = graft.functions.Gates.bloomJoinGate(spark, sfDir).head()
    assert(r.getBoolean(0), "might_contain was not injected into the plan")
    assert(r.getBoolean(1), "bloom-pruned result diverged from baseline")
    assert(r.getLong(2) > 0, "gate ran over an empty join — vacuous")
  }

  test("w3: the sliding sum keeps its bounded ROWS frame") {
    val lp = CoreOps.w3SlidingSum(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    assert(lp.contains("RowFrame") && lp.contains("-3"),
      s"bounded 4-row frame lost (unbounded would sort whole " +
        s"partitions into state):\n$lp")
  }

  test("w5: the rolling spend keeps its value-bounded RANGE frame") {
    val lp = CoreOps.w5RangeFrame(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    assert(lp.contains("RangeFrame") && lp.contains("-6"),
      s"7-day RANGE frame lost (a ROWS frame would break same-day " +
        s"peer semantics):\n$lp")
  }

  test("ev_anomaly: the 5-row stats frame broadcasts, events never reshuffle") {
    val plan = EventOps.anomalyZscore(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"stats join must broadcast, not shuffle the event stream:\n$plan")
  }

  test("inverted index ranks through TWO window passes (skew-safe top-k)") {
    // (string count, not a node collect — AQE's AdaptiveSparkPlanExec
    // hides its subtree from TreeNode.collect before execution)
    val plan = graft.functions.TextOps.invertedIndex(spark, sfDir)
      .queryExecution.executedPlan.toString
    val windows = "\\bWindow \\[".r.findAllIn(plan).size
    // per-(term, partition) local cap THEN the <=k*nP global rank — a
    // refactor to one term-partitioned window would funnel a hot
    // term's whole posting set through one task
    assert(windows == 2,
      s"expected local+global window passes, got $windows:\n$plan")
  }

  test("paragraph dedup elects keepers without any window sort") {
    val plan = graft.functions.Dedup.paragraphDedup(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"keeper election regressed from partial-agg'd min(struct) to a " +
        s"window sort (one task per hot boilerplate paragraph):\n$plan")
  }

  test("semantic decon ships only hit rows: one exchange, no join operator") {
    val plan = graft.functions.Decontam.semanticOverlap(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the eval suite rides a driver broadcast into the map kernel, so
    // the ONLY exchange is the per-doc hit aggregation — a relational
    // join against the corpus-sized side would add joins/exchanges
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"expected exactly the hit-aggregation exchange:\n$plan")
    assert(!plan.contains("Join"),
      s"train×eval must go through the broadcast kernel, not a join:\n$plan")
  }

  test("url extraction is map-only: no exchange anywhere in the plan") {
    val plan = graft.functions.TextOps.urlExtract(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"a pure row-local parse must not shuffle:\n$plan")
  }

  test("s9: the partitionBy(lang) sink layout prunes a lang filter on re-read") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("s9plan").toString
    try {
      graft.Tables.documents(spark, sfDir)
        .select("doc_id", "lang", "n_chars")
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      val aLang = spark.read.parquet(out).select("lang").head().getString(0)
      val plan = spark.read.parquet(out).filter(col("lang") === aLang)
        .queryExecution.executedPlan.toString
      val pf = plan.indexOf("PartitionFilters")
      assert(pf >= 0 && plan.substring(pf).takeWhile(_ != ']').contains("lang"),
        s"lang filter did not become a PartitionFilter:\n$plan")
    } finally graft.Fs.deleteRecursively(java.nio.file.Paths.get(out))
  }

  test("j8: correlated EXISTS decorrelates to an ExistenceJoin hash join") {
    val plan = CoreOps.j8ExistsCorrelated(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ExistenceJoin"),
      s"EXISTS did not decorrelate to an existence hash join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"correlated subquery fell into a nested loop:\n$plan")
  }

  test("j10: NOT IN plans as a null-aware anti join") {
    val plan = CoreOps.j10NotIn(spark, sfDir)
      .queryExecution.executedPlan.toString
    // BroadcastHashJoinExec renders its isNullAwareAntiJoin flag as the
    // trailing boolean: "... LeftAnti, BuildRight, true"
    assert(plan.contains("LeftAnti, BuildRight, true"),
      s"NOT IN lost its null-aware anti join:\n$plan")
  }

  test("q47: both window passes ride ONE exchange+sort (no re-shuffle between)") {
    val plan = CoreOps.q47MovingAvg(spark, sfDir)
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toVector
    val winIdx = lines.zipWithIndex.collect {
      case (l, i) if l.contains("Window [") => i
    }
    assert(winIdx.size == 2,
      s"expected exactly two Window operators (lag/lead + year stats), " +
        s"got ${winIdx.size}:\n$plan")
    // hash(n_name) satisfies ClusteredDistribution(n_name, yr) and the
    // (n_name, yr, mon) sort covers the (n_name, yr) prefix, so the
    // second window must reuse the first's exchange AND sort — a
    // redundant exchange here is a full re-shuffle of the aggregate
    val between = lines.slice(winIdx.min + 1, winIdx.max)
    assert(!between.exists(l => l.contains("Exchange") || l.contains("Sort ")),
      s"the year window re-shuffled/re-sorted instead of riding the " +
        s"sequence window's layout:\n${between.mkString("\n")}")
  }

  test("q51: both running-max fills land in ONE Window operator") {
    val plan = CoreOps.q51CumulativeAlign(spark, sfDir)
      .queryExecution.executedPlan.toString
    val winLines = plan.linesIterator.filter(_.contains("Window [")).toVector
    assert(winLines.exists(l => l.contains("book_cum") && l.contains("ship_cum")),
      s"the two alignment max-fills split into separate Window passes " +
        s"(two sorts of the joined frame instead of one):\n" +
        winLines.mkString("\n"))
  }

  test("merge_upsert: one hash join on compacted sides, no window over history") {
    val plan = Changelog.mergeUpsert(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"merge regressed to a window over raw history:\n$plan")
    assert(plan.contains("max_by"),
      s"expected max_by compaction feeding the merge join:\n$plan")
  }

  test("q88: all eight bands ride ONE scan of the fact table") {
    val df = CoreOps.q88TimeBands(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("FileScan"))
    assert(scans === 1,
      s"the multi-band aggregate split into $scans scans (the 8-subquery " +
        s"anti-pattern this operator exists to avoid):\n$plan")
    // the one-pass counters must equal independently-computed filters
    val row = df.head()
    val li = graft.Tables.lineitem(spark, sfDir)
      .filter("l_discount <= 0.08 OR l_tax >= 0.04")
    assert(row.getLong(0) === li.filter("l_quantity >= 1 AND l_quantity < 7").count())
    assert(row.getLong(7) === li.filter("l_quantity >= 43 AND l_quantity < 51").count())
    assert((0 until 8).map(row.getLong).forall(_ > 0), s"empty band in $row")
  }
}
