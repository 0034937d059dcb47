package graft

/** Suite-wide physical-plan lint: every query whose plan can be built
  * lazily must be free of CartesianProduct — the one operator that is
  * never right at 100 TB (a non-equi join that degenerated). Tiny
  * intentional cross joins (1-row aggregate frames, literal grids)
  * plan as BroadcastNestedLoopJoin and are allowed; a CartesianProduct
  * means a big-side cross product slipped through a refactor. Queries
  * that EXECUTE on construction (quality gates, streaming gates, sink
  * roundtrips, iterative dedup) are excluded by name — their plan
  * shapes are pinned by their own specs instead. */
class SuitePlanLintSpec extends SparkSpec {
  // these run jobs / write files / stream when invoked, so building
  // them here would be an integration run, not a plan inspection:
  // gates + streams, sink roundtrips, iterative dedup, bucketed /
  // partitioned warehouse writers (b1/p1/p2), and the operators that
  // collect tiny driver frames while constructing (stratum offsets,
  // prefix sums, the merge cutoff)
  private val eager = Set(
    "a14_quantile_gate", "dedup_simhash", "sim_lsh_topk", "sim_ivf_topk",
    "a15_hll_merge", "p3_bloom_join", "sim_semdedup", "a18_count_min",
    "ev_sliding_distinct", "fuzzy_cosine_join", "fuzzy_cosine_zipf",
    "stream_batch_parity", "stream_dedup_parity", "stream_upsert_parity",
    "stream_availablenow_parity", "stream_neardup_parity",
    "stream_session_parity", "stream_quantile_parity",
    "compact_small_files", "p4_nested_pruning", "skew_aqe_join",
    "s1_csv_roundtrip", "s7_orc_roundtrip", "s8_json_roundtrip",
    "s9_partitioned_sink", "s10_schema_evolution", "eth_csv_pipeline",
    "dedup_corpus", "corpus_diff", "g2_pagerank", "w_global_row_number",
    "b1_bucketed_join", "p1_partition_pruning", "p2_dynamic_pruning",
    "merge_upsert", "sample_stratified", "sample_cap_per_source",
    "mix_weighted", "pack_chunks", "dedup_cc_clusters", "emb_covariance",
    "s11_zstd_roundtrip", "s12_csv_dialect",
    // r07 late additions: substring dedup counts its gram cache on
    // construction, bloom decon collects the bitmap, the DSv2
    // roundtrip writes segments
    "dedup_substring", "decon_bloom", "s13_dsv2_roundtrip",
    "s14_dsv2_agg_pushdown")

  test("no lazily-built query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq
      .filterNot { case (name, _) => eager.contains(name) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"cartesian products in: ${offenders.mkString(", ")}")
  }
}
