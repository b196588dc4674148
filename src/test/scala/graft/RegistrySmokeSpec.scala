package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Registry

/** Every registered query must run at sf0.001; queries expected to produce
  * rows must produce them (the driver's rows>0 smoke + a floor under the
  * oracle gate).
  */
class RegistrySmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // Queries where an empty result would itself be a bug at sf0.001.
  private val mustHaveRows = Set(
    "f1_source_scan", "f2_range_partition", "f3_hash_partition",
    "f4_dedup_exactly_once", "f6_distinct_collect_sink", "f7_quantify",
    "u1_split_flatmap", "u2_wordcount", "u2_wordcount_salted", "u3_filter_contains_project",
    "u4_project", "u5_filter_eq_project", "u6_filter_numeric",
    "u9_u10_filter_pipeline", "u11_complex_agg", "u12_batch_oracle",
    "g1_grep_per_file", "g2_grep_count", "g4_grep_only_matching", "g5_grep_word_count",
    "h26_regression",
    "h1_pricing_summary", "h2_join_topk_revenue", "h3_broadcast_join",
    "h4_window_topn_per_key", "h5_global_topk", "h7_asof_join", "h7b_asof_join_native",
    "h8_event_time_window", "h9_sessionize", "h10_semi_anti_join", "h11_rollup",
    "h18_cube", "h19_grouping_sets", "h20_pivot", "h21_interval_join",
    "h22_funnel", "h23_cohort_retention", "h24_attribution", "h25_moving_window",
    "x_funnel_incremental", "x_distinct_kmv",
    "x_ngram_freq", "x_quantiles", "x_text_repetition",
    "x_split_train_test", "x_sample_stratified", "x_json_extract", "x_json_struct", "x_json_variant",
    "x_pack_sequences",
    "x_dedup_minhash_lsh", "x_dedup_ngram_jaccard", "x_dedup_containment", "x_kmeans", "x_kmeans_model",
    "x_text_stats", "x_text_langid", "x_text_fingerprint", "x_approx_distinct_sketch",
    "x_dedup_exact", "x_dedup_simhash",
    "x_ann_bruteforce", "x_multimodal_meta", "x_multimodal_frames",
    "x_trending_topk", "x_dedup_incremental_stream", "x_neardup_filter", "x_c4_line_clean",
    "x_dedup_spans", "x_gopher_quality", "x_dedup_spans_incremental",
    "x_gopher_repetition", "x_quality_classifier", "x_mix_temperature", "x_upsample_epochs", "x_select_top_quantile_lang", "x_dedup_url",
    "x_bpe_pair_counts", "x_bpe_merges", "x_bpe_tokenize", "x_chunk_documents", "x_curation_pipeline3", "x_curation_pipeline4",
    "x_html_extract", "x_shard_assign", "x_shard_manifest", "x_zorder", "x_hard_negatives", "x_url_filter",
    "h27_transition_matrix", "h28_top_paths",
    "x_cdc_apply", "x_cdc_merge", "x_data_quality_report", "x_anomaly_days",
    "x_pagerank", "x_fuzzy_join_edit", "x_mv_incremental",
    "x_sample_weighted", "x_skew_report", "x_gdpr_purge", "x_snapshot_diff",
    "h29_funnel_windowed", "x_bitmap_distinct", "x_sketch_setops", "x_ann_pq",
    "x_column_profile", "x_histogram", "x_ann_ivfpq", "x_bfs_layers",
    "x_ohlc_bars", "x_compaction_plan", "h31_funnel_sessionized",
    "x_inverted_index", "x_boolean_search", "x_winnowing", "x_countmin",
    "x_scd2", "x_zonemap", "x_attribution_linear",
    "x_scd2_lookup", "x_triangle_count", "x_fk_audit",
    "x_resample_ffill", "x_sorted_neighborhood", "x_label_propagation", "x_bloom_index",
    "x_mv_retract", "x_market_basket", "x_tfidf_doc_sim", "x_drift_tv",
    "x_multimodal_resize", "x_multimodal_features", "x_mmr_diversify",
    "x_user_ltv", "x_rfm_segmentation", "x_multimodal_ahash"
  )

  Registry.all.foreach { q =>
    test(s"${q.name} runs" + (if (mustHaveRows(q.name)) " and has rows" else "")) {
      val n = q.run(spark, TestSpark.sf0001).count()
      if (mustHaveRows(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
      else assert(n >= 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("registry names are unique — toMap must not silently shadow a query") {
    val names = Registry.all.map(_.name)
    val dups  = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate registry names would drop queries: ${dups.mkString(", ")}")
  }
}
