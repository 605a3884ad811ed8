package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for representative gate queries
  * so plan regressions (lost pushdown, surprise shuffles, broken
  * broadcast) are visible in review. Output is summarized in PLANS.md.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.Graft.localSession(8, "graft-plans")
    val interesting = Set("q01_agg_mixed", "q02_filter_project",
      "q03_join_agg", "q07_broadcast_dims", "q08_window_latest",
      "q11_pivot", "q32_asof_join", "q33_range_join", "q36_interval_overlap",
      "d02_minhash_lsh", "d05_ann_brute", "d06_ann_lsh", "d07_ann_ivf",
      "d09_embed_neardup", "d11_ann_ivf_quantized", "d13_semantic_dedup",
      "t04_fingerprint", "t06_bm25", "q40_gapfill", "q43_funnel",
      "q39_fuzzy_match", "d12_dedup_cluster",
      "t12_seq_pack", "t13_chunk_dedup", "t14_temperature_mix",
      "q47_transitions", "t16_corpus_stats", "t17_quality_prune",
      "t18_repetition", "t19_ccnet_buckets", "q48_pagerank",
      "d15_incremental_minhash", "d16_ann_ivf_stored",
      "d17_incremental_semdedup", "t20_freq_sketch", "q49_ewma_chunked",
      "q50_fuzzy_multipass", "t15_redact", "t22_span_dedup",
      "t23_kmv_sample", "t24_contam_join", "t25_profile", "q51_zorder",
      "d18_incremental_bloom", "d19_ann_projected", "t26_nb_classifier",
      "q52_auc", "q53_scd2_merge", "q54_spearman", "t27_chi2_features",
      "q55_bootstrap", "q56_avg_precision", "q57_robust_z",
      "t28_weighted_sample", "t29_js_divergence", "q58_psi",
      "t30_chunk_stride", "q59_kappa_agreement",
      "q62_snapshot_diff", "t32_expectations", "t33_bigram_lm",
      "t34_k_anonymity", "q63_welch_ttest", "t35_line_dedup",
      "t36_boilerplate_lines", "q64_triangles", "q65_compaction_plan",
      "t37_rrf_fusion", "m02_audio_meta", "q66_ndcg", "d25_kmeans",
      "q67_holt", "t38_l_diversity", "t39_countmin", "q68_fs_linkage",
      "q69_attribution", "q70_pct_rank", "q71_kaplan_meier", "q72_benford",
      "q73_gini", "q74_hits",
      "q75_grouping_sets", "q76_range_frame", "q77_mann_whitney",
      "q78_cuped", "q79_kcore", "q80_assoc_rules", "q81_cusum",
      "q82_quantile_bins", "t41_quantile_sketch", "t42_code_detect",
      "q83_mutual_nn", "t43_tfidf_pairs",
      "t44_keyness", "q84_assortativity", "t45_containment",
      "t46_prefix_jaccard", "q85_session_window", "q86_interval_union",
      "q87_asof_nearest", "q88_winsorize", "q89_merge_upsert",
      "m03_video_meta", "q90_rolling_actives", "q91_weighted_quantiles",
      "q92_cusum_fixed", "q93_window_suite", "q94_setops_all",
      "q95_wasserstein", "d28_centroid_drift", "q96_sprt",
      "d29_ann_filtered", "q97_decile_lift", "t47_bpe_pairs",
      "q98_trendline", "q99_dow_seasonality", "q100_curation_funnel",
      "t48_zipf", "t49_lexical_diversity", "q101_cliffs_delta",
      "q102_sampler_uniformity", "t50_ngram_novelty", "q103_stickiness",
      "m04_image_dims", "q104_revenue_retention", "t51_burstiness",
      "q105_logreg_gd", "q106_kde_grid", "q107_merge_vintage",
      "t52_bpe_merges", "q108_logreg_calibration", "q109_ks_test",
      "d30_centroid_pairs", "t53_bpe_encode")
    SparkEntry.gateQueries.filter(q => interesting.contains(q.name))
      .foreach { q =>
        println(s"\n===== ${q.name} =====")
        q.fn(spark, sfDir).explain("formatted")
      }
    spark.stop()
  }
}
