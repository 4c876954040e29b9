"""Query registry: one entry per implemented operator (SURVEY.md §2).

Each entry pairs a Spark DataFrame builder with the equivalent ANSI SQL
that DuckDB runs as the correctness oracle (driver contract in
``__spark_entry__.py``). Entries with ``oracle=None`` are
non-SQL-expressible (RBM imputation, streaming state, LSH internals) and
get the driver's rows-only check.

Column-name discipline: every computed column is aliased identically in
the Spark plan and the oracle SQL — the driver sorts columns by name
before value-hashing.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark_fn: SparkFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}

# Operator modules that register queries on import.
_OPERATOR_MODULES = (
    "boltzmannclean_spark.operators.relational",
    "boltzmannclean_spark.operators.joins",
    "boltzmannclean_spark.operators.tpch",
    "boltzmannclean_spark.operators.aggregates",
    "boltzmannclean_spark.operators.windows",
    "boltzmannclean_spark.operators.setops",
    "boltzmannclean_spark.operators.scalar_funcs",
    "boltzmannclean_spark.operators.asof",
    "boltzmannclean_spark.operators.timeseries",
    "boltzmannclean_spark.operators.behavioral",
    "boltzmannclean_spark.operators.profiling",
    "boltzmannclean_spark.operators.graph",
    "boltzmannclean_spark.operators.dedup",
    "boltzmannclean_spark.operators.similarity",
    "boltzmannclean_spark.operators.ann_index",
    "boltzmannclean_spark.operators.text",
    "boltzmannclean_spark.operators.multimodal",
    "boltzmannclean_spark.operators.imputation",
    "boltzmannclean_spark.operators.sources_sinks",
    "boltzmannclean_spark.operators.python_udfs",
    "boltzmannclean_spark.streaming.queries",
)


def register(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    def deco(fn: SparkFn) -> SparkFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""), tuple(tags))
        return fn

    return deco


# Verification rotation: the external correctness harness samples the
# FIRST 50 registry entries in iteration order each round. Names listed
# here are served first so that (a) queries never yet harness-verified and
# (b) queries whose plan/oracle changed this round land inside the
# sampling window; everything else follows in module insertion order and
# stays covered by tests/test_oracle_parity.py, which always runs ALL
# entries. Rotate this list each round until every query has a green
# harness row.
_VERIFY_FIRST = (
    # -- round-11 session 2: new operators --
    "pairs_hard_negatives",
    "events_markov_eval",
    "ts_seasonal_strength",
    "stats_power_sample_size",
    "stats_g_test",
    "window_bollinger_breakout",
    "graph_hits_hubs_authorities",
    "agg_weighted_median",
    "ml_feature_hashing",
    "ml_target_encoding",
    "text_winnowing_overlap",
    "graph_personalized_pagerank",
    "dedup_incremental_batch",
    "stats_delta_method_ratio_ci",
    "stream_srm_monitor",
    "agg_bitmap_exact_distinct",
    "stats_proportion_ci_wilson",
    "dq_rowcount_anomaly",
    "stats_jackknife_ci_mean",
    "ts_lagged_cross_correlation",
    "text_lexical_diversity",
    "stats_anova_oneway",
    "stats_spearman_rho",
    "stats_cramers_v",
    "stats_srm_check",
    "events_interarrival_burstiness",
    "chunk_sliding_windows",
    "graph_katz_centrality",
    # -- round-11: new entry + every plan/oracle changed this round
    #    (ADVICE fixes, PQ 32x256 retrain, sharded prefix sum) --
    "stream_psi_drift",
    "stats_chi_square_independence",
    "graph_harmonic_centrality",
    "text_collocations_pmi",
    "similarity_ann_recall_eval",
    "similarity_ann_recall_vs_nprobe",
    "similarity_ann_pq_adc",
    "similarity_ann_pq_adc_prebuilt",
    "similarity_ann_ivfpq",
    "similarity_ann_ivfpq_prebuilt",
    "similarity_ann_delta_assign",
    "sink_ann_index_build",
    "dq_distribution_psi",
    "stats_permutation_test",
    "stats_bh_fdr_permutation",
    "events_pareto_concentration",
    # -- round-10 additions (harness-verified in r10's 50-sample) --
    "events_lorenz_gini",
    "text_textrank_keywords",
    "ts_seasonal_residual_anomaly",
    "sql_recursive_cte_reachability",
    "stats_brown_forsythe",
    "dq_freshness_lag",
    "ts_lag_feature_matrix",
    "stats_welch_ttest",
    "graph_linkpred_jaccard",
    "ts_changepoint_cusum",
    "curation_filter_attribution",
    "stats_ks_two_sample",
    "stats_kruskal_wallis",
    "ts_theil_sen_slope",
    "dedup_sorted_neighborhood",
    "graph_clustering_coefficient",
    "text_rake_keywords",
    # -- round-9 additions whose plan/oracle changed in round 10 --
    "text_apriori_cooccur",
    "dedup_fellegi_sunter_score",
    "stats_skewness_kurtosis_exact",
    "window_hampel_filter",
    "graph_linkpred_adamic_adar",
    # -- round-8 session-2 additions (never verified, newest code) --
    "curation_perplexity_buckets",
    "stats_sequential_sprt",
    "join_geo_knn_grid",
    "graph_linkpred_common_neighbors",
    "ts_holt_linear_smoothing",
    # -- round-8 rotation: new-this-round first, then the full
    #    never-harness-verified backlog (88 names as of r8 start; the
    #    driver samples the first 50, so ~38 roll into round 9).
    #    Oracled entries precede rows-only ones so each sampled slot
    #    yields the strongest possible check. --
    "text_bpe_learn_merges",
    "tpch_q05_local_supplier_volume",
    "similarity_ann_recall_eval",
    "agg_cms_join_size_estimate",
    "agg_entropy",
    "agg_kmv_intersection_estimate",
    "chunk_pack_tokens",
    "curation_dsir_importance",
    "curation_mixture_weights",
    "curation_stratified_exemplars",
    "dedup_containment",
    "dq_join_key_skew",
    "dq_primary_key_uniqueness",
    "dq_referential_integrity",
    "embedding_centroids",
    "embedding_dim_stats",
    "embedding_pca_power_iteration",
    "embedding_quantile_normalize",
    "events_anomaly_iqr",
    "events_cohort_ltv_curve",
    "events_gaps_islands_streaks",
    "events_mad_outliers",
    "events_peak_concurrency",
    "func_crypto_aes",
    "graph_bfs_levels",
    "graph_degree_assortativity",
    "graph_degree_distribution",
    "graph_label_propagation",
    "graph_triangle_count",
    "impute_hotdeck",
    "impute_mean_mode",
    "impute_regression",
    "join_dynamic_partition_pruning",
    "join_geo_grid_distance",
    "multimodal_shard_manifest",
    "orders_cohort_repeat_rate",
    "pairs_negative_sampling",
    "pipeline_dedup_funnel",
    "pipeline_pretraining_mix",
    "sample_balanced_downsample",
    "sample_stratified",
    "sample_train_test_split",
    "sample_weighted_bernoulli",
    "setop_union_by_name_evolution",
    "sink_compact_small_files",
    "sink_dynamic_partition_overwrite",
    "sink_snapshot_diff",
    "sink_zorder_cluster",
    "source_csv_corrupt_records",
    "source_file_metadata",
    "source_json_corrupt_records",
    "source_merge_schema",
    "source_observe_metrics",
    "source_partitioned_events_read",
    "source_python_datasource",
    "source_text_logs",
    "sql_execute_immediate",
    "sql_lateral_column_alias",
    "sql_scalar_udf",
    "stats_ab_cuped_adjustment",
    "stream_ohlc_hourly",
    "stream_python_datasource",
    "stream_trigger_available_now",
    "text_bigram_logprob",
    "text_bm25_topk",
    "text_bpe_regex_tokens",
    "text_char_entropy",
    "text_heaps_law",
    "text_inverted_index",
    "text_langid_confusion",
    "text_ngram_novelty",
    "text_repetition_ratio",
    "text_vocab_coverage",
    "text_zipf_rank",
    "ts_cascaded_rollup",
    "ts_hourly_autocorr_lag24",
    "ts_median_interorder_gap",
    "ts_weekday_hour_profile",
    "udf_apply_in_arrow",
    "udf_arrow_scalar",
    "udf_map_in_arrow",
    "udf_pandas_iterator",
    "udf_sql_registered",
    "window_reset_running_sum",
    "window_rolling_median",
    "dedup_minhash_mllib",
    "multimodal_audio_chunks",
    "similarity_ann_brp_mllib",
)


def all_queries() -> dict[str, Query]:
    """Import every operator module (idempotent) and return the registry,
    reordered so `_VERIFY_FIRST` names come first (see note above)."""
    for mod in _OPERATOR_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # module not built yet; registry stays partial during bring-up
    ordered: dict[str, Query] = {}
    for name in _VERIFY_FIRST:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered
