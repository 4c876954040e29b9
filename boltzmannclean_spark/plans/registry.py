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
    # -- round-5 rotation: plans changed this round (re-verify) --
    "dedup_embedding_cosine",
    "similarity_ann_pq_adc",
    "similarity_ann_ivfpq",
    "graph_pagerank_bipartite",
    # -- new cross-engine surface added late in round 5: these exercise
    #    comparator paths no sampled query has hit (JVM levenshtein vs
    #    DuckDB's, percentile_disc over a 32-row domain, native-XML
    #    roundtrip, a float z statistic, a TPC-H ratio query) — sample
    #    them first so any driver-canon drift surfaces now, not in r8 --
    "dedup_blocked_editdist",
    "sample_poisson_bootstrap",
    "stats_ab_test_proportions",
    "ts_seasonal_naive_eval",
    "source_xml_roundtrip",
    "tpch_q08_market_share",
    # -- never harness-verified (104 remained after r1-r4 sampled 137 of
    #    241), listed in registry order. With the 10 changed/new-surface
    #    slots above, entries past slot 50 (the tail of this list and
    #    every other round-5 addition) roll into the round-6 rotation. --
    "relational_skyline",
    "sample_bottomk_mergeable",
    "sample_group_kfold",
    "join_bloom_semireduction",
    "join_bucketed_colocated",
    "agg_corr_matrix",
    "agg_countmin_heavy_hitters",
    "agg_hll_mergeable_rollup",
    "agg_mode_deterministic",
    "agg_quantile_mergeable",
    "agg_histogram_equidepth",
    "window_ema_decay",
    "ts_time_weighted_avg",
    "ts_ohlc_bars",
    "ts_linear_interpolate",
    "events_retention_cohort",
    "scd2_order_status_history",
    "window_session_batch",
    "events_markov_transitions",
    "events_rfm_segmentation",
    "orders_abc_pareto",
    "intervals_merge_overlapping",
    "events_rolling_wau",
    "events_attribution_linear",
    "events_cumulative_reach",
    "events_path_analysis",
    "events_time_to_convert",
    "events_dau_mau_stickiness",
    "events_funnel_ordered",
    "orders_rank_shift",
    "events_bounce_rate",
    "events_sessionize_skew",
    "events_pattern_vshape",
    "events_cusum_alarm",
    "join_pit_scd2",
    "sessions_overlap_pairs",
    "events_sequence_trigrams",
    "agg_profile_columns",
    "events_zscore_outliers",
    "stats_chi_square",
    "agg_entropy",
    "events_anomaly_iqr",
    "events_mad_outliers",
    "dq_referential_integrity",
    "dq_constraint_violations",
    "dq_join_key_skew",
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
