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
    # -- round-6 rotation: new or plan-changed this round (verify first) --
    "sink_ann_index_build",
    "similarity_ann_pq_adc_prebuilt",
    "similarity_ann_ivfpq_prebuilt",
    "similarity_ann_delta_assign",
    "ts_sla_downtime",
    "dedup_substring_run",
    "multimodal_phash_dedup",
    "sql_identifier_clause",
    "udtf_analyze_dynamic",
    "dedup_semantic_semdedup",
    "impute_rbm_pipeline_persist",
    "ts_downsample_minmax",
    "dq_benford_distribution",
    "source_binary_files",
    "func_convert_timezone",
    "graph_bipartite_projection",
    "stream_cdc_merge_snapshot",
    "impute_mice_chained",
    "stats_ab_did_uplift",
    "dq_schema_drift_report",
    "events_survival_risk_table",
    "graph_kcore_peel",
    "dedup_embedding_cosine_recall_demo",
    "dq_constraint_violations",
    "tpch_q02_min_cost_supplier",
    "impute_rbm_customer",
    # -- never harness-verified backlog (119 remained after r1-r5; the
    #    driver samples the first 50, so this block prioritizes the
    #    whole TPC-H suite, then dedup and text; the rest of the
    #    backlog rolls into round 7's rotation) --
    "tpch_q04_order_priority",
    "tpch_q06_revenue_forecast",
    "tpch_q09_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_late_shipment_priority",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_part_supplier_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_potential_promotion",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_global_sales_opportunity",
    "dedup_keep_best",
    "dedup_levenshtein_verify",
    "dedup_url_canonical",
    "dedup_segments_exact",
    "dedup_minhash_recall_eval",
    "dedup_normalized_exact",
    "dedup_prefix_filter_jaccard",
    "dedup_cluster_size_stats",
    "dedup_minhash_threshold_curve",
    "text_vocab_coverage",
    "text_bigram_logprob",
    "text_heaps_law",
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
