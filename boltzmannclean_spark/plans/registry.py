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
    # -- round-2 red, fixed this round (array output rendered as CSV) --
    "multimodal_features",
    # -- plan or oracle changed this round: need fresh harness rows --
    "similarity_cosine_topk",
    "similarity_ann_lsh",
    "similarity_ann_ivf",
    "similarity_ann_ivf_nprobe",
    "embedding_nearest_centroid",
    "impute_knn_embedding",
    "func_regexp",
    "subquery_scalar_agg",
    "text_decontaminate",
    "text_char_ngram_langid",
    # -- never harness-verified (r1∪r2 sampled 92 of 187); first 39 of
    #    the remaining 95 in registry order — the other 50 are round 4's
    #    window, exactly filling it --
    "dedup_connected_components",
    "window_time_range",
    "events_funnel",
    "agg_histogram_fixed",
    "func_bitwise",
    "func_variant",
    "subquery_lateral",
    "asof_tolerance",
    "func_try_safe",
    "sink_upsert_merge",
    "pipeline_clean_corpus",
    "func_map_higher_order",
    "stream_foreach_batch_sink",
    "func_generators",
    "subquery_recursive_cte",
    "sql_parameterized",
    "sql_pipe_syntax",
    "relational_transpose",
    "join_null_safe",
    "join_existence_in",
    "subquery_exists",
    "join_volume_shipping",
    "join_basket_affinity",
    "agg_boolean_countif",
    "ml_linreg_sufficient_stats",
    "agg_percentile_disc",
    "agg_listagg",
    "agg_weighted_avg",
    "window_ignore_nulls",
    "window_value_range",
    "window_running_drawdown",
    "setop_symmetric_difference",
    "func_encoding",
    "func_collation",
    "func_datetime_make",
    "func_url_parse",
    "asof_forward_next_click",
    "asof_nearest_click",
    "events_sessionize",
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
