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


def all_queries() -> dict[str, Query]:
    """Import every operator module (idempotent) and return the registry."""
    for mod in _OPERATOR_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # module not built yet; registry stays partial during bring-up
    return REGISTRY
