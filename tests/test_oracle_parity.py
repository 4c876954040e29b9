"""Every registered query with an oracle must match DuckDB at sf0.01.

This is a local replica of the driver's t2 correctness gate — it runs
the full registry so a new operator is covered the moment it registers.
"""

from __future__ import annotations

import pytest

from boltzmannclean_spark.plans.registry import all_queries

from pyspark.sql import types as T

from .oracle_utils import (
    assert_matches_oracle,
    assert_path_free,
    driver_sort_canon,
)

QUERIES = all_queries()
ORACLE_CASES = sorted(name for name, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY_CASES = sorted(name for name, q in QUERIES.items() if q.oracle is None)

_NON_ATOMIC = (T.ArrayType, T.MapType, T.StructType)


def _assert_atomic_schema(df, name):
    """The driver canonicalizes EVERY query's output (oracle or not) with
    a pandas sort over all columns, which dies on array/map/struct cells.
    Fleet-wide gate: registered outputs must be atomic-only."""
    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, _NON_ATOMIC)]
    assert not bad, (
        f"[{name}] non-atomic output columns {bad} would crash the driver's "
        f"canonicalizer — render them as strings (to_json/concat_ws)"
    )


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, oracle_sf_dir, name):
    q = QUERIES[name]
    df = q.spark_fn(spark, oracle_sf_dir)
    _assert_atomic_schema(df, name)
    assert_matches_oracle(df, q.oracle, oracle_sf_dir, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_queries_run(spark, oracle_sf_dir, name):
    q = QUERIES[name]
    df = q.spark_fn(spark, oracle_sf_dir)
    _assert_atomic_schema(df, name)
    # Replicate the driver's rows-only path: it still canonicalizes the
    # Spark result before counting rows, so the sort must not throw.
    pdf = df.toPandas()
    driver_sort_canon(pdf, name=name)
    assert_path_free(pdf, name, oracle_sf_dir)
    assert len(pdf) >= 0
    assert len(df.schema.fields) > 0
