"""Guards for the driver's never-sampled tail (round-4 verdict #3).

The driver samples ≤50 of the registered queries per round, so most
entries are only ever exercised by the local parity gate. Local green
must IMPLY driver green, which needs three properties beyond value
parity — each a past or potential local-vs-driver drift source:

1. ATOMIC output cells — the driver canonicalizes with a pandas
   sort_values over every column; list/map/struct cells raise there.
   (Gated per-query inside assert_matches_oracle/driver_sort_canon;
   re-asserted here for rows-only entries which skip the oracle path.)
2. PATH/SF-FREE output — any cell or column embedding the input path
   (e.g. a file-manifest query leaking `/root/testdata/sf0.01/...`)
   would hash differently when the driver runs from its own location
   or at another SF. Outputs must be relativized.
3. DETERMINISM for rows-only entries — oracle-exact queries prove
   determinism by matching DuckDB; rows-only ones (sketches, MLlib
   RNG, stochastic imputers) must at least produce a stable row count
   and canonicalizable output across two runs in one session.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as m
from tests.oracle_utils import driver_sort_canon

QUERIES = m.queries()
ORACLES = m.oracle_sql()
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


def _string_cells(pdf):
    for col in pdf.columns:
        if pdf[col].dtype == object:
            for v in pdf[col].head(200):
                if isinstance(v, str):
                    yield col, v


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_output_is_path_and_sf_free(spark, sf_dir, name):
    pdf = QUERIES[name](spark, sf_dir).limit(500).toPandas()
    for col, v in _string_cells(pdf):
        assert sf_dir not in v, (
            f"{name}.{col} embeds the input dir ({v!r}): the driver runs "
            "from a different path/SF and would hash-mismatch"
        )
        assert "/root/testdata" not in v, (
            f"{name}.{col} embeds an absolute testdata path ({v!r})"
        )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_output_is_stable_and_atomic(spark, sf_dir, name):
    a = QUERIES[name](spark, sf_dir).toPandas()
    b = QUERIES[name](spark, sf_dir).toPandas()
    driver_sort_canon(a, name=name)  # raises on non-atomic cells
    assert len(a) == len(b), (
        f"{name}: row count unstable across runs ({len(a)} vs {len(b)})"
    )
    assert sorted(a.columns) == sorted(b.columns)
