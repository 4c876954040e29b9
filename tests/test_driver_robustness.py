"""Guards for the driver's never-sampled tail (round-4 verdict #3).

The driver samples ≤50 of the registered queries per round, so most
entries are only ever exercised by the local parity gate. Local green
must IMPLY driver green, which needs three properties beyond value
parity — each a past or potential local-vs-driver drift source:

1. ATOMIC output cells — the driver canonicalizes with a pandas
   sort_values over every column; list/map/struct cells raise there.
   (Gated per-query in tests/test_oracle_parity.py's
   _assert_atomic_schema, over the full registry.)
2. PATH/SF-FREE output — any cell embedding the input path (e.g. a
   file-manifest query leaking `/root/testdata/sf0.01/...`) would hash
   differently when the driver runs from its own location or SF.
   (Gated per-query inside oracle_utils.assert_path_free, called from
   BOTH the oracle and rows-only parity paths — it rides the collects
   the parity suite already pays for, so the full registry is covered
   without a second sweep.)
3. DETERMINISM for rows-only entries — oracle-exact queries prove
   determinism by matching DuckDB; rows-only ones (sketches, MLlib
   RNG, stochastic imputers) must at least produce a stable row count
   and canonicalizable output across two runs in one session. That is
   THIS file's job (10 queries × 2 runs — cheap).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as m
from tests.oracle_utils import driver_sort_canon

QUERIES = m.queries()
ROWS_ONLY = sorted(set(QUERIES) - set(m.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_output_is_stable_and_atomic(spark, sf_dir, name):
    a = QUERIES[name](spark, sf_dir).toPandas()
    b = QUERIES[name](spark, sf_dir).toPandas()
    driver_sort_canon(a, name=name)  # raises on non-atomic cells
    assert len(a) == len(b), (
        f"{name}: row count unstable across runs ({len(a)} vs {len(b)})"
    )
    assert sorted(a.columns) == sorted(b.columns)


def test_local_correctness_artifact_covers_full_registry():
    """r6 verdict item 2: the committed full-registry artifact
    (LOCAL_CORRECTNESS_r{N}.json, emitted by tests/driver_replica.py
    --emit) must cover EXACTLY the registered queries — the newest
    artifact's key set == queries(). Catches the staleness class where
    a query lands after the round's artifact refresh (r6 shipped
    316/317). Regenerate with:
        python tests/driver_replica.py --emit LOCAL_CORRECTNESS_r{N}.json
    """
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = glob.glob(os.path.join(repo, "LOCAL_CORRECTNESS_r*.json"))
    assert arts, "no LOCAL_CORRECTNESS_r*.json artifact committed"
    latest = max(
        arts,
        key=lambda p: int(re.search(r"_r(\d+)", os.path.basename(p)).group(1)),
    )
    with open(latest) as fh:
        art = json.load(fh)
    missing = sorted(set(QUERIES) - set(art))
    stale = sorted(set(art) - set(QUERIES))
    assert not missing and not stale, (
        f"{os.path.basename(latest)} drifted from the registry: "
        f"missing={missing[:10]} stale={stale[:10]} — regenerate via "
        f"tests/driver_replica.py --emit"
    )
