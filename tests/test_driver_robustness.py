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
    # r13 verdict #2: frozen r{N} artifacts stop tracking the registry
    # after their round closes — mid-round coverage lives in the WIP
    # file, which is the coverage source of truth when present.
    wip = os.path.join(repo, "LOCAL_CORRECTNESS_WIP.json")
    latest = wip if os.path.exists(wip) else max(
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


def test_subset_emit_cannot_clobber_canonical_artifact(tmp_path):
    """r8 verdict item 2: `driver_replica.py --emit` with a query subset
    must never truncate a canonical LOCAL_CORRECTNESS_r{N}.json. Covers
    all four safe_emit branches: scratch names pass through, a full
    key-set writes, a subset MERGES into an existing full artifact, and
    a subset with no mergeable base diverts to `<emit>.subset.json`.
    """
    import json

    from tests.driver_replica import safe_emit

    registry = {"q_a", "q_b", "q_c"}
    rec = {"hash_match": True, "err": None}

    # 1. non-canonical filename: subset writes as-is (X10/scratch sweeps)
    scratch = tmp_path / "X10_sweep.json"
    out = safe_emit(str(scratch), {"q_a": rec}, registry)
    assert out == str(scratch) and set(json.loads(scratch.read_text())) == {"q_a"}

    # 2. canonical + full key-set: writes the canonical file
    canon = tmp_path / "LOCAL_CORRECTNESS_r99.json"
    full = {k: rec for k in registry}
    assert safe_emit(str(canon), full, registry) == str(canon)
    assert set(json.loads(canon.read_text())) == registry

    # 3. canonical + subset over an existing full artifact: MERGES —
    #    the committed file keeps full-registry coverage
    updated = {"q_b": {"hash_match": True, "err": None, "v": 2}}
    assert safe_emit(str(canon), updated, registry) == str(canon)
    after = json.loads(canon.read_text())
    assert set(after) == registry and after["q_b"]["v"] == 2

    # 4. canonical + subset, no mergeable base: diverts to .subset.json
    fresh = tmp_path / "LOCAL_CORRECTNESS_r100.json"
    out = safe_emit(str(fresh), {"q_a": rec}, registry)
    assert out == str(fresh) + ".subset.json"
    assert not fresh.exists()
    assert set(json.loads((tmp_path / "LOCAL_CORRECTNESS_r100.json.subset.json").read_text())) == {"q_a"}
