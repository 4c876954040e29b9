"""Equivalence tests for the r15 vectorized combination counter
(functions/combos.py) against the nested-HOF enumeration it replaced in
``apriori_triples`` — same packed keys, same counts, candidate filter
identical to the former broadcast join."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pytest  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from boltzmannclean_spark.functions.combos import (  # noqa: E402
    packed_combo_counts,
)

PACK = 1 << 21


@pytest.fixture(scope="module")
def items(spark):
    rows = [
        ([0, 1, 2, 3, 4],),
        ([1, 2, 3],),
        ([0, 2, 4, 5, 6, 7],),
        ([],),            # empty basket
        ([5],),           # below r
        ([0, 1, 2, 3, 4, 5, 6, 7],),
        ([2, 3],),
    ]
    return spark.createDataFrame(rows, "items array<long>").localCheckpoint()


def _hof_counts(items, r):
    if r == 2:
        expr = F.expr(
            "flatten(transform(items, (x, i) ->"
            " transform(slice(items, i + 2, size(items)),"
            f" y -> x * {PACK}L + y)))"
        )
    else:
        expr = F.expr(
            "flatten(flatten(transform(items, (x, i) ->"
            " transform(slice(items, i + 2, size(items)), (y, j) ->"
            " transform(slice(items, i + j + 3, size(items)),"
            f" z -> (x * {PACK}L + y) * {PACK}L + z)))))"
        )
    return {
        r["tk"]: r["cnt"]
        for r in items.select(F.explode(expr).alias("tk"))
        .groupBy("tk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }


@pytest.mark.parametrize("r", [2, 3])
def test_matches_hof_enumeration(spark, items, r):
    got = {
        row["tk"]: row["cnt"]
        for row in packed_combo_counts(items, r=r, pack=PACK)
        .groupBy("tk")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert got == _hof_counts(items, r)


def test_candidate_filter_matches_join(spark, items):
    ref = _hof_counts(items, 3)
    cand = sorted(ref)[::2]  # keep every other observed triple
    got = {
        row["tk"]: row["cnt"]
        for row in packed_combo_counts(
            items, r=3, pack=PACK, candidates=np.array(cand, dtype=np.int64)
        )
        .groupBy("tk")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert got == {k: v for k, v in ref.items() if k in set(cand)}


def test_partition_invariance(spark, items):
    one = packed_combo_counts(items.coalesce(1), r=3, pack=PACK)
    many = packed_combo_counts(items.repartition(7), r=3, pack=PACK)
    agg = lambda df: sorted(  # noqa: E731
        (r["tk"], r["cnt"])
        for r in df.groupBy("tk").agg(F.sum("cnt").alias("cnt")).collect()
    )
    assert agg(one) == agg(many)


def test_empty_candidates(spark, items):
    out = (
        packed_combo_counts(
            items, r=3, pack=PACK, candidates=np.array([], dtype=np.int64)
        )
        .groupBy("tk")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    assert out == []


def _itertools_keys(basket, r, pack):
    from itertools import combinations

    out = []
    for tup in combinations(basket, r):
        key = tup[0]
        for v in tup[1:]:
            key = key * pack + v
        out.append(key)
    return out


def test_giant_basket_fallback_row_major(monkeypatch):
    """r16 ADVICE (medium): with the template cap shrunk so the
    fallback recurses into ITSELF, the keys must still pair each row's
    head with its own tail combos (row-major), matching itertools."""
    import boltzmannclean_spark.functions.combos as combos

    monkeypatch.setattr(combos, "_TEMPLATE_CAP", 3)
    rng = np.random.default_rng(7)
    A = rng.integers(0, 50, size=(4, 6)).astype(np.int64)
    A.sort(axis=1)
    got = sorted(combos._keys_for_group(A, 3, PACK).tolist())
    want = sorted(
        k for row in A for k in _itertools_keys(row.tolist(), 3, PACK)
    )
    assert got == want


@pytest.mark.parametrize("r", [2, 3])
def test_fallback_matches_template(monkeypatch, r):
    """The fallback path (cap=1 forces it at every level) and the
    template path count identically on multi-row stacks."""
    import boltzmannclean_spark.functions.combos as combos

    rng = np.random.default_rng(11)
    A = rng.integers(0, 100, size=(5, 7)).astype(np.int64)
    A.sort(axis=1)
    want = combos._keys_for_group(A, r, PACK)
    monkeypatch.setattr(combos, "_TEMPLATE_CAP", 1)
    got = combos._keys_for_group(A, r, PACK)
    assert sorted(got.tolist()) == sorted(want.tolist())


def test_keys_budget_chunking(monkeypatch):
    """Row-chunking under a tiny _KEYS_BUDGET (r16 skew guardrail)
    produces the same partial counts, with and without candidates."""
    import pyarrow as pa

    import boltzmannclean_spark.functions.combos as combos

    rng = np.random.default_rng(3)
    baskets = [
        sorted(rng.choice(200, size=n, replace=False).tolist())
        for n in rng.integers(0, 12, size=40)
    ]
    col = pa.array(baskets, pa.list_(pa.int64()))
    ref_u, ref_c = combos._count_batch(col, 3, PACK, None)
    monkeypatch.setattr(combos, "_KEYS_BUDGET", 5)
    got_u, got_c = combos._count_batch(col, 3, PACK, None)
    assert got_u.tolist() == ref_u.tolist()
    assert got_c.tolist() == ref_c.tolist()
    cand = np.sort(ref_u[::3])
    got_u2, got_c2 = combos._count_batch(col, 3, PACK, cand)
    keep = np.isin(ref_u, cand)
    assert got_u2.tolist() == ref_u[keep].tolist()
    assert got_c2.tolist() == ref_c[keep].tolist()
