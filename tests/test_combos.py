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
