"""Equivalence tests for the r15 vectorized Lloyd trainer/encoder
(functions/lloyd.py) against the round-11 JVM dataflow it replaced.

The optimization contract is bit-identity: same seeds, same
truncate-toward-zero update, same smallest-cid tie-break — so the
reference here IS the former implementation (broadcast fan-out join +
grouped min_by over struct(dist, cid)), run over inputs that exercise
negatives (residual-style vectors), ties, and empty centroids."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pytest  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from boltzmannclean_spark.functions.exact import sdiv_spark  # noqa: E402
from boltzmannclean_spark.functions.lloyd import (  # noqa: E402
    assign_blocks,
    train_blocks,
)

DIMS = 8
N_BLOCKS = 4
DSUB = DIMS // N_BLOCKS


def _vec(i: int) -> list[int]:
    # Deterministic spread incl. negatives and exact duplicates
    # (ids 7 and 8 share a vector -> distance ties at every block).
    if i == 8:
        i = 7
    return [((i * 37 + d * 11) % 41) - 20 for d in range(DIMS)]


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [(i, _vec(i)) for i in range(40)]
    return spark.createDataFrame(
        rows, "vec_id long, qvec array<long>"
    ).localCheckpoint()


def _reference_train(vecs, seeds, iters):
    """The former JVM formulation, verbatim semantics: per-block
    min_by(cid, struct(dist, cid)) assignment + one-shuffle update with
    truncate-toward-zero division."""
    sub = vecs.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("b"),
                    F.slice("qvec", b * DSUB + 1, DSUB).alias("qsub"),
                )
                for b in range(N_BLOCKS)
            ])
        ).alias("s"),
    ).select("vec_id", F.col("s.b").alias("b"), F.col("s.qsub").alias("qsub"))
    cent = sub.join(F.broadcast(seeds), "vec_id").select(
        F.col("vec_id").alias("cid"), "b", F.col("qsub").alias("cvec")
    )
    dist = None
    for d in range(1, DSUB + 1):
        t = (F.element_at("qsub", d) - F.element_at("cvec", d)) * (
            F.element_at("qsub", d) - F.element_at("cvec", d)
        )
        dist = t if dist is None else dist + t
    for _ in range(iters):
        assigned = (
            sub.join(F.broadcast(cent), "b")
            .select("vec_id", "b", "qsub", "cid", dist.alias("dist"))
            .groupBy("vec_id", "b")
            .agg(
                F.min_by("cid", F.struct("dist", "cid")).alias("cid"),
                F.min_by("qsub", F.struct("dist", "cid")).alias("qsub"),
            )
        )
        sums = assigned.groupBy("b", "cid").agg(
            F.count(F.lit(1)).alias("m"),
            *[
                F.sum(F.element_at("qsub", d)).alias(f"s{d}")
                for d in range(1, DSUB + 1)
            ],
        )
        cent = sums.selectExpr(
            "b",
            "cid",
            "array("
            + ", ".join(sdiv_spark(f"s{d}", "m") for d in range(1, DSUB + 1))
            + ") AS cvec",
        ).localCheckpoint(eager=True)
    return cent


def _reference_assign(vecs, cent):
    sub = vecs.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("b"),
                    F.slice("qvec", b * DSUB + 1, DSUB).alias("qsub"),
                )
                for b in range(N_BLOCKS)
            ])
        ).alias("s"),
    ).select("vec_id", F.col("s.b").alias("b"), F.col("s.qsub").alias("qsub"))
    dist = None
    for d in range(1, DSUB + 1):
        t = (F.element_at("qsub", d) - F.element_at("cvec", d)) * (
            F.element_at("qsub", d) - F.element_at("cvec", d)
        )
        dist = t if dist is None else dist + t
    return (
        sub.join(F.broadcast(cent), "b")
        .select("vec_id", "b", "qsub", "cid", dist.alias("dist"))
        .groupBy("vec_id", "b")
        .agg(F.min_by("cid", F.struct("dist", "cid")).alias("cid"))
    )


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


@pytest.mark.parametrize("iters", [1, 3])
def test_train_blocks_matches_jvm_reference(spark, vecs, iters):
    seeds = vecs.where(F.col("vec_id") < 6).select("vec_id")
    got = train_blocks(
        vecs, seeds, id_col="vec_id", vec_col="qvec",
        dims=DIMS, n_blocks=N_BLOCKS, iters=iters,
    )
    ref = _reference_train(vecs, seeds, iters)
    assert _sorted_rows(got, ["b", "cid", "cvec"]) == _sorted_rows(
        ref, ["b", "cid", "cvec"]
    )


def test_assign_blocks_matches_jvm_reference(spark, vecs):
    seeds = vecs.where(F.col("vec_id") % 5 == 0).select("vec_id")
    cent = train_blocks(
        vecs, seeds, id_col="vec_id", vec_col="qvec",
        dims=DIMS, n_blocks=N_BLOCKS, iters=2,
    )
    got = assign_blocks(
        vecs, cent, id_col="vec_id", vec_col="qvec",
        dims=DIMS, n_blocks=N_BLOCKS,
    )
    ref = _reference_assign(vecs, cent)
    assert _sorted_rows(got, ["vec_id", "b", "cid"]) == _sorted_rows(
        ref, ["vec_id", "b", "cid"]
    )
    # Duplicate-vector rows tie on every block; both sides must break
    # to the smallest cid, so 7 and 8 get identical codes.
    codes = {
        (r["vec_id"], r["b"]): r["cid"]
        for r in got.where(F.col("vec_id").isin(7, 8)).collect()
    }
    for b in range(N_BLOCKS):
        assert codes[(7, b)] == codes[(8, b)]


def test_train_blocks_single_block_kmeans(spark, vecs):
    """n_blocks=1 == plain k-means (the IVF coarse-quantizer shape)."""
    seeds = vecs.where(F.col("vec_id") % 10 == 0).select("vec_id")
    got = train_blocks(
        vecs, seeds, id_col="vec_id", vec_col="qvec",
        dims=DIMS, n_blocks=1, iters=2,
    )
    assert [r["b"] for r in got.collect()] == [0] * got.count()
    # partition-invariance: 1 vs 8 input partitions, identical codebook
    got8 = train_blocks(
        vecs.repartition(8), seeds, id_col="vec_id", vec_col="qvec",
        dims=DIMS, n_blocks=1, iters=2,
    )
    assert _sorted_rows(got, ["b", "cid", "cvec"]) == _sorted_rows(
        got8, ["b", "cid", "cvec"]
    )
