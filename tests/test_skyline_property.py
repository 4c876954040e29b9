"""Property test for the segmented prefix-max skyline kernel: on random
(x, y) datasets — with deliberate duplicate keys and clustered values —
the kernel must return exactly the brute-force non-dominated set under
(minimize x, maximize y)."""

from __future__ import annotations

import random

from boltzmannclean_spark.operators.relational import skyline_frontier


def _brute_force(rows):
    def dominated(a):
        return any(
            b[1] <= a[1]
            and b[2] >= a[2]
            and (b[1] < a[1] or b[2] > a[2])
            for b in rows
        )

    return sorted(r for r in rows if not dominated(r))


def test_skyline_matches_brute_force(spark):
    rng = random.Random(20260813)
    for trial in range(5):
        n = rng.choice([1, 7, 60, 300])
        # Small value domains force duplicate x keys, duplicate (x, y)
        # pairs, and bucket-boundary values — the tie cases a naive
        # running-max formulation gets wrong.
        rows = [
            (
                i,
                float(rng.randrange(0, 500, 25)),
                rng.randrange(-5, 20),
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "id long, x double, y long")
        got = sorted(
            (r.id, r.x, r.y)
            for r in skyline_frontier(df, "x", "y", bucket_width=100.0).collect()
        )
        assert got == _brute_force(rows), f"trial {trial} (n={n})"


def test_bloom_semireduction_no_false_negatives(spark, sf_dir):
    """The Bloom pre-filter may pass extra rows (killed by the real
    join) but must NEVER drop a true match — the result must equal the
    plain join byte-for-byte. (The oracle already asserts this against
    DuckDB; this is the same property checked Spark-vs-Spark so a probe/
    build hash mismatch can't hide behind an oracle quirk.)"""
    from pyspark.sql import functions as F

    from boltzmannclean_spark.operators.joins import join_bloom_semireduction
    from boltzmannclean_spark.functions.exact import dec
    from boltzmannclean_spark.sources.catalog import load_table

    got = {
        (r.order_month, r.n_lineitems, r.revenue)
        for r in join_bloom_semireduction(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    plain = (
        li.join(
            orders.where(F.col("o_orderpriority") == "1-URGENT"),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount", 4, 2)))
            .cast("double")
            .alias("revenue"),
        )
    )
    want = {(r.order_month, r.n_lineitems, r.revenue) for r in plain.collect()}
    assert got == want
