"""Error-bound checks for the approximate sketch aggregates — these are
rows-only in the oracle gate (sketch internals are engine-specific), so
the accuracy claim is asserted here against exact answers instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from boltzmannclean_spark.operators.aggregates import agg_approx_sketches
from boltzmannclean_spark.sources.catalog import load_table


def test_approx_sketches_within_bounds(spark, oracle_sf_dir):
    approx = {
        r.l_returnflag: r for r in agg_approx_sketches(spark, oracle_sf_dir).collect()
    }
    li = load_table(spark, oracle_sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.median("l_extendedprice").alias("median_price"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .collect()
    }
    assert set(approx) == set(exact) and approx
    for flag, a in approx.items():
        e = exact[flag]
        # HLL++ at default rsd=0.05: allow 3 sigma.
        assert abs(a.approx_parts - e.n_parts) <= 0.15 * e.n_parts, flag
        # percentile_approx(0.5) must land inside the value range and
        # within 10% of the exact median for this distribution.
        assert e.min_price <= a.approx_median_price <= e.max_price, flag
        assert abs(float(a.approx_median_price) - float(e.median_price)) <= 0.10 * float(
            e.median_price
        ), flag


def test_hll_rollup_union_equals_direct(spark, sf_dir):
    """HLL register state is an order-independent max, so the union of
    per-day sketches must estimate EXACTLY what the directly-built
    sketch estimates, and both must sit within the family's error bound
    of the exact distinct count."""
    from boltzmannclean_spark.plans.registry import all_queries

    rows = (
        all_queries()["agg_hll_mergeable_rollup"].spark_fn(spark, sf_dir).collect()
    )
    assert rows
    for r in rows:
        assert r.est_union == r.est_direct, r
        assert abs(r.est_union - r.exact_distinct) <= max(
            2, 0.05 * r.exact_distinct
        ), r
