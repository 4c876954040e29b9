"""Statistical-operator invariants beyond value parity.

Parity proves Spark == DuckDB; these assert the STATISTICS themselves
behave — a deterministic-but-wrong threshold table or estimator formula
would pass parity (both engines run the same mistake) yet fail here.
"""

from __future__ import annotations

from boltzmannclean_spark.plans.registry import all_queries

SF_DIR = "/root/testdata/sf0.01"


def test_poisson_bootstrap_ci_brackets_point(spark):
    row = (
        all_queries()["sample_poisson_bootstrap"]
        .spark_fn(spark, SF_DIR)
        .collect()[0]
    )
    assert row.boot_p05_cents <= row.boot_p50_cents <= row.boot_p95_cents
    # Poisson(1) weights have mean 1, so replicate totals center on the
    # point estimate; the 90% CI must bracket it on this fixed corpus.
    assert row.boot_p05_cents <= row.point_total_cents <= row.boot_p95_cents
    # CI width should be a few percent of the total, not degenerate-0
    # (all weights accidentally equal) nor huge (thresholds misscaled).
    width = row.boot_p95_cents - row.boot_p05_cents
    assert 0 < width < 0.2 * row.point_total_cents


def test_kmv_estimates_near_exact(spark):
    row = (
        all_queries()["agg_kmv_intersection_estimate"]
        .spark_fn(spark, SF_DIR)
        .collect()[0]
    )
    # k=32 gives ~1/sqrt(k) ≈ 18% relative error; allow 3x headroom.
    for est, exact in ((row.est_a, row.n_a), (row.est_b, row.n_b)):
        assert abs(est - exact) / exact < 0.55, (est, exact)
    # Inclusion-exclusion compounds three estimates — looser bound, but
    # it must be positive and the right order of magnitude.
    assert 0 < row.est_inter < 3 * row.n_inter


def test_ab_test_z_matches_scipy_free_formula(spark):
    row = (
        all_queries()["stats_ab_test_proportions"]
        .spark_fn(spark, SF_DIR)
        .collect()[0]
    )
    import math

    p0, p1 = row.x0 / row.n0, row.x1 / row.n1
    pp = (row.x0 + row.x1) / (row.n0 + row.n1)
    se = math.sqrt(pp * (1 - pp) * (1 / row.n0 + 1 / row.n1))
    assert abs(row.z_score - (p1 - p0) / se) < 1e-12
    assert 0 < p0 < 1 and 0 < p1 < 1  # fixture keeps the test non-degenerate
