"""Regression pin for the Cramér's V DECIMAL(38,0) accumulators
(r12 ADVICE, fixed at profiling.py: e_den = row·col·n and d = n·o −
row·col formed in DECIMAL(38,0), string-hopped to double).

The hazard is size-gated: e_den is bounded by n³, which exceeds 2^63
at n ≈ 2.1M events — invisible at every fixture scale (sf0.1 has 60k
events), silently wrapping in non-ANSI Spark had the sums stayed
BIGINT. This test runs the REGISTERED op and its DuckDB oracle twin
on a synthetic 4M-event table whose marginals push e_den to ~1.6e19
(> 2^63), asserting bit-identical results and a sane V."""

from __future__ import annotations

import os

from boltzmannclean_spark.plans.registry import all_queries
from boltzmannclean_spark.sources.catalog import TABLES

from .oracle_utils import assert_matches_oracle

N_EVENTS = 4_000_000  # 2x2 table -> e_den ~ (n/2)^2 * n = 1.6e19 > 2^63


def test_cramers_v_decimal_accumulators_past_bigint(spark, tmp_path):
    q = all_queries()["stats_cramers_v"]
    sf_dir = tmp_path / "big_events"
    sf_dir.mkdir()
    # run_oracle registers views over every fixture table; only events
    # matters here — link the rest from the smallest fixture.
    for t in TABLES:
        if t != "events":
            os.symlink(
                f"/root/testdata/sf0.001/{t}.parquet",
                str(sf_dir / f"{t}.parquet"),
            )
    (
        spark.range(N_EVENTS)
        .selectExpr(
            "id AS event_id",
            "timestamp_micros(CAST(1700000000000000 + id AS BIGINT)) AS ts",
            "id % 1000 AS user_id",
            # 2 event types x 2 k-buckets (k 0 -> kb 0, k 30 -> kb 1),
            # deliberately associated so V is strictly inside (0, 1).
            "CASE WHEN id % 7 < 4 THEN 'view' ELSE 'click' END AS event_type",
            "CAST(id % 100 AS DOUBLE) / 4 AS value",
            "CASE WHEN (id * 13) % 11 < 6 OR id % 7 < 2"
            " THEN '{\"k\": 0}' ELSE '{\"k\": 30}' END AS props",
        )
        .coalesce(4)
        .write.parquet(str(sf_dir / "events.parquet"))
    )
    df = q.spark_fn(spark, str(sf_dir))
    row = df.collect()[0]
    # e_den really is past the BIGINT edge on this table (the point).
    n = N_EVENTS
    assert (n // 2) * (n // 2) * n > 2**63
    assert 0.0 < row.cramers_v < 1.0
    assert_matches_oracle(df, q.oracle, str(sf_dir), "stats_cramers_v")
