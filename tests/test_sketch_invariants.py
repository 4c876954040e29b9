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


def _fq_reference_quantiles(rows, q):
    """Exact trailing-6h quantile per hour: smallest value x in the
    window multiset with (#values <= x) * 100 >= q * total — the value
    the sketch's cumulative pick brackets."""
    import bisect
    from collections import defaultdict

    by_hr = defaultdict(list)
    for hr, v in rows:
        by_hr[hr].append(v)
    out = {}
    for hr in sorted(by_hr):
        window = sorted(
            v
            for h in range(hr - 5, hr + 1)
            for v in by_hr.get(h, ())
        )
        total = len(window)
        # smallest index i with (i+1)*100 >= q*total
        i = 0
        while (i + 1) * 100 < q * total:
            i += 1
        out[hr] = (window[i], total)
    return out


def test_float_sketch_accuracy_bound(spark):
    """The IEEE-grid sketch's estimates bracket the exact trailing
    quantile within one sub-bin of RELATIVE error: x <= est <= x*65/64
    for positive x (mirrored for negative) — the bound the docstring
    claims, measured against exact order statistics."""
    df = all_queries()["window_mergeable_quantiles_float"].spark_fn(
        spark, SF_DIR
    )
    got = {r.hr: r for r in df.collect()}
    from boltzmannclean_spark.operators.windows import MICROS_PER_HOUR

    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    from boltzmannclean_spark.sources.catalog import normalize_events_ts

    rows = [
        (r.hr, r.value)
        for r in normalize_events_ts(ev)
        .select(
            F.expr(f"unix_micros(ts) div {MICROS_PER_HOUR}").alias("hr"),
            "value",
        )
        .collect()
    ]
    assert got, "no output hours"
    for q, field in ((50, "p50_est"), (90, "p90_est"), (99, "p99_est")):
        ref = _fq_reference_quantiles(rows, q)
        assert set(ref) == set(got)
        for hr, (x, total) in ref.items():
            est = getattr(got[hr], field)
            assert got[hr].n_window == total
            if abs(x) < 2.0**-62:
                assert est == 0.0
                continue
            # Absolute-scaled lower bound (r14 ADVICE): for x < 0,
            # x * (1 - 1e-12) > x, so an exact-hit estimate would fail.
            assert est >= x - abs(x) * 1e-12, (hr, q, x, est)
            assert abs(est) <= abs(x) * 65.0 / 64.0 * (1 + 1e-12), (
                hr, q, x, est,
            )


def test_float_sketch_merge_law(spark):
    """Mergeability is literal integer addition: binning two disjoint
    halves of the corpus separately and adding the (hr, ord) counts
    equals binning the whole corpus — the property that makes the
    per-hour histogram a SKETCH (partial aggregates combine across
    executors/micro-batches with no error)."""
    from boltzmannclean_spark.operators.windows import (
        MICROS_PER_HOUR,
        _fq_ord,
    )
    from boltzmannclean_spark.sources.catalog import normalize_events_ts

    from pyspark.sql import functions as F

    ev = normalize_events_ts(
        spark.read.parquet(f"{SF_DIR}/events.parquet")
    ).select(
        "event_id",
        F.expr(f"unix_micros(ts) div {MICROS_PER_HOUR}").alias("hr"),
        F.expr(_fq_ord("value", duck=False)).alias("ord"),
    )

    def counts(df):
        return {
            (r.hr, r.ord): r.cnt
            for r in df.groupBy("hr", "ord")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }

    whole = counts(ev)
    a = counts(ev.where(F.col("event_id") % 2 == 0))
    b = counts(ev.where(F.col("event_id") % 2 == 1))
    merged = dict(a)
    for k, v in b.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == whole


def test_float_sketch_bin_engine_parity_on_adversarial_doubles(spark):
    """The exponent-repair construction promises Spark and DuckDB bin
    every double IDENTICALLY even where their libm log2 differs. Probe
    the promise exactly where it could break: exact powers of two,
    values one ulp either side of them, sub-bin boundaries, the zero/
    overflow clamps, negatives, and a deterministic pseudo-random
    spread over the whole clamp range."""
    import math
    import struct

    import duckdb
    import pandas as pd

    from boltzmannclean_spark.operators.windows import _fq_ord

    def ulp_away(x, direction):
        return math.nextafter(x, direction)

    vals = [0.0, -0.0, 2.0**-62, -(2.0**-62), 2.0**-63, 2.0**63,
            -(2.0**63), 2.0**64, 1e308, -1e308, 5e-20, -5e-20]
    for k in range(-62, 63, 7):
        p = 2.0**k
        vals += [p, -p, ulp_away(p, 0.0), ulp_away(p, math.inf),
                 -ulp_away(p, 0.0), -ulp_away(p, math.inf)]
        # sub-bin boundaries m/64 * 2^k and one ulp around them
        for m in (65, 96, 127):
            b = m / 64.0 * p
            vals += [b, ulp_away(b, 0.0), ulp_away(b, math.inf), -b]
    # deterministic pseudo-random doubles spanning the range
    seed = 0x9E3779B97F4A7C15
    for i in range(400):
        seed = (seed * 6364136223846793005 + 1442695040888963407) % 2**64
        # map to a finite double via bit pattern, clamp exponent range
        bits = seed & 0x7FFFFFFFFFFFFFFF
        x = struct.unpack("<d", struct.pack("<Q", bits))[0]
        if not math.isfinite(x) or x == 0.0:
            continue
        # fold into +-[1e-20, 1e19] so most values are in-range
        x = math.copysign(abs(x) % 1e19 + 1e-20, -x if i % 3 else x)
        vals.append(x)

    pdf = pd.DataFrame({"v": vals})
    sdf = spark.createDataFrame(pdf)
    got_spark = [
        r.o for r in sdf.selectExpr(
            f"{_fq_ord('v', duck=False)} AS o"
        ).collect()
    ]
    con = duckdb.connect()
    con.register("t", pdf)
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {_fq_ord('v', duck=True)} AS o FROM t"
        ).fetchall()
    ]
    assert got_spark == got_duck
    # ords must be monotone in value: sort pairs and check
    pairs = sorted(zip(vals, got_spark))
    for (v1, o1), (v2, o2) in zip(pairs, pairs[1:]):
        assert o1 <= o2, (v1, o1, v2, o2)


def test_sample_exact_split_sizes_are_exact(spark):
    """sample_exact_split's whole point vs the hash-bucket split:
    split sizes are EXACTLY floor(0.8N)/floor(0.9N)-floor(0.8N)/rest,
    zero binomial noise, and the three splits partition the corpus."""
    rows = {
        r.split: r
        for r in all_queries()["sample_exact_split"]
        .spark_fn(spark, SF_DIR)
        .collect()
    }
    n = sum(r.n_docs for r in rows.values())
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert n == n_docs
    assert rows["train"].n_docs == (80 * n) // 100
    assert rows["val"].n_docs == (90 * n) // 100 - (80 * n) // 100
    assert rows["test"].n_docs == n - (90 * n) // 100
    # membership fields are consistent: ids partition, so the split
    # sums add to the corpus sum
    total_sum = sum(r.sum_doc_id for r in rows.values())
    from pyspark.sql import functions as F

    corpus_sum = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .agg(F.sum("doc_id"))
        .collect()[0][0]
    )
    assert total_sum == corpus_sum
