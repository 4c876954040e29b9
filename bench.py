"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Methodology (stated explicitly so round-over-round numbers compare
like-for-like): plan shapes are warmed once at sf0.001 (whole-stage
codegen compilation, ~3.4s, is a one-time JVM cost, not engine
throughput), then each query runs twice at the target SF. "value" is
the best-of-2 total over ALL headline queries; "core9_total" is the
best-of-2 total over the original round-1 nine (the cross-round
comparable); "first_run_total" is the sum of FIRST samples — the
conservative number including any residual first-touch cost, reported
so a methodology change can never masquerade as an engine win.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from boltzmannclean_spark.plans.registry import all_queries
from boltzmannclean_spark.session import get_spark

# The original round-1 headline set: totals over these nine are directly
# comparable across every round's BENCH_r{N}.json.
CORE9 = [
    "pricing_summary",
    "project_filter",
    "join_revenue_by_nation",
    "join_theta_self",
    "window_frames",
    "asof_purchase_last_click",
    "dedup_minhash_lsh",
    "similarity_cosine_topk",
    "text_tfidf_top_term",
]

# PINNED ABSOLUTE BASELINE (round-1 bench, BENCH_r01.json, sf0.1,
# local[32]): the repo's first-ever per-query numbers, against which the
# driver's 2x gate is evaluated. "vs_baseline" in the output JSON is
# core9_total / BASELINE_CORE9_TOTAL — < 1.0 means faster than round 1.
# Protocol note (ADVICE r5): round 1 ran WITHOUT the per-query
# clearCache+gc hygiene added in round 5, i.e. under a protocol that
# could only inflate later queries in the list — so beating these
# numbers under the stricter current protocol understates, never
# overstates, the improvement.
BASELINE_CORE9 = {
    "pricing_summary": 1.9396,
    "project_filter": 0.6547,
    "join_revenue_by_nation": 2.4343,
    "join_theta_self": 1.3912,
    "window_frames": 0.4806,
    "asof_purchase_last_click": 0.7595,
    "dedup_minhash_lsh": 3.4706,
    "similarity_cosine_topk": 1.3084,
    "text_tfidf_top_term": 1.1864,
}
BASELINE_CORE9_TOTAL = 13.6253

# Headline queries: the flagship plus the heaviest representatives of each
# operator family (kept in sync as families land). Additions track the
# families that now dominate the registry.
HEADLINE = CORE9 + [
    "events_sessionize",
    "dedup_embedding_cosine",
    "graph_pagerank_bipartite",
    # round-4 families
    "relational_skyline",
    "join_bloom_semireduction",
    "agg_corr_matrix",
    "ts_ohlc_bars",
    # round-5: skew-resistant windowed family + PQ compression leg
    "events_sessionize_skew",
    "similarity_ann_pq_adc",
    # round-5 session additions: exact set-similarity join, keyword
    # search, and the mergeable-rollup contract
    "dedup_prefix_filter_jaccard",
    "text_bm25_topk",
    "ts_cascaded_rollup",
    # round-5 session: TPC-H representatives (the broadcast-dim profit
    # rollup and the stacked order-keyed aggregation chain) plus the
    # Poisson-bootstrap one-pass resample
    "tpch_q09_product_profit",
    "tpch_q21_waiting_suppliers",
    "sample_poisson_bootstrap",
    # round-6: the ANN production query leg over the persisted artifact,
    # plus the reference's own surface (RBM fit+transform), benched so
    # A-path regressions are visible.
    "similarity_ann_pq_adc_prebuilt",
    "impute_rbm_customer",
    # round-7: community detection (the third iterative-graph shape)
    # and the public-API dedup funnel composition.
    "graph_label_propagation",
    "pipeline_dedup_funnel",
]

# Offline build/lifecycle jobs (r6 verdict item 3): timed and reported,
# but under their own "build_jobs_total" bucket so the query-latency
# headline stays round-over-round comparable. A build job runs once per
# corpus in production, not per query — mixing its cost into the query
# total misread r6 as a 38% regression that was actually 3 new entries.
BUILD_JOBS = [
    "sink_ann_index_build",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("boltzmannclean_spark-bench")
    registry = all_queries()
    names = [n for n in HEADLINE + BUILD_JOBS if n in registry]

    # Warm the JVM: parquet-footer caches, vectorized-reader paths, and —
    # the dominant first-touch cost — whole-stage-codegen compilation of
    # each headline plan shape. Each query runs once against the tiny
    # sf0.001 fixture (identical generated code, ~100x less data), so the
    # timed sf0.1 runs below measure steady-state engine throughput
    # rather than one-time Janino compilation.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "sum(l_quantity)"
    ).collect()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in names:
            try:
                registry[name].spark_fn(spark, warm_dir).count()
            except Exception as exc:  # warmup must never fail the bench
                print(f"# warmup {name} skipped: {exc}", file=sys.stderr)

    # Best-of-2 per query: the minimum of two runs estimates the true
    # plan cost under co-tenant interference (standard practice for
    # shared hosts); both samples go to stderr for transparency and the
    # first-sample sum is reported alongside the best-of total.
    # Per-query fault isolation: a single failing query must cost ONE
    # entry, never the whole bench line (round 3 lost every number to one
    # AnalysisException). Failures are reported in "failed" so a partial
    # total is never mistaken for a full one.
    timings: dict[str, float] = {}
    first_runs: dict[str, float] = {}
    failed: dict[str, str] = {}
    for name in names:
        q = registry[name]
        samples = []
        # Hygiene between queries, OUTSIDE the timed region: several
        # operators cache()/localCheckpoint() internally (PQ codebooks,
        # shingle tables, CC edge sets). In one long bench session those
        # blocks accumulate across the growing headline list, and by the
        # 20th query the executor heap is fighting GC — measured 2-4x
        # uniform inflation of every later query. Clearing the cache and
        # letting the ContextCleaner reap checkpoints restores the
        # per-query steady state a fresh session would see.
        spark.catalog.clearCache()
        gc.collect()
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                df = q.spark_fn(spark, sf_dir)
                n = df.count()
                samples.append(time.perf_counter() - t0)
        except Exception as exc:
            failed[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: FAILED {failed[name]}", file=sys.stderr)
            continue
        timings[name] = round(min(samples), 4)
        first_runs[name] = round(samples[0], 4)
        print(
            f"# {name}: {timings[name]:.3f}s ({n} rows; samples "
            + ", ".join(f"{s:.3f}" for s in samples)
            + ")",
            file=sys.stderr,
        )

    query_names = [n for n in HEADLINE if n in timings]
    build_names = [n for n in BUILD_JOBS if n in timings]
    total = round(sum(timings[n] for n in query_names), 4)
    core9_total = round(sum(timings[n] for n in CORE9 if n in timings), 4)
    # vs_baseline is only meaningful when ALL nine core queries produced
    # a timing (ADVICE r6: a failed core query would otherwise shrink the
    # numerator and let the <2x gate pass spuriously). null = not
    # comparable this run; the per-query timings still show which failed.
    core9_complete = all(n in timings for n in CORE9)
    report = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "core9_total": core9_total if core9_complete else None,
        # core9 vs the pinned round-1 absolute baseline (BASELINE.md):
        # < 1.0 = faster than baseline; the driver's gate is < 2.0.
        "vs_baseline": (
            round(core9_total / BASELINE_CORE9_TOTAL, 4)
            if core9_complete
            else None
        ),
        # Offline build/lifecycle jobs, separate bucket (see BUILD_JOBS).
        "build_jobs_total": round(sum(timings[n] for n in build_names), 4),
        "first_run_total": round(
            sum(first_runs[n] for n in query_names if n in first_runs), 4
        ),
        "queries_first_run": first_runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if failed:
        report["failed"] = failed
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
