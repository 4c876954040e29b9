"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (round-8 protocol; BASELINE.md): the FINAL stdout line
is ONE compact JSON gate line — {"metric": "headline_queries_total",
"value": total_sec, "unit": "sec", "queries": {core9 name: sec, ...},
"core9_total": ..., "vs_baseline": ..., "build_jobs_total": ...,
"first_run_total": ..., "noise_med_spread": ..., "canary_drift": ...,
"sf": ...} — guaranteed under 1 KiB (tests/test_bench_contract.py),
because the driver captures only the LAST 2000 bytes of stdout and
parses a JSON line out of that window: round 7's fully-inlined line
outgrew it and the round's perf numbers became machine-unreadable
("parsed": null). Full per-query detail (every headline + build-job
timing, both raw samples, first-run times, per-query spread, and the
per-query ratio vs the pinned round-1 baseline) goes to
BENCH_DETAIL.json in the repo root ($SPARK_GRAFT_BENCH_DETAIL to
override), committed per round as BENCH_DETAIL_r{N}.json.

Methodology (stated explicitly so round-over-round numbers compare
like-for-like): plan shapes are warmed once at sf0.001 (whole-stage
codegen compilation, ~3.4s, is a one-time JVM cost, not engine
throughput), then each query runs twice at the target SF. "value" is
the best-of-2 total over ALL headline queries; "core9_total" is the
best-of-2 total over the original round-1 nine (the cross-round
comparable); "first_run_total" is the sum of FIRST samples — the
conservative number including any residual first-touch cost, reported
so a methodology change can never masquerade as an engine win.

Noise sentinels (round-8, after r7's unexplained +14% common-set
drift): "noise_med_spread" is the median over queries of
(max-min)/min across each query's two samples — a loaded host shows a
large spread because co-tenant interference hits one sample and not
the other; a quiet host stays in single-digit percent.
"canary_drift" re-times the first core query (pricing_summary) at the
END of the session and reports best_end/best_begin — sustained >1
drift means the session itself degrades (heap/GC creep), which
per-query spread cannot see. Both are in the gate line so a noisy
round self-identifies in the committed artifact.

Weather normalization (round-13, r12 verdict #3): the gate line also
carries "cpu_ref_sec"/"cpu_ref_spread" (a fixed CPU-bound JVM
sentinel — identical work every round) and "core9_weather_norm" =
core9_total / cpu_ref_sec. Cross-round comparisons should read the
NORMALIZED number: raw seconds moved ±38-89% with hypervisor
co-tenant weather on this host (r12 SCALING.md) while plans were
unchanged. BENCH_DETAIL carries the per-query normalized table.
The normalized series starts at r12 (core9_weather_norm 19.73);
earlier rounds carried no sentinel and cannot be normalized
retroactively — which is itself the protocol lesson.
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

# The gate line must stay parseable inside the driver's 2000-byte stdout
# tail window, with margin for a "failed" map in a bad round. Enforced
# by tests/test_bench_contract.py against a worst-case synthetic report.
GATE_LINE_BYTE_BUDGET = 1024

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
    # round-5: skew-resistant windowed family + PQ compression leg.
    # r9: dedup_prefix_filter_jaccard moved BEFORE the PQ training leg —
    # running right after similarity_ann_pq_adc it inherited that leg's
    # GC pressure (in-session 5.4 s vs fresh-JVM steady-state 2.3 s,
    # profiled ×5 in isolation; r8 verdict watch item). Same query set,
    # order only.
    "events_sessionize_skew",
    "dedup_prefix_filter_jaccard",
    # r11: similarity_ann_pq_adc moved to BUILD_JOBS — it trains PQ
    # codebooks in-query (it exists as the oracle twin of the build
    # job), so every deliberate recall investment read as a headline
    # regression (r10: ×1.60). The serve-path twin
    # similarity_ann_pq_adc_prebuilt stays in the headline.
    # round-5 session additions: exact set-similarity join, keyword
    # search, and the mergeable-rollup contract
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
    # round-9: the combination-explode itemset miner (heaviest new text
    # shape) and the single-pass robust window filter.
    "text_apriori_cooccur",
    "window_hampel_filter",
    # round-10: the degree-capped wedge-closure shape (heaviest new
    # graph work this round) and the domain-compressed exact-median
    # moments representative of the new robust-stats tier.
    "graph_clustering_coefficient",
    "stats_brown_forsythe",
    # round-13: the truncated-sketch heavy-hitter merge (the new
    # sliding-window shape) and the probe-vs-corpus recall eval (whole-
    # corpus minhash + token-join ground truth — the heaviest hardened
    # dedup leg).
    "window_heavy_hitters",
    "dedup_minhash_recall_eval",
    # round-14: the IEEE-grid float quantile sketch (the unbounded-
    # domain sibling of the mergeable-quantiles tier) and the exact
    # reservoir-free split (bucket-offset global rank — the shape whose
    # naive form is a global sort).
    "window_mergeable_quantiles_float",
    "sample_exact_split",
]

# Offline build/lifecycle jobs (r6 verdict item 3): timed and reported,
# but under their own "build_jobs_total" bucket so the query-latency
# headline stays round-over-round comparable. A build job runs once per
# corpus in production, not per query — mixing its cost into the query
# total misread r6 as a 38% regression that was actually 3 new entries.
BUILD_JOBS = [
    "sink_ann_index_build",
    # r11 (r10 verdict item 2): the train-in-query oracle twins of the
    # build job — Lloyd training dominates their cost, so they are
    # build jobs by nature; their registry/oracle entries are unchanged.
    "similarity_ann_pq_adc",
    "similarity_ann_ivfpq",
]

# End-of-session canary: re-timed last; best_end/best_begin exposes
# session-long degradation (heap/GC creep) that per-query spread misses.
CANARY = "pricing_summary"


def measure_cpu_ref(spark) -> tuple[float, float]:
    """Deterministic host-speed sentinel: best-of-3 (and spread) of a
    fixed CPU-bound JVM job — `range(2e9).sum(id % 7919)`, one codegen
    stage, no shuffle, no disk, no Python. Identical work every round,
    so the number moves ONLY when the machine itself does.

    Round-12 motivation: r11's +17% core9 / +38% headline creep
    reproduced in a fresh JVM on a quiet guest (isolated best-of-3
    core9 = 6.30-6.54 s vs r10's isolated 4.72 s) with ZERO plan
    changes, ~0.2% steal, and back-to-back single-thread pure-CPU
    samples spreading ±38% — physical-host (hypervisor co-tenant)
    variance that guest-visible counters cannot see. Publishing the
    sentinel in every gate line turns "host state dominates" from a
    per-round hypothesis into a measured artifact: compare
    core9_total/cpu_ref_sec across rounds, not raw seconds.
    """
    t = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(2_000_000_000).selectExpr("sum(id % 7919)").collect()
        t.append(time.perf_counter() - t0)
    return round(min(t), 4), round((max(t) - min(t)) / min(t), 4)


def build_reports(
    timings: dict[str, float],
    first_runs: dict[str, float],
    samples: dict[str, list[float]],
    failed: dict[str, str],
    sf,
    canary_drift: float | None,
    cpu_ref: tuple[float, float] | None = None,
) -> tuple[dict, dict]:
    """Assemble (gate_line, detail) reports from raw measurements.

    Pure function so tests/test_bench_contract.py can pin the gate
    line's byte budget against worst-case synthetic inputs.
    """
    query_names = [n for n in HEADLINE if n in timings]
    build_names = [n for n in BUILD_JOBS if n in timings]
    total = round(sum(timings[n] for n in query_names), 4)
    core9_total = round(sum(timings[n] for n in CORE9 if n in timings), 4)
    # vs_baseline is only meaningful when ALL nine core queries produced
    # a timing (ADVICE r6: a failed core query would otherwise shrink the
    # numerator and let the <2x gate pass spuriously). null = not
    # comparable this run; the per-query timings still show which failed.
    core9_complete = all(n in timings for n in CORE9)
    spreads = {
        n: round((max(s) - min(s)) / min(s), 4)
        for n, s in samples.items()
        if len(s) == 2 and min(s) > 0
    }
    med_spread = None
    if spreads:
        vals = sorted(spreads.values())
        mid = len(vals) // 2
        med_spread = round(
            vals[mid] if len(vals) % 2 else (vals[mid - 1] + vals[mid]) / 2, 4
        )
    gate = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        # Per-query detail for ALL headline entries lives in the detail
        # file; the gate line carries only the cross-round-comparable
        # core nine so it stays inside the driver's tail window.
        "queries": {n: timings[n] for n in CORE9 if n in timings},
        "core9_total": core9_total if core9_complete else None,
        # core9 vs the pinned round-1 absolute baseline (BASELINE.md):
        # < 1.0 = faster than baseline; the driver's gate is < 2.0.
        "vs_baseline": (
            round(core9_total / BASELINE_CORE9_TOTAL, 4)
            if core9_complete
            else None
        ),
        "build_jobs_total": round(sum(timings[n] for n in build_names), 4),
        "first_run_total": round(
            sum(first_runs[n] for n in query_names if n in first_runs), 4
        ),
        "noise_med_spread": med_spread,
        "canary_drift": canary_drift,
        # Host-speed sentinel (see measure_cpu_ref): fixed CPU-bound JVM
        # job, best-of-3 seconds + sample spread. Cross-round perf reads
        # should normalize by this before crying regression.
        "cpu_ref_sec": cpu_ref[0] if cpu_ref else None,
        "cpu_ref_spread": cpu_ref[1] if cpu_ref else None,
        # Weather-normalized core9 (r12 verdict #3): core9_total in units
        # of the sentinel's identical-work seconds. Compare THIS across
        # rounds — raw seconds relitigate hypervisor co-tenant weather
        # (measured ±38-89% sentinel swings, r12 SCALING.md). Series
        # starts at r12 (19.73); earlier rounds carried no sentinel.
        "core9_weather_norm": (
            round(core9_total / cpu_ref[0], 4)
            if core9_complete and cpu_ref and cpu_ref[0] > 0
            else None
        ),
        # r16 (r15 verdict #9): the full-headline total normalized the
        # same way, so a weather-distorted round self-identifies on the
        # headline too, not only on core9. ADDITIVE field only — every
        # pre-existing field, query entry, and the measurement protocol
        # are byte-for-byte unchanged.
        "headline_weather_norm": (
            round(total / cpu_ref[0], 4)
            if cpu_ref and cpu_ref[0] > 0
            else None
        ),
        "n_queries": len(query_names),
        "detail": "BENCH_DETAIL.json",
        "sf": sf,
    }
    if failed:
        # Names only — messages live in the detail file (byte budget).
        gate["failed"] = sorted(failed)
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_first_run": first_runs,
        "samples": {n: [round(x, 4) for x in s] for n, s in samples.items()},
        "spread": spreads,
        "vs_baseline_per_query": {
            n: round(timings[n] / BASELINE_CORE9[n], 4)
            for n in CORE9
            if n in timings
        },
        "core9_total": core9_total if core9_complete else None,
        "vs_baseline": gate["vs_baseline"],
        "build_jobs_total": gate["build_jobs_total"],
        "first_run_total": gate["first_run_total"],
        "noise_med_spread": med_spread,
        "canary_drift": canary_drift,
        "cpu_ref_sec": cpu_ref[0] if cpu_ref else None,
        "cpu_ref_spread": cpu_ref[1] if cpu_ref else None,
        "core9_weather_norm": gate["core9_weather_norm"],
        # Per-query timings in sentinel units — the cross-round
        # comparable form of the per-query table (r12 verdict #3).
        "weather_norm_per_query": (
            {
                n: round(timings[n] / cpu_ref[0], 4)
                for n in CORE9
                if n in timings
            }
            if cpu_ref and cpu_ref[0] > 0
            else None
        ),
        "failed": failed,
        "sf": sf,
    }
    return gate, detail


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.environ.get(
        "SPARK_GRAFT_SF_LABEL", sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    )
    sf = float(sf) if sf.replace(".", "").isdigit() else sf
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_DETAIL.json"),
    )
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
    # shared hosts); both samples go to the detail file and stderr.
    # Per-query fault isolation: a single failing query must cost ONE
    # entry, never the whole bench line (round 3 lost every number to one
    # AnalysisException). Failures are reported in "failed" so a partial
    # total is never mistaken for a full one.
    def run_query(name: str) -> list[float]:
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
        q = registry[name]
        out = []
        for _ in range(2):
            t0 = time.perf_counter()
            df = q.spark_fn(spark, sf_dir)
            df.count()
            out.append(time.perf_counter() - t0)
        return out

    timings: dict[str, float] = {}
    first_runs: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    failed: dict[str, str] = {}
    for name in names:
        try:
            s = run_query(name)
        except Exception as exc:
            failed[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: FAILED {failed[name]}", file=sys.stderr)
            continue
        samples[name] = s
        timings[name] = round(min(s), 4)
        first_runs[name] = round(s[0], 4)
        print(
            f"# {name}: {timings[name]:.3f}s (samples "
            + ", ".join(f"{x:.3f}" for x in s)
            + ")",
            file=sys.stderr,
        )

    # Canary rerun at session end (see module docstring).
    canary_drift = None
    if CANARY in timings:
        try:
            end_best = min(run_query(CANARY))
            canary_drift = round(end_best / timings[CANARY], 4)
            print(
                f"# canary {CANARY}: end {end_best:.3f}s vs begin "
                f"{timings[CANARY]:.3f}s (drift x{canary_drift:.2f})",
                file=sys.stderr,
            )
        except Exception as exc:
            print(f"# canary rerun failed: {exc}", file=sys.stderr)

    cpu_ref = None
    try:
        cpu_ref = measure_cpu_ref(spark)
        print(
            f"# cpu_ref: {cpu_ref[0]:.3f}s (spread {cpu_ref[1]:.2%})",
            file=sys.stderr,
        )
    except Exception as exc:  # the sentinel must never fail the bench
        print(f"# cpu_ref failed: {exc}", file=sys.stderr)

    gate, detail = build_reports(
        timings, first_runs, samples, failed, sf, canary_drift, cpu_ref
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"# detail -> {detail_path}", file=sys.stderr)
    # The compact gate line is the FINAL stdout line, alone — the driver
    # parses it from a 2000-byte tail window (see module docstring).
    print(json.dumps(gate))
    spark.stop()


if __name__ == "__main__":
    main()
