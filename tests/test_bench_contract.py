"""Pin bench.py's stdout gate-line contract (r7 verdict items 1 + 6).

The driver captures only the LAST 2000 bytes of bench.py's stdout and
parses a JSON line out of that window. Round 7's fully-inlined report
line grew past the window and the round's perf numbers became
machine-unreadable ("parsed": null in BENCH_r07.json). The fix is
structural — per-query detail goes to BENCH_DETAIL.json and the final
stdout line carries only the gate fields — but the fix only stays
fixed if the line's size is pinned: these tests build the gate line
from WORST-CASE synthetic measurements (every headline + build-job
query timed with maximum-width floats, plus a round's worth of
failures) and assert it stays under bench.GATE_LINE_BYTE_BUDGET
(1 KiB, half the driver's window). Adding a field or a per-query map
to the gate line trips this immediately, in CI, not at round close.
"""

from __future__ import annotations

import json

import bench


def _worst_case_reports():
    # Max-width values: 4-decimal floats in the thousands (a cold run at
    # a big SF), every query present, and several failures recorded.
    names = bench.HEADLINE + bench.BUILD_JOBS
    timings = {n: 1234.5678 for n in names}
    first_runs = {n: 2345.6789 for n in names}
    samples = {n: [2345.6789, 1234.5678] for n in names}
    failed = {f"future_query_{i}": "AnalysisException: boom" for i in range(5)}
    return bench.build_reports(
        timings,
        first_runs,
        samples,
        failed,
        sf=0.1,
        canary_drift=1.2345,
        cpu_ref=(1234.5678, 1.2345),
    )


def test_gate_line_fits_byte_budget():
    gate, _ = _worst_case_reports()
    line = json.dumps(gate)
    assert len(line.encode()) <= bench.GATE_LINE_BYTE_BUDGET, (
        f"gate line is {len(line.encode())} bytes > "
        f"{bench.GATE_LINE_BYTE_BUDGET}; the driver's tail window is "
        f"2000 bytes — move any new detail to BENCH_DETAIL.json"
    )


def test_gate_line_carries_the_gate_fields():
    gate, _ = _worst_case_reports()
    # The driver's perf gate reads vs_baseline; the brief's contract
    # names metric/value/unit/queries/sf. Both must survive compaction.
    for key in (
        "metric",
        "value",
        "unit",
        "queries",
        "core9_total",
        "vs_baseline",
        "build_jobs_total",
        "first_run_total",
        "noise_med_spread",
        "canary_drift",
        "cpu_ref_sec",
        "cpu_ref_spread",
        "sf",
    ):
        assert key in gate, f"gate line lost required field {key!r}"
    assert set(gate["queries"]) == set(bench.CORE9)
    assert gate["vs_baseline"] is not None
    # Failed queries appear by NAME in the gate line (messages belong to
    # the detail file) so a partial total is never mistaken for full.
    assert gate["failed"] == sorted(
        f"future_query_{i}" for i in range(5)
    )


def test_gate_line_null_vs_baseline_when_core9_incomplete():
    names = bench.HEADLINE + bench.BUILD_JOBS
    timings = {n: 1.0 for n in names if n != "pricing_summary"}
    gate, _ = bench.build_reports(
        timings,
        dict(timings),
        {n: [1.0, 1.0] for n in timings},
        {"pricing_summary": "boom"},
        sf=0.1,
        canary_drift=None,
    )
    assert gate["vs_baseline"] is None
    assert gate["core9_total"] is None


def test_detail_report_covers_everything_the_gate_dropped():
    gate, detail = _worst_case_reports()
    names = set(bench.HEADLINE + bench.BUILD_JOBS)
    assert set(detail["queries"]) == names
    assert set(detail["queries_first_run"]) == names
    assert set(detail["samples"]) == names
    assert set(detail["vs_baseline_per_query"]) == set(bench.CORE9)
    # Spread sentinel: (max-min)/min of the synthetic samples.
    expected = round((2345.6789 - 1234.5678) / 1234.5678, 4)
    assert detail["spread"]["pricing_summary"] == expected
    assert detail["noise_med_spread"] == expected
    # Failure MESSAGES live here, names-only in the gate line.
    assert detail["failed"]["future_query_0"].startswith("AnalysisException")
