"""Assemble LOCAL_CORRECTNESS_X30_r12.json (r11 verdict #1).

SUPERSEDED (round 13): use tools/x30_sweep.py for new sweeps — it
fixes this file's merge-precedence defect (r12 ADVICE medium: the
`if k not in merged or ok` rule could keep an earlier chunk's stale
PASS over a later rerun's FAIL; the new tool merges chunks in mtime
order with later entries winning unconditionally). This script is
retained unchanged as provenance for the committed r12 artifact only.

Provenance, stated so the artifact is auditable:

- The bulk of the full-registry ×30 (18M-row replica) sweep ran during
  the round-11 session in resumable chunks (/tmp/x30run, /tmp/x30new,
  /tmp/x30ppr, /tmp/x30fix, /tmp/x30rem, /tmp/x30lt — timestamps
  2026-08-16 02:53–07:32). The session stalled at round close before
  the merged artifact could be emitted; the chunks survived. Operator
  code for every chunked run is identical to round-12 HEAD for those
  operators: the only commits after the last chunk are the oracle-cap
  change (tests/oracle_utils.py), driver round-close artifacts, and
  round-12's own changes — which are exactly the entries RE-RUN fresh
  this round (see below).

- Round-12 re-runs (/tmp/x30r12/rerun.json + solo follow-ups) replace,
  at current HEAD: every operator whose plan changed this round
  (stats_cramers_v, stream_srm_monitor, dedup_incremental_batch),
  the one r11 transient failure (dedup_semantic_semdedup — a
  mid-sweep JVM death, not a mismatch; 372.8 s clean at HEAD), and
  the round-12 additions (window_mergeable_quantiles,
  stream_funnel_monitor, similarity_ann_nprobe_autotune,
  graph_hyperball_reach).

- The spill-cap oracle exclusion class DISSOLVED late in round 12:
  the root cause of every 50-72 GB iterative-graph oracle spill was
  DuckDB's default CTE inlining re-evaluating unrolled levels (the
  HyperBall lesson, applied back). With `AS MATERIALIZED` on each
  level, ALL FIVE — pagerank_bipartite, personalized_pagerank,
  harmonic_centrality, kcore_peel, triangle_count — run hash-exact
  at ×30 under the safe caps in 6.5-26 s each
  (/tmp/x30r12/graph_fixed.json, 78 s total, 0 failures), ending
  three rounds of exclusions. The harmonic transitivity proof
  (sha256-identical Spark output across the round-12 refactor)
  remains in the round log as supporting evidence but is superseded
  by the direct oracle pass at HEAD.

- Exclusions are carried explicitly in the artifact's `_exclusions`
  key with per-query reasons. The round-12 ORGANIC ×30 corpus
  (tools/organic_scale.py — fresh Zipf-preserving text instead of
  verbatim copies) was run against the pair-output exclusions and
  produced the honest answer, which is recorded in the reasons: for
  Fellegi-Sunter and prefix-filter PPJoin the degeneracy is
  FIXTURE-INHERENT (31 distinct tokens corpus-wide defeat any
  content-derived block/prefix key), not a replica artifact; the
  same organic corpus DID vindicate winnowing and exposed+fixed the
  real incremental-dedup defect (SCALING.md round-12). Organic runs
  that completed are recorded under `_organic_x30`.

Usage: python tools/x30_assemble_r12.py [--emit]
Without --emit it prints the summary only.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHUNKS = [
    # round-11 session chunks, oldest first (later files win on rerun)
    "/root/repo/LOCAL_CORRECTNESS_X30_r11.json",
    "/tmp/x30run/X30_r11_raw.json",
    "/tmp/x30run/X30_r11_raw2.json",
    "/tmp/x30new/new.json",
    "/tmp/x30ppr/out.json",
    "/tmp/x30fix/fix.json",
    "/tmp/x30rem/rem.json",
    "/tmp/x30lt/light.json",
    "/tmp/x30lt/light2.json",
    "/tmp/x30rem/heavy.json",
    # round-12 re-runs at HEAD (always win)
    "/tmp/x30r12/rerun.json",
    "/tmp/x30r12/new_ops.json",
    "/tmp/x30r12/new_ops2.json",
    "/tmp/x30r12/autotune_x30.json",
    "/tmp/x30r12/graph_fixed.json",
    "/tmp/x30r12/saturation_x30.json",
]

ORGANIC_RESULTS = "/tmp/x30org/recall_eval.json"

EXCLUSIONS = {
    "source_file_metadata": (
        "oracle compares file metadata (size/mtime) a rewritten replica "
        "cannot match — r9 exclusion"
    ),
    "sessions_overlap_pairs": (
        "overlap-PAIR output is inherently quadratic in concurrent-"
        "session density: x10 users in a fixed time range really do "
        "overlap x100 — 128.3M output rows at x30 (computed by Spark "
        "in 37.4s; uncollectable for hash comparison); hash-exact at "
        "sf0.01 and x10"
    ),
    "dedup_fellegi_sunter_score": (
        "pair-output degeneracy is FIXTURE-INHERENT, not a replica "
        "artifact: the r12 organic x30 corpus (fresh text) still "
        "yields >1 GiB of verified pairs (driver maxResultSize) "
        "because the fixture's 31-token corpus-wide vocabulary makes "
        "every content-derived block key (lang, head-token, ...) "
        "degenerate; a real corpus's key domains grow with it. "
        "Hash-exact at sf0.01 and x10; SCALING.md round-12"
    ),
    "dedup_minhash_recall_eval": (
        "same fixture-vocabulary class, measured on the organic x30 "
        "corpus too: the truth-pair sample is language-blocked and "
        "'en' is 41 percent of the corpus, so the hot-language block "
        "develops the same single-task verification tail (killed at "
        "12 min). Hash-exact at sf0.01 and x10"
    ),
    "dedup_prefix_filter_jaccard": (
        "same fixture-vocabulary degeneracy measured on the ORGANIC "
        "x30 corpus: with only 31 distinct tokens there are no rare "
        "prefixes, so PPJoin's candidate filter passes hot blocks and "
        "verification develops a single-task skew tail (>20 min, "
        "killed). Real-vocabulary prefixes are Zipf-rare (the plan's "
        "premise); carried as a hardening candidate (oversized-block "
        "cap). Hash-exact at sf0.01 and x10"
    ),
}


def main() -> int:
    import __spark_entry__ as m

    registry = set(m.queries())
    merged: dict[str, dict] = {}
    for path in CHUNKS:
        if not os.path.exists(path):
            print(f"skip (absent): {path}")
            continue
        with open(path) as fh:
            data = json.load(fh)
        data.pop("_exclusions", None)
        for k, v in data.items():
            ok = v.get("hash_match") or v.get("err") == "no_oracle"
            if k not in merged or ok:
                merged[k] = v
    for k in EXCLUSIONS:
        merged.pop(k, None)
    merged = {k: v for k, v in merged.items() if k in registry}

    fails = {
        k: (v.get("err") or "")[:100]
        for k, v in merged.items()
        if v.get("err") and v.get("err") != "no_oracle"
    }
    n_hash = sum(1 for v in merged.values() if v.get("hash_match"))
    n_rows = sum(1 for v in merged.values() if v.get("err") == "no_oracle")
    missing = registry - set(merged) - set(EXCLUSIONS)
    print(
        f"entries={len(merged)} hash_exact={n_hash} rows_only={n_rows} "
        f"fails={len(fails)} missing={len(missing)} "
        f"excluded={len(EXCLUSIONS)}"
    )
    if fails:
        print("FAILS:", json.dumps(fails, indent=2))
    if missing:
        print("MISSING:", sorted(missing))

    organic = None
    if os.path.exists(ORGANIC_RESULTS):
        with open(ORGANIC_RESULTS) as fh:
            organic = {
                k: v
                for k, v in json.load(fh).items()
                if not k.startswith("_")
            }

    if "--emit" in sys.argv:
        if fails or missing:
            print("refusing to emit with fails/missing")
            return 1
        out = dict(sorted(merged.items()))
        out["_exclusions"] = EXCLUSIONS
        if organic:
            out["_organic_x30"] = organic
        path = os.path.join(REPO, "LOCAL_CORRECTNESS_X30_r12.json")
        with open(path + ".part", "w") as fh:
            json.dump(out, fh, indent=2)
        os.replace(path + ".part", path)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
