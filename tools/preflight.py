"""Pre-snapshot preflight — the fast, Spark-free contract check the
round-9 verdict asked for (item 2): two consecutive rounds shipped a
red `pytest tests/` because an operator landed in the final commit
AFTER the artifacts/docs were frozen. This script re-implements the
pure-Python contract tests in <2 s so it can run before EVERY commit
that touches `operators/` or `pipeline.py`:

  1. registry vs newest LOCAL_CORRECTNESS_r{N}.json — key sets must be
     EQUAL (the `test_local_correctness_artifact_covers_full_registry`
     contract), and every covered entry must be pass/rows-only (no
     err="mismatch" committed).
  2. SURVEY.md's latest "registry: **N queries, M oracle-exact, K
     rows-only**" claim vs tools/survey_counts.py's live counts (the
     `test_survey_counts_match_registry` contract).
  3. import every tests/test_*.py module (catches syntax errors,
     missing symbols, bad imports — the class of red that needs no
     Spark session to detect).
  4. byte-compile every package .py (syntax gate).

Usage: python tools/preflight.py   (exit 0 = safe to snapshot)
Documented in README ("Development workflow"). NOT a substitute for
the full suite — it is the subset that catches the two failure modes
that actually shipped red in rounds 8 and 9.
"""

from __future__ import annotations

import glob
import importlib
import json
import os
import py_compile
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def fail(msg: str) -> None:
    print(f"PREFLIGHT FAIL: {msg}")
    raise SystemExit(1)


def main() -> None:
    # -- 4. syntax gate first (cheapest, catches the most embarrassing) --
    for pat in ("boltzmannclean_spark/**/*.py", "tools/*.py", "tests/*.py",
                "__spark_entry__.py", "bench.py"):
        for path in glob.glob(os.path.join(REPO, pat), recursive=True):
            try:
                py_compile.compile(path, doraise=True)
            except py_compile.PyCompileError as e:
                fail(f"syntax error: {e}")
    print("ok: syntax (package + tools + tests + entry + bench)")

    # -- registry (imports __spark_entry__, no Spark session started) --
    import __spark_entry__ as m

    queries = set(m.queries())
    oracles = set(m.oracle_sql())
    extra = oracles - queries
    if extra:
        fail(f"oracle_sql() keys not in queries(): {sorted(extra)[:5]}")
    print(f"ok: registry imports ({len(queries)} queries, "
          f"{len(queries & oracles)} oracled)")

    # -- 1. newest artifact covers the registry exactly, all green.
    # Coverage source of truth (r13 verdict #2): the in-round running
    # file LOCAL_CORRECTNESS_WIP.json when present, else the newest
    # frozen per-round artifact — frozen r{N} files must never be
    # edited to track a mid-round registry (gate 1b below enforces it).
    wip = os.path.join(REPO, "LOCAL_CORRECTNESS_WIP.json")
    arts = glob.glob(os.path.join(REPO, "LOCAL_CORRECTNESS_r*.json"))
    if not arts:
        fail("no LOCAL_CORRECTNESS_r*.json artifact committed")
    if os.path.exists(wip):
        latest = wip
    else:
        latest = max(
            arts,
            key=lambda p: int(
                re.search(r"_r(\d+)", os.path.basename(p)).group(1)
            ),
        )
    with open(latest) as fh:
        art = json.load(fh)
    missing = sorted(queries - set(art))
    stale = sorted(set(art) - queries)
    if missing or stale:
        fail(
            f"{os.path.basename(latest)} drifted from the registry: "
            f"missing={missing[:10]} stale={stale[:10]} — run "
            f"python tests/driver_replica.py --only "
            f"{','.join(missing[:10]) or ','.join(stale[:10])} "
            f"--emit {os.path.basename(latest)}"
        )
    bad = sorted(
        k for k, v in art.items()
        if v.get("err") not in (None, "no_oracle")
    )
    if bad:
        fail(f"{os.path.basename(latest)} has failing entries: {bad[:10]}")
    print(f"ok: {os.path.basename(latest)} covers {len(art)}/{len(queries)}"
          ", 0 failures")

    # -- 1b. frozen-round artifacts are byte-identical to their
    # round-close commit (r13 verdict #2 / "What's wrong #1": r12's
    # artifact was extended in place during round 13; an artifact named
    # _r{N} must freeze once the driver's "round N:" close commit
    # exists — running coverage belongs in LOCAL_CORRECTNESS_WIP.json).
    import subprocess

    log = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=REPO, capture_output=True, text=True,
    )
    if log.returncode == 0:
        close_commits: dict[int, str] = {}
        for line in log.stdout.splitlines():
            mm = re.match(r"^([0-9a-f]{40}) round (\d+):", line)
            if mm:
                # latest commit wins (git log is newest-first; keep the
                # first seen = the round's final close commit)
                close_commits.setdefault(int(mm.group(2)), mm.group(1))
        for n, sha in sorted(close_commits.items()):
            name = f"LOCAL_CORRECTNESS_r{n}.json"
            frozen = subprocess.run(
                ["git", "rev-parse", f"{sha}:{name}"],
                cwd=REPO, capture_output=True, text=True,
            )
            if frozen.returncode != 0:
                continue  # that round shipped no full-registry artifact
            path = os.path.join(REPO, name)
            if not os.path.exists(path):
                fail(f"{name} existed at round-{n} close ({sha[:8]}) "
                     "but is missing from the working tree")
            cur = subprocess.run(
                ["git", "hash-object", path],
                cwd=REPO, capture_output=True, text=True,
            )
            if cur.stdout.strip() != frozen.stdout.strip():
                fail(
                    f"{name} was modified after round-{n} close "
                    f"({sha[:8]}) — frozen artifacts must not mutate; "
                    "put in-round coverage in LOCAL_CORRECTNESS_WIP.json "
                    f"and restore via: git checkout {sha[:8]} -- {name}"
                )
        print(f"ok: {len(close_commits)} frozen round artifacts "
              "byte-identical to their close commits")

    # -- 2. SURVEY.md counts --
    claim_re = re.compile(
        r"registry:\s*\*\*(\d+)\s+queries,\s*(\d+)\s+oracle-exact,\s*"
        r"(\d+)\s+rows-only"
    )
    claims = claim_re.findall(open(os.path.join(REPO, "SURVEY.md")).read())
    if not claims:
        fail("SURVEY.md states no registry counts")
    latest_claim = tuple(int(x) for x in claims[-1])
    actual = (len(queries), len(queries & oracles), len(queries - oracles))
    if latest_claim != actual:
        fail(f"SURVEY.md latest claim {latest_claim} != registry {actual} — "
             "update the newest round section")
    print(f"ok: SURVEY.md counts {actual}")

    # -- 3. import every test module --
    for path in sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py"))):
        mod = "tests." + os.path.splitext(os.path.basename(path))[0]
        try:
            importlib.import_module(mod)
        except Exception as e:  # noqa: BLE001 — report, don't mask
            fail(f"tests/{mod}.py fails to import: {type(e).__name__}: {e}")
    print("ok: all test modules import")

    print("PREFLIGHT OK — safe to snapshot")


if __name__ == "__main__":
    main()
