"""One-command full-registry correctness sweep at a scaled replica
(r12 verdict #5 — generalizing the round-specific x30_assemble_r12.py
into a reusable, resumable tool).

What it does: for every registered query not yet recorded as passing,
run the Spark plan AND its DuckDB oracle twin at the replica directory
(default: the 18M-row ×30 verbatim replica built by
tools/scale_probe.py) and record the driver-schema result. Runs are
CHUNKED into subprocesses (tests/driver_replica.py --only ... --emit
per-chunk JSON) so a JVM death, an OOM-killed oracle, or a timeout
loses at most the in-flight query — driver_replica's incremental emit
keeps every completed entry in the chunk file. Re-invoking resumes:
recorded passes are skipped, recorded failures re-run (pass
--keep-failed to trust them).

Merge precedence (the r12 ADVICE medium finding, fixed by
construction): chunk files are merged in MTIME order and a later
chunk's entry unconditionally replaces an earlier one — a fresh rerun
that FAILS overwrites a stale pass, never the reverse. --emit refuses
to publish while any non-excluded entry fails or is missing.

Baked-in lessons from the r10-r12 sweeps (no flags needed):
- oracle spill/memory caps live in tests/oracle_utils.run_oracle
  (SPARK_GRAFT_ORACLE_SPILL / _MEM env to override for a deliberate
  solo heavy run);
- iterative graph oracles materialize their unrolled CTE levels
  (`AS MATERIALIZED` in the oracle SQL) — DuckDB's default inlining
  re-evaluated levels exponentially (the HyperBall lesson);
- inherent exclusions are carried explicitly with per-query reasons in
  the artifact's `_exclusions` key. After the r13 hot-block hardening
  the list is down to the two truly inherent entries.

Usage:
  python tools/x30_sweep.py [--sf-dir DIR] [--state DIR] [--chunk N]
                            [--only a,b,c] [--timeout SEC]
                            [--keep-failed] [--emit FILE] [--status]
Defaults: sf-dir /tmp/bcs_scale/x30, state /tmp/x30sweep_state,
chunk 8, timeout 2400s per chunk.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Inherent exclusions — each one hash-exact at sf0.01 AND ×10; the ×30
# reason is a property of the QUERY'S OUTPUT, not a plan weakness.
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
        "sf0.01 and x10. Pair-level variant only: the domain-sized "
        "companion sessions_overlap_profile IS swept at x30"
    ),
}


def _load_state(state_dir: str) -> dict[str, dict]:
    merged: dict[str, dict] = {}
    files = sorted(
        glob.glob(os.path.join(state_dir, "chunk_*.json")),
        key=lambda p: os.path.getmtime(p),
    )
    for path in files:
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue  # in-flight or truncated chunk; its queries re-run
        for k, v in data.items():
            if k.startswith("_"):
                continue
            merged[k] = v  # later mtime wins UNCONDITIONALLY
    return merged


def _passed(rec: dict) -> bool:
    return bool(rec.get("hash_match")) or rec.get("err") == "no_oracle"


def _summary(merged: dict, registry: set[str]) -> dict:
    known = {k: v for k, v in merged.items() if k in registry}
    fails = {
        k: (v.get("err") or "mismatch")[:120]
        for k, v in known.items()
        if not _passed(v)
    }
    missing = registry - set(known) - set(EXCLUSIONS)
    return {
        "entries": len(known),
        "hash_exact": sum(1 for v in known.values() if v.get("hash_match")),
        "rows_only": sum(
            1 for v in known.values() if v.get("err") == "no_oracle"
        ),
        "fails": fails,
        "missing": sorted(missing),
        "excluded": len(EXCLUSIONS),
    }


def main() -> int:
    argv = sys.argv[1:]

    def opt(name, default=None):
        if name in argv:
            i = argv.index(name)
            v = argv[i + 1]
            del argv[i : i + 2]
            return v
        return default

    sf_dir = opt("--sf-dir", "/tmp/bcs_scale/x30")
    state_dir = opt("--state", "/tmp/x30sweep_state")
    chunk_n = int(opt("--chunk", "8"))
    timeout = int(opt("--timeout", "2400"))
    only = opt("--only")
    shard = opt("--shard")  # "i/n": md5-partition the todo list so N
    # workers sharing one state dir sweep disjoint subsets in parallel
    emit = opt("--emit")
    keep_failed = "--keep-failed" in argv
    status_only = "--status" in argv

    import __spark_entry__ as m

    registry = set(m.queries())
    os.makedirs(state_dir, exist_ok=True)
    merged = _load_state(state_dir)
    s = _summary(merged, registry)

    if status_only:
        print(json.dumps(s, indent=2)[:4000])
        return 0

    todo = [
        q
        for q in sorted(registry)
        if q not in EXCLUSIONS
        and (
            q not in merged
            or (not _passed(merged[q]) and not keep_failed)
        )
    ]
    if only:
        want = set(only.split(","))
        todo = [q for q in todo if q in want]
    if shard:
        import hashlib

        i, n = (int(x) for x in shard.split("/"))
        todo = [
            q
            for q in todo
            if int(hashlib.md5(q.encode()).hexdigest(), 16) % n == i
        ]

    print(
        f"state: {s['entries']} recorded ({s['hash_exact']} hash-exact, "
        f"{s['rows_only']} rows-only, {len(s['fails'])} failed); "
        f"todo: {len(todo)} at {sf_dir}",
        flush=True,
    )

    env = dict(os.environ, SPARK_GRAFT_REPLICA_SF=sf_dir)
    # stamp + pid: parallel sharded workers launched in the same second
    # must never share a chunk filename (measured: two workers' chunk-0
    # files collided and the later writer erased the earlier's records —
    # self-healing via re-run, but wasteful).
    stamp = f"{int(time.time())}_{os.getpid()}"
    for ci in range(0, len(todo), chunk_n):
        names = todo[ci : ci + chunk_n]
        out = os.path.join(state_dir, f"chunk_{stamp}_{ci:04d}.json")
        cmd = [
            sys.executable,
            os.path.join(REPO, "tests", "driver_replica.py"),
            "--only",
            ",".join(names),
            "--emit",
            out,
        ]
        print(f"chunk {ci // chunk_n}: {names}", flush=True)
        try:
            subprocess.run(
                cmd, cwd=REPO, env=env, timeout=timeout,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
        except subprocess.TimeoutExpired:
            print(f"  chunk timed out after {timeout}s", flush=True)
        done = _load_state(state_dir)
        for n in names:
            rec = done.get(n)
            state = (
                "PASS" if rec and _passed(rec)
                else (rec.get("err") or "mismatch")[:80] if rec
                else "ABSENT"
            )
            print(f"  {n}: {state}", flush=True)

    # -- automated heavy-oracle spill retry (r13 verdict #6): a DuckDB
    # oracle that died on its spill/memory cap is re-run SOLO with the
    # documented override (SCALING.md r13 — the 31-token ×30 recall
    # eval needs ~55 GiB of temp), and the retry is annotated in the
    # record so the artifact shows which entries needed it. Patterns
    # are DuckDB's own ("Out of Memory Error", max_temp_directory_size,
    # OutOfMemoryException) — a JVM OutOfMemoryError is a Spark-side
    # problem a bigger oracle cap cannot fix, so it is not retried.
    import re as _re

    spill_re = _re.compile(
        r"Out of Memory Error|max_temp_directory_size|OutOfMemoryException"
    )
    retry_spill = os.environ.get("SPARK_GRAFT_SWEEP_RETRY_SPILL", "60GiB")
    retry_mem = os.environ.get("SPARK_GRAFT_SWEEP_RETRY_MEM", "60GiB")
    merged = _load_state(state_dir)
    retries = sorted(
        k
        for k, v in merged.items()
        if k in registry
        and k not in EXCLUSIONS
        and not _passed(v)
        and spill_re.search(v.get("err") or "")
    )
    for ri, name in enumerate(retries):
        out = os.path.join(state_dir, f"chunk_{stamp}_retry{ri:02d}.json")
        print(
            f"spill retry {name}: oracle cap -> {retry_spill} "
            f"(mem {retry_mem})",
            flush=True,
        )
        env2 = dict(
            env,
            SPARK_GRAFT_ORACLE_SPILL=retry_spill,
            SPARK_GRAFT_ORACLE_MEM=retry_mem,
        )
        cmd = [
            sys.executable,
            os.path.join(REPO, "tests", "driver_replica.py"),
            "--only", name, "--emit", out,
        ]
        rc = None
        tail = ""
        try:
            proc = subprocess.run(
                cmd, cwd=REPO, env=env2, timeout=timeout,
                stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
            )
            rc = proc.returncode
            tail = (proc.stderr or b"").decode(errors="replace")[-2000:]
        except subprocess.TimeoutExpired:
            print(f"  retry timed out after {timeout}s", flush=True)
        data = {}
        if os.path.exists(out):
            try:
                with open(out) as fh:
                    data = json.load(fh)
            except json.JSONDecodeError:
                data = {}
        if name not in data:
            # A retry that died before emitting used to leave the stale
            # failure in state with no diagnostic (r14 ADVICE): surface
            # the return code and the stderr tail.
            print(
                f"  retry for {name} produced no record (rc={rc});"
                f" stderr tail:\n{tail[-800:]}",
                flush=True,
            )
        if os.path.exists(out):
            if name in data:
                data[name]["spill_retry"] = {
                    "spill": retry_spill, "mem": retry_mem,
                }
                with open(out + ".part", "w") as fh:
                    json.dump(data, fh, indent=2)
                os.replace(out + ".part", out)
                rec = data[name]
                print(
                    f"  {name}: "
                    f"{'PASS' if _passed(rec) else (rec.get('err') or 'mismatch')[:80]}"
                    " (spill_retry annotated)",
                    flush=True,
                )

    merged = _load_state(state_dir)
    s = _summary(merged, registry)
    print(json.dumps({k: v for k, v in s.items() if k != "fails"}))
    if s["fails"]:
        print("FAILS:", json.dumps(s["fails"], indent=2)[:4000])

    if emit:
        if s["fails"] or s["missing"]:
            print("refusing to emit with fails/missing")
            return 1
        out = dict(
            sorted((k, v) for k, v in merged.items() if k in registry)
        )
        out["_exclusions"] = EXCLUSIONS
        out["_sf_dir"] = sf_dir
        with open(emit + ".part", "w") as fh:
            json.dump(out, fh, indent=2)
        os.replace(emit + ".part", emit)
        print(f"wrote {emit}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
