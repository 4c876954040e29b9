"""Fresh-process replica of the driver's verify: run `entry()` at
sf0.001, then every `queries()` entry at sf0.01 against its
`oracle_sql()` twin (row count + sorted columns + order-insensitive
value canon, floats bit-exact via float.hex, pandas-sort strictness
identical to the driver's canonicalizer).

Usage: python tests/driver_replica.py [--only name1,name2] [--emit FILE]

`--emit FILE` writes a full-registry correctness artifact in the
driver's own CORRECTNESS_r{N}.json schema (per query: rows_match /
schema_match / hash_match / spark_rows / oracle_rows / err; rows-only
entries get nulls + err="no_oracle") — the round-6 verdict's item 3:
the driver samples ~50 queries/round, this artifact documents all of
them. Exit code 0 iff every query passes (rows-only entries must run
and canonicalize).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as m  # noqa: E402
from boltzmannclean_spark.session import get_spark  # noqa: E402

sys.path.insert(0, "/root/repo/tests")
from oracle_utils import (  # noqa: E402
    assert_path_free,
    canonical_rows,
    driver_sort_canon,
    run_oracle,
)

SF001 = "/root/testdata/sf0.001"
# SPARK_GRAFT_REPLICA_SF overrides the per-query dir: pointing it at a
# scaled replica (tools/scale_probe.py output) runs the ENTIRE oracle
# suite at that scale — Spark and DuckDB both read the same parquet, so
# the hash comparison is as strict at 6M rows as at 60k (round 8).
import os  # noqa: E402

SF01 = os.environ.get("SPARK_GRAFT_REPLICA_SF", "/root/testdata/sf0.01")

import re  # noqa: E402

#: The canonical artifact names the repo's contract test
#: (tests/test_driver_robustness.py) checks for full-registry coverage:
#: the frozen per-round artifacts AND the in-round running file
#: (r13 verdict #2 — LOCAL_CORRECTNESS_r{N}.json freezes at round-N
#: close; mid-round coverage accumulates in LOCAL_CORRECTNESS_WIP.json,
#: which gets the same no-truncate merge guard).
CANONICAL_RE = re.compile(r"^LOCAL_CORRECTNESS_(r\d+|WIP)\.json$")


def safe_emit(
    emit: str, results: dict, registry: set[str], quiet: bool = False
) -> str:
    """Write a correctness artifact without ever letting a SUBSET of
    the registry clobber a canonical LOCAL_CORRECTNESS_r{N}.json.

    Round-8 failure mode (verdict "What's wrong #1"): a 5-query re-emit
    overwrote the committed 328-entry artifact, breaking the repo's own
    contract test. Rules, in order:

    1. Non-canonical filename → write as-is (scratch/X10 artifacts keep
       the old incremental behavior).
    2. Canonical + full key-set → write.
    3. Canonical + subset, but an existing artifact at that path can be
       MERGED (existing ∪ results covers the registry exactly) → merge
       and write; subset re-emits after touching a few operators now
       UPDATE the canonical artifact instead of truncating it.
    4. Otherwise → divert to `<emit>.subset.json` and say so.

    Returns the path actually written.
    """
    keys = set(results)
    if not CANONICAL_RE.match(os.path.basename(emit)) or keys == registry:
        out, payload = emit, results
    else:
        merged = None
        if os.path.exists(emit):
            with open(emit) as fh:
                prior = json.load(fh)
            cand = {**prior, **results}
            if set(cand) == registry:
                merged = cand
        if merged is not None:
            out, payload = emit, merged
        else:
            out = emit + ".subset.json"
            payload = results
            if not quiet:
                print(
                    f"refusing to clobber canonical {emit} with "
                    f"{len(results)}/{len(registry)} entries; wrote {out}",
                    flush=True,
                )
    with open(out + ".part", "w") as fh:
        json.dump(payload, fh, indent=2)
    os.replace(out + ".part", out)
    return out


def compare_to_oracle(df, sql: str, sf_dir: str, name: str) -> dict:
    """Driver-schema comparison record for one oracled query."""
    sp = df.toPandas()
    assert_path_free(sp, name, sf_dir)
    du = run_oracle(sql, sf_dir)
    schema_match = sorted(sp.columns) == sorted(du.columns)
    rows_match = len(sp) == len(du)
    hash_match = bool(
        schema_match
        and rows_match
        and canonical_rows(sp, name=name) == canonical_rows(du, name=name)
    )
    ok = rows_match and schema_match and hash_match
    return {
        "rows_match": rows_match,
        "schema_match": schema_match,
        "hash_match": hash_match,
        "spark_rows": len(sp),
        "oracle_rows": len(du),
        "err": None if ok else "mismatch",
    }


def main() -> int:
    only = None
    emit = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    if "--emit" in sys.argv:
        emit = sys.argv[sys.argv.index("--emit") + 1]
    spark = get_spark("driver-replica")
    n = len(m.entry(spark).collect())
    print(f"entry(): {n} rows", flush=True)
    assert n > 0

    queries = m.queries()
    oracles = m.oracle_sql()
    results: dict[str, dict] = {}
    failures: dict[str, str] = {}
    t_all = time.time()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF01)
            if name in oracles:
                rec = compare_to_oracle(df, oracles[name], SF01, name=name)
                if rec["err"]:
                    failures[name] = "oracle mismatch"
                    status = "FAIL(mismatch)"
                else:
                    status = "oracle-ok"
            else:
                pdf = df.toPandas()
                driver_sort_canon(pdf, name=name)
                rec = {
                    "rows_match": None,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": len(pdf),
                    "oracle_rows": None,
                    "err": "no_oracle",
                }
                status = f"rows-only({len(pdf)})"
        except Exception as e:  # noqa: BLE001
            msg = f"{type(e).__name__}: {e}"[:500]
            failures[name] = msg
            rec = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": msg,
            }
            status = "FAIL"
        results[name] = rec
        print(f"  {name}: {status} ({time.time() - t0:.1f}s)", flush=True)
        if emit:
            # incremental emit: a killed/timed-out run (long at-scale
            # sweeps are chunked under `timeout`) keeps every completed
            # query's record instead of losing the whole chunk.
            # Canonical LOCAL_CORRECTNESS_r{N}.json targets are guarded
            # (safe_emit): an in-progress subset lands on a scratch name
            # or merges into the existing full artifact — never
            # truncates. quiet=True: the divert warning would repeat
            # per query on a fresh canonical target; the final emit
            # below reports the outcome once.
            safe_emit(emit, results, set(queries), quiet=True)
    print(f"total {time.time() - t_all:.0f}s, {len(failures)} failures", flush=True)
    if emit:
        out = safe_emit(emit, results, set(queries))
        if out == emit:
            scratch = emit + ".subset.json"
            if os.path.exists(scratch):
                # incremental emits diverted here before the final full
                # write landed the canonical artifact; don't leave the
                # stale scratch beside it.
                os.remove(scratch)
        with open(out) as fh:
            n_written = len(json.load(fh))
        print(f"wrote {out} ({n_written} entries)", flush=True)
    if failures:
        print(json.dumps(failures, indent=2)[:4000])
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
