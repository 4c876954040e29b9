"""One-command re-verify of the driver's sampled correctness surface
(r11 verdict #6).

The driver samples ~50 queries per round into CORRECTNESS_r{N}.json;
between rounds, retrains (ANN codebooks) or refactors can silently
move exactly the queries the NEXT sample will hit. This tool re-runs,
in a fresh process via tests/driver_replica.py:

- every query named in the newest CORRECTNESS_r*.json in the repo
  root (the driver's own latest sample), plus
- every registered query that has NO oracle twin (the rows-only legs
  whose only gate is that they run and canonicalize), plus
- anything passed via --also a,b,c (e.g. ops touched this session).

Exit 0 iff all pass. Minutes, not hours — run it after any retrain
or cross-cutting refactor, and at round close before the driver's
own verify.

Usage: python tools/resample_check.py [--also name1,name2]
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_driver_sample() -> tuple[str, set[str]]:
    rounds = []
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(p))
        if m:
            rounds.append((int(m.group(1)), p))
    if not rounds:
        return "", set()
    _, path = max(rounds)
    with open(path) as fh:
        data = json.load(fh)
    # driver schema: {"queries": {name: rec}} or flat {name: rec}
    queries = data.get("queries", data)
    return path, {k for k in queries if not k.startswith("_")}


def rows_only_registry() -> set[str]:
    import __spark_entry__ as m

    return set(m.queries()) - set(m.oracle_sql())


def main() -> int:
    also: set[str] = set()
    if "--also" in sys.argv:
        also = set(sys.argv[sys.argv.index("--also") + 1].split(","))
    path, sample = latest_driver_sample()
    rows_only = rows_only_registry()
    import __spark_entry__ as m

    registry = set(m.queries())
    stale = (sample | also) - registry
    if stale:
        print(f"note: skipping {sorted(stale)} (no longer registered)")
    names = sorted(((sample | also) & registry) | rows_only)
    print(
        f"re-verifying {len(names)} queries "
        f"({len(sample & registry)} from {os.path.basename(path) or 'n/a'}, "
        f"{len(rows_only)} rows-only legs, {len(also & registry)} --also)"
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tests", "driver_replica.py"),
            "--only",
            ",".join(names),
        ],
        cwd=REPO,
    )
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
