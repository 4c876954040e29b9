"""Fresh-process replica of the driver's verify: run `entry()` at
sf0.001, then every `queries()` entry at sf0.01 against its
`oracle_sql()` twin (row count + sorted columns + order-insensitive
value canon, floats bit-exact via float.hex, pandas-sort strictness
identical to the driver's canonicalizer).

Usage: python tests/driver_replica.py [--only name1,name2]
Exit code 0 iff every query passes (rows-only entries must run and
canonicalize).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as m  # noqa: E402
from boltzmannclean_spark.session import get_spark  # noqa: E402

sys.path.insert(0, "/root/repo/tests")
from oracle_utils import assert_matches_oracle, driver_sort_canon  # noqa: E402

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def main() -> int:
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    spark = get_spark("driver-replica")
    n = len(m.entry(spark).collect())
    print(f"entry(): {n} rows", flush=True)
    assert n > 0

    queries = m.queries()
    oracles = m.oracle_sql()
    failures: dict[str, str] = {}
    t_all = time.time()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF01)
            if name in oracles:
                assert_matches_oracle(df, oracles[name], SF01, name=name)
                status = "oracle-ok"
            else:
                pdf = df.toPandas()
                driver_sort_canon(pdf, name=name)
                status = f"rows-only({len(pdf)})"
        except Exception as e:  # noqa: BLE001
            failures[name] = f"{type(e).__name__}: {e}"[:500]
            status = "FAIL"
        print(f"  {name}: {status} ({time.time() - t0:.1f}s)", flush=True)
    print(f"total {time.time() - t_all:.0f}s, {len(failures)} failures", flush=True)
    if failures:
        print(json.dumps(failures, indent=2)[:4000])
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
