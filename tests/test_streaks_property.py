"""Property test: events_gaps_islands_streaks agrees with a brute-force
single-pass scan. The operator derives islands from a row_number
difference; the oracle here is the obvious O(N) Python loop over the
same deterministic (ts, event_id) order — an independent formulation,
not a SQL re-derivation, so a subtle off-by-one in the island key
cannot hide in both sides.
"""

from __future__ import annotations

from collections import defaultdict

import duckdb

from boltzmannclean_spark.plans.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _brute_force() -> dict[str, tuple[int, int, int]]:
    rows = duckdb.sql(
        f"""
        SELECT user_id, event_type
        FROM '{SF_DIR}/events.parquet'
        ORDER BY user_id, epoch_us(ts), event_id
        """
    ).fetchall()
    runs = defaultdict(list)  # event_type -> [run lengths]
    prev_user, prev_type, length = None, None, 0
    for user, etype in rows:
        if user == prev_user and etype == prev_type:
            length += 1
        else:
            if prev_type is not None:
                runs[prev_type].append(length)
            prev_user, prev_type, length = user, etype, 1
    if prev_type is not None:
        runs[prev_type].append(length)
    return {
        t: (max(ls), sum(1 for x in ls if x >= 3), len(ls))
        for t, ls in runs.items()
    }


def test_streaks_match_brute_force(spark):
    got = {
        r["event_type"]: (r["max_streak"], r["n_streaks_ge3"], r["n_islands"])
        for r in all_queries()["events_gaps_islands_streaks"]
        .spark_fn(spark, SF_DIR)
        .collect()
    }
    assert got == _brute_force()
