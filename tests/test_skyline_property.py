"""Property test for the segmented prefix-max skyline kernel: on random
(x, y) datasets — with deliberate duplicate keys and clustered values —
the kernel must return exactly the brute-force non-dominated set under
(minimize x, maximize y)."""

from __future__ import annotations

import random

from boltzmannclean_spark.operators.relational import skyline_frontier


def _brute_force(rows):
    def dominated(a):
        return any(
            b[1] <= a[1]
            and b[2] >= a[2]
            and (b[1] < a[1] or b[2] > a[2])
            for b in rows
        )

    return sorted(r for r in rows if not dominated(r))


def test_skyline_matches_brute_force(spark):
    rng = random.Random(20260813)
    for trial in range(5):
        n = rng.choice([1, 7, 60, 300])
        # Small value domains force duplicate x keys, duplicate (x, y)
        # pairs, and bucket-boundary values — the tie cases a naive
        # running-max formulation gets wrong.
        rows = [
            (
                i,
                float(rng.randrange(0, 500, 25)),
                rng.randrange(-5, 20),
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "id long, x double, y long")
        got = sorted(
            (r.id, r.x, r.y)
            for r in skyline_frontier(df, "x", "y", bucket_width=100.0).collect()
        )
        assert got == _brute_force(rows), f"trial {trial} (n={n})"
