"""Property-based check of gap-based sessionization: for random event
streams, the lag+cumsum island build must produce sessions that (a)
partition each user's events exactly, (b) never contain an internal gap
> the threshold, and (c) are separated by gaps > the threshold — the
definition of a session, checked against inputs with ties, bursts, and
singleton users that fixture data rarely hits."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

GAP = 5  # µs-scale toy gap; the algorithm only compares differences

USERS = st.integers(min_value=0, max_value=2)
TS = st.integers(min_value=0, max_value=40)
rows = st.lists(st.tuples(USERS, TS), min_size=1, max_size=20)


def sessionize(spark, data):
    df = spark.createDataFrame(
        [(u, t, i) for i, (u, t) in enumerate(data)], "user LONG, t LONG, eid LONG"
    )
    w = Window.partitionBy("user").orderBy("t", "eid")
    flagged = df.withColumn(
        "new_sess", F.when(F.col("t") - F.lag("t").over(w) > GAP, 1).otherwise(0)
    )
    return flagged.withColumn(
        "sid",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).collect()


def brute_sessions(data):
    """user -> list of sorted event-time lists, split on gap > GAP."""
    out = {}
    by_user = {}
    for u, t in data:
        by_user.setdefault(u, []).append(t)
    for u, ts in by_user.items():
        ts.sort()
        sessions = [[ts[0]]]
        for prev, cur in zip(ts, ts[1:]):
            if cur - prev > GAP:
                sessions.append([])
            sessions[-1].append(cur)
        out[u] = sessions
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows)
def test_sessionize_matches_definition(spark, data):
    got = sessionize(spark, data)
    expected = brute_sessions(data)
    # group observed rows by (user, sid) -> sorted times
    sessions = {}
    for r in got:
        sessions.setdefault((r.user, r.sid), []).append(r.t)
    for k in sessions:
        sessions[k].sort()
    for (u, sid), ts in sessions.items():
        assert ts in expected[u], (u, sid, ts, expected[u])
    # exact partition: every event accounted for, session counts agree
    assert sum(len(v) for v in sessions.values()) == len(data)
    for u, sess_list in expected.items():
        got_count = len({k for k in sessions if k[0] == u})
        assert got_count == len(sess_list), (u, sessions, sess_list)
