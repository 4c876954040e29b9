"""The external harness hands queries ITS OWN SparkSession, whose
session timezone we don't control. Every timestamp-sensitive construct
in the engine (timestamp literals, unix_micros, the NTZ→LTZ events
cast) is session-tz-dependent, so `load_table` pins the session to UTC
defensively on every call. This test simulates a hostile harness: a
session whose timezone is America/New_York must still produce
oracle-identical results for timestamp-heavy queries.
"""

from __future__ import annotations

import pytest

from boltzmannclean_spark.plans.registry import all_queries

from .oracle_utils import assert_matches_oracle

# Timestamp-heavy representatives: events scan+convert, hour buckets,
# window over event time, lineitem date filter.
TZ_SENSITIVE = [
    "ts_ohlc_bars",
    "ts_time_weighted_avg",
    "events_sessionize",
    "pricing_summary",
]


@pytest.mark.parametrize("name", TZ_SENSITIVE)
def test_non_utc_harness_session_matches_oracle(spark, sf_dir, name):
    q = all_queries()[name]
    assert q.oracle is not None
    # newSession(): same JVM/SparkContext, independent SQLConf — the
    # closest local stand-in for "a session someone else configured".
    hostile = spark.newSession()
    hostile.conf.set("spark.sql.session.timeZone", "America/New_York")
    df = q.spark_fn(hostile, sf_dir)
    assert_matches_oracle(df, q.oracle, sf_dir, name=f"{name}[NY-session]")
    # load_table must have re-pinned THIS session to UTC.
    assert hostile.conf.get("spark.sql.session.timeZone") == "UTC"
