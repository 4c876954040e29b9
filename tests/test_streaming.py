"""Streaming operator tests: stream-batch parity against the DuckDB
oracle, multi-micro-batch incremental replay, and real watermark
late-data semantics."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from boltzmannclean_spark.plans.registry import all_queries
from boltzmannclean_spark.sources.catalog import normalize_events_ts
from boltzmannclean_spark.streaming.core import run_to_memory

from .oracle_utils import assert_matches_oracle

STREAM_QUERIES = [
    "stream_window_tumbling",
    "stream_window_sliding",
    "stream_session_window",
    "stream_dedup_watermark",
    "stream_static_join",
    "stream_stateful_user_totals",
    # r11 session 2: the multi-epoch SRM monitor hash-matches the
    # SHARED stats_srm_check oracle (same reduction tree over the
    # accumulated assignment log).
    "stream_srm_monitor",
]


@pytest.mark.parametrize("name", STREAM_QUERIES)
def test_stream_oracle_parity(spark, sf_dir, name):
    q = all_queries()[name]
    assert q.oracle is not None
    assert_matches_oracle(q.spark_fn(spark, sf_dir), q.oracle, sf_dir, name)


def _write_event_files(spark, sf_dir, tmp_path, n_files=3):
    """Split events into time-ordered parquet files with increasing
    mtimes so the file source replays them as separate micro-batches."""
    pdf = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .orderBy("ts")
        .toPandas()
    )
    chunk = (len(pdf) + n_files - 1) // n_files
    base = tmp_path / "events_stream"
    base.mkdir()
    for i in range(n_files):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        f = base / f"part-{i:03d}.parquet"
        part.to_parquet(f, index=False)
        os.utime(f, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return str(base)


def _stream_events(spark, path, max_files=1):
    # Probe the footer with a batch read so the stream schema tracks
    # whichever ts layout (long-ns vs timestamp[us]) the fixture has.
    schema = spark.read.parquet(path).schema
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .option("latestFirst", "false")
        .parquet(path)
    )
    return normalize_events_ts(df)


def test_multibatch_incremental_matches_batch(spark, sf_dir, tmp_path):
    """Tumbling-window agg replayed one file per micro-batch (complete
    mode) must equal the single-shot batch aggregation."""
    path = _write_event_files(spark, sf_dir, tmp_path)
    agg = (
        _stream_events(spark, path)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros("window.start").alias("ws_us"), "n_events"
        )
    )
    got = {
        r.ws_us: r.n_events for r in run_to_memory(agg).collect()
    }
    batch = (
        normalize_events_ts(spark.read.parquet(path))
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.unix_micros("window.start").alias("ws_us"), "n_events")
    )
    want = {r.ws_us: r.n_events for r in batch.collect()}
    assert got == want


def test_stream_ohlc_matches_batch_rollup(spark, sf_dir):
    """Stream-batch parity for the OHLC candle rollup (r5 verdict item
    7): the watermarked streaming aggregation (min_by/max_by pick keys)
    must produce row-for-row the same candles as the batch hypertable
    rollup ts_ohlc_bars (window-function formulation) over the same
    events — two independent formulations of one contract."""
    qs = all_queries()
    stream_rows = sorted(
        tuple(r) for r in qs["stream_ohlc_hourly"].spark_fn(spark, sf_dir).collect()
    )
    batch_rows = sorted(
        tuple(r) for r in qs["ts_ohlc_bars"].spark_fn(spark, sf_dir).collect()
    )
    assert stream_rows == batch_rows


def test_python_datasource_replay_matches_batch(spark, sf_dir):
    """Replay parity for the custom Python streaming source: draining
    the tick stream micro-batch by micro-batch (offset bookkeeping via
    JSON cursors) must equal the closed-form batch computation of the
    same per-device aggregate in Spark itself (r5 verdict item 7 — the
    DuckDB oracle checks values; this pins the STREAMING result to the
    batch engine's semantics too)."""
    qs = all_queries()
    got = sorted(
        tuple(r)
        for r in qs["stream_python_datasource"].spark_fn(spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r)
        for r in (
            spark.range(0, 5000)
            .select(
                (F.col("id") % 4).alias("device"),
                ((F.col("id") * F.col("id")) % 1000).alias("cents"),
            )
            .groupBy("device")
            .agg(
                F.count(F.lit(1)).alias("n_ticks"),
                F.sum("cents").cast("long").alias("sum_cents"),
            )
        ).collect()
    )
    assert got == want


def test_watermark_drops_late_data(spark, tmp_path):
    """Append mode + watermark: a window is finalized once the watermark
    passes its end; late rows for it are dropped from the result."""
    import pandas as pd

    base = tmp_path / "late_events"
    base.mkdir()
    t0 = pd.Timestamp("2024-01-01 00:00:00")

    def mk(path, rows, mtime):
        pdf = pd.DataFrame(
            {
                "event_id": range(len(rows)),
                # int64 ns-since-epoch — exercises the legacy long-ns
                # branch of normalize_events_ts
                "ts": [int(pd.Timestamp(t).value) for t in rows],
                "user_id": [1] * len(rows),
                "event_type": ["click"] * len(rows),
                "value": [1.0] * len(rows),
                "props": ["{}"] * len(rows),
            }
        )
        pdf.to_parquet(path, index=False)
        os.utime(path, (mtime, mtime))

    # batch 1: three on-time events in window [00:00, 01:00)
    mk(base / "b1.parquet", [t0, t0 + pd.Timedelta("10min"), t0 + pd.Timedelta("20min")], 1_700_000_000)
    # batch 2: an event at 03:00 pushes the watermark to 02:00 at batch
    # end (watermarks advance between micro-batches)
    mk(base / "b2.parquet", [t0 + pd.Timedelta("3h")], 1_700_000_060)
    # batch 3: runs WITH watermark 02:00 — the first window (end 01:00)
    # is finalized: emitted and its state evicted. NB dropping late rows
    # is only guaranteed after eviction (Spark's watermark contract is
    # one-sided); a late row arriving in THIS batch could still merge.
    mk(base / "b3.parquet", [t0 + pd.Timedelta("3h10min")], 1_700_000_120)
    # batch 4: a LATE event back at 00:30 — state gone, row dropped
    mk(base / "b4.parquet", [t0 + pd.Timedelta("30min")], 1_700_000_180)

    agg = (
        _stream_events(spark, str(base))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.unix_micros("window.start").alias("ws_us"), "n_events")
    )
    rows = {
        r.ws_us: r.n_events
        for r in run_to_memory(agg, output_mode="append").collect()
    }
    first_window_us = int(t0.value // 1000)
    # finalized with the 3 on-time events; the late 4th never counted
    assert rows.get(first_window_us) == 3
    # the 03:00 window was never finalized (nothing advanced the
    # watermark past its end), so append mode hasn't emitted it
    assert len(rows) == 1


def test_out_of_order_replay_within_watermark_matches_batch(
    spark, tmp_path
):
    """ADVERSARIAL out-of-order replay (r12 verdict #7): the fixture
    file-splits are time-ordered, so they never exercise the watermark
    path's real job — merging WITHIN-WATERMARK disorder. Here events
    arrive shuffled: each micro-batch interleaves the current hour
    with stragglers from the previous hour (late by up to ~55 min
    against a 1-hour watermark, so every row must MERGE, none may
    drop), per-batch delivery order is scrambled, and two users'
    streams are interleaved. The finalized append-mode windows must
    equal the batch groupBy over the same rows exactly — count AND
    exact-decimal sum — for every window the final watermark passed."""
    import pandas as pd

    base = tmp_path / "ooo_events"
    base.mkdir()
    t0 = pd.Timestamp("2024-01-01 00:00:00")

    # 6 hours x 2 users x 6 events/hour, deterministic pseudo-random
    # minute offsets and values.
    events = []  # (event_id, ts, user_id, value)
    eid = 0
    for h in range(6):
        for u in (1, 2):
            for j in range(6):
                minute = (7 * eid + 11 * j) % 60
                ts = t0 + pd.Timedelta(hours=h, minutes=minute)
                events.append((eid, ts, u, float((eid % 13) + 0.25)))
                eid += 1

    # Delivery schedule: batch k carries hour k's events PLUS half of
    # hour k-1's (the stragglers), internally scrambled. Max lateness
    # ≈ 55 min < the 1-hour watermark ⇒ zero legal drops.
    by_hour: dict[int, list] = {}
    for e in events:
        by_hour.setdefault((e[1] - t0).total_seconds() // 3600, []).append(e)
    batches = []
    carry: list = []
    for h in range(6):
        cur = by_hour[h]
        fresh, stragglers = cur[::2], cur[1::2]
        batch = carry + fresh
        # scramble delivery order inside the batch (deterministic)
        batch.sort(key=lambda e: (e[0] * 2654435761) % 97)
        batches.append(batch)
        carry = stragglers
    batches.append(carry)  # final stragglers of hour 5

    for i, batch in enumerate(batches):
        pdf = pd.DataFrame(
            {
                "event_id": [e[0] for e in batch],
                "ts": [int(e[1].value) for e in batch],
                "user_id": [e[2] for e in batch],
                "event_type": ["click"] * len(batch),
                "value": [e[3] for e in batch],
                "props": ["{}"] * len(batch),
            }
        )
        f = base / f"b{i:02d}.parquet"
        pdf.to_parquet(f, index=False)
        os.utime(f, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    agg = (
        _stream_events(spark, str(base))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_micros("window.start").alias("ws_us"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
    got = {
        (r.ws_us, r.user_id): (r.n_events, r.sum_value)
        for r in run_to_memory(agg, output_mode="append").collect()
    }

    # Batch reference over the same rows, restricted to windows the
    # final watermark finalized. Final max event ts = hour 5 + 55min;
    # watermark = that - 1h ≥ 04:55 ⇒ windows 0..3 are finalized for
    # sure; window 4 (end 05:00) only if the watermark passed 05:00,
    # which it did not. Assert exactly windows 0..3.
    want = {}
    for e in events:
        h = int((e[1] - t0).total_seconds() // 3600)
        if h <= 3:
            key = (int((t0 + pd.Timedelta(hours=h)).value // 1000), e[2])
            n, s = want.get(key, (0, 0.0))
            want[key] = (n + 1, s + e[3])
    want = {k: (n, round(s, 2)) for k, (n, s) in want.items()}
    got_rounded = {k: (n, round(s, 2)) for k, (n, s) in got.items()}
    assert got_rounded == want, (
        f"missing={sorted(set(want) - set(got))[:4]} "
        f"extra={sorted(set(got) - set(want))[:4]}"
    )


def test_stream_heavy_hitters_rejects_negative_epoch(spark, tmp_path):
    """r13 ADVICE regression: window('ts','1 hour') FLOOR-aligns hour
    buckets while the shared oracle trunc-divides, so the streaming
    heavy-hitters twin must REFUSE pre-1970 data instead of silently
    bucketing it one hour off the oracle (the batch twin's sdiv path
    is signed-exact and stays available)."""
    import pandas as pd

    base = tmp_path / "neg_events"
    base.mkdir()
    # one pre-1970 event (1969-12-31 23:30 → hr = -1 after floor
    # window alignment) among on-time 2024 events — int64 ns layout
    # exercises the legacy long-ns branch of normalize_events_ts.
    stamps = [
        pd.Timestamp("1969-12-31 23:30:00"),
        pd.Timestamp("2024-01-01 00:10:00"),
        pd.Timestamp("2024-01-01 00:20:00"),
    ]
    pdf = pd.DataFrame(
        {
            "event_id": range(len(stamps)),
            "ts": [int(t.value) for t in stamps],
            "user_id": [1] * len(stamps),
            "event_type": ["click"] * len(stamps),
            "value": [1.0] * len(stamps),
            "props": ["{}"] * len(stamps),
        }
    )
    pdf.to_parquet(base / "events.parquet", index=False)
    fn = all_queries()["stream_heavy_hitters_monitor"].spark_fn
    with pytest.raises(ValueError, match="non-negative event timestamps"):
        fn(spark, str(base))


def test_stream_heavy_hitters_append_mode_evicts_state(spark, tmp_path):
    """r13 verdict #3: the monitor's 'state bounded by the watermark
    horizon' claim, MEASURED in append mode. Ten hourly files replay
    as ten micro-batches through the monitor's exact aggregation
    (watermark 1h, groupBy(window, user) count) in APPEND mode with
    N_USERS=30 distinct users per hour. Pins both properties:

    1. finalized-hour sketches match batch — the append-emitted
       (hr, user, cnt) rows equal the batch groupBy for every
       finalized hour, and feeding them through the shared
       heavy_hitters_readout equals the readout over batch counts
       restricted to the same hours;
    2. state is bounded by the watermark horizon, not corpus hours —
       the state store row count (streaming progress metrics) never
       approaches N_HOURS x N_USERS and rows are actually REMOVED as
       hours finalize."""
    import pandas as pd

    from boltzmannclean_spark.operators.windows import (
        heavy_hitters_readout,
    )

    base = tmp_path / "hh_events"
    base.mkdir()
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    N_HOURS, N_USERS = 10, 30
    events = []  # (event_id, ts, user_id)
    eid = 0
    for h in range(N_HOURS):
        for u in range(1, N_USERS + 1):
            # varying per-(hour,user) counts so ranks differ per hour
            # and the K=20 sketch truncation has real work
            for j in range(1 + (u * (h + 1)) % 5):
                minute = (13 * eid + 7 * j) % 56  # max :55
                events.append((eid, t0 + pd.Timedelta(hours=h, minutes=minute), u))
                eid += 1
    by_hour: dict[int, list] = {}
    for e in events:
        by_hour.setdefault(int((e[1] - t0).total_seconds() // 3600), []).append(e)
    for h in range(N_HOURS):
        batch = by_hour[h]
        pdf = pd.DataFrame(
            {
                "event_id": [e[0] for e in batch],
                "ts": [int(e[1].value) for e in batch],
                "user_id": [e[2] for e in batch],
                "event_type": ["click"] * len(batch),
                "value": [1.0] * len(batch),
                "props": ["{}"] * len(batch),
            }
        )
        f = base / f"b{h:02d}.parquet"
        pdf.to_parquet(f, index=False)
        os.utime(f, (1_700_000_000 + h * 60, 1_700_000_000 + h * 60))
    # 11th file: one hour-9 tail event (09:59). Its batch runs with the
    # watermark already at 08:55, so hour 7 (window end 08:00) is
    # finalized during a DATA batch — the assertion doesn't depend on
    # Spark's no-data-batch timing vs processAllAvailable. Hour 9 is
    # never finalized (final watermark 08:59 < 09:00), so this event
    # never reaches the emitted rows.
    tail = pd.DataFrame(
        {
            "event_id": [eid],
            "ts": [int((t0 + pd.Timedelta(hours=9, minutes=59)).value)],
            "user_id": [1],
            "event_type": ["click"],
            "value": [1.0],
            "props": ["{}"],
        }
    )
    f = base / "b10.parquet"
    tail.to_parquet(f, index=False)
    os.utime(f, (1_700_000_000 + 10 * 60, 1_700_000_000 + 10 * 60))

    micros_per_hour = 3_600_000_000
    agg = (
        _stream_events(spark, str(base))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            F.expr(f"unix_micros(window.start) div {micros_per_hour}")
            .alias("hr"),
            "user_id",
            "cnt",
        )
    )
    sink = "hh_append_evict_sink"
    query = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    try:
        query.processAllAvailable()
        progresses = list(query.recentProgress)
    finally:
        query.stop()
    got = {
        (r.hr, r.user_id): r.cnt for r in spark.table(sink).collect()
    }

    # -- property 1: finalized hours exactly match batch. Final max
    # event ts = 09:55, watermark = 08:55 ⇒ windows ending ≤ 08:55,
    # i.e. hours 0..7, are finalized; hour 8 (end 09:00) is not.
    want = {}
    for e in events:
        h = int((e[1] - t0).total_seconds() // 3600)
        if h <= 7:
            k = (h + int(t0.value // 1000) // micros_per_hour, e[2])
            want[k] = want.get(k, 0) + 1
    assert got == want
    finalized_hours = sorted({hr for hr, _ in got})
    assert len(finalized_hours) == 8

    # readout parity over the finalized counts (the shared sketch
    # reduction both twins use)
    stream_counts = spark.createDataFrame(
        [(hr, u, c) for (hr, u), c in got.items()],
        "hr long, user_id long, cnt long",
    )
    batch_counts = spark.createDataFrame(
        [(hr, u, c) for (hr, u), c in want.items()],
        "hr long, user_id long, cnt long",
    )
    s_rows = sorted(tuple(r) for r in heavy_hitters_readout(stream_counts).collect())
    b_rows = sorted(tuple(r) for r in heavy_hitters_readout(batch_counts).collect())
    assert s_rows == b_rows and len(s_rows) > 0

    # -- property 2: state bounded by the watermark horizon. Without
    # eviction the agg state would accumulate to N_HOURS×N_USERS=300
    # rows; the watermark keeps only ~2-3 active hours' windows live.
    state_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in progresses
        if p.get("stateOperators")
    ]
    removed = sum(
        p["stateOperators"][0].get("numRowsRemoved", 0) or 0
        for p in progresses
        if p.get("stateOperators")
    )
    assert state_rows, "no stateOperators metrics captured"
    assert max(state_rows) <= 4 * N_USERS, (
        f"state not bounded: max {max(state_rows)} rows vs horizon "
        f"bound {4 * N_USERS} (no-eviction would be {N_HOURS * N_USERS})"
    )
    assert max(state_rows) < N_HOURS * N_USERS
    assert removed >= 7 * N_USERS, (
        f"expected ≥{7 * N_USERS} evicted sketch rows (7 finalized "
        f"hours × {N_USERS} users), saw {removed}"
    )
