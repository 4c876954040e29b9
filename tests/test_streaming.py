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
