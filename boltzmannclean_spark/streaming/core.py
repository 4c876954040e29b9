"""Structured Streaming harness over the ``events`` table.

The driver's correctness gate compares batch DataFrames, so every
streaming operator here runs as a REAL streaming query (file source →
transformations → memory sink), is drained with ``processAllAvailable``,
and returns the sink's contents as a batch DataFrame. That makes
stream-batch parity the oracle: the DuckDB SQL twin is the batch
equivalent over the same parquet.

Scale notes: the file source is the local stand-in for Kafka — the plan
(watermark → stateful op → sink) is identical; only the source/sink
lines change on a cluster. State is partitioned by grouping key across
executors by the shuffle before each stateful operator, so state size
scales horizontally; watermarks bound it in time.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import normalize_events_ts

_sink_ids = itertools.count()


def events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of events with a proper µs event-time column."""
    # The file source wants a directory; pathGlobFilter narrows the scan
    # to the events file (in production this is a Kafka topic / a
    # date-partitioned landing directory).
    # Same defensive confs as sources/catalog.load_table: older testdata
    # carries ts as TIMESTAMP(NANOS), readable only with nanosAsLong on,
    # and the determinism contract assumes a UTC session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # readStream needs a static schema; probe the parquet footer with a
    # batch read (driver-side metadata only) so the stream schema tracks
    # whichever ts layout (long-ns vs timestamp[us]) the testdata has.
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    reader = spark.readStream.schema(batch_schema)
    if os.path.isdir(f"{sf_dir}/events.parquet"):
        # Spark-written table directory (scaled replicas, sink outputs):
        # stream the part files inside it directly — pathGlobFilter
        # matches FILE names, so filtering the parent dir for
        # "events.parquet" would match nothing and stream zero rows.
        src, reader = f"{sf_dir}/events.parquet", reader
    else:
        # driver testdata layout: one file per table inside sf_dir
        src = sf_dir
        reader = reader.option("pathGlobFilter", "events.parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return normalize_events_ts(reader.parquet(src))


def run_to_memory(
    sdf: DataFrame, output_mode: str = "complete", name: str | None = None
) -> DataFrame:
    """Run a streaming DataFrame to completion into a memory sink and
    return the sink table as a batch DataFrame."""
    sink = name or f"stream_sink_{next(_sink_ids)}"
    query = (
        sdf.writeStream.format("memory")
        .queryName(sink)
        .outputMode(output_mode)
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return sdf.sparkSession.table(sink)
