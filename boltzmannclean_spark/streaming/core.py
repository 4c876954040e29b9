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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# events.parquet carries ts as TIMESTAMP(NANOS); with the session's
# nanosAsLong conf the scan yields a long, converted to a µs timestamp
# exactly like sources/catalog.load_table does for the batch path.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_sink_ids = itertools.count()


def events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of events with a proper µs event-time column."""
    # The file source wants a directory; pathGlobFilter narrows the scan
    # to the events file (in production this is a Kafka topic / a
    # date-partitioned landing directory).
    # Same defensive conf as sources/catalog.load_table: the LongType ts
    # in EVENTS_SCHEMA only materializes from TIMESTAMP(NANOS) parquet
    # when nanosAsLong is on, and the caller's session may not set it.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(EVENTS_SCHEMA).option(
        "pathGlobFilter", "events.parquet"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(sf_dir)
    return df.withColumn("ts_ns", F.col("ts")).withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )


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
