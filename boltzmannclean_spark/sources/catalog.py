"""Table catalog over the driver's parquet testdata.

``spark.read.parquet`` gives vectorized columnar scans with predicate
pushdown and column pruning — at 100 TB these tables would be
partitioned (e.g. orders/lineitem by date) and the same loader would
pick up partition pruning for free; nothing downstream changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# (region/nation are fixed-size; supplier/part/customer grow with SF but
# stay orders of magnitude below the fact tables).
BROADCAST_DIMS = ("region", "nation", "supplier")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to a µs TIMESTAMP plus a long ``ts_ns`` twin,
    whatever physical type the parquet footer carried.

    The driver's testdata has shipped two layouts: TIMESTAMP(NANOS)
    (readable only as long ns via the nanosAsLong conf) and plain
    timestamp[us] (which Spark infers as TIMESTAMP_NTZ). Branching on the
    actual scan schema keeps every downstream operator on the exact same
    TIMESTAMP(µs) semantics in both cases.
    """
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # Legacy layout: long ns-since-epoch. Integer division keeps full
        # precision (double would lose it at 1e18); DuckDB's
        # TIMESTAMP_NS -> µs truncates identically.
        return df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    # Current layout: timestamp[us], inferred TIMESTAMP_NTZ. Cast to the
    # session-zoned TIMESTAMP the operators were written against (session
    # tz is UTC, so instants match DuckDB's naive read bit-for-bit).
    return df.withColumn("ts", F.col("ts").cast(T.TimestampType())).withColumn(
        "ts_ns", (F.unix_micros(F.col("ts")) * F.lit(1000)).cast(T.LongType())
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # The engine's cross-engine determinism contract (timestamp literals,
    # unix_micros, the NTZ→LTZ events cast) assumes a UTC session — our
    # get_spark() pins it, but the external harness hands us ITS session.
    # Runtime-settable, idempotent, and required for DuckDB's naive
    # timestamps to mean the same instants: set defensively on every load.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # Older testdata carries events.ts as parquet TIMESTAMP(NANOS);
        # Spark refuses that read (PARQUET_TYPE_ILLEGAL) unless nanosAsLong
        # is on. Harmless for the current timestamp[us] layout — set it
        # defensively; it is a runtime-settable SQL conf.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the spark.sql entry path)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
