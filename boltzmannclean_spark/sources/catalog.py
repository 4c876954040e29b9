"""Table catalog over the driver's parquet testdata.

``spark.read.parquet`` gives vectorized columnar scans with predicate
pushdown and column pruning — at 100 TB these tables would be
partitioned (e.g. orders/lineitem by date) and the same loader would
pick up partition pruning for free; nothing downstream changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS); Spark refuses the read
        # (PARQUET_TYPE_ILLEGAL) unless nanosAsLong is on. Our own
        # get_spark() sets it, but callers (e.g. an external harness) may
        # hand us a bare session — set it defensively; it is a runtime-
        # settable SQL conf.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts arrives as long ns-since-epoch (see session.py nanosAsLong).
        # Integer division keeps full precision (double would lose it at
        # 1e18); DuckDB's TIMESTAMP_NS -> µs truncates identically.
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the spark.sql entry path)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
