"""Secondary sources and sinks (SURVEY.md §2.B scans/sources/sinks):
CSV scan, JSON-lines scan, in-memory source, parquet sink round-trip.

Each query materializes a real file in a fresh temp directory, reads it
back through the corresponding Spark source, and computes an aggregate
whose oracle runs on the ORIGINAL parquet table — so the check proves
the format round-trip is lossless, not just that the file was written.
Doubles survive CSV/JSON round-trips because Spark writes shortest
round-trip representations.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from boltzmannclean_spark.functions.exact import dec
from boltzmannclean_spark.plans.registry import register
from boltzmannclean_spark.sources.catalog import load_table


@register(
    "source_csv_scan",
    oracle="""
SELECT
  n_regionkey,
  COUNT(*) AS n_nations,
  STRING_AGG(n_name, ',' ORDER BY n_name) AS nation_names
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
""",
    tags=("source", "csv"),
)
def source_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet → CSV → scan with explicit schema → aggregate. The CSV
    reader gets the schema up front (no inferSchema pass — at scale
    schema inference is an extra full read)."""
    nation = load_table(spark, sf_dir, "nation")
    path = tempfile.mkdtemp(prefix="bcs_csv_") + "/nation"
    nation.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.schema(nation.schema).option("header", True).csv(path)
    )
    return (
        back.groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias(
                "nation_names"
            ),
        )
        .orderBy("n_regionkey")
    )


@register(
    "source_json_scan",
    oracle="""
SELECT
  s_nationkey,
  COUNT(*) AS n_suppliers,
  CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
FROM supplier
GROUP BY s_nationkey
ORDER BY s_nationkey
""",
    tags=("source", "json"),
)
def source_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet → JSON-lines → scan with explicit schema → aggregate;
    proves doubles round-trip JSON bit-exactly."""
    supplier = load_table(spark, sf_dir, "supplier")
    path = tempfile.mkdtemp(prefix="bcs_json_") + "/supplier"
    supplier.write.mode("overwrite").json(path)
    back = spark.read.schema(supplier.schema).json(path)
    return (
        back.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(dec("s_acctbal")).cast("double").alias("sum_acctbal"),
        )
        .orderBy("s_nationkey")
    )


@register(
    "source_inmemory_values",
    oracle="""
SELECT r_name, priority, COUNT(*) AS n_regions
FROM region
JOIN (VALUES (0, 'high'), (1, 'high'), (2, 'low'),
             (3, 'low'),  (4, 'low')) AS t(key, priority)
  ON r_regionkey = key
GROUP BY r_name, priority
ORDER BY r_name
""",
    tags=("source", "inmemory"),
)
def source_inmemory_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-memory source (createDataFrame) broadcast-joined to a table —
    the idiom for small lookup/config tables shipped with a job."""
    lookup = spark.createDataFrame(
        [(0, "high"), (1, "high"), (2, "low"), (3, "low"), (4, "low")],
        schema="key long, priority string",
    )
    region = load_table(spark, sf_dir, "region")
    return (
        region.join(F.broadcast(lookup), F.col("r_regionkey") == F.col("key"))
        .groupBy("r_name", "priority")
        .agg(F.count(F.lit(1)).alias("n_regions"))
        .orderBy("r_name")
    )


@register(
    "sink_parquet_roundtrip",
    oracle="""
SELECT
  o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("sink", "parquet"),
)
def sink_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate → parquet sink → re-scan. At 100 TB the write would be
    partitioned (partitionBy on a pruning key); the re-scan then gets
    partition pruning for free."""
    orders = load_table(spark, sf_dir, "orders")
    agg = (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice", 14)).cast("double").alias("total_value"),
        )
    )
    path = tempfile.mkdtemp(prefix="bcs_sink_") + "/order_priority_summary"
    agg.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).orderBy("o_orderpriority")


@register(
    "source_orc_roundtrip",
    oracle="""
SELECT p_brand, COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM part
GROUP BY p_brand
ORDER BY p_brand
""",
    tags=("source", "sink", "orc"),
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC columnar format roundtrip: write the part table as ORC,
    re-scan, aggregate. ORC gets the same vectorized reader, predicate
    pushdown, and column pruning as parquet in Spark — the choice is an
    interop/ecosystem question, not a capability one."""
    part = load_table(spark, sf_dir, "part")
    path = tempfile.mkdtemp(prefix="bcs_orc_") + "/part_orc"
    part.write.mode("overwrite").orc(path)
    return (
        spark.read.orc(path)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(dec("p_retailprice")).cast("double").alias("total_price"),
        )
        .orderBy("p_brand")
    )


@register(
    "sink_partitioned_pruning",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("sink", "parquet", "partitioned", "pruning"),
)
def sink_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet sink + partition-pruned re-scan:
    write orders partitioned by o_orderstatus, read back filtering on the
    partition column. The filter resolves against directory names — the
    physical plan's PartitionFilters prune non-matching directories
    without opening a single file (asserted in tests/test_plans.py).
    This is THE 100 TB pattern: a date/status-partitioned fact table
    turns a full scan into a touched-partitions scan."""
    orders = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="bcs_part_") + "/orders_by_status"
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    return (
        spark.read.parquet(path)
        .where(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice", 14)).cast("double").alias("total_value"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "sink_upsert_merge",
    oracle="""
WITH target AS (
  SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DECIMAL(12,2)) AS bal
  FROM customer WHERE c_custkey % 3 <> 0
),
updates AS (
  SELECT c_custkey, c_mktsegment,
         CAST(CAST(c_acctbal AS DECIMAL(12,2)) + 100 AS DECIMAL(12,2)) AS bal
  FROM customer WHERE c_custkey % 2 = 0
),
merged AS (
  SELECT COALESCE(u.c_custkey, t.c_custkey)       AS c_custkey,
         COALESCE(u.c_mktsegment, t.c_mktsegment) AS c_mktsegment,
         COALESCE(u.bal, t.bal)                   AS bal
  FROM target t FULL OUTER JOIN updates u ON t.c_custkey = u.c_custkey
)
SELECT c_mktsegment, COUNT(*) AS n_rows,
       CAST(SUM(bal) AS DOUBLE) AS total_bal
FROM merged
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    tags=("sink", "merge", "upsert"),
)
def sink_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert without a lakehouse format: updates win over target
    rows on key match (WHEN MATCHED UPDATE), unmatched updates insert
    (WHEN NOT MATCHED INSERT), via one full outer join + COALESCE —
    then the merged snapshot is written to parquet and re-scanned, which
    is exactly how a plain-parquet pipeline rewrites a dimension. At
    100 TB the join shuffles on the merge key; partitioning the snapshot
    by a stable bucket of the key turns the rewrite into touched-
    partitions-only."""
    customer = load_table(spark, sf_dir, "customer")
    target = customer.where(F.col("c_custkey") % 3 != 0).select(
        "c_custkey", "c_mktsegment", dec("c_acctbal").alias("bal")
    )
    updates = customer.where(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        "c_mktsegment",
        (dec("c_acctbal") + 100).cast("decimal(12,2)").alias("bal"),
    )
    t = target.alias("t")
    u = updates.alias("u")
    merged = t.join(u, F.col("t.c_custkey") == F.col("u.c_custkey"), "full").select(
        F.coalesce("u.c_custkey", "t.c_custkey").alias("c_custkey"),
        F.coalesce("u.c_mktsegment", "t.c_mktsegment").alias("c_mktsegment"),
        F.coalesce("u.bal", "t.bal").alias("bal"),
    )
    path = tempfile.mkdtemp(prefix="bcs_merge_") + "/customer_snapshot"
    merged.write.mode("overwrite").parquet(path)
    return (
        spark.read.parquet(path)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("bal").cast("double").alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )
