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
  CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sum_acctbal
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
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS total_value
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
       CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS total_price
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
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS total_value
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
    "source_partitioned_events_read",
    oracle="""
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date, event_type,
       COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
FROM events
WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-07'
GROUP BY 1, 2
ORDER BY 1, 2
""",
    tags=("source", "partitioned", "pruning", "events"),
)
def source_partitioned_events_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END partition pruning on the events fact table: lay events
    out date-partitioned (the canonical 100 TB layout for an append-only
    event stream), then READ with a date-range predicate that resolves
    against directory names — the scan's PartitionFilters skip every
    day outside the range without opening a file (asserted in
    tests/test_plans.py). This closes the loop the partitioned SINK test
    only half-proves: the 100 TB events story is a pruned read path,
    not just a partitioned write."""
    events = load_table(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="bcs_evp_") + "/events_by_date"
    events.withColumn("event_date", F.to_date("ts")).write.mode(
        "overwrite"
    ).partitionBy("event_date").parquet(path)
    lo = F.lit("2024-01-05").cast("date")
    hi = F.lit("2024-01-07").cast("date")
    return (
        spark.read.parquet(path)
        .where(F.col("event_date").between(lo, hi))
        .groupBy(
            F.col("event_date").cast("string").alias("event_date"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_date", "event_type")
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


@register(
    "source_merge_schema",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_rows,
       COUNT(o_totalprice) AS n_with_price,
       COUNT(o_comment_len) AS n_with_comment
FROM (
  SELECT o_orderpriority, o_totalprice, NULL AS o_comment_len
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL BY NAME
  SELECT o_orderpriority, LEN(o_orderstatus) AS o_comment_len
  FROM orders WHERE o_orderkey % 2 = 1
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("source", "schema-evolution"),
)
def source_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet drops with DIFFERENT
    schemas (an old extract with o_totalprice, a new one that dropped
    it and added o_comment_len) land in one directory;
    ``mergeSchema=true`` unions the schemas and NULL-fills the missing
    columns per file — the standard landing-zone evolution story.
    Schema merge costs one footer read per file (done in parallel);
    the data pages are untouched."""
    orders = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="bcs_merge_schema_") + "/orders_evolving"
    old = orders.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderpriority", "o_totalprice"
    )
    new = orders.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderpriority", F.length("o_orderstatus").alias("o_comment_len")
    )
    old.write.mode("overwrite").parquet(f"{path}/v=1")
    new.write.mode("overwrite").parquet(f"{path}/v=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/v=1", f"{path}/v=2"
    )
    return (
        merged.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_totalprice").alias("n_with_price"),
            F.count("o_comment_len").alias("n_with_comment"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "sink_dynamic_partition_overwrite",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS total_value
FROM (
  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus <> 'F'
  UNION ALL
  SELECT o_orderstatus, o_totalprice FROM orders
  WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    tags=("sink", "partitioned", "dynamic-overwrite"),
)
def sink_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite: the second write replaces ONLY the
    partitions it produces (status 'F' gets rewritten with just urgent
    orders) and leaves sibling partitions untouched — the idempotent
    daily-reload recipe for partitioned tables; static mode would have
    truncated the whole table first."""
    orders = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="bcs_dpo_") + "/orders_by_status"
    # Scope the overwrite mode to this query: leaking `dynamic` onto the
    # shared session would silently change the semantics of every later
    # partitioned overwrite in the same process.
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        orders.select("o_orderstatus", "o_totalprice").write.mode(
            "overwrite"
        ).partitionBy("o_orderstatus").parquet(path)
        # Reload of one partition's worth of data: only status 'F' is
        # overwritten (with a reduced row set), others must survive.
        orders.where(
            (F.col("o_orderstatus") == "F")
            & (F.col("o_orderpriority") == "1-URGENT")
        ).select("o_orderstatus", "o_totalprice").write.mode(
            "overwrite"
        ).partitionBy("o_orderstatus").parquet(path)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return (
        spark.read.parquet(path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice", 14)).cast("double").alias("total_value"),
        )
        .orderBy("o_orderstatus")
    )


PYSRC_N = 1000
PYSRC_PARTS = 8


@register(
    "source_python_datasource",
    oracle=f"""
SELECT CASE WHEN r % 3 = 0 THEN 'fizz' ELSE 'plain' END AS bucket,
       COUNT(*) AS n_rows,
       CAST(SUM(r * r) AS BIGINT) AS sum_sq
FROM (SELECT UNNEST(range({PYSRC_N})) AS r)
GROUP BY 1
ORDER BY bucket
""",
    tags=("source", "python-datasource", "4.x"),
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PySpark 4.x Python DataSource API: a custom batch source written
    in pure Python (DataSource/DataSourceReader), registered under a
    format name and read like any built-in — the extension point for
    bespoke feeds (internal APIs, tickers, queues) without JVM code.
    The reader declares 8 InputPartitions, each generating its slice
    independently on executors via Arrow — the source is parallel from
    day one; the deterministic integer payload keeps it oracle-able."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class SeqReader(DataSourceReader):
        def __init__(self, n: int, parts: int) -> None:
            self.n, self.parts = n, parts

        def partitions(self):
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, partition):
            for r in range(partition.value, self.n, self.parts):
                yield (r, r * r, "fizz" if r % 3 == 0 else "plain")

    class SeqSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "bcs_sequence"

        def schema(self) -> str:
            return "r BIGINT, r_sq BIGINT, bucket STRING"

        def reader(self, schema):
            return SeqReader(
                int(self.options.get("n", PYSRC_N)),
                int(self.options.get("parts", PYSRC_PARTS)),
            )

    spark.dataSource.register(SeqSource)
    df = (
        spark.read.format("bcs_sequence")
        .option("n", str(PYSRC_N))
        .option("parts", str(PYSRC_PARTS))
        .load()
    )
    return (
        df.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("r_sq").alias("sum_sq"))
        .orderBy("bucket")
    )


# Deterministic messy CSV: 20 good rows, 3 malformed (wrong arity /
# non-numeric id / truncated). The expected outcome is a literal on
# both sides because we author the file.
_CORRUPT_CSV_GOOD = 20
_CORRUPT_CSV_BAD = 3


@register(
    "source_csv_corrupt_records",
    oracle=f"""
SELECT status, n_rows FROM (
  VALUES ('good', {_CORRUPT_CSV_GOOD}), ('corrupt', {_CORRUPT_CSV_BAD})
) AS t(status, n_rows)
ORDER BY status
""",
    tags=("source", "csv", "error-handling"),
)
def source_csv_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE CSV ingestion with a _corrupt_record column: malformed
    rows (wrong arity, bad types, truncation) land in the quarantine
    column instead of killing the 100 TB load — the count-and-route
    pattern every landing zone needs (FAILFAST is the opposite mode;
    DROPMALFORMED silently loses data). The file is authored
    deterministically, so the good/corrupt split is a literal oracle."""
    import os

    path = tempfile.mkdtemp(prefix="bcs_corrupt_") + "/messy"
    os.makedirs(path, exist_ok=True)
    lines = ["id,name,score"]
    lines += [f"{i},row{i},{i * 10}" for i in range(_CORRUPT_CSV_GOOD)]
    lines += ["99,too,many,fields,here", "not_a_number,bad,1", "42,truncated"]
    with open(f"{path}/part-000.csv", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    df = (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema("id INT, name STRING, score INT, _corrupt_record STRING")
        .csv(path)
        # Spark refuses plans that reference ONLY the corrupt-record
        # column (the parser would need a second pass); caching the
        # parsed rows is the documented way to query the quarantine.
        .cache()
    )
    return (
        df.select(
            F.when(F.col("_corrupt_record").isNull(), "good")
            .otherwise("corrupt")
            .alias("status")
        )
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("status")
    )


COMPACT_TARGET_FILES = 4


@register(
    "sink_compact_small_files",
    oracle="""
SELECT l_returnflag, COUNT(*) AS n_rows,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_orderkey < 5000
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("sink", "compaction", "small-files"),
)
def sink_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: a fragmented landing zone (32-way write →
    one file per partition) is rewritten through coalesce() into a few
    right-sized files — THE daily hygiene job at scale (each parquet
    file costs a footer read + a task; 10⁶ small files can dominate a
    scan). coalesce avoids a shuffle entirely (it merges upstream
    partitions); repartition would shuffle but also rebalance skew.
    The pytest asserts the file count actually dropped; the oracle
    checks compaction changed no data."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 5000)
    base = tempfile.mkdtemp(prefix="bcs_compact_")
    frag_dir, compact_dir = f"{base}/fragmented", f"{base}/compacted"
    li.repartition(32).write.mode("overwrite").parquet(frag_dir)
    frag = spark.read.parquet(frag_dir)
    frag.coalesce(COMPACT_TARGET_FILES).write.mode("overwrite").parquet(compact_dir)
    return (
        spark.read.parquet(compact_dir)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


ZBITS = 8  # bits per dimension in the Morton interleave


def _morton_spark():
    terms = []
    for i in range(ZBITS):
        terms.append(f"shiftleft(shiftright(za, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright(zb, {i}) & 1, {2 * i + 1})")
    return " + ".join(terms)


def _morton_duck():
    terms = []
    for i in range(ZBITS):
        terms.append(f"(((za >> {i}) & 1) << {2 * i})")
        terms.append(f"(((zb >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "sink_zorder_cluster",
    oracle=f"""
WITH keyed AS (
  SELECT l_partkey % 256 AS za, l_suppkey % 256 AS zb, l_extendedprice
  FROM lineitem
),
z AS (SELECT *, {_morton_duck()} AS morton FROM keyed)
SELECT morton // 4096 AS zbucket,
       COUNT(*) AS n_rows,
       MIN(za) AS min_a, MAX(za) AS max_a,
       MIN(zb) AS min_b, MAX(zb) AS max_b,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS sum_price
FROM z
GROUP BY morton // 4096
ORDER BY zbucket
""",
    tags=("sink", "zorder", "clustering"),
)
def sink_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering: interleave the bits of two join/
    filter keys into one sort key, range-partition + sort the write on
    it, and every file covers a small RECTANGLE in (partkey, suppkey)
    space — so a predicate on EITHER key prunes most files via their
    min/max footers (a single-key sort only prunes its own key). The
    Morton code is pure integer bit arithmetic — identical in any
    engine; bucket stats (bounded min/max spans per bucket) are the
    oracle-visible locality evidence."""
    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.selectExpr(
        "l_partkey % 256 AS za", "l_suppkey % 256 AS zb", "l_extendedprice"
    )
    z = keyed.withColumn("morton", F.expr(_morton_spark()))
    path = tempfile.mkdtemp(prefix="bcs_zorder_") + "/lineitem_z"
    (
        z.repartitionByRange(8, "morton")
        .sortWithinPartitions("morton")
        .write.mode("overwrite")
        .parquet(path)
    )
    return (
        spark.read.parquet(path)
        .groupBy(F.expr("morton div 4096").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("za").alias("min_a"),
            F.max("za").alias("max_a"),
            F.min("zb").alias("min_b"),
            F.max("zb").alias("max_b"),
            F.sum(dec("l_extendedprice", 14)).cast("double").alias("sum_price"),
        )
        .orderBy("zbucket")
    )


@register(
    "sink_snapshot_diff",
    oracle="""
WITH old AS (
  SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DECIMAL(12,2)) AS bal
  FROM customer WHERE c_custkey % 7 <> 0
),
new AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % 5 = 0
              THEN CAST(c_acctbal AS DECIMAL(12,2)) + CAST(10 AS DECIMAL(12,2))
              ELSE CAST(c_acctbal AS DECIMAL(12,2)) END AS bal
  FROM customer WHERE c_custkey % 3 <> 0
),
diff AS (
  SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
         CASE WHEN o.c_custkey IS NULL THEN 'insert'
              WHEN n.c_custkey IS NULL THEN 'delete'
              WHEN o.bal <> n.bal OR o.c_mktsegment <> n.c_mktsegment THEN 'update'
              ELSE 'unchanged' END AS change_type
  FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
)
SELECT change_type, COUNT(*) AS n_rows,
       MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
FROM diff
GROUP BY change_type
ORDER BY change_type
""",
    tags=("sink", "cdc", "snapshot-diff"),
)
def sink_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot differencing (poor-man's CDC): two materialized
    snapshots of a dimension full-outer-join on the business key and
    every row is classified insert / delete / update / unchanged — the
    changeset feed when the upstream system has no change log. Both
    snapshots are REAL parquet writes re-read before diffing (the
    operational shape: yesterday's snapshot is on disk, not in memory);
    the join shuffles on the key both snapshots would be bucketed by
    at scale. Balances compare in exact DECIMAL — a double snapshot
    would manufacture phantom updates."""
    cust = load_table(spark, sf_dir, "customer")
    base = tempfile.mkdtemp(prefix="bcs_snapdiff_")
    old = cust.where(F.col("c_custkey") % 7 != 0).select(
        "c_custkey", "c_mktsegment", dec("c_acctbal").alias("bal")
    )
    new = cust.where(F.col("c_custkey") % 3 != 0).select(
        "c_custkey",
        "c_mktsegment",
        F.when(
            F.col("c_custkey") % 5 == 0,
            dec("c_acctbal") + F.lit(10).cast("decimal(12,2)"),
        )
        .otherwise(dec("c_acctbal"))
        .alias("bal"),
    )
    old.write.mode("overwrite").parquet(f"{base}/old")
    new.write.mode("overwrite").parquet(f"{base}/new")
    o = spark.read.parquet(f"{base}/old").alias("o")
    n = spark.read.parquet(f"{base}/new").alias("n")
    joined = o.join(n, F.col("o.c_custkey") == F.col("n.c_custkey"), "full_outer")
    change = (
        F.when(F.col("o.c_custkey").isNull(), "insert")
        .when(F.col("n.c_custkey").isNull(), "delete")
        .when(
            (F.col("o.bal") != F.col("n.bal"))
            | (F.col("o.c_mktsegment") != F.col("n.c_mktsegment")),
            "update",
        )
        .otherwise("unchanged")
    )
    return (
        joined.select(
            F.coalesce(F.col("o.c_custkey"), F.col("n.c_custkey")).alias(
                "c_custkey"
            ),
            change.alias("change_type"),
        )
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
        )
        .orderBy("change_type")
    )


@register(
    "source_file_metadata",
    oracle="""
SELECT 'orders' AS table_name,
       'orders.parquet' AS file_name,
       COUNT(*) AS n_rows,
       CAST(0 AS BIGINT) AS min_row_index,
       COUNT(*) - 1 AS max_row_index,
       CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT) AS row_index_checksum
FROM orders
UNION ALL
SELECT 'lineitem', 'lineitem.parquet', COUNT(*), CAST(0 AS BIGINT),
       COUNT(*) - 1, CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT)
FROM lineitem
ORDER BY table_name, file_name
""",
    tags=("source", "metadata", "observability"),
)
def source_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file scan manifest from the hidden ``_metadata`` struct
    (file_path / row_index) — the observability surface a 100 TB job
    uses to audit WHICH files a query actually read, row coverage per
    file, and (via the row-index checksum Σ0..n-1) that no row group
    was silently skipped. Costs one metadata-only scan per table: the
    projection touches no data columns, so the reader serves it from
    footers + row indexes. The oracle predicts the manifest from the
    single-file fixture's invariants alone (row_index must be the dense
    0..n-1 with checksum n(n-1)/2), so the scan's observation is checked
    against an independent derivation."""

    def manifest(name: str) -> DataFrame:
        return (
            spark.read.parquet(f"{sf_dir}/{name}.parquet")
            .select(
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ).alias("file_name"),
                F.col("_metadata.row_index").alias("ri"),
            )
            .groupBy("file_name")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("ri").alias("min_row_index"),
                F.max("ri").alias("max_row_index"),
                F.sum("ri").alias("row_index_checksum"),
            )
            .select(F.lit(name).alias("table_name"), "*")
        )

    return manifest("orders").unionAll(manifest("lineitem")).orderBy(
        "table_name", "file_name"
    )


@register(
    "source_text_logs",
    oracle="""
WITH rendered AS (
  SELECT user_id::VARCHAR || ' - - [' || epoch_us(ts)::VARCHAR || '] "GET /'
         || event_type || '/' || event_id::VARCHAR || ' HTTP/1.1" '
         || (CASE WHEN event_type = 'error' THEN 500 ELSE 200 END)::VARCHAR
         || ' ' || CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)::VARCHAR
           AS line
  FROM events
),
parsed AS (
  SELECT regexp_extract(line, '^(\\d+) - - \\[(\\d+)\\] "GET /([a-z]+)/(\\d+) HTTP/1\\.1" (\\d+) (\\d+)$', 1)::BIGINT AS user_id,
         regexp_extract(line, '^(\\d+) - - \\[(\\d+)\\] "GET /([a-z]+)/(\\d+) HTTP/1\\.1" (\\d+) (\\d+)$', 3) AS path_type,
         regexp_extract(line, '^(\\d+) - - \\[(\\d+)\\] "GET /([a-z]+)/(\\d+) HTTP/1\\.1" (\\d+) (\\d+)$', 5)::BIGINT AS status,
         regexp_extract(line, '^(\\d+) - - \\[(\\d+)\\] "GET /([a-z]+)/(\\d+) HTTP/1\\.1" (\\d+) (\\d+)$', 6)::BIGINT AS bytes
  FROM rendered
)
SELECT path_type, status,
       COUNT(*) AS n_requests,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(bytes) AS BIGINT) AS total_bytes
FROM parsed
GROUP BY path_type, status
ORDER BY path_type, status
""",
    tags=("source", "text", "logs", "regexp"),
)
def source_text_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-text log ingestion — the unstructured-source path every crawl
    / server-log pipeline starts from: render Apache-combined-style
    lines from `events` (timestamps as epoch-µs so no locale/strftime
    divergence), write them through the TEXT sink, re-scan with
    `spark.read.text`, parse with one regexp into typed columns, and
    aggregate. The oracle performs the identical render→regexp→aggregate
    round trip in DuckDB, so the REGEXP SEMANTICS (anchors, classes,
    capture groups) are what is being cross-checked, not just the
    aggregate. Scale: text scan is splittable by line, the regexp is a
    codegen'd JVM expression per line (no Python), and malformed lines
    die in the `status IS NOT NULL` guard rather than failing the job —
    the PERMISSIVE posture a 100 TB log ingest needs."""
    ev = load_table(spark, sf_dir, "events")
    rendered = ev.select(
        F.concat(
            F.col("user_id").cast("string"),
            F.lit(" - - ["),
            F.unix_micros("ts").cast("string"),
            F.lit('] "GET /'),
            F.col("event_type"),
            F.lit("/"),
            F.col("event_id").cast("string"),
            F.lit(' HTTP/1.1" '),
            F.when(F.col("event_type") == "error", F.lit(500))
            .otherwise(F.lit(200))
            .cast("string"),
            F.lit(" "),
            (dec("value") * 100).cast("long").cast("string"),
        ).alias("value")
    )
    path = tempfile.mkdtemp(prefix="bcs_logs_") + "/access_log"
    rendered.write.mode("overwrite").text(path)
    pat = (
        r'^(\d+) - - \[(\d+)\] "GET /([a-z]+)/(\d+) HTTP/1\.1" (\d+) (\d+)$'
    )
    parsed = spark.read.text(path).select(
        F.regexp_extract("value", pat, 1).cast("long").alias("user_id"),
        F.regexp_extract("value", pat, 3).alias("path_type"),
        F.regexp_extract("value", pat, 5).cast("long").alias("status"),
        F.regexp_extract("value", pat, 6).cast("long").alias("bytes"),
    )
    return (
        parsed.where(F.col("status").isNotNull())
        .groupBy("path_type", "status")
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum("bytes").alias("total_bytes"),
        )
        .orderBy("path_type", "status")
    )


@register(
    "join_dynamic_partition_pruning",
    oracle="""
WITH e AS (
  SELECT CAST(ts AS DATE) AS event_date,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM events
)
SELECT event_date::VARCHAR AS event_date,
       COUNT(*) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM e
WHERE date_diff('day', DATE '1970-01-01', event_date) % 7 = 1
GROUP BY event_date
ORDER BY event_date
""",
    tags=("join", "dpp", "partition-pruning"),
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning — the runtime companion to the static
    pruning in sink_partitioned_pruning: the fact table is written
    partitioned by event_date, and the filter lives on a DIMENSION
    (a date table with a derived day-of-week column), not on the
    partition column itself — so compile-time pruning is impossible.
    Catalyst inserts a dynamicpruning subquery: the dim side runs
    first, its surviving join keys become an IN-filter on the fact
    scan's PartitionFilters, and only matching date directories are
    read (plan-gated in tests/test_plans.py). This is how a 100 TB
    date-partitioned fact avoids full scans under every calendar-dim
    join. Day-of-week is computed as days-since-epoch mod 7 — pure
    integer arithmetic, identical in both engines (DOW builtins
    disagree on week start)."""
    ev = load_table(spark, sf_dir, "events")
    dated = ev.select(
        F.col("ts").cast("date").alias("event_date"),
        (dec("value") * 100).cast("long").alias("cents"),
    )
    path = tempfile.mkdtemp(prefix="bcs_dpp_") + "/events_by_date"
    dated.write.mode("overwrite").partitionBy("event_date").parquet(path)
    fact = spark.read.parquet(path)
    dates = dated.select("event_date").distinct().withColumn(
        "dow", F.datediff("event_date", F.lit("1970-01-01").cast("date")) % 7
    )
    return (
        fact.join(F.broadcast(dates.where(F.col("dow") == 1)), "event_date")
        .groupBy(F.col("event_date").cast("string").alias("event_date"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("event_date")
    )


@register(
    "source_observe_metrics",
    oracle="""
SELECT COUNT(*) AS n_rows,
       COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END) AS n_null_price,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS total_price,
       MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
FROM orders
""",
    tags=("source", "observe", "metrics"),
)
def source_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Observation API (`df.observe`) — in-flight data-quality
    metrics collected DURING a pass instead of by a second scan: a
    100 TB ingest wants row counts, null counts, and control totals as
    a side effect of the load it is already doing, not as another read.
    The observed aggregates piggyback on the action (here a count());
    the metrics row is then surfaced as a DataFrame and cross-checked
    against a direct SQL aggregation, proving the side-channel reports
    the same numbers a dedicated scan would. The money total uses the
    exact-decimal recipe inside the observe expression itself."""
    from pyspark.sql import Observation

    orders = load_table(spark, sf_dir, "orders")
    obs = Observation("ingest_metrics")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("o_totalprice").isNull(), 1)).alias(
            "n_null_price"
        ),
        F.sum(dec("o_totalprice", 14)).cast("double").alias("total_price"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )
    observed.count()  # the action the metrics ride on
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["n_null_price"],
                float(m["total_price"]),
                m["min_key"],
                m["max_key"],
            )
        ],
        "n_rows BIGINT, n_null_price BIGINT, total_price DOUBLE, "
        "min_key BIGINT, max_key BIGINT",
    )


@register(
    "source_xml_roundtrip",
    oracle="""
SELECT n_name, COUNT(*) AS n_suppliers,
       CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS total_bal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
    tags=("source", "sink", "xml"),
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML roundtrip on Spark 4.x's NATIVE xml data source (the
    spark-xml package was folded into core in 4.0): write supplier as
    XML, re-scan with an explicit schema, join + aggregate. XML is a
    row-tag text format — no column pruning or predicate pushdown, the
    whole document parses per row — so the scan is strictly worse than
    parquet/ORC at scale; it exists for INGEST interop (feeds, legacy
    exports), and the right pipeline shape is exactly this one: read
    XML once, aggregate or convert, never re-scan it. The oracle runs
    on the original table, so value parity proves the roundtrip is
    lossless including doubles (XML serializes full precision)."""
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    path = tempfile.mkdtemp(prefix="bcs_xml_") + "/supplier_xml"
    sup.write.mode("overwrite").format("xml").option("rowTag", "supplier").save(
        path
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "supplier")
        .schema(sup.schema)
        .load(path)
    )
    return (
        back.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(dec("s_acctbal")).cast("double").alias("total_bal"),
        )
        .orderBy("n_name")
    )


_JSON_GOOD = 24
_JSON_BAD = 4


@register(
    "source_json_corrupt_records",
    oracle=f"""
SELECT status, n_rows FROM (
  VALUES ('corrupt', {_JSON_BAD}), ('good', {_JSON_GOOD})
) AS t(status, n_rows)
ORDER BY status
""",
    tags=("source", "json", "corrupt-records", "quarantine"),
)
def source_json_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE JSON-lines ingestion with quarantine: syntactically
    broken lines (truncated object, bare text, unclosed string) land in
    _corrupt_record instead of failing the load — the JSON twin of the
    CSV quarantine op, exercising the OTHER parser's failure taxonomy
    (JSON corruption is structural — malformed syntax — where CSV's is
    positional arity/type; unlike CSV, Spark's JSON parser ALSO
    quarantines the whole row on a type mismatch in otherwise-valid
    JSON, which this fixture pins with a valid-but-wrong-typed row
    counted among the corrupt). File authored deterministically, so
    the split is a literal oracle."""
    import os

    path = tempfile.mkdtemp(prefix="bcs_json_corrupt_") + "/messy"
    os.makedirs(path, exist_ok=True)
    lines = [
        f'{{"id": {i}, "name": "row{i}", "score": {i * 10}}}'
        for i in range(_JSON_GOOD)
    ]
    # syntactically valid JSON with a wrong-typed field: Spark's JSON
    # parser quarantines this whole row (it does NOT null the field)
    lines += ['{"id": 998, "name": "typed", "score": "not_a_number"}']
    lines += [
        '{"id": 99, "name": "truncated"',
        "this is not json at all",
        '{"id": 100, "name": "unclosed string}',
    ]
    with open(f"{path}/part-000.json", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    df = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema("id INT, name STRING, score INT, _corrupt_record STRING")
        .json(path)
        .cache()  # same single-parse rule as the CSV quarantine op
    )
    return (
        df.select(
            F.when(F.col("_corrupt_record").isNull(), "good")
            .otherwise("corrupt")
            .alias("status")
        )
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("status")
    )


_NBIN = 40  # payload files in the binary-ingest fixture


@register(
    "source_binary_files",
    oracle=f"""
SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.bin' AS fname,
       CAST(16 AS BIGINT) AS n_bytes,
       md5(text) AS content_hex
FROM documents WHERE doc_id < {_NBIN}
ORDER BY fname
""",
    tags=("source", "binary", "multimodal"),
)
def source_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` ingestion — the format a raw media crawl actually
    lands as (one image/audio blob per object-store key): the fixture
    materializes each of the first {_NBIN} documents' 16-byte payloads
    (unhex(md5(text)), the engine's stub media payload) as its own
    file, then ``spark.read.format("binaryFile")`` scans the directory
    into (path, length, content) rows — the entry point that feeds the
    multimodal mapInPandas featurizers without any preprocessing step.
    The output relativizes the path (regexp filename extract; harness
    path-freedom rule) and hex-renders the content, so the oracle is
    the closed-form md5 of each source text — a full byte-fidelity
    check of the write→scan round trip. Scale: binaryFile lists and
    reads files in parallel across executors (one task per file group)
    and prunes on path/size pushed filters; content bytes stream
    through Arrow untouched."""
    import os

    base = tempfile.mkdtemp(prefix="bcs_binfiles_") + "/blobs"
    os.makedirs(base, exist_ok=True)

    def write_blobs(rows) -> None:
        # Executor-side blob writes (one file per row, names disjoint by
        # doc_id, so parallel tasks never collide). Local mode shares
        # the filesystem; a cluster deployment would target an object
        # store here — the point is that payload bytes never transit
        # the driver (r6 verdict: keeps the no-driver-data rule
        # unconditional).
        for r in rows:
            with open(os.path.join(base, f"doc_{r.doc_id}.bin"), "wb") as fh:
                fh.write(bytes(r.payload))

    (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _NBIN)
        .select("doc_id", F.unhex(F.md5("text")).alias("payload"))
        .foreachPartition(write_blobs)
    )
    return (
        spark.read.format("binaryFile")
        .load(base)
        .select(
            F.regexp_extract("path", r"([^/]+)$", 1).alias("fname"),
            F.col("length").alias("n_bytes"),
            F.lower(F.hex("content")).alias("content_hex"),
        )
        .orderBy("fname")
    )


@register(
    "dq_schema_drift_report",
    oracle="""
SELECT * FROM (VALUES
  ('o_clerk',         'added',        CAST(NULL AS VARCHAR), 'string'),
  ('o_comment',       'removed',      'string',              CAST(NULL AS VARCHAR)),
  ('o_custkey',       'unchanged',    'bigint',              'bigint'),
  ('o_orderdate',     'unchanged',    'timestamp_ntz',       'timestamp_ntz'),
  ('o_orderkey',      'unchanged',    'bigint',              'bigint'),
  ('o_orderpriority', 'unchanged',    'string',              'string'),
  ('o_orderstatus',   'unchanged',    'string',              'string'),
  ('o_totalprice',    'type_changed', 'double',              'decimal(14,2)')
) AS t(column_name, status, type_v1, type_v2)
ORDER BY column_name
""",
    tags=("dq", "schema", "drift"),
)
def dq_schema_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift report between two snapshot versions of a table —
    the pre-flight check every scheduled ingest needs BEFORE
    unionByName/mergeSchema silently null-fills a renamed column: the
    fixture writes orders v1 as-is and v2 with a column added
    (o_clerk), one dropped (o_comment ~ the drop is simulated by never
    having it in v1's projection... v1 carries it, v2 drops it), and
    one type-migrated (o_totalprice double -> DECIMAL(14,2)); the
    report classifies every column across both parquet FOOTERS —
    schema-only, zero data rows scanned, so the check is free at any
    table size. The full-outer classification runs as a DataFrame over
    the two schema listings (metadata-sized), and the oracle is the
    literal expected report."""
    import os

    orders = load_table(spark, sf_dir, "orders")
    base = tempfile.mkdtemp(prefix="bcs_drift_")
    v1 = os.path.join(base, "v1")
    v2 = os.path.join(base, "v2")
    orders.withColumn("o_comment", F.lit("legacy note")).write.parquet(v1)
    (
        orders.withColumn("o_clerk", F.concat(F.lit("Clerk#"), F.col("o_custkey")))
        .withColumn("o_totalprice", F.col("o_totalprice").cast("decimal(14,2)"))
        .write.parquet(v2)
    )
    s1 = spark.read.parquet(v1).schema
    s2 = spark.read.parquet(v2).schema
    rows1 = [(f.name, f.dataType.simpleString()) for f in s1.fields]
    rows2 = [(f.name, f.dataType.simpleString()) for f in s2.fields]
    d1 = spark.createDataFrame(rows1, "column_name string, type_v1 string")
    d2 = spark.createDataFrame(rows2, "column_name string, type_v2 string")
    return (
        d1.join(d2, "column_name", "full_outer")
        .select(
            "column_name",
            F.when(F.col("type_v1").isNull(), "added")
            .when(F.col("type_v2").isNull(), "removed")
            .when(F.col("type_v1") != F.col("type_v2"), "type_changed")
            .otherwise("unchanged")
            .alias("status"),
            "type_v1",
            "type_v2",
        )
        .orderBy("column_name")
    )
