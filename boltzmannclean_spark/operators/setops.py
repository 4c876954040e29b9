"""Set operations (SURVEY.md §2.B "Set operations").

UNION ALL is a zero-shuffle concatenation; the distinct variants add one
hash-aggregate exchange on the full row; INTERSECT/EXCEPT [ALL] plan as
aggregations + joins on the row value. All scale as hash-aggs on the
deduplicated key space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from boltzmannclean_spark.functions.exact import dec
from boltzmannclean_spark.plans.registry import register
from boltzmannclean_spark.sources.catalog import load_table


@register(
    "setop_union_all",
    oracle="""
SELECT nationkey, kind, COUNT(*) AS n
FROM (
  SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier
) t
GROUP BY nationkey, kind
ORDER BY nationkey, kind
""",
    tags=("setop", "union"),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union) + aggregation for a deterministic result."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("kind")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("kind")
    )
    return (
        c.unionByName(s)
        .groupBy("nationkey", "kind")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("nationkey", "kind")
    )


@register(
    "setop_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
""",
    tags=("setop", "union"),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set union): Spark union() is bag semantics, so + distinct()."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct().orderBy("nationkey")


@register(
    "setop_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
""",
    tags=("setop", "intersect"),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): nations with rich customers AND suppliers."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s).orderBy("nationkey")


@register(
    "setop_except",
    oracle="""
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY custkey
""",
    tags=("setop", "except"),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers without any finished order."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select(F.col("o_custkey").alias("custkey"))
    return c.subtract(o).orderBy("custkey")


@register(
    "setop_intersect_except_all",
    oracle="""
SELECT priority, COUNT(*) AS n FROM (
  SELECT o_orderpriority AS priority FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-02-01'
  INTERSECT ALL
  SELECT o_orderpriority AS priority FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-02-01'
) t
GROUP BY priority
ORDER BY priority
""",
    tags=("setop", "intersect", "multiset"),
)
def setop_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset min-count semantics), aggregated."""
    o = load_table(spark, sf_dir, "orders")
    jan95 = o.where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-02-01").cast("timestamp"))
    ).select(F.col("o_orderpriority").alias("priority"))
    jan96 = o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-02-01").cast("timestamp"))
    ).select(F.col("o_orderpriority").alias("priority"))
    return (
        jan95.intersectAll(jan96)
        .groupBy("priority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("priority")
    )


@register(
    "setop_symmetric_difference",
    oracle="""
SELECT c_custkey, side FROM (
  SELECT c_custkey, 'only_big_spenders' AS side
  FROM (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000
        EXCEPT
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
  UNION ALL
  SELECT c_custkey, 'only_f_status' AS side
  FROM (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT
        SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 150000)
)
ORDER BY c_custkey, side
""",
    tags=("setop", "symmetric-difference"),
)
def setop_symmetric_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference with provenance: customers in exactly one
    of two cohorts, tagged with which side they came from — the
    audience-comparison op (A-only / B-only) that plain EXCEPT answers
    only half of. Two EXCEPTs over deduped key sets union'd with a
    side label; each EXCEPT is one hash aggregation on the key."""
    orders = load_table(spark, sf_dir, "orders")
    big = orders.where(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("c_custkey")
    ).distinct()
    fstat = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    ).distinct()
    only_a = big.exceptAll(fstat).select(
        "c_custkey", F.lit("only_big_spenders").alias("side")
    )
    only_b = fstat.exceptAll(big).select(
        "c_custkey", F.lit("only_f_status").alias("side")
    )
    return only_a.unionByName(only_b).orderBy("c_custkey", "side")


@register(
    "setop_union_by_name_evolution",
    oracle="""
WITH v1 AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(14,2)) AS price,
         NULL AS o_orderpriority
  FROM orders WHERE o_orderkey % 3 = 0
),
v2 AS (
  SELECT o_orderkey, o_orderstatus,
         NULL AS price,
         o_orderpriority
  FROM orders WHERE o_orderkey % 3 = 1
),
u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(COUNT(price) AS BIGINT) AS n_with_price,
       CAST(COUNT(o_orderpriority) AS BIGINT) AS n_with_priority,
       CAST(SUM(COALESCE(price, 0)) AS DOUBLE) AS total_priced
FROM u
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    tags=("setop", "union-by-name", "schema-evolution"),
)
def setop_union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two snapshots of the "same" table whose
    column sets drifted (v1 carries price, v2 carries priority) merge
    with ``unionByName(allowMissingColumns=True)`` — missing columns
    null-fill BY NAME, where positional UNION ALL would silently zip
    mismatched columns together (the classic pipeline-breaking bug
    when a landing-zone schema evolves mid-backfill). The null-count
    columns in the output pin exactly which side contributed which
    fields. Union is a zero-shuffle plan node; only the final tiny
    aggregate exchanges."""
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        dec("o_totalprice", 14, 2).alias("price"),
    )
    v2 = orders.where(F.col("o_orderkey") % 3 == 1).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    u = v1.unionByName(v2, allowMissingColumns=True)
    return (
        u.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("price").cast("long").alias("n_with_price"),
            F.count("o_orderpriority").cast("long").alias("n_with_priority"),
            F.sum(F.coalesce(F.col("price"), F.lit(0)))
            .cast("double")
            .alias("total_priced"),
        )
        .orderBy("o_orderstatus")
    )
