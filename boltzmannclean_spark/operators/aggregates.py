"""Aggregation operators (SURVEY.md §2.B "Aggregations").

All hash aggregations get Catalyst's partial+final split automatically —
each exchange moves one row per (partition × group), so these plans'
shuffle volume is bounded by group cardinality, not input size.

Cross-engine float discipline (functions/exact.py): money sums in exact
decimal; statistical moments computed from exact decimal power sums with
the SAME double expression on both engines (builtin stddev/corr stream
in engine-specific merge orders and cannot hash-match, so the builtins
are exercised in the rows-only query + pytest bounds instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from boltzmannclean_spark.functions.exact import dec
from boltzmannclean_spark.plans.registry import register
from boltzmannclean_spark.sources.catalog import load_table


@register(
    "agg_distinct",
    oracle="""
SELECT
  o_orderstatus,
  COUNT(*) AS n_orders,
  COUNT(DISTINCT o_custkey) AS n_customers,
  COUNT(DISTINCT o_orderpriority) AS n_priorities
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    tags=("aggregate", "distinct"),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT DISTINCT (Catalyst expands to a two-level aggregation)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_dedup_exact_rows",
    oracle="""
SELECT DISTINCT o_orderstatus, o_orderpriority
FROM orders
ORDER BY o_orderstatus, o_orderpriority
""",
    tags=("aggregate", "distinct"),
)
def agg_dedup_exact_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT / dropDuplicates as an operator."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderstatus", "o_orderpriority")
        .dropDuplicates()
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@register(
    "agg_rollup",
    oracle="""
SELECT
  COALESCE(n_name, '(all)')       AS n_name,
  COALESCE(c_mktsegment, '(all)') AS c_mktsegment,
  GROUPING(n_name, c_mktsegment) AS gid,
  COUNT(*) AS n_customers,
  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sum_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, c_mktsegment)
ORDER BY gid, n_name, c_mktsegment
""",
    tags=("aggregate", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping_id over a broadcast dim join. Rolled-up keys
    are coalesced to a sentinel: NULL group keys break row-sort
    comparators (None<str) and pandas dtype coercion downstream."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(dec("c_acctbal")).cast("double").alias("sum_acctbal"),
        )
        .select(
            F.coalesce("n_name", F.lit("(all)")).alias("n_name"),
            F.coalesce("c_mktsegment", F.lit("(all)")).alias("c_mktsegment"),
            "gid",
            "n_customers",
            "sum_acctbal",
        )
        .orderBy("gid", "n_name", "c_mktsegment")
    )


@register(
    "agg_cube",
    oracle="""
SELECT
  COALESCE(l_returnflag, '(all)') AS l_returnflag,
  COALESCE(l_linestatus, '(all)') AS l_linestatus,
  GROUPING(l_returnflag, l_linestatus) AS gid,
  COUNT(*) AS n_items,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
""",
    tags=("aggregate", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("l_linestatus"),
            "gid",
            "n_items",
            "sum_qty",
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


@register(
    "agg_filtered",
    oracle="""
SELECT
  c_mktsegment,
  COUNT(*) AS n_orders,
  COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent,
  CAST(CAST(SUM(CASE WHEN o_orderstatus = 'F'
                THEN CAST(o_totalprice AS DECIMAL(12,2))
                ELSE CAST(0 AS DECIMAL(12,2)) END) AS STRING) AS DOUBLE) AS finished_value
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    tags=("aggregate", "conditional"),
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregation (SUM(CASE WHEN ...))."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    zero = F.lit(0).cast("decimal(12,2)")
    return (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias(
                "n_urgent"
            ),
            F.sum(F.when(F.col("o_orderstatus") == "F", dec("o_totalprice")).otherwise(zero))
            .cast("double")
            .alias("finished_value"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "agg_stats_exact",
    # Decimal→double casts hop via VARCHAR: DuckDB's direct cast is not
    # correctly rounded past a 2^53 mantissa (the x10 sweep flipped
    # corr's last ulp at 6M rows via the ~1e20 sums of squares);
    # string→double parsing matches Spark's correctly-rounded
    # Decimal.toDouble at every magnitude. See pricing_summary.
    oracle="""
WITH s AS (
  SELECT
    l_returnflag,
    COUNT(*) AS n,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sx,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sxx,
    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sy,
    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS syy,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT
  l_returnflag,
  n,
  sx / n AS mean_qty,
  (sxx - sx * sx / n) / (n - 1) AS var_qty,
  SQRT((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
  (n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)) AS corr_qty_price
FROM s
ORDER BY l_returnflag
""",
    tags=("aggregate", "stats"),
)
def agg_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev / correlation from exact decimal power sums.

    One pass, partial+final aggregation; the closed-form moment algebra
    runs on bit-identical doubles in both engines (builtin streaming
    stddev/corr cannot hash-match across engines — see agg_stats_builtin).
    """
    li = load_table(spark, sf_dir, "lineitem")
    q, p = dec("l_quantity"), dec("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(p * p).cast("double").alias("syy"),
        F.sum(q * p).cast("double").alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return s.select(
        "l_returnflag",
        "n",
        (sx / n).alias("mean_qty"),
        ((sxx - sx * sx / n) / (n - 1)).alias("var_qty"),
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("stddev_qty"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


@register(
    "agg_stats_builtin",
    # Spark's streaming-moment aggregates differ from a closed-form
    # computation only in low-order bits (merge-order noise); casting both
    # engines' results to FLOAT (24-bit mantissa) absorbs that while still
    # checking ~7 significant digits. The oracle computes Spark's exact
    # DEFINITIONS (population skewness m3/m2^1.5, population excess
    # kurtosis m4/m2^2-3, sample stddev/var/covar) from exact decimal
    # power sums — DuckDB's own skewness/kurtosis use different
    # bias-corrected sample definitions and would never match.
    oracle="""
WITH s AS (
  SELECT
    l_returnflag,
    COUNT(*) AS n,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS s1,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS s2,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS s3,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS s4,
    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sy,
    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS syy,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sxy
  FROM lineitem
  GROUP BY l_returnflag
),
m AS (
  SELECT *,
    s1 / n AS mean,
    s2 / n - (s1 / n) * (s1 / n) AS m2,
    s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
    s4 / n - 4 * (s1 / n) * (s3 / n)
      + 6 * (s1 / n) * (s1 / n) * (s2 / n)
      - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
  FROM s
)
SELECT
  l_returnflag,
  CAST(SQRT((s2 - s1 * s1 / n) / (n - 1)) AS FLOAT) AS stddev_qty,
  CAST((s2 - s1 * s1 / n) / (n - 1) AS FLOAT) AS var_qty,
  CAST((n * sxy - s1 * sy)
       / (SQRT(n * s2 - s1 * s1) * SQRT(n * syy - sy * sy)) AS FLOAT)
    AS corr_qty_price,
  CAST((sxy - s1 * sy / n) / (n - 1) AS FLOAT) AS covar_qty_price,
  CAST(m3 / POW(m2, 1.5) AS FLOAT) AS skew_qty,
  CAST(m4 / (m2 * m2) - 3 AS FLOAT) AS kurt_qty
FROM m
ORDER BY l_returnflag
""",
    tags=("aggregate", "stats"),
)
def agg_stats_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builtin streaming statistical aggregates (stddev, variance, corr,
    covar_samp, skewness, kurtosis), float-cast for cross-engine parity
    against a closed-form moment oracle. The approximate sketches
    (HLL++, percentile_approx) live in agg_approx_sketches (rows-only —
    sketch internals are engine-specific by design)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.stddev("l_quantity").cast("float").alias("stddev_qty"),
            F.variance("l_quantity").cast("float").alias("var_qty"),
            F.corr("l_quantity", "l_extendedprice").cast("float").alias("corr_qty_price"),
            F.covar_samp("l_quantity", "l_extendedprice")
            .cast("float")
            .alias("covar_qty_price"),
            F.skewness("l_quantity").cast("float").alias("skew_qty"),
            F.kurtosis("l_quantity").cast("float").alias("kurt_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_approx_sketches",
    oracle=None,  # HLL++ / KLL sketch values are engine-specific by design
    tags=("aggregate", "approx", "sketch"),
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates over sketches: approx_count_distinct
    (HyperLogLog++) and percentile_approx. Cross-engine value parity is
    impossible by construction (different sketch algorithms), so the
    driver row is rows-only; error bounds vs exact answers are asserted
    in tests/test_approx.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_median_percentile",
    oracle="""
SELECT
  l_returnflag,
  median(l_quantity) AS median_qty,
  quantile_cont(l_quantity, 0.25) AS p25_qty,
  quantile_cont(l_quantity, 0.90) AS p90_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("aggregate", "stats"),
)
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median / interpolated percentiles (Spark ``percentile`` and
    DuckDB ``quantile_cont`` share linear interpolation semantics)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.median("l_quantity").alias("median_qty"),
            F.percentile("l_quantity", 0.25).alias("p25_qty"),
            F.percentile("l_quantity", 0.90).alias("p90_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_collect",
    oracle="""
SELECT
  n_name,
  array_to_string(list_sort(list_distinct(list(c_mktsegment))), ',') AS segments,
  MAX_BY(c_custkey, c_acctbal * 10000000 + c_custkey) AS top_customer,
  MIN_BY(c_custkey, c_acctbal * 10000000 + c_custkey) AS bottom_customer
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
    tags=("aggregate", "collect"),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect-set (sorted, joined to a string for deterministic hashing)
    + max_by/min_by with an arithmetic tiebreak (2-decimal balances ×1e7
    + unique key stays exact in doubles, so ties are deterministic)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rank_key = F.col("c_acctbal") * 10000000 + F.col("c_custkey")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            ),
            F.max_by("c_custkey", rank_key).alias("top_customer"),
            F.min_by("c_custkey", rank_key).alias("bottom_customer"),
        )
        .orderBy("n_name")
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT
  COALESCE(o_orderstatus, '(all)')   AS o_orderstatus,
  COALESCE(o_orderpriority, '(all)') AS o_orderpriority,
  GROUPING(o_orderstatus, o_orderpriority) AS gid,
  COUNT(*) AS n_orders,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS total_value
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY gid, o_orderstatus, o_orderpriority
""",
    tags=("aggregate", "grouping_sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): per-status,
    per-priority, and grand-total groups in one pass — Catalyst expands
    to a single Expand + hash aggregate, not three scans."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("bcs_orders")
    return spark.sql(
        """
        SELECT
          COALESCE(o_orderstatus, '(all)')   AS o_orderstatus,
          COALESCE(o_orderpriority, '(all)') AS o_orderpriority,
          GROUPING_ID(o_orderstatus, o_orderpriority) AS gid,
          COUNT(*) AS n_orders,
          CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS total_value
        FROM bcs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY gid, o_orderstatus, o_orderpriority
        """
    )


@register(
    "agg_pivot",
    oracle="""
SELECT
  n_name,
  COUNT(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END) AS automobile,
  COUNT(CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 END) AS building,
  COUNT(CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 END) AS furniture,
  COUNT(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1 END) AS household,
  COUNT(CASE WHEN c_mktsegment = 'MACHINERY'  THEN 1 END) AS machinery
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
    tags=("aggregate", "pivot"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): customer counts per nation × market segment.
    With the pivot values listed explicitly Spark skips the extra
    distinct-values job and plans ONE aggregation pass — pivot compiles
    to exactly the conditional-aggregation plan the oracle spells out,
    so there is no shuffle beyond the groupBy."""
    segments = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    wide = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .pivot("c_mktsegment", segments)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "n_name",
        *[F.coalesce(F.col(s), F.lit(0)).alias(s.lower()) for s in segments],
    ).orderBy("n_name")


@register(
    "agg_unpivot",
    oracle="""
SELECT o_orderpriority, metric, value FROM (
  SELECT o_orderpriority, 'n_orders' AS metric,
         CAST(COUNT(*) AS DOUBLE) AS value
  FROM orders GROUP BY o_orderpriority
  UNION ALL
  SELECT o_orderpriority, 'total_value' AS metric,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE) AS value
  FROM orders GROUP BY o_orderpriority
  UNION ALL
  SELECT o_orderpriority, 'max_value' AS metric,
         CAST(MAX(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS value
  FROM orders GROUP BY o_orderpriority
) t
ORDER BY o_orderpriority, metric
""",
    tags=("aggregate", "unpivot", "melt"),
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide→long): per-priority order stats melted into
    (key, metric, value) rows via DataFrame.unpivot — the Spark-native
    melt. Executes as a generate (explode) over the aggregated rows: no
    extra shuffle after the aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.sum(dec("o_totalprice", 14)).cast("double").alias("total_value"),
        F.max(dec("o_totalprice", 14)).cast("double").alias("max_value"),
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["n_orders", "total_value", "max_value"],
        variableColumnName="metric",
        valueColumnName="value",
    ).orderBy("o_orderpriority", "metric")


@register(
    "agg_boolean_countif",
    oracle="""
SELECT l_returnflag,
       COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS n_bulk,
       BOOL_AND(l_discount <= 0.1) AS all_modest_discount,
       BOOL_OR(l_tax > 0.07) AS any_high_tax,
       COUNT(CASE WHEN l_quantity > 25 THEN 1 END)
         * 1.0 / COUNT(*) AS bulk_frac
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("aggregate", "boolean", "countif"),
)
def agg_boolean_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family: count_if / bool_and (every) / bool_or
    (any) — predicate rollups that stay a single partial+final hash
    aggregate (each boolean agg is one bit of partial state, the
    cheapest aggregates there are). bulk_frac divides two exact counts,
    so the double is bit-identical cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    bulk = F.count_if(F.col("l_quantity") > 25)
    return (
        li.groupBy("l_returnflag")
        .agg(
            bulk.alias("n_bulk"),
            F.bool_and(F.col("l_discount") <= 0.1).alias("all_modest_discount"),
            F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
            (bulk * F.lit(1.0) / F.count(F.lit(1))).alias("bulk_frac"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "ml_linreg_sufficient_stats",
    oracle="""
WITH s AS (
  -- decimal->double via VARCHAR: DuckDB's direct DECIMAL->DOUBLE cast is
  -- not correctly rounded past 2^53 mantissas (the price-squared sums
  -- cross it at ~6M rows); string->double parsing is.
  SELECT l_returnflag, COUNT(*) AS n,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                  * CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                  * CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sxy,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS syy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept,
       ((n * sxy - sx * sy) * (n * sxy - sx * sy))
         / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
FROM s
ORDER BY l_returnflag
""",
    tags=("ml", "regression", "aggregate"),
)
def ml_linreg_sufficient_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed OLS (price ~ quantity per return flag) via sufficient
    statistics: the five power sums accumulate EXACTLY in decimals (2-dp
    money × 2-dp quantity products are exact in DECIMAL), then the
    closed-form slope/intercept/R² evaluates per group from identical
    doubles — the one-pass, shuffle-one-row-per-group pattern that is
    the only way to fit millions of small regressions at 100 TB (MLlib
    itself aggregates the same normal-equation terms)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = dec("l_quantity")
    y = dec("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        (
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("r2"),
    ).orderBy("l_returnflag")


@register(
    "agg_percentile_disc",
    oracle="""
SELECT l_returnflag,
       quantile_disc(l_quantity, 0.25) AS p25_qty,
       quantile_disc(l_quantity, 0.50) AS p50_qty,
       quantile_disc(l_quantity, 0.75) AS p75_qty,
       quantile_disc(l_extendedprice, 0.90) AS p90_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("aggregate", "percentile", "disc"),
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (percentile_disc / quantile_disc): returns
    an ACTUAL data element, never an interpolation — which is why the
    values hash-match across engines bit-for-bit with no float recipe
    at all (continuous quantiles interpolate and need one). Exact
    percentile aggregation sorts within groups; at 100 TB the
    approx_percentile sketch next door (agg_approx_sketches) is the
    scale path, this is the audit path."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)"
            ).alias("p25_qty"),
            F.expr(
                "percentile_disc(0.50) WITHIN GROUP (ORDER BY l_quantity)"
            ).alias("p50_qty"),
            F.expr(
                "percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity)"
            ).alias("p75_qty"),
            F.expr(
                "percentile_disc(0.90) WITHIN GROUP (ORDER BY l_extendedprice)"
            ).alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_listagg",
    oracle="""
SELECT n_regionkey,
       STRING_AGG(n_name, '|' ORDER BY n_name) AS nations,
       STRING_AGG(DISTINCT SUBSTRING(n_name, 1, 7), '|' ORDER BY SUBSTRING(n_name, 1, 7))
         AS name_prefixes
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
""",
    tags=("aggregate", "listagg", "4.x"),
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg / string_agg (4.x): ordered string concatenation as a
    real aggregate — WITHIN GROUP fixes the concatenation order, so the
    result is deterministic under any shuffle (an unordered listagg is
    a flaky-output bug factory). DISTINCT + ordered variant included."""
    nation = load_table(spark, sf_dir, "nation")
    nation.createOrReplaceTempView("nation")
    return spark.sql(
        """
SELECT n_regionkey,
       listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name) AS nations,
       listagg(DISTINCT SUBSTRING(n_name, 1, 7), '|')
         WITHIN GROUP (ORDER BY SUBSTRING(n_name, 1, 7)) AS name_prefixes
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
"""
    )


@register(
    "agg_weighted_avg",
    oracle="""
SELECT l_returnflag,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE)
         / CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE)
         AS qty_weighted_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) / COUNT(*)
         AS plain_avg_price,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("aggregate", "weighted"),
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mean (Σw·x / Σw) with EXACT decimal numerator and
    denominator — the aggregation every pricing/index computation
    needs, and a decimal-recipe showcase: both power sums are exact, so
    the one double division is bit-identical cross-engine. Plain mean
    alongside shows the weighting effect."""
    li = load_table(spark, sf_dir, "lineitem")
    price, qty = dec("l_extendedprice"), dec("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            (
                F.sum(price * qty).cast("double")
                / F.sum(qty).cast("double")
            ).alias("qty_weighted_price"),
            (F.sum(price).cast("double") / F.count(F.lit(1))).alias(
                "plain_avg_price"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_corr_matrix",
    oracle="""
WITH c AS (
  SELECT CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS q,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS p,
         CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS d
  FROM lineitem
),
s AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(q AS HUGEINT)) AS DOUBLE) AS sq,
         CAST(SUM(CAST(p AS HUGEINT)) AS DOUBLE) AS sp,
         CAST(SUM(CAST(d AS HUGEINT)) AS DOUBLE) AS sd,
         CAST(SUM(CAST(q * q AS HUGEINT)) AS DOUBLE) AS sqq,
         CAST(SUM(CAST(p * p AS HUGEINT)) AS DOUBLE) AS spp,
         CAST(SUM(CAST(d * d AS HUGEINT)) AS DOUBLE) AS sdd,
         CAST(SUM(CAST(q * p AS HUGEINT)) AS DOUBLE) AS sqp,
         CAST(SUM(CAST(q * d AS HUGEINT)) AS DOUBLE) AS sqd,
         CAST(SUM(CAST(p * d AS HUGEINT)) AS DOUBLE) AS spd
  FROM c
)
SELECT col_x, col_y,
       (n * sxy - sx * sy)
         / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr,
       n AS n_rows
FROM (
  SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
         n, sq AS sx, sp AS sy, sqq AS sxx, spp AS syy, sqp AS sxy FROM s
  UNION ALL
  SELECT 'l_quantity', 'l_discount', n, sq, sd, sqq, sdd, sqd FROM s
  UNION ALL
  SELECT 'l_extendedprice', 'l_discount', n, sp, sd, spp, sdd, spd FROM s
)
ORDER BY col_x, col_y
""",
    tags=("aggregate", "statistics", "correlation"),
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over three lineitem measures
    from ONE pass of sufficient statistics — the way a 100 TB profiler
    computes all pairwise correlations: a single partial+final hash
    aggregation of 10 sums, then a 1-row driver-free expansion into the
    pair rows. Determinism: inputs become exact integer cents (per-row,
    engine-identical), per-row products stay within int64, sums are
    exact wide-integer (decimal(38,0) / HUGEINT), and the correlation
    formula is evaluated in the same double-op order in both engines —
    bit-identical without any tolerance."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.select(
        (dec("l_quantity") * 100).cast("long").alias("q"),
        (dec("l_extendedprice") * 100).cast("long").alias("p"),
        (dec("l_discount", 4, 2) * 100).cast("long").alias("d"),
    )

    def wide(col: F.Column) -> F.Column:
        return F.sum(col.cast("decimal(38,0)")).cast("double")

    s = c.agg(
        F.count(F.lit(1)).alias("n"),
        wide(F.col("q")).alias("sq"),
        wide(F.col("p")).alias("sp"),
        wide(F.col("d")).alias("sd"),
        wide(F.col("q") * F.col("q")).alias("sqq"),
        wide(F.col("p") * F.col("p")).alias("spp"),
        wide(F.col("d") * F.col("d")).alias("sdd"),
        wide(F.col("q") * F.col("p")).alias("sqp"),
        wide(F.col("q") * F.col("d")).alias("sqd"),
        wide(F.col("p") * F.col("d")).alias("spd"),
    )
    pairs = s.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("l_quantity").alias("col_x"),
                    F.lit("l_extendedprice").alias("col_y"),
                    F.col("n").alias("n"),
                    F.col("sq").alias("sx"),
                    F.col("sp").alias("sy"),
                    F.col("sqq").alias("sxx"),
                    F.col("spp").alias("syy"),
                    F.col("sqp").alias("sxy"),
                ),
                F.struct(
                    F.lit("l_quantity").alias("col_x"),
                    F.lit("l_discount").alias("col_y"),
                    F.col("n").alias("n"),
                    F.col("sq").alias("sx"),
                    F.col("sd").alias("sy"),
                    F.col("sqq").alias("sxx"),
                    F.col("sdd").alias("syy"),
                    F.col("sqd").alias("sxy"),
                ),
                F.struct(
                    F.lit("l_extendedprice").alias("col_x"),
                    F.lit("l_discount").alias("col_y"),
                    F.col("n").alias("n"),
                    F.col("sp").alias("sx"),
                    F.col("sd").alias("sy"),
                    F.col("spp").alias("sxx"),
                    F.col("sdd").alias("syy"),
                    F.col("spd").alias("sxy"),
                ),
            )
        ).alias("e")
    ).select("e.*")
    return pairs.select(
        "col_x",
        "col_y",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            )
        ).alias("corr"),
        F.col("n").alias("n_rows"),
    ).orderBy("col_x", "col_y")


# Count-min sketch geometry: 4 rows × 256 buckets of int64 counters —
# 8 KB total, mergeable by elementwise +, built with ONE aggregation.
CMS_K = 4
CMS_W = 256


@register(
    "agg_countmin_heavy_hitters",
    oracle=f"""
WITH h AS (
  SELECT user_id,
         CAST(UNNEST(range(0, {CMS_K})) AS INTEGER) AS k
  FROM events
),
cells AS (
  SELECT k,
         ('0x' || substring(md5(k::VARCHAR || ':' || user_id::VARCHAR), 1, 8))::BIGINT
           % {CMS_W} AS bucket,
         COUNT(*) AS cnt
  FROM h
  GROUP BY 1, 2
),
truth AS (
  SELECT user_id, COUNT(*) AS true_count
  FROM events GROUP BY user_id
),
est AS (
  SELECT t.user_id, t.true_count, MIN(c.cnt) AS cms_estimate
  FROM truth t
  JOIN cells c
    ON c.bucket = ('0x' || substring(md5(c.k::VARCHAR || ':' || t.user_id::VARCHAR), 1, 8))::BIGINT
                  % {CMS_W}
  GROUP BY t.user_id, t.true_count
)
SELECT user_id, true_count, CAST(cms_estimate AS BIGINT) AS cms_estimate
FROM est
WHERE cms_estimate >= 100
ORDER BY user_id
""",
    tags=("aggregate", "sketch", "count-min"),
)
def agg_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters, built entirely from deterministic
    SQL primitives so the sketch itself is oracle-exact (unlike opaque
    binary sketches): 4 md5-derived hash rows × 256 counters — an 8 KB
    summary whatever the stream size, mergeable across partitions/days
    by elementwise addition (the counter build IS a partial+final hash
    agg). Estimates are min-over-rows, always ≥ the true count
    (one-sided error ≤ 2N/w with prob 1-2^-k); emitted hitters are
    those whose ESTIMATE clears the threshold — the standard CMS
    screen, here joined back to true counts so the overestimate is
    visible and testable. The query side reuses the same md5 buckets as
    an equi-join, so probing n keys costs one broadcast-sized join, not
    n sketch lookups."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        "user_id",
        F.explode(F.array(*[F.lit(k) for k in range(CMS_K)])).alias("k"),
    )
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("k").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(CMS_W),
    )
    cells = (
        h.select("k", bucket.alias("bucket"))
        .groupBy("k", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    probe = truth.select(
        "user_id",
        "true_count",
        F.explode(F.array(*[F.lit(k) for k in range(CMS_K)])).alias("k"),
    ).select(
        "user_id",
        "true_count",
        "k",
        bucket.alias("bucket"),
    )
    return (
        probe.join(F.broadcast(cells), ["k", "bucket"])
        .groupBy("user_id", "true_count")
        .agg(F.min("cnt").alias("cms_estimate"))
        .where(F.col("cms_estimate") >= 100)
        .orderBy("user_id")
    )


@register(
    "agg_hll_mergeable_rollup",
    oracle=None,  # Datasketches HLL binaries are engine-specific;
    # the mergeability equality + error-bound invariants live in
    # tests/test_approx.py.
    tags=("aggregate", "sketch", "hll", "mergeable"),
)
def agg_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — THE pattern for distinct counts over
    100 TB cubes: build per-(event_type, day) HLL sketches of distinct
    users ONCE, then answer the coarser (event_type) level by UNIONING
    the daily sketches instead of rescanning raw events. HLL register
    state is an order-independent max, so union-of-dailies equals the
    sketch built directly from raw rows EXACTLY (asserted in tests),
    and a day's sketch is reusable by any rollup that includes the day
    — the pre-aggregation contract that exact distinct counts cannot
    offer. Emits both estimates side by side with the per-level day
    count; 12 KB of sketch per group regardless of row count."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "user_id"
    ).groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    rolled = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_union"),
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est_direct"),
        F.count_distinct("user_id").alias("exact_distinct"),
    )
    return (
        rolled.join(direct, "event_type")
        .select("event_type", "n_days", "est_union", "est_direct", "exact_distinct")
        .orderBy("event_type")
    )


@register(
    "agg_mode_deterministic",
    oracle="""
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
r AS (
  SELECT o_orderstatus, o_orderpriority, n,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY n DESC, o_orderpriority) AS rk
  FROM c
)
SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_count
FROM r WHERE rk = 1
ORDER BY o_orderstatus
""",
    tags=("aggregate", "mode", "statistics"),
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group with a DETERMINISTIC tiebreak (highest
    count, then lexicographically smallest value) — Spark's builtin
    ``mode()`` is non-deterministic under ties, which is exactly the
    kind of silent cross-run drift a 100 TB pipeline can't debug, so
    the engine's mode is count-then-max_by over an explicit (n, value)
    ordering: two partial+final hash aggregations, no window over raw
    rows."""
    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    # "Max count, then min value" in three tiny post-aggregation steps
    # over the (status, priority, n) counts (≤ 15 rows): take max(n)
    # per status, join back to keep only the tied-for-max rows, then
    # min(priority) breaks the tie. All work after the first aggregate
    # is on group-count-sized data.
    best = (
        c.groupBy("o_orderstatus")
        .agg(F.max("n").alias("mode_count"))
        .join(c, "o_orderstatus")
        .where(F.col("n") == F.col("mode_count"))
        .groupBy("o_orderstatus", "mode_count")
        .agg(F.min("o_orderpriority").alias("mode_priority"))
    )
    return best.select(
        "o_orderstatus", "mode_priority", "mode_count"
    ).orderBy("o_orderstatus")


QH_BIN_CENTS = 10_000  # $100 histogram bins
QH_PCTS = (50, 90, 99)


@register(
    "agg_quantile_mergeable",
    oracle=f"""
WITH c AS (
  SELECT o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
           // {QH_BIN_CENTS} AS bin
  FROM orders
),
hg AS (
  SELECT o_orderstatus, bin, COUNT(*) AS n FROM c GROUP BY 1, 2
),
merged AS (
  SELECT bin, CAST(SUM(n) AS BIGINT) AS n FROM hg GROUP BY bin
),
direct AS (
  SELECT bin, COUNT(*) AS n FROM c GROUP BY bin
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM direct),
cum_m AS (
  SELECT bin, SUM(n) OVER (ORDER BY bin
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM merged
),
cum_d AS (
  SELECT bin, SUM(n) OVER (ORDER BY bin
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM direct
),
pcts AS (SELECT UNNEST([{", ".join(str(p) for p in QH_PCTS)}]) AS p),
qm AS (
  SELECT p, MIN(bin) AS mbin
  FROM pcts CROSS JOIN tot JOIN cum_m
    ON cum_m.cum * 100 >= p * tot.t
  GROUP BY p
),
qd AS (
  SELECT p, MIN(bin) AS dbin
  FROM pcts CROSS JOIN tot JOIN cum_d
    ON cum_d.cum * 100 >= p * tot.t
  GROUP BY p
)
SELECT qd.p AS percentile,
       qd.dbin * {QH_BIN_CENTS} AS direct_bin_lo_cents,
       qm.mbin * {QH_BIN_CENTS} AS merged_bin_lo_cents,
       (qd.dbin = qm.mbin) AS merge_agrees
FROM qd JOIN qm ON qd.p = qm.p
ORDER BY percentile
""",
    tags=("aggregate", "quantile", "mergeable", "histogram"),
)
def agg_quantile_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles via fixed-bin histograms — the pre-aggregation
    contract that makes percentile CUBES possible at 100 TB: per-group
    ($100-bin) histograms roll up by simple ADDITION, and any quantile
    is read off the merged cumulative histogram, so per-day/per-segment
    sketches combine without touching raw rows again (exact percentiles
    don't merge; t-digest merges approximately and non-deterministically
    — fixed bins merge EXACTLY at bin resolution). The query PROVES the
    merge law on real data: p50/p90/p99 bins computed from per-status
    histograms summed together must equal the bins from a direct global
    histogram (`merge_agrees` all-true). The quantile rule — smallest
    bin with cum·100 ≥ p·total — is pure integer arithmetic, bit-exact
    in both engines."""
    o = load_table(spark, sf_dir, "orders")
    c = o.select(
        "o_orderstatus",
        F.expr(
            f"CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"
            f" div {QH_BIN_CENTS}"
        ).alias("bin"),
    )
    hg = c.groupBy("o_orderstatus", "bin").agg(F.count(F.lit(1)).alias("n"))
    merged = hg.groupBy("bin").agg(F.sum("n").alias("n"))
    direct = c.groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
    tot = direct.agg(F.sum("n").alias("t"))
    wcum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pcts = spark.range(len(QH_PCTS)).select(
        F.element_at(
            F.array(*[F.lit(p) for p in QH_PCTS]), (F.col("id") + 1).cast("int")
        ).alias("p")
    )

    def quantiles(hist: DataFrame, out: str) -> DataFrame:
        # Bin count is bounded by the value domain / bin width, NOT the
        # corpus (≪ data), so the single-partition cumsum window is over
        # a domain-sized table — the same bounded-window argument as
        # relational_skyline.
        cum = hist.select("bin", F.sum("n").over(wcum).alias("cum"))
        return (
            pcts.crossJoin(F.broadcast(tot))
            .join(cum, F.col("cum") * 100 >= F.col("p") * F.col("t"))
            .groupBy("p")
            .agg(F.min("bin").alias(out))
        )
    qd = quantiles(direct, "dbin")
    qm = quantiles(merged, "mbin")
    return (
        qd.join(qm, "p")
        .select(
            F.col("p").alias("percentile"),
            (F.col("dbin") * QH_BIN_CENTS).alias("direct_bin_lo_cents"),
            (F.col("mbin") * QH_BIN_CENTS).alias("merged_bin_lo_cents"),
            (F.col("dbin") == F.col("mbin")).alias("merge_agrees"),
        )
        .orderBy("percentile")
    )


N_DEPTH_BUCKETS = 10  # equi-depth deciles per group


@register(
    "agg_histogram_equidepth",
    oracle=f"""
WITH t AS (
  SELECT o_orderstatus, o_totalprice,
         NTILE({N_DEPTH_BUCKETS}) OVER (
           PARTITION BY o_orderstatus
           ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders
)
SELECT o_orderstatus, bucket,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS lo,
       MAX(o_totalprice) AS hi,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS bucket_sum
FROM t
GROUP BY o_orderstatus, bucket
ORDER BY o_orderstatus, bucket
""",
    tags=("aggregate", "histogram", "equi-depth"),
)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-count) histogram of order totals, {N_DEPTH_BUCKETS}
    buckets per order status: ntile over a per-group sort, then a hash
    aggregation — the complement of ``agg_histogram_fixed``'s equal-width
    bins and the optimizer-statistics shape (equi-depth bounds are what
    a CBO stores). Ties broken by o_orderkey so bucket membership is
    deterministic cross-engine.

    Scale: ntile needs a per-GROUP total order, so the window partitions
    on o_orderstatus — parallelism = group count, and a single group at
    100 TB would sort on one reducer. That is inherent to EXACT
    equi-depth; the production-scale path for a global histogram is the
    mergeable KLL sketch already registered as ``agg_quantile_mergeable``
    (approximate bounds, fully parallel). This operator is the exact
    small-group form; the window+agg share one o_orderstatus exchange."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    t = orders.select(
        "o_orderstatus",
        "o_totalprice",
        F.ntile(N_DEPTH_BUCKETS).over(w).alias("bucket"),
    )
    return (
        t.groupBy("o_orderstatus", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            F.sum(dec("o_totalprice")).cast("double").alias("bucket_sum"),
        )
        .orderBy("o_orderstatus", "bucket")
    )


@register(
    "agg_cms_join_size_estimate",
    oracle=f"""
WITH keys AS (
  SELECT l_partkey AS key FROM lineitem
),
hashed AS (
  SELECT key, CAST(UNNEST(range(0, {CMS_K})) AS INTEGER) AS k FROM keys
),
cells AS (
  SELECT k,
         ('0x' || substring(md5(k::VARCHAR || ':' || key::VARCHAR), 1, 8))::BIGINT
           % {CMS_W} AS bucket,
         COUNT(*) AS cnt
  FROM hashed GROUP BY k, bucket
),
est AS (
  SELECT MIN(row_est) AS est_join_size FROM (
    SELECT k, CAST(SUM(cnt * cnt) AS BIGINT) AS row_est
    FROM cells GROUP BY k
  )
),
exact AS (
  SELECT CAST(SUM(c * c) AS BIGINT) AS exact_join_size FROM (
    SELECT key, COUNT(*) AS c FROM keys GROUP BY key
  )
)
SELECT exact.exact_join_size, est.est_join_size,
       CAST(est.est_join_size AS DOUBLE) / exact.exact_join_size
         AS overestimate_ratio
FROM exact CROSS JOIN est
""",
    tags=("aggregate", "sketch", "cardinality"),
)
def agg_cms_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from count-min sketches (Cormode &
    Muthukrishnan's inner-product estimator): the predicted row count of
    the lineitem self-equi-join on l_partkey is min over hash rows of
    Σ_bucket cms[b]² — computed from the 8 KB sketch alone, never from
    the data — compared in-query against the exact Σ c_key². This is
    the cost-model primitive a distributed optimizer uses to pick join
    order / strategy BEFORE launching a 100 TB shuffle; the estimator
    only ever over-counts (hash collisions add cross terms), so
    overestimate_ratio ≥ 1 by construction. One scan builds the sketch
    (same md5 hash family as ``agg_countmin_heavy_hitters``, mergeable
    by elementwise +); everything downstream is sketch-sized."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("key")
    )
    hashed = li.select(
        "key",
        F.explode(F.array(*[F.lit(k) for k in range(CMS_K)])).alias("k"),
    )
    cells = hashed.select(
        "k",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.col("k").cast("string"), F.col("key").cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(CMS_W),
        ).alias("bucket"),
    ).groupBy("k", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    est = (
        cells.groupBy("k")
        .agg(F.sum(F.col("cnt") * F.col("cnt")).alias("row_est"))
        .agg(F.min("row_est").alias("est_join_size"))
    )
    exact = (
        li.groupBy("key")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("exact_join_size"))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_join_size",
        "est_join_size",
        (
            F.col("est_join_size").cast("double") / F.col("exact_join_size")
        ).alias("overestimate_ratio"),
    )


@register(
    "agg_kmv_intersection_estimate",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
ua AS (SELECT DISTINCT doc_id FROM tok WHERE w = 'the'),
ub AS (SELECT DISTINCT doc_id FROM tok WHERE w = 'data'),
ha AS (
  SELECT ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS h
  FROM ua
),
hb AS (
  SELECT ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS h
  FROM ub
),
ka AS (SELECT MAX(h) AS theta_a FROM (SELECT h FROM ha ORDER BY h LIMIT 32)),
kb AS (SELECT MAX(h) AS theta_b FROM (SELECT h FROM hb ORDER BY h LIMIT 32)),
ku AS (SELECT MAX(h) AS theta_u FROM
        (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
         ORDER BY h LIMIT 32)),
exact AS (
  SELECT (SELECT COUNT(*) FROM ua) AS n_a,
         (SELECT COUNT(*) FROM ub) AS n_b,
         (SELECT COUNT(*) FROM ua WHERE doc_id IN
            (SELECT doc_id FROM ub)) AS n_inter
)
SELECT n_a, n_b, n_inter,
       31.0 * 4294967296 / theta_a AS est_a,
       31.0 * 4294967296 / theta_b AS est_b,
       31.0 * 4294967296 / theta_a
       + 31.0 * 4294967296 / theta_b
       - 31.0 * 4294967296 / theta_u AS est_inter
FROM exact, ka, kb, ku
""",
    tags=("aggregate", "sketch", "kmv", "set-operation"),
)
def agg_kmv_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/KMV sketch SET OPERATIONS: estimate |A∩B| for two document
    cohorts (docs containing 'the' ∩ docs containing 'data' — sets
    that genuinely partially overlap in this corpus) from 32-element
    bottom-k sketches by inclusion-exclusion — |A∩B| ≈ est(A) + est(B)
    − est(A∪B), where each KMV estimate is (k−1)·2^32/θ (θ = the k-th
    smallest hash; Beyer et al., SIGMOD'07). The A∪B sketch is the
    bottom-k of the MERGED sketches — sketches compose under union,
    which is what makes them the 100 TB path: each cohort reduces to
    32 longs before anything meets anything. Hashes are md5-derived
    (no RNG), bottom-k via sort-limit on the already-distinct doc
    sets, and the estimates are single IEEE divisions of exact
    integers — bit-equal across engines. The exact counts ride along
    so the estimate's error is visible in the output itself."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    ua = tok.where(F.col("w") == "the").select("doc_id").distinct()
    ub = tok.where(F.col("w") == "data").select("doc_id").distinct()
    ha = ua.select(h.alias("h"))
    hb = ub.select(h.alias("h"))
    k = 32
    theta_a = ha.orderBy("h").limit(k).agg(F.max("h").alias("theta_a"))
    theta_b = hb.orderBy("h").limit(k).agg(F.max("h").alias("theta_b"))
    theta_u = (
        ha.union(hb)
        .distinct()
        .orderBy("h")
        .limit(k)
        .agg(F.max("h").alias("theta_u"))
    )
    n_a = ua.agg(F.count(F.lit(1)).alias("n_a"))
    n_b = ub.agg(F.count(F.lit(1)).alias("n_b"))
    n_inter = (
        ua.join(ub, "doc_id", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    est = lambda th: F.lit(31.0) * F.lit(4294967296.0) / F.col(th)  # noqa: E731
    return (
        n_a.crossJoin(F.broadcast(n_b))
        .crossJoin(F.broadcast(n_inter))
        .crossJoin(F.broadcast(theta_a))
        .crossJoin(F.broadcast(theta_b))
        .crossJoin(F.broadcast(theta_u))
        .select(
            "n_a",
            "n_b",
            "n_inter",
            est("theta_a").alias("est_a"),
            est("theta_b").alias("est_b"),
            (est("theta_a") + est("theta_b") - est("theta_u")).alias(
                "est_inter"
            ),
        )
    )


@register(
    "agg_bitmap_exact_distinct",
    oracle="""
WITH per_type AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
           AS n_distinct_users
  FROM events GROUP BY event_type
),
overall AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_overall
  FROM events
)
SELECT p.event_type, p.n_distinct_users, o.n_users_overall
FROM per_type p CROSS JOIN overall o
ORDER BY p.event_type
""",
    tags=("agg", "bitmap", "exact-distinct", "mergeable"),
)
def agg_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per event type via Spark's bitmap
    aggregates (bitmap_bucket_number / bitmap_bit_position /
    bitmap_construct_agg / bitmap_count) — the mergeable exact-distinct
    idiom that sits between COUNT(DISTINCT) (exact, but its shuffle
    carries every distinct VALUE) and HLL (mergeable, but approximate;
    agg_hll_mergeable_rollup): each 32k-id bucket compresses to a 4 KB
    bitmap in the partial aggregate, bitmaps OR together
    associatively, and the count is exact. This is how a 100 TB
    warehouse materializes daily distinct-user cubes it can later
    re-merge into weeks/months WITHOUT rescanning (the second level
    here — bitmap_or_agg across event types before counting — is
    precisely that rollup, proving the partials re-merge).

    Scale: the shuffle carries (groups × buckets) fixed-width bitmaps
    instead of raw ids — for a dense 1B-user domain that is ~30k
    bitmaps/group regardless of row count. Oracle is plain
    COUNT(DISTINCT): the bitmap path must agree exactly."""
    ev = load_table(spark, sf_dir, "events")
    buckets = (
        ev.select("event_type", "user_id")
        .groupBy(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
        )
        .agg(
            F.expr(
                "bitmap_construct_agg(bitmap_bit_position(user_id))"
            ).alias("bmp")
        )
    )
    per_type = buckets.groupBy("event_type").agg(
        F.expr("CAST(SUM(bitmap_count(bmp)) AS BIGINT)").alias(
            "n_distinct_users"
        )
    )
    # second-level re-merge: OR the per-type bucket bitmaps down to
    # global bucket bitmaps, then count — distinct users overall from
    # the SAME partials, no rescan.
    overall = (
        buckets.groupBy("bkt")
        .agg(F.expr("bitmap_or_agg(bmp)").alias("bmp"))
        .agg(
            F.expr("CAST(SUM(bitmap_count(bmp)) AS BIGINT)").alias(
                "n_users_overall"
            )
        )
    )
    return (
        per_type.crossJoin(F.broadcast(overall))
        .select("event_type", "n_distinct_users", "n_users_overall")
        .orderBy("event_type")
    )


@register(
    "agg_weighted_median",
    oracle="""
WITH pool AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
           AS price_cents,
         CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS w
  FROM lineitem
),
dom AS (
  SELECT l_returnflag, price_cents, CAST(SUM(w) AS BIGINT) AS w
  FROM pool GROUP BY l_returnflag, price_cents
),
cum AS (
  SELECT l_returnflag, price_cents, w,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price_cents)
           AS cw,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM dom
)
SELECT l_returnflag, CAST(MIN(tw) AS BIGINT) AS total_weight,
       CAST(MIN(CASE WHEN 2 * cw >= tw THEN price_cents END) AS BIGINT)
         AS weighted_median_cents
FROM cum
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("agg", "weighted-median", "percentile", "robust"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median price per return flag (weight = quantity) —
    the warehouse staple the unweighted percentile family
    (agg_median_percentile) can't answer: "the price at which half
    the UNITS ship", not half the line items. Definition is the exact
    lower weighted median (smallest value whose cumulative weight
    reaches half the total, decided by the integer comparison
    2·cum ≥ total — no float, no interpolation), so the answer can
    never flip on a rounding edge and is identical in any engine.

    Scale: the row stream compresses to the (flag × distinct-price)
    domain in one map-combined groupBy; the prefix sum runs per flag
    over that domain (route through functions/prefix.py's sharded
    prefix sum at an unbounded value domain). Same shape as
    mann_whitney's ranking — domain-sized, never row-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    pool = li.select(
        "l_returnflag",
        (dec("l_extendedprice") * 100).cast("long").alias("price_cents"),
        (dec("l_quantity") * 100).cast("long").alias("w"),
    )
    dom = pool.groupBy("l_returnflag", "price_cents").agg(
        F.sum("w").cast("long").alias("w")
    )
    wc = Window.partitionBy("l_returnflag").orderBy("price_cents")
    wt = Window.partitionBy("l_returnflag")
    cum = dom.select(
        "l_returnflag",
        "price_cents",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    return (
        cum.groupBy("l_returnflag")
        .agg(
            F.min("tw").cast("long").alias("total_weight"),
            F.min(
                F.when(2 * F.col("cw") >= F.col("tw"), F.col("price_cents"))
            )
            .cast("long")
            .alias("weighted_median_cents"),
        )
        .orderBy("l_returnflag")
    )


_FH_BUCKETS = 16  # feature-hashing dimensionality


@register(
    "ml_feature_hashing",
    oracle=f"""
WITH feats AS (
  SELECT user_id,
         event_type || ':' || (CAST(props ->> '$.k' AS BIGINT) // 25)
           AS feat
  FROM events
),
hashed AS (
  SELECT user_id,
         CAST(('0x' || substring(md5(feat), 1, 1))::INTEGER AS BIGINT)
           AS bucket,
         CASE WHEN substring(md5(feat), 2, 1)
                IN ('0','1','2','3','4','5','6','7')
              THEN 1 ELSE -1 END AS sgn
  FROM feats
)
SELECT user_id,
       {", ".join(
         "CAST(SUM(CASE WHEN bucket = %d THEN sgn ELSE 0 END) AS BIGINT)"
         " AS f%02d" % (b, b) for b in range(_FH_BUCKETS)
       )}
FROM hashed
GROUP BY user_id
ORDER BY user_id
""",
    tags=("ml", "feature-hashing", "hashing-trick", "featurization"),
)
def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): per-user signed
    16-bucket feature vectors over the unbounded (event_type ×
    k-segment) feature space — the featurizer that makes
    billion-category ML features fixed-width WITHOUT a vocabulary
    build or broadcast (no dictionary pass, no OOV problem; the
    signed hash keeps collisions unbiased in expectation). Bucket and
    sign come from md5 hex digits (the engine-portable hash
    discipline: stable under reruns, repartitioning, engine
    migration), and every cell is an exact signed integer count —
    bit-equal in any engine at any parallelism.

    Scale: ONE map-combined groupBy — the 16 conditional sums are
    parallel aggregate expressions over the same exchange (wide-agg
    pivot, not 16 passes). Output is user-domain-sized — exactly the
    feature table a downstream trainer consumes."""
    ev = load_table(spark, sf_dir, "events")
    feats = ev.select(
        "user_id",
        F.concat(
            F.col("event_type"),
            F.lit(":"),
            F.expr(
                "CAST(CAST(get_json_object(props, '$.k') AS BIGINT)"
                " div 25 AS STRING)"
            ),
        ).alias("feat"),
    )
    hashed = feats.select(
        "user_id",
        F.expr("CAST(conv(substring(md5(feat), 1, 1), 16, 10) AS BIGINT)")
        .alias("bucket"),
        F.when(
            F.substring(F.md5("feat"), 2, 1).isin(
                "0", "1", "2", "3", "4", "5", "6", "7"
            ),
            1,
        )
        .otherwise(-1)
        .alias("sgn"),
    )
    return (
        hashed.groupBy("user_id")
        .agg(
            *[
                F.sum(
                    F.when(F.col("bucket") == b, F.col("sgn")).otherwise(0)
                )
                .cast("long")
                .alias(f"f{b:02d}")
                for b in range(_FH_BUCKETS)
            ]
        )
        .orderBy("user_id")
    )


_TE_SMOOTH = 100  # pseudo-observations toward the global mean


@register(
    "ml_target_encoding",
    oracle=f"""
WITH pool AS (
  SELECT o_orderpriority AS category,
         CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS HUGEINT) AS y
  FROM orders
),
cat AS (
  SELECT category, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(y) AS sye,
         CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy
  FROM pool GROUP BY category
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(CAST(SUM(sye) AS VARCHAR) AS DOUBLE) AS sy_all
  FROM cat
)
SELECT c.category, c.n,
       c.sy / c.n AS mean_y_cents,
       (c.sy + {_TE_SMOOTH} * (t.sy_all / t.n_total))
         / (c.n + {_TE_SMOOTH}) AS encoded_cents
FROM cat c CROSS JOIN tot t
ORDER BY c.category
""",
    tags=("ml", "target-encoding", "categorical", "featurization"),
)
def ml_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding for a categorical feature (order
    priority → mean order value): enc = (Σy + m·ȳ_global)/(n + m)
    with m = 100 pseudo-observations — the high-cardinality
    categorical encoder tree models use where one-hot explodes
    (micro-partner of A4's one-hot in the imputer pipeline), with the
    shrinkage toward the global mean that keeps rare categories from
    memorizing noise. Per-category and global sums are exact
    HUGEINT/DECIMAL(38,0) string-hopped; mean and encoding are ONE
    fixed IEEE tree each — bit-equal across engines, no float
    aggregation.

    Scale: one map-combined groupBy to the category domain, a 1-row
    broadcast total, category-domain arithmetic after. The encoding
    table is what ships to the trainer — at 100 TB it is still
    category-domain-sized."""
    orders = load_table(spark, sf_dir, "orders")
    pool = orders.select(
        F.col("o_orderpriority").alias("category"),
        (dec("o_totalprice", 14) * 100).cast("decimal(38,0)").alias("y"),
    )
    cat = pool.groupBy("category").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("SUM(y)").alias("sye"),
        F.expr("CAST(CAST(SUM(y) AS STRING) AS DOUBLE)").alias("sy"),
    )
    tot = cat.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.expr("CAST(CAST(SUM(sye) AS STRING) AS DOUBLE)").alias("sy_all"),
    )
    return (
        cat.crossJoin(F.broadcast(tot))
        .select(
            "category",
            "n",
            (F.col("sy") / F.col("n")).alias("mean_y_cents"),
            (
                (
                    F.col("sy")
                    + _TE_SMOOTH * (F.col("sy_all") / F.col("n_total"))
                )
                / (F.col("n") + _TE_SMOOTH)
            ).alias("encoded_cents"),
        )
        .orderBy("category")
    )
