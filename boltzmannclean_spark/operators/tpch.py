"""The remaining canonical TPC-H query shapes (SURVEY.md §2.B "joins /
aggregates / subqueries"), adapted to the driver's reduced star schema.

Q1/Q3/Q5/Q7/Q13 shapes already live in ``relational.py`` / ``joins.py``;
this module completes the suite (Q2, Q4, Q6, Q8-Q12, Q14-Q22) so a user
of a TPC-H-class engine can run every canonical decision-support shape.

Schema adaptations (testdata has no partsupp, commit/receipt dates,
shipmode, phone, or comment columns):

- the part⋈supplier relation (partsupp) is derived as the DISTINCT
  (l_partkey, l_suppkey) pairs observed in lineitem;
- "late" lineitems (Q4/Q12/Q21) are those shipped > N days after
  o_orderdate instead of commit-vs-receipt comparisons;
- supply cost (Q2/Q9/Q11) uses s_acctbal / p_retailprice as the
  numeric stand-in for ps_supplycost;
- Q22's country code is c_nationkey (no phone column).

Design for 100 TB (same posture as joins.py):

- lineitem⋈orders is the only fact⋈fact shuffle anywhere; all dims
  (region/nation/supplier/part at this ratio) are broadcast or left to
  AQE when they grow with SF (customer, part).
- Correlated subqueries (Q2/Q17) are decorrelated into partial-agg +
  equi-join — the partial agg is key-count-sized, never row-count-sized.
- Scalar-aggregate subqueries (Q11/Q15/Q22) become a 1-row broadcast
  cross join: the fact side never moves for them.
- Exact arithmetic everywhere money is summed (decimal, not double), so
  results are partition-count-invariant and bit-equal to the oracle;
  ratios divide the exact sums as the final double op in BOTH engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from boltzmannclean_spark.functions.exact import dec
from boltzmannclean_spark.plans.registry import register
from boltzmannclean_spark.sources.catalog import load_table


def _revenue() -> F.Column:
    return dec("l_extendedprice") * (1 - dec("l_discount", 4, 2))


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (1 - CAST(l_discount AS DECIMAL(4,2)))"
)


@register(
    "tpch_q02_min_cost_supplier",
    oracle=f"""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
cand AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
  FROM part
  JOIN ps ON p_partkey = l_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_size <= 10 AND p_type = 'STANDARD'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM cand c
WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM cand m
                   WHERE m.p_partkey = c.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    tags=("tpch", "join", "subquery", "correlated"),
)
def tpch_q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: cheapest supplier per qualifying part (correlated MIN).

    partsupp is derived as DISTINCT lineitem pairs (one shuffle on the
    pair); the correlated MIN decorrelates into a per-part partial agg +
    equi-join back — part-count-sized state, never lineitem-sized. Part
    is filtered BEFORE the join (predicate pushdown makes the derived
    partsupp probe tiny); supplier/nation broadcast. The mins join is
    deliberately NOT hint-broadcast: the per-part MIN table grows with
    SF (every qualifying part), so AQE picks broadcast-vs-shuffle at
    runtime from the measured size (ADVICE r5 — same forced-broadcast
    hazard the r4 verdict flagged for PageRank).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    cand = (
        part.join(ps, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
    )
    mins = cand.groupBy(F.col("p_partkey").alias("mp")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        cand.join(
            mins,
            (F.col("p_partkey") == F.col("mp"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q04_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("tpch", "semi-join", "exists"),
)
def tpch_q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: priority counts for orders with a late shipment (EXISTS).

    The EXISTS is a LEFT SEMI join on l_orderkey with the lateness
    predicate as an extra join condition — Spark ships only the join key
    + shipdate of lineitem, and the quarter filter prunes orders before
    the shuffle ("late" adapted to shipdate > orderdate + 60 days; the
    schema has no commit/receipt dates).
    """
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q05_local_supplier_volume",
    oracle=f"""
SELECT n_name, CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    tags=("tpch", "join", "aggregate"),
)
def tpch_q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (canonical): revenue by nation where the SUPPLYING
    nation equals the CUSTOMER nation — the local-supplier condition
    (``c_nationkey = s_nationkey``) that distinguishes Q5 from the
    plain revenue-by-nation rollup (``join_revenue_by_nation`` is the
    Q5-shaped variant WITHOUT it; this completes the canonical suite:
    Q3/Q7/Q13 live as ``join_shipping_priority_topk`` /
    ``join_volume_shipping`` / ``join_left_order_counts``).

    Plan: the year filter prunes orders before the one fact⋈fact
    shuffle (lineitem⋈orders); customer joins on custkey (AQE picks
    broadcast while it fits); supplier/nation/region broadcast. The
    locality predicate is an extra equi-condition ON the supplier
    join — Catalyst evaluates it inside the broadcast hash join, so
    non-local rows never reach the aggregation. Exact decimal revenue.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(sup),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "tpch_q06_revenue_forecast",
    oracle="""
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(l_discount AS DECIMAL(4,2))) AS STRING) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("tpch", "scan", "aggregate"),
)
def tpch_q06_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-sum — the pushdown showcase.

    All three predicates reach the parquet scan (shipdate/quantity as
    PushedFilters); the discount band compares in exact decimal so the
    0.05/0.07 boundaries cannot float-drift between engines. Map-side
    partial sum → 1-row result; zero shuffle beyond the final gather.
    """
    li = load_table(spark, sf_dir, "lineitem")
    d = dec("l_discount", 4, 2)
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (d >= F.lit("0.05").cast("decimal(4,2)"))
            & (d <= F.lit("0.07").cast("decimal(4,2)"))
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(dec("l_extendedprice") * d)).cast("double").alias("revenue"))
    )


@register(
    "tpch_q08_market_share",
    oracle=f"""
WITH vol AS (
  SELECT year(o_orderdate) AS o_year,
         {_REV_SQL} AS v,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN v ELSE 0 END)
            AS DOUBLE)
       / CAST(SUM(v) AS DOUBLE) AS mkt_share
FROM vol
GROUP BY o_year
ORDER BY o_year
""",
    tags=("tpch", "join", "ratio"),
)
def tpch_q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_2's share of PROMO-part volume in ASIA, by year.

    8-way join, one fact⋈fact shuffle (lineitem⋈orders); every dim
    broadcast (nation twice under different aliases). Numerator and
    denominator accumulate in exact decimal; the share divides the two
    exact sums as the single final double op in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_reg")
    )
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    vol = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_reg") == F.col("r_regionkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _revenue().alias("v"),
            "supp_nation",
        )
    )
    zero = F.lit("0").cast("decimal(16,4)")
    return (
        vol.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2", F.col("v")).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum("v").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q09_product_profit",
    oracle="""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(4,2)))
                - CAST(p_retailprice AS DECIMAL(12,2))
                  * CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
""",
    tags=("tpch", "join", "aggregate"),
)
def tpch_q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on 'red' parts by supplier nation × year.

    ps_supplycost is adapted to p_retailprice×quantity (schema has no
    partsupp). The selective part filter broadcasts, pruning lineitem
    BEFORE its shuffle against orders; supplier/nation broadcast. Profit
    accumulates as one exact decimal expression.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    amount = _revenue() - dec("p_retailprice") * dec("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders  ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation  ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("tpch", "join", "topk"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue, one quarter.

    Quarter + returnflag filters prune both fact sides before their one
    shuffle; nation broadcasts; customer joins post-aggregation would be
    ideal at extreme SF but the group key needs c_name/acctbal, so AQE
    picks broadcast-vs-shuffle for customer at runtime. Top-20 carries
    c_custkey as the deterministic tiebreak.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nat = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q11_important_stock",
    oracle="""
WITH pv AS (
  SELECT l_partkey AS p_key,
         SUM(CAST(l_quantity AS DECIMAL(12,2))
             * CAST(p_retailprice AS DECIMAL(12,2))) AS value_d
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_0', 'NATION_5', 'NATION_10')
  GROUP BY l_partkey
)
SELECT p_key AS p_partkey, CAST(value_d AS DOUBLE) AS part_value
FROM pv, (SELECT SUM(value_d) AS total FROM pv) t
WHERE CAST(value_d AS DOUBLE) > 0.001 * CAST(total AS DOUBLE)
ORDER BY part_value DESC, p_partkey
""",
    tags=("tpch", "aggregate", "scalar-subquery"),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts holding >0.1% of three nations' inventory value.

    The HAVING-vs-global-total scalar subquery is a 1-row broadcast
    cross join over the per-part aggregate — the per-part side is
    part-count-sized and never re-shuffles. Both the per-part value and
    the grand total accumulate in exact decimal (sum-of-sums for the
    total, so it is bit-equal to the oracle's), and the 0.1% compare is
    the identical double expression in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_0", "NATION_5", "NATION_10")
    )
    pv = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("p_key"))
        .agg(F.sum(dec("l_quantity") * dec("p_retailprice")).alias("value_d"))
    )
    total = pv.agg(F.sum("value_d").alias("total"))
    return (
        pv.crossJoin(F.broadcast(total))
        .where(
            F.col("value_d").cast("double") > 0.001 * F.col("total").cast("double")
        )
        .select(
            F.col("p_key").alias("p_partkey"),
            F.col("value_d").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@register(
    "tpch_q12_late_shipment_priority",
    oracle="""
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
            THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
ORDER BY ship_class
""",
    tags=("tpch", "join", "conditional-aggregate"),
)
def tpch_q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: priority mix of late vs on-time shipments, one year.

    Shipmode is adapted to a lateness class (shipdate vs orderdate + 90
    days — the schema has no l_shipmode). One fact⋈fact shuffle with the
    year filter pushed to the lineitem scan; the pivoted counts are
    conditional aggregates, no second pass.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.when(
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                "LATE",
            )
            .otherwise("ONTIME")
            .alias("ship_class")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
SELECT 100.0
       * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                       ELSE 0 END) AS DOUBLE)
       / CAST(SUM({_REV_SQL}) AS DOUBLE) AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
""",
    tags=("tpch", "join", "ratio"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: PROMO parts' share of one month's revenue.

    Month filter prunes lineitem at the scan; part broadcasts, so the
    plan is a single map-side join + 1-row aggregate — no shuffle of
    fact data at all. Exact decimal sums; one final double division.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    zero = F.lit("0").cast("decimal(16,4)")
    rev = _revenue()
    return li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast(
                "double"
            )
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct")
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
""",
    tags=("tpch", "aggregate", "scalar-subquery"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the quarter's top revenue supplier (scalar MAX view).

    The "view" is the per-supplier aggregate; the scalar-MAX subquery is
    a 1-row broadcast cross join against it. Equality on total_revenue
    is safe because the max IS one of the compared doubles (each an
    exact-decimal sum cast once). Supplier broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    sup = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16_part_supplier_counts",
    oracle="""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    tags=("tpch", "anti-join", "distinct-aggregate"),
)
def tpch_q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct-supplier counts per part attribute group.

    The NOT IN (complaint suppliers, adapted to negative acctbal) is a
    broadcast LEFT ANTI join — only excluded keys ship. partsupp derives
    from lineitem with the part filter broadcast-applied BEFORE the
    distinct, so the distinct shuffles only qualifying pairs.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    ps = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey", "p_brand", "p_type", "p_size")
        .distinct()
    )
    return (
        ps.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
WITH pq AS (
  SELECT l_partkey AS avg_key,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE)
         / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE)
       / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pq ON avg_key = l_partkey
WHERE p_brand = 'Brand#3' AND l_quantity < 0.2 * avg_qty
""",
    tags=("tpch", "correlated", "decorrelated-aggregate"),
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders of one brand.

    The correlated per-part AVG decorrelates into a part-keyed partial
    aggregate joined back (part-count-sized — AQE broadcasts it while
    small, shuffles when not). The average is computed as exact-decimal
    sum / count in BOTH engines so the 0.2× threshold compare cannot
    drift. Brand filter broadcasts against lineitem first.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    pq = li.groupBy(F.col("l_partkey").alias("avg_key")).agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(pq, F.col("avg_key") == F.col("l_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "tpch_q18_large_volume_customers",
    oracle="""
WITH big AS (
  SELECT l_orderkey AS big_key,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN big ON o_orderkey = big_key
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    tags=("tpch", "in-subquery", "aggregate"),
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with orders totalling > 300 units.

    The IN-subquery over a grouped HAVING becomes aggregate-then-join:
    the big-order set (HAVING-filtered, tiny) joins orders — AQE sees
    the post-agg size and broadcasts it, so orders never shuffles for
    it. Quantity sums in exact decimal; the HAVING compares in decimal.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("big_key"))
        .agg(F.sum(dec("l_quantity")).alias("qty_d"))
        .where(F.col("qty_d") > F.lit("300").cast("decimal(12,2)"))
        .select("big_key", F.col("qty_d").cast("double").alias("sum_qty"))
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("big_key"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
    tags=("tpch", "join", "disjunction"),
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under OR-ed brand/size/quantity clauses.

    The disjunction mixes both sides' columns so it cannot push below
    the join — but the union of the three brand clauses CAN pre-filter
    part (broadcast), and Catalyst derives the quantity range 1-30 for
    the lineitem scan. Join stays a map-side broadcast hash join with
    the residual OR as post-join filter — no shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3")
    )
    q = F.col("l_quantity")
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .where(clause)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q20_potential_promotion",
    oracle="""
WITH sh AS (
  SELECT l_partkey, l_suppkey
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 60
)
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM sh
  JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'SMALL')
ORDER BY s_name
""",
    tags=("tpch", "semi-join", "nested-subquery"),
)
def tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers moving real volume of SMALL parts in 1997.

    Availability (no partsupp) adapts to "shipped > 60 units of the part
    that year". The nested IN-chain is aggregate → broadcast part filter
    → LEFT SEMI into supplier: each stage shrinks the data before the
    next, and supplier (the outer side) never shuffles.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "SMALL")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    sh = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("qty_d"))
        .where(F.col("qty_d") > F.lit("60").cast("decimal(12,2)"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .select("l_suppkey")
    )
    return (
        sup.join(sh, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
WITH lf AS (
  SELECT l_orderkey, l_suppkey, l_shipdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
st AS (
  SELECT l_orderkey AS ok, MAX(l_shipdate) AS mx,
         COUNT(DISTINCT l_suppkey) AS ns
  FROM lf GROUP BY l_orderkey
),
latest AS (
  SELECT lf.l_orderkey, lf.l_suppkey, st.ns
  FROM lf JOIN st ON lf.l_orderkey = st.ok AND lf.l_shipdate = st.mx
),
nm AS (
  SELECT l_orderkey AS ok2, COUNT(DISTINCT l_suppkey) AS n_at_max
  FROM latest GROUP BY l_orderkey
)
SELECT s_name, COUNT(DISTINCT latest.l_orderkey) AS numwait
FROM latest
JOIN nm ON latest.l_orderkey = nm.ok2
JOIN supplier ON latest.l_suppkey = s_suppkey
WHERE latest.ns >= 2 AND nm.n_at_max = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
    tags=("tpch", "exists", "multi-aggregate"),
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who alone held up multi-supplier orders.

    "Kept waiting" adapts to: in a finished multi-supplier order, this
    supplier's shipment is the unique latest (EXISTS another supplier /
    NOT EXISTS another equally-late one — expressed as per-order
    aggregates + joins, all keyed on l_orderkey so the whole chain sits
    in ONE exchange of the order key; supplier broadcasts at the end).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    sup = load_table(spark, sf_dir, "supplier")
    lf = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    st = lf.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.max("l_shipdate").alias("mx"),
        F.countDistinct("l_suppkey").alias("ns"),
    )
    latest = lf.join(
        st,
        (F.col("l_orderkey") == F.col("ok")) & (F.col("l_shipdate") == F.col("mx")),
    ).select("l_orderkey", "l_suppkey", "ns")
    nm = latest.groupBy(F.col("l_orderkey").alias("ok2")).agg(
        F.countDistinct("l_suppkey").alias("n_at_max")
    )
    return (
        latest.join(nm, F.col("l_orderkey") == F.col("ok2"))
        .where((F.col("ns") >= 2) & (F.col("n_at_max") == 1))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@register(
    "tpch_q22_global_sales_opportunity",
    oracle="""
WITH ab AS (
  SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS STRING) AS DOUBLE)
         / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS totacctbal
FROM customer, ab
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY cntrycode
""",
    tags=("tpch", "anti-join", "scalar-subquery"),
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: rich customers gone quiet (no orders this year).

    The scalar AVG is a 1-row broadcast; NOT EXISTS is a LEFT ANTI join
    against 2001+ orders — only o_custkey ships, pre-filtered at the
    orders scan. Country code adapts to c_nationkey (no phone column).
    The average is exact-sum/count in both engines; acctbal sums exact.
    """
    cust = load_table(spark, sf_dir, "customer")
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    ab = cust.where(F.col("c_acctbal") > 0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    return (
        cust.crossJoin(F.broadcast(ab))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
