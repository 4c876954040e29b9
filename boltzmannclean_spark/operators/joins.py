"""Join operators over the star schema (SURVEY.md §2.B "Joins").

Design-for-scale notes, per join kind:

- Equi joins on fact tables shuffle both sides on the key; Catalyst
  picks sort-merge vs shuffled-hash, and AQE converts to broadcast at
  runtime when a side turns out small.
- Dimension joins (region/nation/supplier, and customer at moderate SF)
  are explicitly ``F.broadcast`` — at 100 TB the fact side never
  shuffles for these, which is the difference between an hour and a
  minute.
- Semi/anti joins ship only the join key of the right side.
- Theta/range joins have no hash strategy; they are kept
  broadcast-nested-loop with a deliberately small build side (or a
  pre-aggregated one) — the scalable form of a non-equi join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from boltzmannclean_spark.functions.combos import packed_combo_counts
from boltzmannclean_spark.functions.exact import dec
from boltzmannclean_spark.plans.registry import register
from boltzmannclean_spark.sources.catalog import load_table


@register(
    "join_revenue_by_nation",
    oracle="""
SELECT
  n_name,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS STRING) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    tags=("join", "broadcast", "aggregate"),
)
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 5-way join: fact⋈fact shuffle + broadcast dims.

    lineitem⋈orders is the only big shuffle; customer/nation/region are
    broadcast so the probe side streams through map-side hash joins.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp")
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    revenue = dec("l_extendedprice") * (1 - dec("l_discount", 4, 2))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer grows with SF (unlike region/nation) — no forced
        # broadcast hint; AQE broadcasts it at runtime while it's small
        # and falls back to shuffle when it isn't.
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "join_left_order_counts",
    oracle="""
SELECT c_count, COUNT(*) AS n_customers
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus <> 'F'
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY n_customers DESC, c_count DESC
""",
    tags=("join", "left", "aggregate"),
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join with an extra join predicate,
    double aggregation. COUNT(col) counting only matched rows is the
    NULL-semantics check for outer joins."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_orderstatus") != "F"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("c_count"))
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
ORDER BY c_custkey
""",
    tags=("join", "semi"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): only the key column of orders is shuffled."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        customer.join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
""",
    tags=("join", "anti"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers that never ordered."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "join_full_outer",
    oracle="""
WITH cust_n AS (
  SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
  FROM customer GROUP BY c_nationkey
), supp_n AS (
  SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
  FROM supplier GROUP BY s_nationkey
)
SELECT
  COALESCE(cust_n.nationkey, supp_n.nationkey) AS nationkey,
  COALESCE(n_customers, 0) AS n_customers,
  COALESCE(n_suppliers, 0) AS n_suppliers
FROM cust_n FULL OUTER JOIN supp_n ON cust_n.nationkey = supp_n.nationkey
ORDER BY nationkey
""",
    tags=("join", "full"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides (aggregate-before-join:
    the scalable form — joins row counts, not fact rows)."""
    cust_n = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp_n = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    joined = cust_n.join(supp_n, on="nationkey", how="full")
    return joined.select(
        F.col("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    ).orderBy("nationkey")


@register(
    "join_theta_self",
    oracle="""
SELECT o1.o_custkey AS custkey, COUNT(*) AS n_escalations
FROM orders o1
JOIN orders o2
  ON o1.o_custkey = o2.o_custkey
 AND o1.o_orderdate < o2.o_orderdate
 AND o1.o_totalprice * 2 < o2.o_totalprice
GROUP BY o1.o_custkey
ORDER BY n_escalations DESC, custkey
""",
    tags=("join", "theta", "self"),
)
def join_theta_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self theta-join: later order more than doubling an earlier one.

    The equi part (same customer) hash-partitions both sides, so the
    non-equi predicates evaluate only within a customer's own orders —
    this stays a shuffle-hash/sort-merge join, NOT a nested-loop over
    the cross product, and scales with sum(per-key group size²)."""
    o1 = load_table(spark, sf_dir, "orders").alias("o1")
    o2 = load_table(spark, sf_dir, "orders").alias("o2")
    return (
        o1.join(
            o2,
            (F.col("o1.o_custkey") == F.col("o2.o_custkey"))
            & (F.col("o1.o_orderdate") < F.col("o2.o_orderdate"))
            & (F.col("o1.o_totalprice") * 2 < F.col("o2.o_totalprice")),
        )
        .groupBy(F.col("o1.o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_escalations"))
        .orderBy(F.desc("n_escalations"), "custkey")
    )


@register(
    "join_cross",
    oracle="""
SELECT r1.r_name AS from_region, r2.r_name AS to_region
FROM region r1 CROSS JOIN region r2
WHERE r1.r_regionkey <> r2.r_regionkey
ORDER BY from_region, to_region
""",
    tags=("join", "cross"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (tiny×tiny only — anything else is a design bug)."""
    r1 = load_table(spark, sf_dir, "region").alias("r1")
    r2 = load_table(spark, sf_dir, "region").alias("r2")
    return (
        r1.crossJoin(r2)
        .where(F.col("r1.r_regionkey") != F.col("r2.r_regionkey"))
        .select(
            F.col("r1.r_name").alias("from_region"),
            F.col("r2.r_name").alias("to_region"),
        )
        .orderBy("from_region", "to_region")
    )


@register(
    "join_range_bucket",
    oracle="""
SELECT p_size, COUNT(*) AS n_parts,
       CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sum_price
FROM part
JOIN region ON p_size BETWEEN r_regionkey * 10 AND r_regionkey * 10 + 9
GROUP BY p_size
ORDER BY p_size
""",
    tags=("join", "range"),
)
def join_range_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: part.p_size falls in a region-derived bucket.

    Non-equi → broadcast-nested-loop with the 5-row side broadcast; the
    big side streams. At scale the derivable-bucket form should instead
    compute the bucket key and equi-join — shown here as the BNL variant
    to exercise the operator."""
    part = load_table(spark, sf_dir, "part")
    region = load_table(spark, sf_dir, "region")
    return (
        part.join(
            F.broadcast(region),
            F.col("p_size").between(
                F.col("r_regionkey") * 10, F.col("r_regionkey") * 10 + 9
            ),
        )
        .groupBy("p_size")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(dec("p_retailprice")).cast("double").alias("sum_price"),
        )
        .orderBy("p_size")
    )


@register(
    "join_salted_skew",
    oracle="""
SELECT
  o_orderpriority,
  COUNT(*) AS n_items,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS STRING) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("join", "skew", "salting"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual key-salting for skewed shuffle joins, result-identical to
    the plain join (the oracle IS the plain join).

    Pattern: the (potentially hot-keyed) fact side gets a deterministic
    salt in [0, S); the other side is replicated S times; the join key
    becomes (key, salt), splitting each hot key's rows across S
    partitions. AQE's skew-join split covers most cases at runtime —
    salting is the explicit fallback when a single key exceeds what one
    task can hold, and this query keeps the technique oracle-verified."""
    S = 8
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", (F.xxhash64("l_orderkey", "l_linenumber") % S + S) % S
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(S)])))
    )
    revenue = dec("l_extendedprice") * (1 - dec("l_discount", 4, 2))
    return (
        li.join(
            orders,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (li["salt"] == orders["salt"]),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "join_shipping_priority_topk",
    oracle="""
SELECT
  l_orderkey,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS STRING) AS DOUBLE) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=("join", "aggregate", "topk"),
)
def join_shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: selective dim filter → broadcast → one fact
    shuffle → hash agg → TakeOrderedAndProject top-10 (Catalyst turns
    orderBy+limit into a per-partition top-k + driver merge; no global
    sort materializes)."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    revenue = dec("l_extendedprice") * (1 - dec("l_discount", 4, 2))
    # Broadcast ONLY the filtered customer dim; orders⋈lineitem are both
    # fact-sized and must shuffle on the join key (AQE demotes to
    # broadcast at runtime if the filtered orders side turns out tiny —
    # never force a fact-side broadcast, it's a driver OOM at scale).
    return (
        li.join(
            o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "join_right_supplier_counts",
    oracle="""
SELECT s_nationkey, COUNT(l_orderkey) AS n_heavy_items, COUNT(*) AS n_rows
FROM lineitem
RIGHT JOIN supplier ON l_suppkey = s_suppkey AND l_quantity > 45
GROUP BY s_nationkey
ORDER BY s_nationkey
""",
    tags=("join", "right", "aggregate"),
)
def join_right_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join with an extra join predicate (how='right' twin of
    join_left_order_counts): every supplier row survives; COUNT(col) vs
    COUNT(*) checks the NULL semantics of unmatched probe rows. Planner
    note: Spark rewrites right outer as left outer with sides swapped, so
    the same broadcast/shuffle strategies apply."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        li.join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("l_quantity") > 45),
            "right",
        )
        .groupBy("s_nationkey")
        .agg(
            F.count("l_orderkey").alias("n_heavy_items"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("s_nationkey")
    )


@register(
    "join_null_safe",
    oracle="""
WITH c AS (SELECT c_custkey, NULLIF(c_nationkey, 5) AS nk FROM customer),
     s AS (SELECT s_suppkey, NULLIF(s_nationkey, 5) AS nk FROM supplier)
SELECT COALESCE(c.nk, -1) AS nation_key, COUNT(*) AS n_pairs,
       COUNT(DISTINCT c.c_custkey) AS n_customers,
       COUNT(DISTINCT s.s_suppkey) AS n_suppliers
FROM c JOIN s ON c.nk IS NOT DISTINCT FROM s.nk
GROUP BY COALESCE(c.nk, -1)
ORDER BY nation_key
""",
    tags=("join", "null-safe"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing, which is what entity-
    resolution joins on nullable business keys need. Spark plans `<=>`
    as a hash join key (NULL becomes an ordinary bucket) — note the
    NULL bucket is also the classic skew key at scale: salt it or
    pre-split when NULL rates are high. Nation 5 is NULLed on both
    sides here to force real NULL↔NULL matches."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey"), F.lit(5)).alias("nk")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.nullif(F.col("s_nationkey"), F.lit(5)).alias("nk")
    )
    return (
        c.join(s, c["nk"].eqNullSafe(s["nk"]))
        .groupBy(F.coalesce(c["nk"], F.lit(-1)).alias("nation_key"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count_distinct("c_custkey").alias("n_customers"),
            F.count_distinct("s_suppkey").alias("n_suppliers"),
        )
        .orderBy("nation_key")
    )


EXISTENCE_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderstatus = 'F'
                          AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


@register(
    "join_existence_in",
    oracle=EXISTENCE_SQL,
    tags=("join", "existence", "anti"),
)
def join_existence_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subqueries through the SQL API: Catalyst compiles the
    IN to a left-semi hash join and the NOT IN to a NULL-AWARE anti
    join (the physical operator that honors three-valued NOT IN
    semantics — a single NULL in the subquery empties the result; the
    subquery key here is non-null so the result is meaningful). Both
    existence joins build from the filtered orders side, never
    materializing the match list on the driver."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(EXISTENCE_SQL)


EXISTS_SQL = """
SELECT s_suppkey, s_name
FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
  AND NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey
                    AND l.l_returnflag = 'R' AND l.l_quantity >= 49)
ORDER BY s_suppkey
"""


@register(
    "subquery_exists",
    oracle=EXISTS_SQL,
    tags=("join", "exists", "subquery"),
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL API: Catalyst
    de-correlates both into left-semi and left-anti hash joins on
    s_suppkey with the extra predicates pushed below the join — the
    suppliers-with-big-shipments-but-no-big-returns question a user
    would actually write this way. No driver-side match list, no
    row-at-a-time subquery execution."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(EXISTS_SQL)


VOLUME_SHIPPING_SQL_DUCK = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       YEAR(l_shipdate) AS l_year,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS STRING) AS DOUBLE) AS volume
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, YEAR(l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


@register(
    "join_volume_shipping",
    oracle=VOLUME_SHIPPING_SQL_DUCK,
    tags=("join", "tpch-q7", "multi-join"),
)
def join_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped 6-way join: bilateral trade volume between two
    nations by ship year. The OR-of-pairs predicate cannot be pushed
    into either nation join alone — Catalyst evaluates it after both
    broadcast nation joins, which is the right plan: the two fact
    shuffles (lineitem⋈orders on orderkey) dominate, every dimension
    broadcasts, and the disjunction filters a tiny post-join stream."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    volume = dec("l_extendedprice") * (1 - dec("l_discount", 4, 2))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(volume).cast("double").alias("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


BASKET_TOP_N = 25
_BASKET_PACK = 1 << 31  # partkey < 2^31: (a·P + b) packs a pair losslessly


@register(
    "join_basket_affinity",
    oracle=f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM items),
supp AS (SELECT l_partkey, COUNT(*) AS s FROM items GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS together
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
SELECT part_a, part_b, together,
       sa.s AS supp_a, sb.s AS supp_b,
       CAST(together AS DOUBLE) * n_orders.n / (sa.s * sb.s) AS lift
FROM pairs
JOIN supp sa ON sa.l_partkey = part_a
JOIN supp sb ON sb.l_partkey = part_b
CROSS JOIN n_orders
QUALIFY ROW_NUMBER() OVER (ORDER BY together DESC, part_a, part_b) <= {BASKET_TOP_N}
ORDER BY together DESC, part_a, part_b
""",
    tags=("join", "basket", "affinity"),
)
def join_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: part pairs co-occurring in the same
    order, with lift = P(a,b)/(P(a)·P(b)) from exact counts. Pair
    enumeration cost is Σ basket² per order — bounded by basket size,
    never corpus²; at 100 TB cap basket size like the shingle DF cap.
    Deterministic top-25 by co-occurrence.

    r15 (guide §2.3/§2.4): pairs come from per-order sorted DISTINCT
    partkey baskets through the vectorized combo counter
    (functions/combos.py) — ONE shuffle of lineitem (the basket
    groupBy, with collect_set deduping in the partial aggregation)
    instead of the items-distinct exchange plus the order-key
    self-join's two exchanges and corpus-pair aggregation. Support
    counts and the order count are read off the pinned basket frame
    (explode + count), not extra lineitem scans. Exactness: baskets
    are sorted distinct sets, so the counter's strictly-increasing
    index pairs are exactly the self-join's p1 < p2 pair set, each
    counted once per order — together/supp/n are the same int64
    counts, and lift is the identical double expression."""
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(
            F.sort_array(
                F.collect_set(F.col("l_partkey").cast("long"))
            ).alias("items")
        )
        .localCheckpoint(eager=False)
    )
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n"))
    supp = (
        baskets.select(F.explode("items").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    pairs = (
        packed_combo_counts(baskets, r=2, pack=_BASKET_PACK)
        .groupBy("tk")
        .agg(F.sum("cnt").alias("together"))
        .select(
            F.expr(f"tk div {_BASKET_PACK}").alias("part_a"),
            (F.col("tk") % _BASKET_PACK).alias("part_b"),
            "together",
        )
    )
    sa = supp.select(F.col("l_partkey").alias("part_a"), F.col("s").alias("supp_a"))
    sb = supp.select(F.col("l_partkey").alias("part_b"), F.col("s").alias("supp_b"))
    lift = (
        F.col("together").cast("double")
        * F.col("n")
        / (F.col("supp_a") * F.col("supp_b"))
    )
    w = Window.orderBy(F.desc("together"), "part_a", "part_b")
    return (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select("part_a", "part_b", "together", "supp_a", "supp_b", lift.alias("lift"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= BASKET_TOP_N)
        .drop("rk")
        .orderBy(F.desc("together"), "part_a", "part_b")
    )


# Bloom pre-filter geometry: 2^16 bits (1024 longs ≈ 8 KB broadcast) and
# 4 hash probes. False positives only cost wasted probe rows — the real
# equi-join afterwards removes them, so output semantics are exact and
# the oracle is the plain join SQL.
BLOOM_BITS = 1 << 16
BLOOM_WORDS = BLOOM_BITS // 64
BLOOM_K = 4


@register(
    "join_bloom_semireduction",
    oracle="""
SELECT date_trunc('month', o_orderdate) AS order_month,
       COUNT(*) AS n_lineitems,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS STRING) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY date_trunc('month', o_orderdate)
ORDER BY order_month
""",
    tags=("join", "bloom", "semireduction"),
)
def join_bloom_semireduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction via an explicit Bloom filter: revenue per
    month for URGENT orders, with the lineitem scan pre-filtered by an
    8 KB Bloom filter built from the urgent order keys before the real
    join runs.

    This is the classic 100 TB pattern for a selective fact⋈fact join:
    shipping the full urgent-key set to every lineitem task costs
    O(|keys|) network per task, while the Bloom filter is a fixed 8 KB
    broadcast whatever the key count, and it prunes the probe side down
    to ~selectivity × |lineitem| rows BEFORE the join shuffle — the
    shuffle that dominates the query. False positives pass the filter
    but die in the real equi-join, so results are exact and the oracle
    is the plain join (the Bloom stage is invisible to semantics; Spark
    4's own runtime bloom-filter join applies the same rewrite when
    statistics justify it — this operator is the explicit, always-on
    form).

    Build: urgent keys → explode 4 xxhash64 probes → (word, bit) →
    bit_or-aggregated 1024-long words → map_from_entries on one row —
    two tiny aggregations. Probe: 1-row broadcast crossJoin, 4 map
    lookups + bitwise AND per lineitem row, all codegen'd builtins."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderdate"
    )

    hashes = [
        f"pmod(xxhash64(o_orderkey, {i}), {BLOOM_BITS})" for i in range(BLOOM_K)
    ]
    words = (
        urgent.select(
            F.explode(F.array(*[F.expr(h) for h in hashes])).alias("pos")
        )
        .select(
            F.expr("CAST(pos div 64 AS INT)").alias("word"),
            F.expr("CAST(pmod(pos, 64) AS INT)").alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias("mask"))
    )
    # Dense long[1024] instead of a map: Spark's map element_at is a
    # LINEAR scan of the entries (O(words) per probe — measured 3.3s at
    # sf0.1); array element_at is O(1). The fill runs once on the 1-row
    # build side (1024 map lookups total, then the map is dropped).
    bloom = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "mask"))).alias("m")
    ).select(
        F.expr(
            f"transform(sequence(0, {BLOOM_WORDS - 1}), "
            f"w -> coalesce(element_at(m, w), CAST(0 AS BIGINT)))"
        ).alias("bloom")
    )

    def member(col_name: str) -> F.Column:
        tests = []
        for i in range(BLOOM_K):
            h = f"pmod(xxhash64({col_name}, {i}), {BLOOM_BITS})"
            tests.append(
                f"(element_at(bloom, CAST({h} div 64 AS INT) + 1) "
                f"& shiftleft(CAST(1 AS BIGINT), CAST(pmod({h}, 64) AS INT))) != 0"
            )
        return F.expr(" AND ".join(tests))

    pruned = (
        li.crossJoin(F.broadcast(bloom))
        .where(member("l_orderkey"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        pruned.join(urgent, pruned.l_orderkey == urgent.o_orderkey)
        .groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(dec("l_extendedprice") * (1 - dec("l_discount", 4, 2)))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("order_month")
    )


BUCKETS_COLOCATED = 8


@register(
    "join_bucketed_colocated",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS STRING) AS DOUBLE)
         AS total_revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    tags=("join", "bucketed", "colocated"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located fact⋈dim join — the pattern for tables that
    are joined on the same key every day at 100 TB: both sides are
    written ONCE as managed tables bucketed (and sorted) on the join
    key, after which every subsequent join on that key needs NO
    exchange on either side — the sort-merge join reads co-located
    buckets directly, verified by the plan gate in tests/test_plans.py
    (zero Exchange nodes above the bucketed scans). The one-time
    bucketed write costs the shuffle the first query would have paid;
    every later join amortizes it to zero. The oracle checks the same
    join/aggregate over the raw parquet, proving bucketing changed the
    physical plan, not the answer. Money sums use the exact-decimal
    recipe (functions/exact.py)."""
    from boltzmannclean_spark.functions.exact import dec

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "/tmp/bcs_warehouse"
    ).removeprefix("file:")
    for df, name, key in (
        (orders, "bcs_colocated_orders", "o_custkey"),
        (customer, "bcs_colocated_customer", "c_custkey"),
    ):
        # The derby metastore and the warehouse dir have independent
        # lifetimes across sessions; drop BOTH so a stale location from
        # an earlier process can never fail the write.
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        (
            df.write.bucketBy(BUCKETS_COLOCATED, key)
            .sortBy(key)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )
    ob = spark.table("bcs_colocated_orders")
    cb = spark.table("bcs_colocated_customer")
    return (
        ob.join(cb, ob.o_custkey == cb.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice", 14, 2)).cast("double").alias(
                "total_revenue"
            ),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "join_geo_grid_distance",
    oracle="""
WITH pts AS (
  SELECT c_custkey AS id,
         CAST(('0x' || substring(md5(c_custkey::VARCHAR), 1, 8))::BIGINT
              % 1800000 AS BIGINT) AS lat_m,
         CAST(('0x' || substring(md5(c_custkey::VARCHAR), 9, 8))::BIGINT
              % 3600000 AS BIGINT) AS lon_m
  FROM customer
),
cells AS (
  SELECT id, lat_m, lon_m,
         lat_m // 10000 AS cy, lon_m // 10000 AS cx
  FROM pts
),
b AS (
  SELECT id, lat_m, lon_m, cy, cx FROM cells
),
a AS (
  SELECT id, lat_m, lon_m,
         cy + dy AS cy, cx + dx AS cx
  FROM cells,
       (SELECT unnest(range(-1, 2)) AS dy) ,
       (SELECT unnest(range(-1, 2)) AS dx)
),
cand AS (
  SELECT a.id AS id_a, b.id AS id_b,
         a.lat_m AS lat_a, a.lon_m AS lon_a,
         b.lat_m AS lat_b, b.lon_m AS lon_b
  FROM a JOIN b ON a.cy = b.cy AND a.cx = b.cx AND a.id < b.id
),
verified AS (
  SELECT id_a, id_b,
         CAST(2 * 6371.0 * asin(sqrt(
           pow(sin(radians((lat_b - lat_a) / 10000.0) / 2), 2)
           + cos(radians(lat_a / 10000.0 - 90))
             * cos(radians(lat_b / 10000.0 - 90))
             * pow(sin(radians((lon_b - lon_a) / 10000.0) / 2), 2)
         )) AS FLOAT) AS dist_km
  FROM cand
)
SELECT id_a, id_b, dist_km
FROM verified
WHERE dist_km < 50.0
ORDER BY id_a, id_b
""",
    tags=("join", "spatial", "grid", "haversine"),
)
def join_geo_grid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial distance self-join via GRID BLOCKING — the geohash-style
    pattern that turns "all pairs within 50 km" into an EQUI-join:
    each point lands in a 1°×1° integer cell; one side explodes into
    its 3×3 cell neighborhood; candidates come from the cell equi-join
    (hash-partitionable, AQE-skewable — dense cities are hot keys) and
    only candidates pay the haversine. Coordinates are derived
    deterministically from key hashes in integer micro-degrees
    (testdata has no geo columns; the OPERATOR is the point), so cell
    keys are pure int64 — no float binning drift. The verify distance
    is FLOAT-cast (libm sin/cos differ by 1 ulp across engines — the
    func_math_transcendental rule). Honest recall caveat, as in
    production geohash joins: lon cells narrow toward the poles, so
    >50 km-wide neighborhoods at extreme latitudes need
    latitude-adaptive cell spans; the oracle replicates the same
    candidate generation, so parity checks the pattern, not a
    different algorithm. Output is Θ(true close pairs), linear in
    corpus at fixed density."""
    cust = load_table(spark, sf_dir, "customer")
    h = lambda lo, n: F.conv(  # noqa: E731
        F.substring(F.md5(F.col("c_custkey").cast("string")), lo, 8), 16, 10
    ).cast("long") % n
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        h(1, 1800000).alias("lat_m"),
        h(9, 3600000).alias("lon_m"),
    ).select(
        "id",
        "lat_m",
        "lon_m",
        F.expr("lat_m div 10000").alias("cy"),
        F.expr("lon_m div 10000").alias("cx"),
    )
    a = pts.select(
        F.col("id").alias("id_a"),
        F.col("lat_m").alias("lat_a"),
        F.col("lon_m").alias("lon_a"),
        F.explode(
            F.expr("array(cy - 1, cy, cy + 1)")
        ).alias("cy"),
        "cx",
    ).select(
        "id_a",
        "lat_a",
        "lon_a",
        "cy",
        F.explode(F.expr("array(cx - 1, cx, cx + 1)")).alias("cx2"),
    )
    b = pts.select(
        F.col("id").alias("id_b"),
        F.col("lat_m").alias("lat_b"),
        F.col("lon_m").alias("lon_b"),
        F.col("cy").alias("by"),
        F.col("cx").alias("bx"),
    )
    cand = a.join(
        b,
        (F.col("cy") == F.col("by"))
        & (F.col("cx2") == F.col("bx"))
        & (F.col("id_a") < F.col("id_b")),
    )
    rad = lambda c: F.radians(c)  # noqa: E731
    dlat2 = rad((F.col("lat_b") - F.col("lat_a")) / 10000.0) / 2
    dlon2 = rad((F.col("lon_b") - F.col("lon_a")) / 10000.0) / 2
    lat_a = rad(F.col("lat_a") / 10000.0 - 90)
    lat_b = rad(F.col("lat_b") / 10000.0 - 90)
    dist = (
        2
        * 6371.0
        * F.asin(
            F.sqrt(
                F.pow(F.sin(dlat2), 2)
                + F.cos(lat_a) * F.cos(lat_b) * F.pow(F.sin(dlon2), 2)
            )
        )
    ).cast("float")
    return (
        cand.select("id_a", "id_b", dist.alias("dist_km"))
        .where(F.col("dist_km") < 50.0)
        .orderBy("id_a", "id_b")
    )


@register(
    "join_geo_knn_grid",
    oracle="""
WITH pts AS (
  SELECT c_custkey AS id,
         CAST(('0x' || substring(md5(c_custkey::VARCHAR), 1, 8))::BIGINT
              % 1800000 AS BIGINT) AS lat_m,
         CAST(('0x' || substring(md5(c_custkey::VARCHAR), 9, 8))::BIGINT
              % 3600000 AS BIGINT) AS lon_m
  FROM customer
),
cells AS (
  SELECT id, lat_m, lon_m,
         lat_m // 300000 AS cy, lon_m // 300000 AS cx
  FROM pts
),
probes AS (
  SELECT c.id, c.lat_m, c.lon_m, c.cy + dy.d AS cy, c.cx + dx.d AS cx
  FROM cells c
  CROSS JOIN (VALUES (-1), (0), (1)) AS dy(d)
  CROSS JOIN (VALUES (-1), (0), (1)) AS dx(d)
  WHERE c.id < 400
),
cand AS (
  SELECT p.id, n.id AS nbr_id,
         (p.lat_m - n.lat_m) * (p.lat_m - n.lat_m)
       + (p.lon_m - n.lon_m) * (p.lon_m - n.lon_m) AS d2
  FROM probes p JOIN cells n ON p.cy = n.cy AND p.cx = n.cx
  WHERE p.id <> n.id
),
ranked AS (
  SELECT id, nbr_id, d2,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY id ORDER BY d2, nbr_id) AS INT) AS rank
  FROM cand
)
SELECT id, rank, nbr_id, d2
FROM ranked WHERE rank <= 3
ORDER BY id, rank
""",
    tags=("join", "spatial", "knn", "grid"),
)
def join_geo_knn_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-nearest-neighbor SPATIAL join via grid blocking: each query
    point probes its 3×3 cell neighborhood (explode to 9 cell keys →
    one EQUI-join against points keyed by home cell), and only
    candidates pay the distance + per-query top-k. This is the
    geohash-kNN pattern that replaces the quadratic all-pairs ranking:
    candidate count is Θ(k-neighborhood density), linear in corpus at
    fixed density, and the per-query top-3 is a row_number window over
    candidates, never over the full table. Distances are EXACT integer
    squared micro-degree deltas (coordinates derive from key hashes as
    in join_geo_grid_distance — testdata has no geo columns; the
    OPERATOR is the point), so ranking has no float ties and parity is
    bit-exact. Honest caveats, as in production grid kNN: a true k-th
    neighbor beyond the 3×3 ring is missed (production expands the
    ring until k candidates are inside the guaranteed radius), and
    this fixture ignores lon wraparound; the oracle replicates the
    same candidate generation, so parity checks the pattern.

    Scale: the probe side explodes 9×, the candidate side shuffles
    once on the cell key; dense cells are AQE skew-join territory.
    The top-k window partitions by query id — no global sort.
    Delegates to the public ``grid_knn_join`` API (pipeline.py)."""
    from boltzmannclean_spark.pipeline import grid_knn_join

    cust = load_table(spark, sf_dir, "customer")
    h = lambda lo, n: F.conv(  # noqa: E731
        F.substring(F.md5(F.col("c_custkey").cast("string")), lo, 8), 16, 10
    ).cast("long") % n
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        h(1, 1800000).alias("lat_m"),
        h(9, 3600000).alias("lon_m"),
    )
    return grid_knn_join(
        pts, cell=300000, k=3, query_pred=F.col("id") < 400
    ).select("id", "rank", "nbr_id", "d2")
