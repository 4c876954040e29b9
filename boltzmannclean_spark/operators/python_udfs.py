"""The Python UDF surface (SURVEY.md §2.B UDF/UDAF/UDTF): scalar UDF,
vectorized pandas UDF, grouped-agg pandas UDF (UDAF), grouped-map
applyInPandas, and a table-valued UDTF.

Built-ins beat UDFs in the hot path (JVM whole-stage codegen vs Python
round-trip); these queries exist to prove the escape hatches work and
stay oracle-exact. Determinism rules: per-row IEEE arithmetic is
bit-stable everywhere; aggregations inside Python accumulate integer
cents (exact for the 2-decimal data) so partition order can't change
the result.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf

from boltzmannclean_spark.plans.registry import register
from boltzmannclean_spark.sources.catalog import load_table


@register(
    "udf_scalar_priority",
    oracle="""
SELECT
  o_orderpriority,
  CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS priority_rank,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("udf", "scalar"),
)
def udf_scalar_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the slow path — fine on a grouped
    5-row domain, never on the fact table)."""

    @udf("int")
    def priority_rank(p: str) -> int:
        return int(p.split("-")[0])

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "o_orderpriority",
            priority_rank("o_orderpriority").alias("priority_rank"),
            "n_orders",
        )
        .orderBy("o_orderpriority")
    )


@register(
    "udf_pandas_vectorized",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
WHERE l_quantity >= 49
ORDER BY l_orderkey, l_linenumber
""",
    tags=("udf", "pandas_udf", "vectorized"),
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF: per-row IEEE arithmetic on
    numpy arrays — bit-identical to the JVM expression and ~10-100x a
    row-at-a-time UDF."""

    @pandas_udf("double")
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1 - discount)

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_quantity") >= 49)
        .select(
            "l_orderkey",
            "l_linenumber",
            net_price("l_extendedprice", "l_discount").alias("net_price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "udaf_grouped_agg_cents",
    oracle="""
SELECT
  c_mktsegment,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    tags=("udf", "udaf", "grouped_agg"),
)
def udaf_grouped_agg_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (UDAF): exact integer-cents accumulation
    inside Python, so the result is independent of row order — the UDF
    twin of the exact-decimal SUM recipe."""

    @pandas_udf("long")
    def cents_sum(v: pd.Series) -> int:
        return int(v.mul(100).round().astype("int64").sum())

    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.groupBy("c_mktsegment")
        .agg((cents_sum("c_acctbal") / 100.0).alias("total_acctbal"))
        .orderBy("c_mktsegment")
    )


@register(
    "grouped_map_nation_top",
    oracle="""
WITH m AS (
  SELECT c_nationkey,
         COUNT(*) AS n_customers,
         MAX(c_acctbal) AS max_acctbal,
         SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS s
  FROM customer GROUP BY c_nationkey
)
SELECT m.c_nationkey,
       m.n_customers,
       CAST(m.s AS DOUBLE) AS sum_acctbal,
       (SELECT MIN(c_custkey) FROM customer c
        WHERE c.c_nationkey = m.c_nationkey
          AND c.c_acctbal = m.max_acctbal) AS top_custkey
FROM m ORDER BY m.c_nationkey
""",
    tags=("udf", "grouped_map", "applyInPandas"),
)
def grouped_map_nation_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-nation stats plus the top-balance
    customer (ties broken by min custkey — deterministic). The group
    shuffle is the same hash partition a groupBy would take."""

    def per_nation(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = pdf["c_acctbal"].mul(100).round().astype("int64")
        mx = pdf["c_acctbal"].max()
        top = int(pdf.loc[pdf["c_acctbal"] == mx, "c_custkey"].min())
        return pd.DataFrame(
            {
                "c_nationkey": [int(pdf["c_nationkey"].iloc[0])],
                "n_customers": [len(pdf)],
                "sum_acctbal": [cents.sum() / 100.0],
                "top_custkey": [top],
            }
        )

    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.groupBy("c_nationkey")
        .applyInPandas(
            per_nation,
            schema=(
                "c_nationkey bigint, n_customers bigint, "
                "sum_acctbal double, top_custkey bigint"
            ),
        )
        .orderBy("c_nationkey")
    )


@register(
    "udtf_tokenize",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         generate_subscripts(toks, 1) AS pos,
         unnest(toks) AS token
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
)
SELECT token, COUNT(*) AS n_docs
FROM toks
WHERE pos <= 3
GROUP BY token
ORDER BY n_docs DESC, token
LIMIT 20
""",
    tags=("udf", "udtf"),
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): text → (pos, token) rows via a
    LATERAL join, then an aggregate over leading tokens. The UDTF is the
    PySpark 4.x idiom for one-row-to-many-rows Python logic."""

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" "), start=1):
                yield i, tok

    spark.udtf.register("bcs_tokenize", Tokenize)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "bcs_documents"
    )
    return spark.sql(
        """
        SELECT t.token, COUNT(*) AS n_docs
        FROM bcs_documents d, LATERAL bcs_tokenize(d.text) t
        WHERE t.pos <= 3
        GROUP BY t.token
        ORDER BY n_docs DESC, t.token
        LIMIT 20
        """
    )
