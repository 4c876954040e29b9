"""Bucketed-table co-located join: pre-bucketing both sides of a join
on the key removes the per-query shuffle entirely — the 100 TB pattern
for repeatedly-joined tables. Asserts BOTH the plan property (no
Exchange feeding the join) and result equality with the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

N_BUCKETS = 8


def _bucketed_name(spark, base: str) -> str:
    return f"bcs_bucketed_{base}"


def test_bucketed_join_no_exchange(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")

    for df, name, key in (
        (orders, "orders", "o_custkey"),
        (customer, "customer", "c_custkey"),
    ):
        tbl = _bucketed_name(spark, name)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            df.write.mode("overwrite")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(tbl)
        )

    bo = spark.table(_bucketed_name(spark, "orders"))
    bc = spark.table(_bucketed_name(spark, "customer"))
    joined = (
        bo.join(bc, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )

    # Plan property: bucketing provides the join's required distribution,
    # so no shuffle exchange may appear below the join.
    plan = joined._jdf.queryExecution().executedPlan().toString()
    join_section = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "Exchange hashpartitioning" not in join_section, (
        f"bucketed join still shuffles:\n{plan}"
    )

    # Result property: identical to the plain (shuffling) join.
    plain = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    got = {(r.c_mktsegment, r.n_orders) for r in joined.collect()}
    want = {(r.c_mktsegment, r.n_orders) for r in plain.collect()}
    assert got == want
