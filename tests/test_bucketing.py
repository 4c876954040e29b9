"""Bucketed-table co-located join: pre-bucketing both sides of a join
on the key removes the per-query shuffle entirely — the 100 TB pattern
for repeatedly-joined tables. Asserts BOTH the plan property (bucketed
scan, no Exchange feeding the join) and result equality with the plain
join."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

N_BUCKETS = 8


def _bucketed_name(spark, base: str) -> str:
    return f"bcs_bucketed_{base}"


def test_bucketed_join_no_exchange(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix(
        "file:"
    )
    for df, name, key in (
        (orders, "orders", "o_custkey"),
        (customer, "customer", "c_custkey"),
    ):
        tbl = _bucketed_name(spark, name)
        # DROP TABLE alone is not idempotent against a crashed prior run:
        # the metastore entry can be gone while the warehouse location
        # survives, and saveAsTable then throws LOCATION_ALREADY_EXISTS.
        # Clean both.
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        if warehouse:
            shutil.rmtree(f"{warehouse}/{tbl}", ignore_errors=True)
        (
            df.write.mode("overwrite")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(tbl)
        )

    bo = spark.table(_bucketed_name(spark, "orders"))
    bc = spark.table(_bucketed_name(spark, "customer"))

    # AQE would legitimately pick BroadcastHashJoin for the small side at
    # test scale, which is correct but not the plan property under test —
    # pin the join family so the bucketed-distribution claim is checkable.
    old_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            bo.join(bc, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_orders"))
        )
        got = {(r.c_mktsegment, r.n_orders) for r in joined.collect()}

        # Plan property: the scans are bucketed and bucketing provides the
        # join's required distribution — no shuffle exchange below the join.
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert f"SelectedBucketsCount: {N_BUCKETS} out of {N_BUCKETS}" in plan, plan
        join_section = plan.split("HashAggregate")[-1]
        assert "Exchange hashpartitioning" not in join_section, (
            f"bucketed join still shuffles:\n{plan}"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_threshold)

    # Result property: identical to the plain (shuffling) join.
    plain = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    want = {(r.c_mktsegment, r.n_orders) for r in plain.collect()}
    assert got == want
