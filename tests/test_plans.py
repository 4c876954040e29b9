"""Physical-plan quality gates: the scale claims in operator docstrings
(pushed-down filters, pruned columns, broadcast dims, partition pruning,
whole-stage codegen) asserted against the actual Catalyst output, so a
regression that silently de-optimizes a plan fails the suite even though
results stay correct."""

from __future__ import annotations

from boltzmannclean_spark.plans.registry import all_queries

QUERIES = all_queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_scan_is_pruned_and_pushed(spark, sf_dir):
    df = QUERIES["pricing_summary"].spark_fn(spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0], plan
    # Column pruning: the scan must not read columns the query never touches.
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema, read_schema
    assert "l_partkey" not in read_schema, read_schema
    # Codegen spans only appear in the AQE-final plan, after execution.
    df.collect()
    final_plan = _plan(df)
    # "*(n)" is WholeStageCodegen's marker in the plan string.
    assert "*(" in final_plan, "aggregation fell out of codegen:\n" + final_plan


def test_project_filter_pushdown(spark, sf_dir):
    df = QUERIES["project_filter"].spark_fn(spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [" in plan, plan
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "IsNotNull" in pushed or "GreaterThan" in pushed or "EqualTo" in pushed, pushed


def test_revenue_join_broadcasts_dims(spark, sf_dir):
    df = QUERIES["join_revenue_by_nation"].spark_fn(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_partitioned_sink_scan_prunes_partitions(spark, sf_dir):
    df = QUERIES["sink_partitioned_pruning"].spark_fn(spark, sf_dir)
    plan = _plan(df)
    assert "PartitionFilters:" in plan, plan
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "o_orderstatus" in pf, pf
    df.collect()  # materialize so the pruned scan actually runs


def test_embedding_dedup_has_no_driver_collect(spark, sf_dir):
    # The banded-LSH plan must be a pure DataFrame pipeline: joins +
    # aggregations, no Python row path and no cartesian product of the
    # corpus with itself (the planes crossJoin is a 24-row broadcast).
    df = QUERIES["dedup_embedding_cosine"].spark_fn(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "mapInPandas" not in plan and "MapInPandas" not in plan, plan


def test_sessionize_single_user_shuffle(spark, sf_dir):
    # lag, running sum, and the per-session aggregate must all reuse the
    # one user_id exchange: exactly one shuffle before the final sort.
    df = QUERIES["events_sessionize"].spark_fn(spark, sf_dir)
    plan = _plan(df)
    pre_sort = plan.split("rangepartitioning")[-1]  # below the output sort
    assert pre_sort.count("Exchange hashpartitioning") == 1, plan


def test_nearest_centroid_broadcasts_centroids(spark, sf_dir):
    # The corpus side must stream: centroid table broadcast, no corpus
    # cartesian product and no corpus-wide explode on the scoring path.
    df = QUERIES["embedding_nearest_centroid"].spark_fn(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_levenshtein_pairs_from_equi_join(spark, sf_dir):
    # Blocking on (lang, n_chars) must plan as a hash/merge equi-join —
    # a cartesian pair enumeration would be quadratic in the corpus.
    df = QUERIES["dedup_levenshtein_verify"].spark_fn(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_profile_columns_single_scan(spark, sf_dir):
    # The profiler's whole point: 6 columns × 4 stats from ONE scan of
    # orders (the oracle's UNION ALL twin needs 6).
    df = QUERIES["agg_profile_columns"].spark_fn(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("FileScan parquet") == 1, plan


def test_pagerank_no_cartesian_blowup(spark, sf_dir):
    # Power iteration must stay equi-join + aggregate per iteration;
    # the only nested-loop join allowed is the 1-row n_nodes broadcast.
    df = QUERIES["graph_pagerank_bipartite"].spark_fn(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
