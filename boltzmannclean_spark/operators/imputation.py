"""Registry entries for the RBM imputation pipeline (reference surface,
SURVEY.md §2.A). Imputation output depends on random init/noise, so —
exactly like upstream's own tests — these are rows-only checks (the
driver records count+schema); the behavioral invariants (no nulls
remain, observed cells untouched, categorical fills from vocabulary)
are asserted in tests/test_imputer.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from boltzmannclean_spark.ml.imputer import RBMImputer
from boltzmannclean_spark.plans.registry import register
from boltzmannclean_spark.sources.catalog import load_table

NUM_COLS = ["c_acctbal"]
CAT_COLS = ["c_mktsegment"]


def with_injected_nulls(df: DataFrame) -> DataFrame:
    """Deterministically null out cells (testdata has no nulls): every
    7th customer loses c_acctbal, every 11th loses c_mktsegment."""
    return df.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 7 == 3, None).otherwise(F.col("c_acctbal")),
    ).withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 11 == 5, None).otherwise(F.col("c_mktsegment")),
    )


@register(
    "impute_rbm_customer",
    oracle=None,  # stochastic model output: rows-only + invariant tests
    tags=("imputation", "rbm", "ml"),
)
def impute_rbm_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end reference pipeline: inject nulls into customer, fit
    RBMImputer (driver-side CD-1 on the encode job's output), transform
    distributed (mapInPandas + broadcast weights), return filled rows."""
    customer = load_table(spark, sf_dir, "customer")
    holed = with_injected_nulls(customer)
    model = RBMImputer(
        numerical_columns=NUM_COLS,
        categorical_columns=CAT_COLS,
        n_hidden=8,
        max_epochs=10,
        seed=42,
    ).fit(holed)
    return model.transform(holed).orderBy("c_custkey")


@register(
    "impute_rbm_distributed_fit",
    oracle=None,
    tags=("imputation", "rbm", "ml", "distributed"),
)
def impute_rbm_distributed_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v2 fit path: per-epoch distributed CD-1 gradient averaging
    (broadcast params → mapInPandas partial gradients → driver update),
    then the same distributed transform."""
    customer = load_table(spark, sf_dir, "customer")
    holed = with_injected_nulls(customer)
    model = RBMImputer(
        numerical_columns=NUM_COLS,
        categorical_columns=CAT_COLS,
        n_hidden=8,
        max_epochs=3,
        seed=42,
        distributed_fit=True,
    ).fit(holed)
    return model.transform(holed).orderBy("c_custkey")


@register(
    "impute_rbm_tuned",
    oracle=None,
    tags=("imputation", "rbm", "ml", "tuning"),
)
def impute_rbm_tuned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 hyperparameter tuning path: hide a fraction of observed cells,
    score candidate configs by masked-cell reconstruction RMSE, refit the
    winner, impute. Small grid/epochs keep the gate fast; the search
    itself is embarrassingly parallel at scale (one fit per config)."""
    customer = load_table(spark, sf_dir, "customer")
    holed = with_injected_nulls(customer)
    imputer = RBMImputer(
        numerical_columns=NUM_COLS,
        categorical_columns=CAT_COLS,
        n_hidden=8,
        max_epochs=5,
        seed=42,
    ).tune(
        holed,
        param_grid=[{"n_hidden": 4}, {"n_hidden": 8, "learn_rate": 0.05}],
    )
    model = imputer.fit(holed)
    return model.transform(holed).orderBy("c_custkey")


@register(
    "impute_mean_mode",
    oracle="""
WITH holed AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 3 THEN NULL ELSE c_acctbal END AS acctbal,
         CASE WHEN c_custkey % 11 = 5 THEN NULL ELSE c_mktsegment END AS seg
  FROM customer
),
stats AS (
  SELECT CAST(SUM(CAST(acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(acctbal)
           AS mean_bal
  FROM holed
),
mode_seg AS (
  SELECT seg AS top_seg FROM holed WHERE seg IS NOT NULL
  GROUP BY seg ORDER BY COUNT(*) DESC, seg LIMIT 1
)
SELECT c_custkey,
       COALESCE(acctbal, mean_bal) AS c_acctbal_filled,
       COALESCE(seg, top_seg)      AS c_mktsegment_filled,
       (acctbal IS NULL) AS was_null_num,
       (seg IS NULL)     AS was_null_cat
FROM holed CROSS JOIN stats CROSS JOIN mode_seg
ORDER BY c_custkey
""",
    tags=("imputation", "baseline"),
)
def impute_mean_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic baseline imputer: numeric nulls ← column mean
    (exact-decimal sum / non-null count), categorical nulls ← mode
    (ties to the lexicographically smallest value). The classical
    baseline the RBM imputer is judged against — and unlike the RBM,
    fully oracle-checkable. Both fill values are 1-row broadcasts
    crossed onto the table: two tiny aggregates + one pass, no driver
    collect."""
    holed = with_injected_nulls(load_table(spark, sf_dir, "customer")).select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("seg"),
    )
    stats = holed.agg(
        (
            F.sum(F.col("acctbal").cast("decimal(12,2)")).cast("double")
            / F.count("acctbal")
        ).alias("mean_bal")
    )
    mode_seg = (
        holed.where(F.col("seg").isNotNull())
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "seg")
        .limit(1)
        .select(F.col("seg").alias("top_seg"))
    )
    return (
        holed.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(mode_seg))
        .select(
            "c_custkey",
            F.coalesce("acctbal", "mean_bal").alias("c_acctbal_filled"),
            F.coalesce("seg", "top_seg").alias("c_mktsegment_filled"),
            F.col("acctbal").isNull().alias("was_null_num"),
            F.col("seg").isNull().alias("was_null_cat"),
        )
        .orderBy("c_custkey")
    )
