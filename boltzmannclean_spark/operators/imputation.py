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
