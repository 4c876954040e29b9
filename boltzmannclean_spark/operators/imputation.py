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


@register(
    "impute_regression",
    oracle="""
WITH feat AS (
  SELECT o.o_orderkey, o.o_orderstatus,
         CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) AS DOUBLE) AS y_true,
         CAST(x.sq AS DOUBLE) AS x,
         (o.o_orderkey % 7 = 3) AS masked
  FROM orders o
  JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq
        FROM lineitem GROUP BY l_orderkey) x
    ON o.o_orderkey = x.l_orderkey
),
fit AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y_true AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2)))
              AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x AS DECIMAL(18,2)) * CAST(y_true AS DECIMAL(18,2)))
              AS DOUBLE) AS sxy
  FROM feat WHERE NOT masked
),
beta AS (
  SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b1,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS b0
  FROM fit
),
ev AS (
  SELECT o_orderstatus,
         COUNT(*) AS n_masked,
         CAST(SUM(CAST(y_true AS DECIMAL(18,2))) AS DOUBLE) AS msy,
         CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS msx,
         CAST(SUM(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2)))
              AS DOUBLE) AS msxx,
         CAST(SUM(CAST(y_true AS DECIMAL(18,2)) * CAST(y_true AS DECIMAL(18,2)))
              AS DOUBLE) AS msyy,
         CAST(SUM(CAST(x AS DECIMAL(18,2)) * CAST(y_true AS DECIMAL(18,2)))
              AS DOUBLE) AS msxy
  FROM feat WHERE masked GROUP BY o_orderstatus
)
SELECT o_orderstatus, n_masked,
       msy AS sum_actual,
       n_masked * b0 + b1 * msx AS sum_imputed,
       SQRT((n_masked * b0 * b0 + b1 * b1 * msxx + msyy
             + 2 * b0 * b1 * msx - 2 * b0 * msy - 2 * b1 * msxy)
            / n_masked) AS rmse
FROM ev CROSS JOIN beta
ORDER BY o_orderstatus
""",
    tags=("imputation", "regression", "ols"),
)
def impute_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression imputation with SELF-EVALUATION — the fourth leg of
    the imputer family (mean/mode baseline, kNN, RBM, now OLS): mask
    o_totalprice on a deterministic 1/7th of orders, fit ordinary least
    squares of price on total line-item quantity over the UNMASKED
    rows, impute the masked ones, and score the imputation against the
    held-out truth — all in one declarative plan.

    Float discipline: no per-row prediction is ever summed. Σŷ and the
    masked-set squared error expand algebraically into the group's
    exact-decimal moments (Σŷ = n·β₀ + β₁·Σx; Σ(ŷ−y)² = n·β₀² + β₁²Σx²
    + Σy² + 2β₀β₁Σx − 2β₀Σy − 2β₁Σxy), so every emitted double is one
    IEEE expression over identical exact operands in both engines —
    order-independent at any parallelism, same recipe as
    agg_stats_exact. The fit is a single partial+final aggregation
    (4 sufficient statistics), the evaluation another; β is a 1-row
    broadcast."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sq = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("sq")
    )
    feat = o.join(sq, o.o_orderkey == sq.l_orderkey).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(14,2)").cast("double").alias("y"),
        F.col("sq").cast("double").alias("x"),
        (F.col("o_orderkey") % 7 == 3).alias("masked"),
    )
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    fit = feat.where(~F.col("masked")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d("x")).cast("double").alias("sx"),
        F.sum(d("y")).cast("double").alias("sy"),
        F.sum(d("x") * d("x")).cast("double").alias("sxx"),
        F.sum(d("x") * d("y")).cast("double").alias("sxy"),
    )
    beta = fit.select(
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("b1"),
        (
            (
                F.col("sy")
                - (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.col("sx")
            )
            / F.col("n")
        ).alias("b0"),
    )
    ev = feat.where(F.col("masked")).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_masked"),
        F.sum(d("y")).cast("double").alias("msy"),
        F.sum(d("x")).cast("double").alias("msx"),
        F.sum(d("x") * d("x")).cast("double").alias("msxx"),
        F.sum(d("y") * d("y")).cast("double").alias("msyy"),
        F.sum(d("x") * d("y")).cast("double").alias("msxy"),
    )
    return (
        ev.crossJoin(F.broadcast(beta))
        .select(
            "o_orderstatus",
            "n_masked",
            F.col("msy").alias("sum_actual"),
            (F.col("n_masked") * F.col("b0") + F.col("b1") * F.col("msx")).alias(
                "sum_imputed"
            ),
            F.sqrt(
                (
                    F.col("n_masked") * F.col("b0") * F.col("b0")
                    + F.col("b1") * F.col("b1") * F.col("msxx")
                    + F.col("msyy")
                    + 2 * F.col("b0") * F.col("b1") * F.col("msx")
                    - 2 * F.col("b0") * F.col("msy")
                    - 2 * F.col("b1") * F.col("msxy")
                )
                / F.col("n_masked")
            ).alias("rmse"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "impute_hotdeck",
    oracle="""
WITH holed AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         CASE WHEN c_custkey % 7 = 3 THEN NULL ELSE c_acctbal END AS acctbal,
         c_acctbal AS truth
  FROM customer
),
filled AS (
  SELECT c_custkey, c_nationkey, c_mktsegment, acctbal, truth,
         COALESCE(acctbal,
                  LAST_VALUE(acctbal IGNORE NULLS) OVER (
                    PARTITION BY c_nationkey, c_mktsegment
                    ORDER BY c_custkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           AS donor_fill
  FROM holed
)
SELECT c_custkey, c_nationkey, c_mktsegment,
       donor_fill AS c_acctbal_filled,
       (acctbal IS NULL)                          AS was_null,
       (acctbal IS NULL AND donor_fill IS NULL)   AS still_null,
       CASE WHEN acctbal IS NULL AND donor_fill IS NOT NULL
            THEN CAST(CAST(ABS(CAST(donor_fill AS DECIMAL(12,2))
                               - CAST(truth AS DECIMAL(12,2)))
                           AS DECIMAL(12,2)) AS DOUBLE) END AS abs_error
FROM filled
ORDER BY c_custkey
""",
    tags=("imputation", "hotdeck"),
)
def impute_hotdeck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential hot-deck imputation (the survey-statistics classic,
    and boltzmannclean's conceptual neighbor: fill from a REAL donor
    record rather than a model): a null c_acctbal takes the value of
    the nearest preceding donor within its (nation, market-segment)
    stratum, in deterministic c_custkey order — so fills are always
    actually-observed values, preserve the stratum's distribution, and
    are reproducible across engines (no RNG donor draw). One window
    over ONE (nationkey, mktsegment) exchange; per-cell absolute error
    against the pre-masking truth is emitted for the held-out
    self-evaluation, exact-decimal so the comparison needs no
    tolerance. Rows whose stratum has no preceding donor stay null and
    are flagged (`still_null`) — the honest residual a production
    pipeline routes to the model-based imputers."""
    from pyspark.sql import Window

    base = load_table(spark, sf_dir, "customer")
    holed = base.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 == 3, None)
        .otherwise(F.col("c_acctbal"))
        .alias("acctbal"),
        F.col("c_acctbal").alias("truth"),
    )
    w = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = holed.withColumn(
        "donor_fill",
        F.coalesce("acctbal", F.last("acctbal", ignorenulls=True).over(w)),
    )
    err = (
        F.abs(
            F.col("donor_fill").cast("decimal(12,2)")
            - F.col("truth").cast("decimal(12,2)")
        )
        .cast("decimal(12,2)")
        .cast("double")
    )
    return filled.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.col("donor_fill").alias("c_acctbal_filled"),
        F.col("acctbal").isNull().alias("was_null"),
        (F.col("acctbal").isNull() & F.col("donor_fill").isNull()).alias(
            "still_null"
        ),
        F.when(
            F.col("acctbal").isNull() & F.col("donor_fill").isNotNull(), err
        ).alias("abs_error"),
    ).orderBy("c_custkey")


@register(
    "impute_rbm_pipeline_persist",
    oracle=None,  # stochastic model output: rows-only + invariant tests
    tags=("imputation", "rbm", "ml", "mllib", "persistence"),
)
def impute_rbm_pipeline_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north star's 'MLlib pipeline' end-to-end THROUGH the
    registered surface: RBMImputer runs inside pyspark.ml.Pipeline,
    the fitted PipelineModel's RBM stage is persisted with save(),
    reloaded with RBMImputerModel.load(), and the RELOADED model
    produces the output — proving fit-once / persist / transform-
    anywhere works as a user would actually wire it. The reload is
    bit-identical to the in-memory model (tests/test_imputer.py), so
    this entry's row count and schema match impute_rbm_customer's."""
    import os
    import tempfile

    from pyspark.ml import Pipeline

    from boltzmannclean_spark.ml.imputer import RBMImputerModel

    customer = load_table(spark, sf_dir, "customer")
    holed = with_injected_nulls(customer)
    pm = Pipeline(
        stages=[
            RBMImputer(
                numerical_columns=NUM_COLS,
                categorical_columns=CAT_COLS,
                n_hidden=8,
                max_epochs=5,
                seed=42,
            )
        ]
    ).fit(holed)
    path = os.path.join(tempfile.mkdtemp(prefix="bcs_rbm_model_"), "rbm")
    pm.stages[0].save(path)
    reloaded = RBMImputerModel.load(path)
    return reloaded.transform(holed).orderBy("c_custkey")
