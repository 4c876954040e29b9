"""As-of join — Spark has no built-in; composed from union + window.

Semantics match DuckDB's ``ASOF JOIN`` (the oracle): for each left row,
pick the single right row with the largest ``right_on <= left_on``
within the same ``by`` keys ("backward" direction); left rows with no
such right row survive with NULLs (ASOF LEFT JOIN).

Scale design: the naive formulation (range join + max_by) is a near
cross-product per key. This implementation instead unions both sides
tagged, sorts once per key on (ts, tag), and forward-fills the right
payload with ``last(..., ignorenulls=True)`` over an unbounded-preceding
row frame — ONE shuffle + sort over n_left + n_right rows, the same cost
as a sort-merge join, no quadratic blowup on hot keys. Equal timestamps:
right rows sort before left rows (tag 0 < 1) so a tie matches, exactly
like DuckDB's ``>=``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from boltzmannclean_spark.plans.registry import register
from boltzmannclean_spark.sources.catalog import load_table

_TAG = "__asof_tag"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_on: str,
    right_on: str,
    payload: Sequence[str],
) -> DataFrame:
    """Backward as-of join; returns left columns + ``payload`` columns
    from the latest right row with right_on <= left_on per ``by`` group.

    ``payload`` column names must not clash with left's columns (rename
    on the right side first).
    """
    by = list(by)
    payload = list(payload)
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns clash with left columns: {sorted(clash)}")

    l2 = left.withColumn(_TAG, F.lit(1)).withColumn(_TS, F.col(left_on))
    for c in payload:
        l2 = l2.withColumn(c, F.lit(None).cast(right.schema[c].dataType))

    r2 = right.select(
        *by, F.col(right_on).alias(_TS), F.lit(0).alias(_TAG), *payload
    )
    for c in left.columns:
        if c not in r2.columns:
            r2 = r2.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    cols = left.columns + [_TAG, _TS] + payload
    unioned = l2.select(*cols).unionByName(r2.select(*cols))

    w = (
        Window.partitionBy(*by)
        .orderBy(_TS, _TAG)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left.columns,
        F.col(_TAG),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload],
    )
    return filled.where(F.col(_TAG) == 1).drop(_TAG)


@register(
    "asof_purchase_last_click",
    oracle="""
SELECT
  p.event_id        AS purchase_id,
  p.user_id         AS user_id,
  epoch_us(p.ts)    AS purchase_us,
  COALESCE(c.event_id, -1)     AS click_id,
  COALESCE(c.value, -1.0)      AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY purchase_id
""",
    tags=("join", "asof"),
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the user's most recent click at-or-before it."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    out = asof_join(
        purchases,
        clicks,
        by=["user_id"],
        left_on="p_ts",
        right_on="c_ts",
        payload=["click_id", "click_value"],
    )
    return out.select(
        "purchase_id",
        "user_id",
        "purchase_us",
        F.coalesce("click_id", F.lit(-1)).alias("click_id"),
        F.coalesce("click_value", F.lit(-1.0)).alias("click_value"),
    ).orderBy("purchase_id")


@register(
    "asof_tolerance",
    oracle="""
SELECT
  p.event_id     AS purchase_id,
  p.user_id      AS user_id,
  epoch_us(p.ts) AS purchase_us,
  CASE WHEN c.ts IS NOT NULL
        AND epoch_us(p.ts) - epoch_us(c.ts) <= 1800000000
       THEN c.event_id ELSE -1 END AS click_id,
  CASE WHEN c.ts IS NOT NULL
        AND epoch_us(p.ts) - epoch_us(c.ts) <= 1800000000
       THEN epoch_us(p.ts) - epoch_us(c.ts) ELSE -1 END AS lag_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY purchase_id
""",
    tags=("join", "asof", "tolerance"),
)
def asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance window (pandas merge_asof semantics):
    the most recent click counts only if it is within 30 minutes of the
    purchase. The backward as-of already yields the CLOSEST candidate,
    so tolerance is a post-filter on the matched timestamp — no plan
    change, same single shuffle as the plain as-of."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("matched_click"),
        F.unix_micros("ts").alias("click_us"),
    )
    out = asof_join(
        purchases,
        clicks,
        by=["user_id"],
        left_on="p_ts",
        right_on="c_ts",
        payload=["matched_click", "click_us"],
    )
    within = (F.col("purchase_us") - F.col("click_us")) <= 1_800_000_000
    ok = F.col("click_us").isNotNull() & within
    return out.select(
        "purchase_id",
        "user_id",
        "purchase_us",
        F.when(ok, F.col("matched_click")).otherwise(-1).alias("click_id"),
        F.when(ok, F.col("purchase_us") - F.col("click_us"))
        .otherwise(-1)
        .alias("lag_us"),
    ).orderBy("purchase_id")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_on: str,
    right_on: str,
    payload: Sequence[str],
) -> DataFrame:
    """Forward as-of join: EARLIEST right row with right_on >= left_on
    per ``by`` group (pandas merge_asof direction='forward'). Mirror of
    ``asof_join``: same one-shuffle union+sort, but the fill runs
    backward (first over current..unboundedFollowing) and right rows
    sort AFTER left rows on timestamp ties so a tie still matches."""
    by = list(by)
    payload = list(payload)
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns clash with left columns: {sorted(clash)}")

    l2 = left.withColumn(_TAG, F.lit(0)).withColumn(_TS, F.col(left_on))
    for c in payload:
        l2 = l2.withColumn(c, F.lit(None).cast(right.schema[c].dataType))

    r2 = right.select(
        *by, F.col(right_on).alias(_TS), F.lit(1).alias(_TAG), *payload
    )
    for c in left.columns:
        if c not in r2.columns:
            r2 = r2.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    cols = left.columns + [_TAG, _TS] + payload
    unioned = l2.select(*cols).unionByName(r2.select(*cols))

    w = (
        Window.partitionBy(*by)
        .orderBy(_TS, _TAG)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = unioned.select(
        *left.columns,
        F.col(_TAG),
        *[F.first(c, ignorenulls=True).over(w).alias(c) for c in payload],
    )
    return filled.where(F.col(_TAG) == 0).drop(_TAG)


@register(
    "asof_forward_next_click",
    oracle="""
SELECT
  p.event_id        AS purchase_id,
  p.user_id         AS user_id,
  epoch_us(p.ts)    AS purchase_us,
  COALESCE(c.event_id, -1)     AS click_id,
  COALESCE(c.value, -1.0)      AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts <= c.ts
ORDER BY purchase_id
""",
    tags=("join", "asof", "forward"),
)
def asof_forward_next_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each purchase matched to the user's NEXT click at
    or after it (post-purchase behavior attribution) — merge_asof
    direction='forward', still one shuffle, no per-key cross product.
    DuckDB's ASOF with `<=` is the directional oracle."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    joined = asof_join_forward(
        purchases,
        clicks,
        by=["user_id"],
        left_on="p_ts",
        right_on="c_ts",
        payload=["click_id", "click_value"],
    )
    return joined.select(
        "purchase_id",
        "user_id",
        F.unix_micros("p_ts").alias("purchase_us"),
        F.coalesce("click_id", F.lit(-1)).alias("click_id"),
        F.coalesce("click_value", F.lit(-1.0)).alias("click_value"),
    ).orderBy("purchase_id")


@register(
    "asof_nearest_click",
    oracle="""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     c AS (SELECT * FROM events WHERE event_type = 'click'),
back AS (
  SELECT p.event_id AS purchase_id, p.user_id, epoch_us(p.ts) AS p_us,
         c.event_id AS b_id, epoch_us(c.ts) AS b_us
  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
),
fwd AS (
  SELECT p.event_id AS purchase_id,
         c.event_id AS f_id, epoch_us(c.ts) AS f_us
  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
)
SELECT b.purchase_id, b.user_id,
       CASE
         WHEN b.b_id IS NULL AND f.f_id IS NULL THEN -1
         WHEN f.f_id IS NULL THEN b.b_id
         WHEN b.b_id IS NULL THEN f.f_id
         WHEN b.p_us - b.b_us <= f.f_us - b.p_us THEN b.b_id
         ELSE f.f_id
       END AS nearest_click_id,
       CASE
         WHEN b.b_id IS NULL AND f.f_id IS NULL THEN -1
         WHEN f.f_id IS NULL THEN b.p_us - b.b_us
         WHEN b.b_id IS NULL THEN f.f_us - b.p_us
         ELSE LEAST(b.p_us - b.b_us, f.f_us - b.p_us)
       END AS gap_us
FROM back b JOIN fwd f ON f.purchase_id = b.purchase_id
ORDER BY b.purchase_id
""",
    tags=("join", "asof", "nearest"),
)
def asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of (merge_asof direction='nearest'): each purchase
    takes whichever click is closer in time — backward on ties —
    composed from the backward and forward single-shuffle as-of
    kernels and a per-row CASE. Still two sorts of n_left+n_right
    rows, never a per-key cross product; the gap arithmetic is integer
    µs, so the closer-side choice is engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    clicks_b = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
    )
    clicks_f = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("f_id"),
        F.col("ts").alias("f_ts"),
    )
    back = asof_join(
        purchases, clicks_b, by=["user_id"], left_on="p_ts", right_on="c_ts",
        payload=["b_id", "b_ts"],
    )
    fwd = asof_join_forward(
        purchases.select("purchase_id", "user_id", "p_ts"),
        clicks_f, by=["user_id"], left_on="p_ts", right_on="c_ts",
        payload=["f_id", "f_ts"],
    ).select("purchase_id", "f_id", "f_ts")
    j = back.join(fwd, "purchase_id")
    b_gap = F.unix_micros("p_ts") - F.unix_micros("b_ts")
    f_gap = F.unix_micros("f_ts") - F.unix_micros("p_ts")
    nearest = (
        F.when(F.col("b_id").isNull() & F.col("f_id").isNull(), F.lit(-1))
        .when(F.col("f_id").isNull(), F.col("b_id"))
        .when(F.col("b_id").isNull(), F.col("f_id"))
        .when(b_gap <= f_gap, F.col("b_id"))
        .otherwise(F.col("f_id"))
    )
    gap = (
        F.when(F.col("b_id").isNull() & F.col("f_id").isNull(), F.lit(-1))
        .when(F.col("f_id").isNull(), b_gap)
        .when(F.col("b_id").isNull(), f_gap)
        .otherwise(F.least(b_gap, f_gap))
    )
    return j.select(
        "purchase_id",
        "user_id",
        nearest.alias("nearest_click_id"),
        gap.alias("gap_us"),
    ).orderBy("purchase_id")
