"""Time-series operators over the events stream: regular-grid
resampling with gap filling (zero-fill for additive measures,
forward-fill for state-like measures) — the preprocessing step for any
downstream windowed model over irregular event data.

Scale design: the hour grid is built per user by exploding a
``sequence`` between the corpus time bounds — the bounds are a 1-row
broadcast (no driver collect), the explode is executor-side, and the
grid⋈observations join is an equi-join on (user_id, hour), so the whole
plan is one shuffle on the same key the output is grouped by. Grid size
is users × hours, which at 100 TB argues for bucketing the output table
by user_id — the join key is already the partitioning key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from boltzmannclean_spark.functions.exact import dec
from boltzmannclean_spark.plans.registry import register
from boltzmannclean_spark.sources.catalog import load_table

N_USERS = 50  # grid bound for the fixture (production: all users)


@register(
    "ts_gapfill_hourly",
    oracle=f"""
WITH e AS (
  SELECT user_id, date_trunc('hour', ts) AS h, value
  FROM events WHERE user_id < {N_USERS}
),
b AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM e),
users AS (SELECT DISTINCT user_id FROM e),
grid AS (
  SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM users CROSS JOIN b
),
agg AS (
  SELECT user_id, h, COUNT(*) AS n,
         CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS v
  FROM e GROUP BY user_id, h
),
joined AS (
  SELECT g.user_id, epoch_us(g.h) AS hour_us,
         COALESCE(agg.n, 0) AS n_events,
         COALESCE(agg.v, 0.0) AS sum_value,
         agg.v AS v_raw
  FROM grid g LEFT JOIN agg ON g.user_id = agg.user_id AND g.h = agg.h
)
SELECT user_id, hour_us, n_events, sum_value,
       COALESCE(last_value(v_raw IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY hour_us
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS ffill_value
FROM joined
ORDER BY user_id, hour_us
""",
    tags=("timeseries", "gapfill", "resample"),
)
def ts_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample events to a per-user hourly grid: missing hours appear
    with n_events=0 (zero-fill) and the last observed hourly sum carried
    forward (forward-fill via last(ignorenulls) over an unbounded-
    preceding frame). Decimal-exact hourly sums keep both engines
    bit-identical; hours emitted as epoch-µs."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < N_USERS)
    e = ev.select("user_id", F.date_trunc("hour", "ts").alias("h"), "value")
    agg = e.groupBy("user_id", "h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value")).cast("double").alias("v"),
    )
    bounds = e.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    users = e.select("user_id").distinct()
    grid = (
        users.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    joined = grid.join(agg, ["user_id", "h"], "left").select(
        "user_id",
        F.unix_micros("h").alias("hour_us"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.coalesce("v", F.lit(0.0)).alias("sum_value"),
        F.col("v").alias("v_raw"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hour_us",
        "n_events",
        "sum_value",
        F.coalesce(F.last("v_raw", ignorenulls=True).over(w), F.lit(0.0)).alias(
            "ffill_value"
        ),
    ).orderBy("user_id", "hour_us")


@register(
    "ts_time_weighted_avg",
    oracle="""
WITH t AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         LEAD(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS nxt
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_intervals,
       CAST(SUM(nxt - us) AS BIGINT) AS span_us,
       CAST(SUM((nxt - us) * cents) AS DOUBLE)
         / CAST(SUM(nxt - us) AS DOUBLE) / 100.0 AS twa_value
FROM t
WHERE nxt IS NOT NULL
GROUP BY user_id
HAVING SUM(nxt - us) > 0
ORDER BY user_id
""",
    tags=("timeseries", "time-weighted", "window"),
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per user (TimescaleDB
    `time_weight('LOCF')`-style): each observation is weighted by how
    long it was the latest one, i.e. the µs gap to the next event; the
    final open-ended observation carries no weight.

    One window (lead over the per-user timeline — the same shuffle the
    aggregation needs anyway, so the whole plan is ONE exchange on
    user_id) plus a hash aggregation. Determinism: weights are exact µs
    bigints, values exact integer cents (2-dp money data), and
    Σ(weight·cents) accumulates in DECIMAL(38,0) — DuckDB promotes this
    sum to HUGEINT, and a LongType sum would wrap silently at scale
    (µs gaps × cents exceeds 2^63 per ROW for multi-day gaps on large
    values; the round-4 advisor caught this) — so both sides are exact
    integer arithmetic in any order at any parallelism; the only float
    ops are two final IEEE divisions of identical exact operands. Ties
    on ts are ordered by event_id in both engines. Users with a zero
    total span (all events at one instant) are dropped by the HAVING
    in both plans."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    t = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        (dec("value") * 100).cast("long").alias("cents"),
    ).withColumn("nxt", F.lead("us").over(w))
    return (
        t.where(F.col("nxt").isNotNull())
        .withColumn("dt", F.col("nxt") - F.col("us"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dt").alias("span_us"),
            (
                F.sum(
                    F.col("dt").cast("decimal(20,0)") * F.col("cents")
                ).cast("double")
                / F.sum("dt").cast("double")
                / F.lit(100.0)
            ).alias("twa_value"),
        )
        .where(F.col("span_us") > 0)
        .orderBy("user_id")
    )


@register(
    "ts_ohlc_bars",
    oracle="""
WITH t AS (
  SELECT date_trunc('hour', ts) AS h, epoch_us(ts) AS us, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY epoch_us(ts), event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT epoch_us(h) AS hour_us,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS volume
FROM t
GROUP BY h
ORDER BY hour_us
""",
    tags=("timeseries", "ohlc", "rollup"),
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candles over the event stream — the hypertable
    rollup shape (TimescaleDB `time_bucket` + first/last/min/max).

    Open/close are first/last `value` by (ts, event_id) — selected via
    two row_numbers over the SAME (hour) partitioning the aggregation
    shuffles on, so the whole plan is one exchange; the deterministic
    event_id tiebreak makes the pick identical in both engines. High/
    low/count are plain aggregates; volume sums in exact decimal. At
    100 TB the hour key is low-cardinality relative to rows — the
    window is per-bucket parallel and the agg partial-aggregates
    map-side; for finer buckets the same plan just has more groups."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        F.date_trunc("hour", "ts").alias("h"),
        F.unix_micros("ts").alias("us"),
        "event_id",
        "value",
    )
    wa = Window.partitionBy("h").orderBy(F.col("us").asc(), F.col("event_id").asc())
    wd = Window.partitionBy("h").orderBy(F.col("us").desc(), F.col("event_id").desc())
    return (
        t.withColumn("rn_a", F.row_number().over(wa))
        .withColumn("rn_d", F.row_number().over(wd))
        .groupBy("h")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("volume"),
        )
        .select(
            F.unix_micros("h").alias("hour_us"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "volume",
        )
        .orderBy("hour_us")
    )


@register(
    "ts_linear_interpolate",
    oracle=f"""
WITH obs AS (
  SELECT user_id, epoch_us(ts) AS t_us,
         arg_max(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT), event_id)
           AS cents
  FROM events WHERE user_id < {N_USERS}
  GROUP BY user_id, epoch_us(ts)
),
b AS (
  SELECT user_id, MIN(t_us) AS t0, MAX(t_us) AS t1 FROM obs GROUP BY user_id
),
grid AS (
  SELECT user_id,
         UNNEST(generate_series(t0 - (t0 % 3600000000) + 3600000000,
                                t1 - (t1 % 3600000000), 3600000000)) AS t_us
  FROM b
),
u AS (
  SELECT user_id, t_us, cents, 0 AS is_grid FROM obs
  UNION ALL
  SELECT user_id, t_us, NULL AS cents, 1 AS is_grid FROM grid
),
filled AS (
  SELECT user_id, t_us, is_grid,
         last_value(cents IGNORE NULLS) OVER wp AS vp,
         last_value(CASE WHEN cents IS NOT NULL THEN t_us END IGNORE NULLS)
           OVER wp AS tp,
         first_value(cents IGNORE NULLS) OVER wn AS vn,
         first_value(CASE WHEN cents IS NOT NULL THEN t_us END IGNORE NULLS)
           OVER wn AS tn
  FROM u
  WINDOW wp AS (PARTITION BY user_id ORDER BY t_us, is_grid
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY t_us, is_grid
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, t_us AS hour_us,
       CASE WHEN tn IS NULL OR tn = tp THEN CAST(vp AS DOUBLE) / 100.0
            ELSE (CAST(vp AS DOUBLE)
                  + CAST((vn - vp) * (t_us - tp) AS DOUBLE)
                    / CAST(tn - tp AS DOUBLE)) / 100.0 END AS interp_value
FROM filled
WHERE is_grid = 1
ORDER BY user_id, hour_us
""",
    tags=("timeseries", "interpolate", "resample"),
)
def ts_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resampling by LINEAR interpolation (TimescaleDB
    `interpolate()` / pandas `resample().interpolate()`): each interior
    grid hour gets the line between its surrounding observations,
    v = vp + (vn−vp)·(t−tp)/(tn−tp). The union-of-grid-and-observations
    trick computes every (prev, next) pair with TWO frames over ONE
    per-user exchange — no as-of self-join, no fan-out: observations
    sort before a coinciding grid point, so an exact hit degenerates to
    tp = t (the formula's zero-numerator case) and the tn IS NULL guard
    covers a grid point at the user's final observation. Grids are
    per-user interior (first full hour after the user's first event to
    the last full hour before their final one), so no extrapolation
    NULLs reach the output. Exactness: values in integer cents,
    timestamps in integer µs; the interpolation itself is IEEE ops on
    identical exact int64 operands — (vn−vp)·dt stays below 2^63 up to
    multi-year gaps on 2-dp values (wider spans would move the product
    to DECIMAL like ts_time_weighted_avg). Same-µs duplicate events
    resolve by max event_id (arg_max) in both engines."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < N_USERS)
    obs = (
        ev.select(
            "user_id",
            F.unix_micros("ts").alias("t_us"),
            "event_id",
            (dec("value") * 100).cast("long").alias("c"),
        )
        .groupBy("user_id", "t_us")
        .agg(F.max_by("c", "event_id").alias("cents"))
    )
    hour = 3_600_000_000
    bounds = obs.groupBy("user_id").agg(
        F.min("t_us").alias("t0"), F.max("t_us").alias("t1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("t0") - F.col("t0") % hour + hour,
                F.col("t1") - F.col("t1") % hour,
                F.lit(hour),
            )
        ).alias("t_us"),
    )
    u = obs.select(
        "user_id", "t_us", "cents", F.lit(0).alias("is_grid")
    ).unionAll(
        grid.select(
            "user_id",
            "t_us",
            F.lit(None).cast("long").alias("cents"),
            F.lit(1).alias("is_grid"),
        )
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "is_grid")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t_obs = F.when(F.col("cents").isNotNull(), F.col("t_us"))
    filled = u.select(
        "user_id",
        "t_us",
        "is_grid",
        F.last("cents", ignorenulls=True).over(wp).alias("vp"),
        F.last(t_obs, ignorenulls=True).over(wp).alias("tp"),
        F.first("cents", ignorenulls=True).over(wn).alias("vn"),
        F.first(t_obs, ignorenulls=True).over(wn).alias("tn"),
    )
    interp = (
        F.when(
            F.col("tn").isNull() | (F.col("tn") == F.col("tp")),
            F.col("vp").cast("double") / 100.0,
        ).otherwise(
            (
                F.col("vp").cast("double")
                + (
                    (F.col("vn") - F.col("vp")) * (F.col("t_us") - F.col("tp"))
                ).cast("double")
                / (F.col("tn") - F.col("tp")).cast("double")
            )
            / 100.0
        )
    )
    return (
        filled.where(F.col("is_grid") == 1)
        .select("user_id", F.col("t_us").alias("hour_us"), interp.alias("interp_value"))
        .orderBy("user_id", "hour_us")
    )


@register(
    "ts_cascaded_rollup",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('day', ts) AS d, date_trunc('hour', ts) AS h,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS sum_cents,
         MIN(value) AS lo, MAX(value) AS hi
  FROM events GROUP BY d, h
),
daily_cascade AS (
  SELECT d, CAST(SUM(n) AS BIGINT) AS n_events,
         CAST(SUM(sum_cents) AS BIGINT) AS sum_cents,
         MIN(lo) AS min_value, MAX(hi) AS max_value
  FROM hourly GROUP BY d
),
daily_direct AS (
  SELECT date_trunc('day', ts) AS d, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS sum_cents
  FROM events GROUP BY d
)
SELECT epoch_us(c.d) AS day_us, c.n_events,
       CAST(c.sum_cents AS DOUBLE) / 100.0 AS sum_value,
       CAST(c.sum_cents AS DOUBLE) / 100.0 / c.n_events AS avg_value,
       c.min_value, c.max_value,
       (c.n_events = dd.n AND c.sum_cents = dd.sum_cents) AS cascade_ok
FROM daily_cascade c JOIN daily_direct dd ON c.d = dd.d
ORDER BY day_us
""",
    tags=("timeseries", "rollup", "mergeable"),
)
def ts_cascaded_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascaded continuous aggregate (the TimescaleDB/Druid rollup
    contract): daily bars built FROM the hourly bars, not from raw rows
    — and proven equal to the direct daily aggregation in-query
    (``cascade_ok``). This is the property that lets a 100 TB pipeline
    keep only hour-grain aggregates and serve every coarser grain by
    re-aggregation: counts/sums/min/max merge exactly (integer cents —
    float sums would NOT re-aggregate bit-identically), and avg must be
    derived from merged (sum, count), never averaged-of-averages. The
    cascade is two hash aggregations where the second input is
    |hours| rows; the direct-daily audit branch shares the raw scan."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("hour", "ts").alias("h"),
        "value",
        (dec("value") * 100).cast("long").alias("cents"),
    )
    hourly = ev.groupBy("d", "h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sum_cents"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    cascade = hourly.groupBy("d").agg(
        F.sum("n").alias("n_events"),
        F.sum("sum_cents").alias("sum_cents"),
        F.min("lo").alias("min_value"),
        F.max("hi").alias("max_value"),
    )
    direct = ev.groupBy("d").agg(
        F.count(F.lit(1)).alias("n_d"),
        F.sum("cents").alias("sum_cents_d"),
    )
    return (
        cascade.join(direct, "d")
        .select(
            F.unix_micros("d").alias("day_us"),
            "n_events",
            (F.col("sum_cents").cast("double") / F.lit(100.0)).alias(
                "sum_value"
            ),
            (
                F.col("sum_cents").cast("double")
                / F.lit(100.0)
                / F.col("n_events")
            ).alias("avg_value"),
            "min_value",
            "max_value",
            (
                (F.col("n_events") == F.col("n_d"))
                & (F.col("sum_cents") == F.col("sum_cents_d"))
            ).alias("cascade_ok"),
        )
        .orderBy("day_us")
    )


@register(
    "ts_seasonal_naive_eval",
    oracle="""
WITH hourly AS (
  SELECT epoch_us(date_trunc('hour', ts)) AS h_us,
         SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS cents
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(h_us) AS lo, MAX(h_us) AS hi FROM hourly),
grid AS (
  SELECT unnest(range(lo, hi + 1, 3600000000)) AS h_us FROM bounds
),
series AS (
  SELECT g.h_us,
         CAST(COALESCE(hourly.cents, 0) AS BIGINT) AS actual_cents
  FROM grid g LEFT JOIN hourly ON g.h_us = hourly.h_us
),
fc AS (
  SELECT h_us, actual_cents,
         LAG(actual_cents, 24) OVER (ORDER BY h_us) AS forecast_cents
  FROM series
)
SELECT COUNT(*) AS n_eval_hours,
       CAST(SUM(ABS(actual_cents - forecast_cents)) AS BIGINT)
         AS sum_abs_err_cents,
       CAST(SUM(ABS(actual_cents - forecast_cents)) AS DOUBLE) / COUNT(*)
         AS mae_cents
FROM fc WHERE forecast_cents IS NOT NULL
""",
    tags=("timeseries", "forecast", "evaluation"),
)
def ts_seasonal_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each hour's revenue
    with the value 24 hours earlier and score MAE — the baseline every
    fancier forecaster must beat, and the cheapest sanity check on a
    metrics pipeline. The series is the zero-filled hourly grid
    (absent hour = 0 revenue — true for an additive metric), built as
    min/max-bounds 1-row agg -> sequence explode -> left join of the
    hourly partial aggregate. The lag-24 window is a single global
    order over the HOUR table, whose size grows with elapsed time, not
    data volume (8,760 rows/year at any SF) — the same bounded-domain
    argument as relational_skyline; the per-hour aggregation beneath
    it is the only data-sized shuffle. Errors stay integer cents; MAE
    is one division of exact ints."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.unix_micros(F.date_trunc("hour", "ts")).alias("h_us")
    ).agg(
        F.sum((dec("value") * 100).cast("long")).alias("cents")
    )
    bounds = hourly.agg(F.min("h_us").alias("lo"), F.max("h_us").alias("hi"))
    grid = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(3600000000).cast("long"))
        ).alias("h_us")
    )
    series = grid.join(hourly, "h_us", "left").select(
        "h_us", F.coalesce(F.col("cents"), F.lit(0)).cast("long").alias("actual_cents")
    )
    w = Window.orderBy("h_us")
    fc = series.select(
        "actual_cents",
        F.lag("actual_cents", 24).over(w).alias("forecast_cents"),
    ).where(F.col("forecast_cents").isNotNull())
    err = F.abs(F.col("actual_cents") - F.col("forecast_cents"))
    return fc.agg(
        F.count(F.lit(1)).alias("n_eval_hours"),
        F.sum(err).cast("long").alias("sum_abs_err_cents"),
        (F.sum(err).cast("double") / F.count(F.lit(1))).alias("mae_cents"),
    )


@register(
    "ts_hourly_autocorr_lag24",
    oracle="""
WITH hourly AS (
  SELECT epoch_us(date_trunc('hour', ts)) AS h_us,
         SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS cents
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(h_us) AS lo, MAX(h_us) AS hi FROM hourly),
grid AS (
  SELECT unnest(range(lo, hi + 1, 3600000000)) AS h_us FROM bounds
),
series AS (
  SELECT g.h_us,
         CAST(COALESCE(hourly.cents, 0) AS BIGINT) AS x
  FROM grid g LEFT JOIN hourly ON g.h_us = hourly.h_us
),
pairs AS (
  SELECT x, LAG(x, 24) OVER (ORDER BY h_us) AS y FROM series
),
st AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * x AS HUGEINT)) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y * y AS HUGEINT)) AS DOUBLE) AS syy,
         CAST(SUM(CAST(x * y AS HUGEINT)) AS DOUBLE) AS sxy
  FROM pairs WHERE y IS NOT NULL
)
SELECT n AS n_pairs,
       (n * sxy - sx * sy)
         / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
         AS autocorr_lag24
FROM st
""",
    tags=("timeseries", "autocorrelation", "seasonality"),
)
def ts_hourly_autocorr_lag24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-24 autocorrelation of hourly revenue — the numeric
    seasonality detector that justifies (or debunks) the seasonal-naive
    baseline next door: r≈1 means yesterday's same hour predicts today,
    r≈0 means the 24h forecast is noise. Same zero-filled hourly grid
    as ts_seasonal_naive_eval; the correlation is the
    exact-wide-integer sufficient-stats recipe (agg_corr_matrix /
    assortativity) over (x_t, x_t−24) pairs, so the only float ops are
    the final closed expression, identical in both engines. The lag
    window orders the HOUR table (time-bounded, not data-bounded);
    everything below it partial-aggregates."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.unix_micros(F.date_trunc("hour", "ts")).alias("h_us")
    ).agg(F.sum((dec("value") * 100).cast("long")).alias("cents"))
    bounds = hourly.agg(F.min("h_us").alias("lo"), F.max("h_us").alias("hi"))
    grid = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(3600000000).cast("long"))
        ).alias("h_us")
    )
    series = grid.join(hourly, "h_us", "left").select(
        "h_us", F.coalesce(F.col("cents"), F.lit(0)).cast("long").alias("x")
    )
    w = Window.orderBy("h_us")
    pairs = series.select(
        "x", F.lag("x", 24).over(w).alias("y")
    ).where(F.col("y").isNotNull())
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    st = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d38(F.col("x"))).cast("double").alias("sx"),
        F.sum(d38(F.col("y"))).cast("double").alias("sy"),
        F.sum(d38(F.col("x") * F.col("x"))).cast("double").alias("sxx"),
        F.sum(d38(F.col("y") * F.col("y"))).cast("double").alias("syy"),
        F.sum(d38(F.col("x") * F.col("y"))).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return st.select(
        n.alias("n_pairs"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("autocorr_lag24"),
    )


@register(
    "ts_weekday_hour_profile",
    oracle="""
SELECT CAST(((epoch_us(ts) // 86400000000) + 4) % 7 AS BIGINT) AS dow_idx,
       CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour_utc,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM events
WHERE event_type = 'purchase'
GROUP BY 1, 2
ORDER BY dow_idx, hour_utc
""",
    tags=("timeseries", "seasonality", "profile"),
)
def ts_weekday_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday × hour revenue heat-map — the seasonality PROFILE
    completing the trio with the lag-24 autocorrelation (is there
    seasonality?) and the seasonal-naive backtest (is it exploitable?).
    Weekday comes from pure epoch-µs integer arithmetic
    ((days since 1970-01-01 + 4) mod 7, anchored on epoch's Thursday)
    instead of calendar dayofweek(), whose 0-vs-1-based and
    Sunday-vs-Monday conventions differ across engines — the classic
    cross-engine drift trap removed at the source. One partial-
    aggregated scan; output is a fixed 7×24 grid regardless of
    corpus size."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    return (
        ev.groupBy(
            F.expr("((unix_micros(ts) div 86400000000) + 4) % 7")
            .cast("long")
            .alias("dow_idx"),
            F.expr("(unix_micros(ts) div 3600000000) % 24")
            .cast("long")
            .alias("hour_utc"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((dec("value") * 100).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
        .orderBy("dow_idx", "hour_utc")
    )


@register(
    "ts_median_interorder_gap",
    oracle="""
WITH seq AS (
  SELECT o_custkey,
         epoch_us(o_orderdate) // 86400000000 AS day_idx,
         LAG(epoch_us(o_orderdate) // 86400000000)
           OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS prev_day
  FROM orders
),
gaps AS (
  SELECT o_custkey, day_idx - prev_day AS gap_days
  FROM seq WHERE prev_day IS NOT NULL
)
SELECT c_mktsegment,
       COUNT(*) AS n_gaps,
       CAST(quantile_disc(gap_days, 0.50) AS BIGINT) AS p50_gap_days,
       CAST(quantile_disc(gap_days, 0.90) AS BIGINT) AS p90_gap_days
FROM gaps JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    tags=("timeseries", "retention", "percentile"),
)
def ts_median_interorder_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median (and p90) days between consecutive orders per market
    segment — the repurchase-cadence number behind replenishment
    campaigns and churn thresholds ("a customer 2× past their
    segment's p90 gap is churning"). Gaps come from one lag over the
    customer-keyed exchange in integer epoch-days (`div`, no calendar
    arithmetic); the per-segment percentiles are discrete picks of
    actual gaps (percentile_disc / quantile_disc — no interpolation,
    so integers hash-match). Customer broadcasts; the gap table is
    order-count-sized."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # o_orderdate is TIMESTAMP_NTZ in the fixtures; the UTC-pinned
    # session makes the NTZ->LTZ cast an identity on instants.
    day = F.expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
    seq = orders.select(
        "o_custkey",
        day.alias("day_idx"),
        F.lag(day).over(w).alias("prev_day"),
    )
    gaps = seq.where(F.col("prev_day").isNotNull()).select(
        "o_custkey", (F.col("day_idx") - F.col("prev_day")).alias("gap_days")
    )
    return (
        gaps.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY gap_days)")
            .cast("long")
            .alias("p50_gap_days"),
            F.expr("percentile_disc(0.90) WITHIN GROUP (ORDER BY gap_days)")
            .cast("long")
            .alias("p90_gap_days"),
        )
        .orderBy("c_mktsegment")
    )


_SLA_GAP_US = 2 * 3_600 * 1_000_000  # heartbeat gap > 2h = an outage


@register(
    "ts_sla_downtime",
    oracle=f"""
WITH hb AS (
  SELECT event_type, epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (
           PARTITION BY event_type
           ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
),
g AS (
  SELECT event_type, us, us - prev_us AS gap_us FROM hb
)
SELECT event_type,
       COUNT(*) + 1 AS n_events,
       CAST(SUM(CASE WHEN gap_us > {_SLA_GAP_US} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outages,
       CAST(SUM(CASE WHEN gap_us > {_SLA_GAP_US}
                     THEN gap_us - {_SLA_GAP_US} ELSE 0 END)
            AS BIGINT) AS downtime_us,
       MAX(gap_us) AS max_gap_us,
       MAX(us) - MIN(us - gap_us) AS span_us,
       CAST(MAX(us) - MIN(us - gap_us)
            - SUM(CASE WHEN gap_us > {_SLA_GAP_US}
                       THEN gap_us - {_SLA_GAP_US} ELSE 0 END) AS DOUBLE)
         / CAST(MAX(us) - MIN(us - gap_us) AS DOUBLE) AS uptime_ratio
FROM g WHERE gap_us IS NOT NULL
GROUP BY event_type
ORDER BY event_type
""",
    tags=("timeseries", "sla", "gaps", "observability"),
)
def ts_sla_downtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heartbeat-gap SLA report — the observability workload over an
    event stream: treat each event_type's events as service heartbeats;
    any inter-event gap beyond the threshold is an outage whose
    downtime is the excess over the threshold (the service is presumed
    up for one threshold after its last heartbeat). Per type: event
    count, outage count, total downtime, worst gap, observed span, and
    the uptime ratio.

    Plan: ONE exchange on event_type for the lag window, then a
    map-combined aggregation on the same key — no second shuffle
    (sort-within-partition serves both). All durations are exact int64
    microseconds; the final uptime ratio is a single division of two
    exact integers, the same IEEE operation in both engines. Span is
    recovered inside the gap aggregation as MAX(us) - MIN(us - gap_us)
    (= first event's timestamp), so no second pass over the raw events
    is needed."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("us").asc(), F.col("event_id").asc()
    )
    hb = ev.select(
        "event_type", F.unix_micros("ts").alias("us"), "event_id"
    ).withColumn("prev_us", F.lag("us").over(w))
    g = hb.where(F.col("prev_us").isNotNull()).select(
        "event_type", "us", (F.col("us") - F.col("prev_us")).alias("gap_us")
    )
    outage = F.col("gap_us") > _SLA_GAP_US
    excess = F.when(outage, F.col("gap_us") - _SLA_GAP_US).otherwise(F.lit(0))
    span = F.max("us") - F.min(F.col("us") - F.col("gap_us"))
    return (
        g.groupBy("event_type")
        .agg(
            (F.count(F.lit(1)) + 1).alias("n_events"),
            F.sum(F.when(outage, 1).otherwise(0)).cast("long").alias(
                "n_outages"
            ),
            F.sum(excess).cast("long").alias("downtime_us"),
            F.max("gap_us").alias("max_gap_us"),
            span.alias("span_us"),
            (
                (span - F.sum(excess)).cast("double")
                / span.cast("double")
            ).alias("uptime_ratio"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_downsample_minmax",
    oracle="""
WITH e AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         epoch_us(ts) AS us, event_id,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM events
),
k AS (
  SELECT day, us, cents,
         lpad(CAST(cents + 1000000000000 AS VARCHAR), 13, '0')
           || lpad(CAST(us AS VARCHAR), 20, '0')
           || lpad(CAST(event_id AS VARCHAR), 12, '0') AS key
  FROM e
)
SELECT day, COUNT(*) AS n_points,
       MIN(cents) AS v_min_cents, MAX(cents) AS v_max_cents,
       arg_min(us, key) AS ts_min_us,
       arg_max(us, key) AS ts_max_us
FROM k GROUP BY day ORDER BY day
""",
    tags=("timeseries", "downsample", "minmax"),
)
def ts_downsample_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max downsampling — the standard lossy reduction behind every
    time-series dashboard (keep each bucket's extreme points so the
    rendered envelope is exact; Grafana/M3/Influx all ship this
    shape): per day-bucket, the min and max values plus the timestamps
    of the points that attain them. Tie-break is deterministic via the
    zero-padded (cents, µs, event_id) string key — cents is
    offset-encoded (+10^12, covering the full DECIMAL(12,2) cents
    domain) so even NEGATIVE values lpad to a digit string whose
    lexicographic order equals numeric order (ADVICE r6: a bare '-'
    prefix would invert the ordering), so both engines pick the
    identical point. ONE map-side-combined aggregation on the bucket key; state
    per bucket is four scalars + two pick keys — the same plan serves
    a 100 TB metrics table at any bucket granularity."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        F.unix_micros("ts").alias("us"),
        "event_id",
        (dec("value") * 100).cast("long").alias("cents"),
    )
    key = F.concat(
        F.lpad((F.col("cents") + F.lit(1000000000000)).cast("string"), 13, "0"),
        F.lpad(F.col("us").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        e.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("cents").alias("v_min_cents"),
            F.max("cents").alias("v_max_cents"),
            F.min_by("us", key).alias("ts_min_us"),
            F.max_by("us", key).alias("ts_max_us"),
        )
        .orderBy("day")
    )


@register(
    "ts_holt_linear_smoothing",
    oracle="""
WITH RECURSIVE
daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS STRING) AS DOUBLE)
           AS y
  FROM events WHERE user_id < 8
  GROUP BY 1, 2
),
seq AS (
  SELECT user_id, day, y,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY day) AS BIGINT) AS idx
  FROM daily
),
hw AS (
  SELECT user_id, day, idx, y,
         y AS l, CAST(0.0 AS DOUBLE) AS b
  FROM seq WHERE idx = 1
  UNION ALL
  SELECT s.user_id, s.day, s.idx, s.y,
         0.5 * s.y + 0.5 * (hw.l + hw.b),
         0.5 * ((0.5 * s.y + 0.5 * (hw.l + hw.b)) - hw.l) + 0.5 * hw.b
  FROM hw JOIN seq s
    ON s.user_id = hw.user_id AND s.idx = hw.idx + 1
)
SELECT user_id, CAST(day AS VARCHAR) AS day, idx, y,
       CAST(l AS FLOAT) AS level,
       CAST(b AS FLOAT) AS trend,
       CAST(l + b AS FLOAT) AS forecast_next
FROM hw
ORDER BY user_id, idx
""",
    tags=("timeseries", "smoothing", "holt", "stateful"),
)
def ts_holt_linear_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) over each
    user's daily series — the classic short-horizon forecaster, and
    the engine's demonstrator for SEQUENTIAL per-key recurrences that
    no window frame can express (each state depends on the previous
    OUTPUT, not the previous input). The Spark side is the canonical
    shape for this class: pre-aggregate to (key, step) on the JVM,
    then ONE `applyInPandas` pass per key runs the O(steps) scan —
    Arrow-batched, state never leaves the executor, no driver loop.
    The oracle is the same recurrence as a recursive CTE, which makes
    this operator oracle-EXACT where most stateful ops settle for
    rows-only. Bit-reproducibility: α=β=0.5 are exact binary
    fractions, the daily input is an exact-decimal sum parsed to
    double through the string hop, and both engines evaluate the
    identically-associated multiply-adds — IEEE doubles agree
    bit-for-bit, float-cast on output per house rule.

    Scale: the daily pre-aggregation is one shuffle on (user, day);
    the recurrence shuffles once on user and each series scans
    linearly inside its Arrow batch. Series length is bounded by the
    calendar (days, not events), so a 100 TB event log still hands
    each key a few-thousand-row pandas frame; key-count parallelism
    is the whole win. Delegates to the public ``holt_smooth`` API
    (pipeline.py) with α=β=0.5."""
    from boltzmannclean_spark.pipeline import holt_smooth

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 8)
    daily = ev.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.sum(dec("value")).cast("string").cast("double").alias("y"))
    out = holt_smooth(
        daily, key_col="user_id", step_col="day", y_col="y", alpha=0.5, beta=0.5
    )
    # holt_smooth keeps `day` a DATE (r8 advice: the API must order by —
    # and return — the caller's step type); the registered surface
    # stringifies it per the repo's atomic-date output convention.
    return out.withColumn("day", F.col("day").cast("string"))


@register(
    "ts_mann_kendall_trend",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(12,2))) AS y
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         CAST(SIGN(b.y - a.y) AS BIGINT) AS sg
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
),
s AS (
  SELECT event_type, CAST(SUM(sg) AS BIGINT) AS s_stat
  FROM pairs GROUP BY event_type
),
n AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily
  GROUP BY event_type
),
ties AS (
  SELECT event_type,
         CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
           AS tie_term
  FROM (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t
    FROM daily GROUP BY event_type, y
  ) g WHERE t > 1
  GROUP BY event_type
)
SELECT n.event_type, n.n_days, s.s_stat,
       n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
         - COALESCE(ties.tie_term, 0) AS var_s_x18,
       CASE WHEN s.s_stat > 0 THEN 'increasing'
            WHEN s.s_stat < 0 THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM n JOIN s USING (event_type)
LEFT JOIN ties USING (event_type)
ORDER BY event_type
""",
    tags=("timeseries", "statistics", "trend", "mann-kendall"),
)
def ts_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per event arm — the standard
    nonparametric monotonic-trend detector for irregular time series
    (no distribution or spacing assumption): S = sum over ordered day
    pairs of sign(y_j - y_i), with the tie-corrected variance
    var(S) = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18 reported in
    exact x18 integer units so both engines hash bit-identically (the
    caller divides and sqrt()s at display time). Daily values are
    EXACT decimal sums, so sign() never sees float noise.

    Scale: the day pre-aggregation is one shuffle on (arm, day) and
    bounds everything after it by the CALENDAR, not the event volume —
    the O(days^2) pair join runs per arm on a few-hundred-row side
    (10 years = 3.6k days = 6.6M sign evaluations per arm, map-side
    after one equi-join shuffle on the arm key). At 100 TB the pairs
    never touch the event table; hot arms are the AQE skew case."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.sum(dec("value")).alias("y"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") < F.col("b.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.signum(F.col("b.y") - F.col("a.y")).cast("long").alias("sg"),
    )
    s = pairs.groupBy("event_type").agg(
        F.sum("sg").cast("long").alias("s_stat")
    )
    n = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    ties = (
        daily.groupBy("event_type", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .where(F.col("t") > 1)
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    return (
        n.join(s, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            (
                F.col("n_days")
                * (F.col("n_days") - 1)
                * (2 * F.col("n_days") + 5)
                - F.coalesce(F.col("tie_term"), F.lit(0))
            ).alias("var_s_x18"),
            F.when(F.col("s_stat") > 0, "increasing")
            .when(F.col("s_stat") < 0, "decreasing")
            .otherwise("no_trend")
            .alias("trend"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_seasonal_decompose_additive",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS yc
  FROM events GROUP BY 1, 2
),
ma AS (
  SELECT event_type, day, yc,
         CAST(SUM(yc) OVER w AS BIGINT) AS trend_x7c,
         COUNT(*) OVER w AS n_win
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detr AS (
  SELECT event_type, isodow(day) - 1 AS weekday,
         7 * yc - trend_x7c AS d_x7c
  FROM ma WHERE n_win = 7
)
SELECT event_type, CAST(weekday AS INT) AS weekday,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(d_x7c) AS BIGINT) AS sum_detr_x7c,
       CAST(SUM(d_x7c) AS DOUBLE) / (7.0 * COUNT(*)) / 100.0
         AS seasonal_mean
FROM detr
GROUP BY event_type, weekday
ORDER BY event_type, weekday
""",
    tags=("timeseries", "seasonal", "decompose", "trend"),
)
def ts_seasonal_decompose_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition (STL-lite) per event arm: a
    centered 7-row moving average estimates the trend, the detrended
    residual y - trend is averaged per ISO weekday — the classical
    decomposition behind weekly-seasonality dashboards. All state is
    EXACT integer x7-cents (trend = the 7-row cent sum, detrended =
    7*y_cents - trend_sum), so window merge order can't perturb a
    bit; the per-weekday mean is emitted both as the exact integer
    numerator (sum_detr_x7c, n_days) and as one display double — a
    single IEEE division of identical exact operands in both engines.
    Edge days without a full 7-row window are excluded (n_win = 7),
    matching the NaN head/tail of a textbook centered MA.

    Scale: the daily pre-agg is one shuffle on (arm, day) and bounds
    the series by the CALENDAR; the centered window runs inside each
    arm's partition; the weekday agg is map-combined over at most
    7 x arms groups. The rows-based window assumes a gap-free daily
    grid (compose with ts_gapfill for sparse arms)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg((F.sum(dec("value")) * 100).cast("long").alias("yc"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    ma = daily.select(
        "event_type",
        "day",
        "yc",
        F.sum("yc").over(w).cast("long").alias("trend_x7c"),
        F.count(F.lit(1)).over(w).alias("n_win"),
    )
    detr = ma.where(F.col("n_win") == 7).select(
        "event_type",
        F.weekday("day").cast("int").alias("weekday"),
        (7 * F.col("yc") - F.col("trend_x7c")).alias("d_x7c"),
    )
    return (
        detr.groupBy("event_type", "weekday")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("d_x7c").cast("long").alias("sum_detr_x7c"),
        )
        .select(
            "event_type",
            "weekday",
            "n_days",
            "sum_detr_x7c",
            (
                F.col("sum_detr_x7c").cast("double")
                / (F.lit(7.0) * F.col("n_days"))
                / F.lit(100.0)
            ).alias("seasonal_mean"),
        )
        .orderBy("event_type", "weekday")
    )


@register(
    "ts_theil_sen_slope",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         (b.y - a.y) / (b.day - a.day) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
),
ranked AS (
  SELECT event_type, slope,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope)
           AS rn,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
           AS n_pairs
  FROM pairs
),
mid AS (
  SELECT event_type, n_pairs, slope
  FROM ranked
  WHERE rn BETWEEN (n_pairs + 1) // 2 AND (n_pairs + 2) // 2
),
n AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily
  GROUP BY event_type
)
SELECT mid.event_type AS event_type, n.n_days, mid.n_pairs,
       SUM(mid.slope) / COUNT(*) AS sen_slope_cents_per_day
FROM mid JOIN n ON mid.event_type = n.event_type
GROUP BY mid.event_type, n.n_days, mid.n_pairs
ORDER BY mid.event_type
""",
    tags=("timeseries", "statistics", "trend", "theil-sen", "robust"),
)
def ts_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen slope estimate per event arm — the robust trend
    MAGNITUDE that pairs with ts_mann_kendall_trend's direction test
    (the textbook combination: MK says whether, Sen says how much,
    both immune to outliers that wreck least squares). Every pairwise
    slope is ONE correctly-rounded IEEE division of exact integers
    (bigint cent difference over integer day difference), so the
    slope multiset is bit-identical in both engines; the median is
    selected by row position (rn in the middle 1-2 positions), and
    the even-count average is a 2-term sum — IEEE addition is
    commutative, so even that is order-free.

    Scale: the (arm, day) pre-aggregation bounds the O(days^2) pair
    join by the CALENDAR exactly as in ts_mann_kendall_trend; the
    median selection uses per-arm windows over the pair table (10
    years = 6.6M pairs per arm at worst — window state, never a
    global sort), and production swaps the full pairwise median for
    the repeated-median or a sampled estimator above ~10^4 days."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg((F.sum(dec("value")) * 100).cast("long").alias("y"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") < F.col("b.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.y") - F.col("a.y"))
            / F.datediff(F.col("b.day"), F.col("a.day"))
        ).alias("slope"),
    )
    warm = Window.partitionBy("event_type")
    wrn = Window.partitionBy("event_type").orderBy("slope")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(wrn).alias("rn"),
        F.count(F.lit(1)).over(warm).cast("long").alias("n_pairs"),
    )
    mid = ranked.where(
        (F.col("rn") >= F.expr("(n_pairs + 1) div 2"))
        & (F.col("rn") <= F.expr("(n_pairs + 2) div 2"))
    )
    n = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    return (
        mid.groupBy("event_type", "n_pairs")
        .agg(
            (F.sum("slope") / F.count(F.lit(1))).alias(
                "sen_slope_cents_per_day"
            )
        )
        .join(n, "event_type")
        .select(
            "event_type",
            "n_days",
            "n_pairs",
            "sen_slope_cents_per_day",
        )
        .orderBy("event_type")
    )


@register(
    "ts_changepoint_cusum",
    oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT event_type, day,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS k,
         CAST(SUM(v) OVER w AS BIGINT) AS s_k
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s_n
  FROM daily GROUP BY event_type
),
g AS (
  SELECT c.event_type, c.day, tot.n,
         CAST(ABS(tot.n * c.s_k - c.k * tot.s_n) AS BIGINT) AS g_k
  FROM cum c JOIN tot ON c.event_type = tot.event_type
  WHERE c.k < tot.n
),
best AS (
  SELECT event_type, day, n, g_k,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY g_k DESC, day) AS rn
  FROM g
)
SELECT event_type, n AS n_days, day AS split_day, g_k AS cusum_num,
       g_k / n AS cusum_stat_cents
FROM best WHERE rn = 1
ORDER BY event_type
""",
    tags=("timeseries", "changepoint", "cusum", "monitoring"),
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint location per event arm via the CUSUM
    statistic — the mean-shift detector a pipeline-health monitor runs
    over its daily volume series (events_cusum_alarm answers "is it
    drifting NOW" with a streaming alarm; this answers "WHERE did the
    level shift" retrospectively). The split point is
    argmax_k |S_k - (k/n)·S_n|, kept EXACT as the integer numerator
    g_k = |n·S_k - k·S_n| over daily cent totals: the argmax is decided
    entirely in bigints (ties pinned to the earliest day), and the
    display statistic is ONE correctly-rounded IEEE division g_k / n —
    bit-equal in both engines. k ranges over proper splits (k < n).

    Width: g_k ≤ n_days · total_cents; at 365 buckets that leaves
    ~2.5e4 headroom of total corpus value inside int64 vs this
    fixture's 6e10-cent ×10 replica — the bucketed series is
    DOMAIN-sized (days × arms), so width grows with data VALUE, not
    row count.

    Scale: one map-combined groupBy compresses the event stream to the
    (arm, day) domain; one prefix-sum window and one ranking window
    over that domain-sized table, partitioned by arm — nothing
    row-scale ever shuffles twice, no single-partition window."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            (dec("value") * 100).cast("long").alias("x"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("x").cast("long").alias("v"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = daily.select(
        "event_type",
        "day",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .cast("long")
        .alias("k"),
        F.sum("v").over(w).cast("long").alias("s_k"),
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s_n"),
    )
    g = (
        cum.join(F.broadcast(tot), "event_type")
        .where(F.col("k") < F.col("n"))
        .select(
            "event_type",
            "day",
            "n",
            F.abs(F.col("n") * F.col("s_k") - F.col("k") * F.col("s_n"))
            .cast("long")
            .alias("g_k"),
        )
    )
    best = g.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.desc("g_k"), "day")
        ),
    ).where(F.col("rn") == 1)
    return best.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("day").alias("split_day"),
        F.col("g_k").alias("cusum_num"),
        (F.col("g_k") / F.col("n")).alias("cusum_stat_cents"),
    ).orderBy("event_type")


@register(
    "ts_lag_feature_matrix",
    oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
feat AS (
  SELECT event_type, day, y,
         LAG(y, 1) OVER w AS lag_1,
         LAG(y, 7) OVER w AS lag_7,
         CAST(SUM(y) OVER (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT)
           AS roll_sum_7,
         CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS n_win
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
)
SELECT event_type, day, y, lag_1, lag_7, roll_sum_7,
       roll_sum_7 / 7 AS roll_mean_7
FROM feat WHERE n_win = 7
ORDER BY event_type, day
""",
    tags=("timeseries", "features", "supervised", "forecasting"),
)
def ts_lag_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised feature matrix for per-arm demand forecasting — the
    lag/rolling design matrix (target y, lag-1, lag-7, trailing-7-day
    sum and mean) every gradient-boosted or linear forecaster trains
    on. Warm-up rows (fewer than 7 trailing days) are dropped so every
    emitted row has a complete feature vector — no NULL features ever
    reach the trainer. All features are exact integer cents; the
    trailing mean is ONE correctly-rounded IEEE division of exact
    integers by the constant window width.

    Scale: one map-combined groupBy compresses the event stream to the
    (arm, day) domain; all four features come from ONE window pass
    over that domain-sized table partitioned by arm (Spark evaluates
    same-partition same-order window functions in a single sort+scan);
    nothing row-scale shuffles twice."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            (dec("value") * 100).cast("long").alias("x"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("x").cast("long").alias("y"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    trail = w.rowsBetween(-7, -1)
    feat = daily.select(
        "event_type",
        "day",
        "y",
        F.lag("y", 1).over(w).alias("lag_1"),
        F.lag("y", 7).over(w).alias("lag_7"),
        F.sum("y").over(trail).cast("long").alias("roll_sum_7"),
        F.count(F.lit(1)).over(trail).cast("long").alias("n_win"),
    )
    return (
        feat.where(F.col("n_win") == 7)
        .select(
            "event_type",
            "day",
            "y",
            "lag_1",
            "lag_7",
            "roll_sum_7",
            (F.col("roll_sum_7") / F.lit(7)).alias("roll_mean_7"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "ts_seasonal_residual_anomaly",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(dayofweek(ts) AS BIGINT) AS dow,
         CAST(hour(ts) AS BIGINT) AS hod,
         CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS v
  FROM events GROUP BY 1, 2, 3, 4
),
per_vg AS (
  SELECT event_type, dow, hod, v, CAST(COUNT(*) AS BIGINT) AS t
  FROM hourly GROUP BY 1, 2, 3, 4
),
cum AS (
  SELECT event_type, dow, hod, v, t,
         CAST(COALESCE(SUM(t) OVER (PARTITION BY event_type, dow, hod
              ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0) AS BIGINT) AS below
  FROM per_vg
),
n AS (
  SELECT event_type, dow, hod, CAST(SUM(t) AS BIGINT) AS n_g
  FROM per_vg GROUP BY 1, 2, 3
),
season AS (
  SELECT c.event_type, c.dow, c.hod,
         CAST(SUM(CASE WHEN c.below < (n.n_g + 1) // 2
                        AND (n.n_g + 1) // 2 <= c.below + c.t
                       THEN c.v ELSE 0 END)
            + SUM(CASE WHEN c.below < (n.n_g + 2) // 2
                        AND (n.n_g + 2) // 2 <= c.below + c.t
                       THEN c.v ELSE 0 END) AS BIGINT) AS med2
  FROM cum c JOIN n ON n.event_type = c.event_type
   AND n.dow = c.dow AND n.hod = c.hod
  GROUP BY 1, 2, 3
),
resid AS (
  SELECT h.event_type, h.h,
         CAST(2 * h.v - s.med2 AS BIGINT) AS r
  FROM hourly h JOIN season s ON s.event_type = h.event_type
   AND s.dow = h.dow AND s.hod = h.hod
),
ar AS (
  SELECT event_type, ABS(r) AS av, CAST(COUNT(*) AS BIGINT) AS t
  FROM resid GROUP BY 1, 2
),
acum AS (
  SELECT event_type, av, t,
         CAST(COALESCE(SUM(t) OVER (PARTITION BY event_type ORDER BY av
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS below
  FROM ar
),
an AS (SELECT event_type, CAST(SUM(t) AS BIGINT) AS n_g FROM ar GROUP BY 1),
mad AS (
  SELECT a.event_type,
         CAST(SUM(CASE WHEN a.below < (an.n_g + 1) // 2
                        AND (an.n_g + 1) // 2 <= a.below + a.t
                       THEN a.av ELSE 0 END)
            + SUM(CASE WHEN a.below < (an.n_g + 2) // 2
                        AND (an.n_g + 2) // 2 <= a.below + a.t
                       THEN a.av ELSE 0 END) AS BIGINT) AS mad2
  FROM acum a JOIN an ON an.event_type = a.event_type
  GROUP BY a.event_type
),
flagged AS (
  SELECT r.event_type, r.h, r.r, m.mad2,
         CASE WHEN 2 * ABS(r.r) > 3 * m.mad2 THEN 1 ELSE 0 END AS is_anom,
         ROW_NUMBER() OVER (PARTITION BY r.event_type
                            ORDER BY ABS(r.r) DESC, r.h) AS rk
  FROM resid r JOIN mad m ON m.event_type = r.event_type
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(is_anom) AS BIGINT) AS n_anomalies,
       CAST(MAX(mad2) AS BIGINT) AS mad2_halfcents,
       MAX(CASE WHEN rk = 1 THEN h END) AS worst_hour,
       CAST(MAX(CASE WHEN rk = 1 THEN r END) AS BIGINT)
         AS worst_resid2_halfcents
FROM flagged GROUP BY event_type
ORDER BY event_type
""",
    tags=("timeseries", "anomaly", "seasonal", "residual", "mad"),
)
def ts_seasonal_residual_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection on the DESEASONALIZED hourly series — the
    monitoring tier above raw-value outlier ops (events_anomaly_iqr /
    zscore / mad flag absolute extremes; this flags hours that are
    extreme FOR THEIR (weekday, hour-of-day) SLOT, which is what pages
    an on-call for a quiet-Tuesday-3am spike that a global threshold
    never sees). Seasonal level = exact per-(arm, dow, hod) 2×median
    in half-cents (the stats_brown_forsythe domain-compressed median
    machinery over a finer key); residual r = 2v − med2 stays exact;
    the robust scale is the per-arm 2×median of |r| and the flag rule
    2·|r| > 3·mad2 is a pure integer comparison — zero floats anywhere
    in the decision. Emits per arm: hours, anomaly count, the robust
    scale, and the worst hour (ties pinned to the earliest).

    Scale: every median lives on a (key, value) DOMAIN — the seasonal
    grid is arms × 168 slots, the residual domain is value-bounded —
    prefix-sum windows are partitioned by those keys (no global
    window); the hourly compression groupBy is the only row-scale
    shuffle."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("h"),
            F.dayofweek("ts").cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hod"),
            (dec("value") * 100).cast("long").alias("x"),
        )
        .groupBy("event_type", "h", "dow", "hod")
        .agg(F.sum("x").cast("long").alias("v"))
    )
    per_vg = hourly.groupBy("event_type", "dow", "hod", "v").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    wkey = ["event_type", "dow", "hod"]
    wb = (
        Window.partitionBy(*wkey)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per_vg.select(
        *wkey,
        "v",
        "t",
        F.coalesce(F.sum("t").over(wb), F.lit(0)).cast("long").alias("below"),
    )
    n = per_vg.groupBy(*wkey).agg(F.sum("t").cast("long").alias("n_g"))
    lo = F.expr("(n_g + 1) div 2")
    hi = F.expr("(n_g + 2) div 2")
    pick = lambda pos: F.sum(  # noqa: E731
        F.when(
            (F.col("below") < pos) & (pos <= F.col("below") + F.col("t")),
            F.col("v"),
        ).otherwise(0)
    )
    season = (
        cum.join(n, wkey)
        .groupBy(*wkey)
        .agg((pick(lo) + pick(hi)).cast("long").alias("med2"))
    )
    resid = hourly.join(season, wkey).select(
        "event_type",
        "h",
        (2 * F.col("v") - F.col("med2")).cast("long").alias("r"),
    )
    ar = resid.groupBy("event_type", F.abs("r").alias("av")).agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    ab = (
        Window.partitionBy("event_type")
        .orderBy("av")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    acum = ar.select(
        "event_type",
        "av",
        "t",
        F.coalesce(F.sum("t").over(ab), F.lit(0)).cast("long").alias("below"),
    )
    an = ar.groupBy("event_type").agg(F.sum("t").cast("long").alias("n_g"))
    picka = lambda pos: F.sum(  # noqa: E731
        F.when(
            (F.col("below") < pos) & (pos <= F.col("below") + F.col("t")),
            F.col("av"),
        ).otherwise(0)
    )
    mad = (
        acum.join(F.broadcast(an), "event_type")
        .groupBy("event_type")
        .agg((picka(lo) + picka(hi)).cast("long").alias("mad2"))
    )
    flagged = resid.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "h",
        "r",
        "mad2",
        F.when(2 * F.abs("r") > 3 * F.col("mad2"), 1).otherwise(0).alias(
            "is_anom"
        ),
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy(F.abs("r").desc(), "h")
        )
        .alias("rk"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.sum("is_anom").cast("long").alias("n_anomalies"),
            F.max("mad2").cast("long").alias("mad2_halfcents"),
            F.max(F.when(F.col("rk") == 1, F.col("h"))).alias("worst_hour"),
            F.max(F.when(F.col("rk") == 1, F.col("r")))
            .cast("long")
            .alias("worst_resid2_halfcents"),
        )
        .orderBy("event_type")
    )


_XCORR_LAGS = tuple(range(-3, 4))  # hours
_HOUR_US = 3_600_000_000


@register(
    "ts_lagged_cross_correlation",
    oracle=f"""
WITH hourly AS (
  SELECT epoch_us(date_trunc('hour', ts)) AS h_us,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS b
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(h_us) AS lo, MAX(h_us) AS hi FROM hourly),
grid AS (
  SELECT unnest(range(lo, hi + 1, {_HOUR_US})) AS h_us FROM bounds
),
series AS (
  SELECT g.h_us,
         CAST(COALESCE(hourly.a, 0) AS BIGINT) AS a,
         CAST(COALESCE(hourly.b, 0) AS BIGINT) AS b
  FROM grid g LEFT JOIN hourly ON g.h_us = hourly.h_us
),
lags AS (
  SELECT unnest(ARRAY[{", ".join(str(x) for x in _XCORR_LAGS)}])
    AS lag_hours
),
pairs AS (
  SELECT l.lag_hours, s1.a AS x, s2.b AS y
  FROM lags l
  JOIN series s1 ON TRUE
  JOIN series s2 ON s2.h_us = s1.h_us + l.lag_hours * {_HOUR_US}
),
st AS (
  SELECT lag_hours, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(CAST(SUM(CAST(x AS HUGEINT)) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(y AS HUGEINT)) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(x AS HUGEINT) * x) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(y AS HUGEINT) * y) AS VARCHAR) AS DOUBLE) AS syy,
         CAST(CAST(SUM(CAST(x AS HUGEINT) * y) AS VARCHAR) AS DOUBLE) AS sxy
  FROM pairs GROUP BY lag_hours
)
SELECT lag_hours, n_pairs,
       (n_pairs * sxy - sx * sy)
         / (SQRT(n_pairs * sxx - sx * sx) * SQRT(n_pairs * syy - sy * sy))
         AS xcorr
FROM st
ORDER BY lag_hours
""",
    tags=("timeseries", "cross-correlation", "lead-lag", "causality"),
)
def ts_lagged_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between the hourly click and
    purchase volumes at lags −3..+3 h — the "which metric moves
    first" scan behind leading-indicator discovery and alerting
    root-cause triage (a peak at lag +2 reads "clicks lead purchases
    by 2 hours"). Both series live on the SAME zero-filled hour grid
    (the ts_hourly_autocorr discipline — missing hours are real
    zeros, not dropped rows); per-lag sufficient statistics are exact
    integer counts/products in HUGEINT/DECIMAL(38,0), string-hopped
    once, so each lag's Pearson is a single IEEE tree over
    bit-identical operands — bit-equal across engines with no float
    aggregation.

    Scale: one map-combined groupBy compresses the stream to the hour
    domain; the 7 lags are a 7-row broadcast against the hour-domain
    self-join (each lag pairs the grid with its shifted self — an
    equi-join on h_us, domain-sized). At 100 TB the event scan
    dominates; everything downstream is hours×7."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("h_us")
        )
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            )
            .cast("long")
            .alias("a"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("long")
            .alias("b"),
        )
    )
    bounds = hourly.agg(
        F.min("h_us").alias("lo"), F.max("h_us").alias("hi")
    )
    grid = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(_HOUR_US))
        ).alias("h_us")
    )
    series = (
        grid.join(hourly, "h_us", "left")
        .select(
            "h_us",
            F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("a"),
            F.coalesce(F.col("b"), F.lit(0)).cast("long").alias("b"),
        )
    )
    lags = spark.createDataFrame(
        [(x,) for x in _XCORR_LAGS], "lag_hours int"
    )
    s2 = series.select(
        F.col("h_us").alias("h2_us"), F.col("b").alias("y")
    )
    pairs = (
        series.crossJoin(F.broadcast(lags))
        .withColumn(
            "h2_us", F.col("h_us") + F.col("lag_hours") * F.lit(_HOUR_US)
        )
        .join(s2, "h2_us")
        .select("lag_hours", F.col("a").alias("x"), "y")
    )
    st = pairs.groupBy("lag_hours").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr(
            "CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))) AS STRING) AS DOUBLE)"
        ).alias("sx"),
        F.expr(
            "CAST(CAST(SUM(CAST(y AS DECIMAL(38,0))) AS STRING) AS DOUBLE)"
        ).alias("sy"),
        F.expr(
            "CAST(CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS STRING)"
            " AS DOUBLE)"
        ).alias("sxx"),
        F.expr(
            "CAST(CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS STRING)"
            " AS DOUBLE)"
        ).alias("syy"),
        F.expr(
            "CAST(CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS STRING)"
            " AS DOUBLE)"
        ).alias("sxy"),
    )
    return st.select(
        "lag_hours",
        "n_pairs",
        (
            (F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(
                    F.col("n_pairs") * F.col("sxx")
                    - F.col("sx") * F.col("sx")
                )
                * F.sqrt(
                    F.col("n_pairs") * F.col("syy")
                    - F.col("sy") * F.col("sy")
                )
            )
        ).alias("xcorr"),
    ).orderBy("lag_hours")


@register(
    "ts_seasonal_strength",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS yc
  FROM events GROUP BY 1, 2
),
ma AS (
  SELECT event_type, day, yc,
         CAST(SUM(yc) OVER w AS BIGINT) AS trend_x7c,
         COUNT(*) OVER w AS n_win
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detr AS (
  SELECT event_type, isodow(day) - 1 AS weekday,
         7 * yc - trend_x7c AS d
  FROM ma WHERE n_win = 7
),
wk AS (
  SELECT event_type, weekday, CAST(COUNT(*) AS BIGINT) AS n_w,
         SUM(CAST(d AS HUGEINT)) AS s1e,
         SUM(CAST(d AS HUGEINT) * d) AS s2e,
         CAST(CAST(SUM(CAST(d AS HUGEINT)) AS VARCHAR) AS DOUBLE) AS s1,
         CAST(CAST(SUM(CAST(d AS HUGEINT) * d) AS VARCHAR) AS DOUBLE) AS s2
  FROM detr GROUP BY event_type, weekday
),
et AS (
  SELECT event_type, CAST(SUM(n_w) AS BIGINT) AS n_days,
         CAST(CAST(SUM(s1e) AS VARCHAR) AS DOUBLE) AS s1_all,
         CAST(CAST(SUM(s2e) AS VARCHAR) AS DOUBLE) AS s2_all
  FROM wk GROUP BY event_type
),
terms AS (
  SELECT w.event_type, w.s2 - (w.s1 / w.n_w) * w.s1 AS ssw_w,
         e.n_days, e.s1_all, e.s2_all
  FROM wk w JOIN et e USING (event_type)
)
SELECT event_type, n_days,
       CAST(1.0 - SUM(ssw_w) OVER (PARTITION BY event_type)
              / (s2_all - (s1_all / n_days) * s1_all) AS FLOAT)
         AS seasonal_strength_f
FROM terms
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_type) = 1
ORDER BY event_type
""",
    tags=("timeseries", "seasonality", "strength", "monitoring"),
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-strength score per arm (Hyndman's F_s, computed as the
    weekday η² of the detrended series): 1 − SSW/SST over the exact
    ×7-cent detrended values — "how much of the detrended variance the
    weekly pattern explains", the scalar a seasonality monitor tracks
    where ts_seasonal_decompose_additive emits the full profile (F_s
    near 0 → no weekly cycle, near 1 → calendar-dominated; alert on
    CHANGE). Reuses the decomposition's exact-integer discipline end
    to end: detrended d = 7y − trend is an exact bigint, per-weekday
    Σd/Σd² accumulate in HUGEINT/DECIMAL(38,0) and string-hop once,
    each weekday's within-SS is one fixed IEEE tree, and the final
    strength FLOAT-absorbs the 7-term sum (the anova/chi2 contract —
    this IS the one-way ANOVA identity with weekday groups).

    Scale: identical shape to the decomposition (calendar-bounded
    daily pre-agg, per-arm centered window, ≤7×arms groups), plus
    arm-partitioned 7-row window sums. Output is one row per arm."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg((F.sum(dec("value")) * 100).cast("long").alias("yc"))
    w = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    )
    ma = daily.select(
        "event_type",
        "day",
        "yc",
        F.sum("yc").over(w).cast("long").alias("trend_x7c"),
        F.count(F.lit(1)).over(w).alias("n_win"),
    )
    detr = ma.where(F.col("n_win") == 7).select(
        "event_type",
        F.weekday("day").cast("int").alias("weekday"),
        (7 * F.col("yc") - F.col("trend_x7c"))
        .cast("decimal(38,0)")
        .alias("d"),
    )
    wk = detr.groupBy("event_type", "weekday").agg(
        F.count(F.lit(1)).cast("long").alias("n_w"),
        F.expr("SUM(d)").alias("s1e"),
        F.expr("SUM(d * d)").alias("s2e"),
        F.expr("CAST(CAST(SUM(d) AS STRING) AS DOUBLE)").alias("s1"),
        F.expr("CAST(CAST(SUM(d * d) AS STRING) AS DOUBLE)").alias("s2"),
    )
    et = wk.groupBy("event_type").agg(
        F.sum("n_w").cast("long").alias("n_days"),
        F.expr("CAST(CAST(SUM(s1e) AS STRING) AS DOUBLE)").alias("s1_all"),
        F.expr("CAST(CAST(SUM(s2e) AS STRING) AS DOUBLE)").alias("s2_all"),
    )
    terms = wk.join(et, "event_type").select(
        "event_type",
        (
            F.col("s2") - (F.col("s1") / F.col("n_w")) * F.col("s1")
        ).alias("ssw_w"),
        "n_days",
        "s1_all",
        "s2_all",
    )
    warm = Window.partitionBy("event_type")
    wrn = Window.partitionBy("event_type").orderBy("event_type")
    return (
        terms.select(
            "event_type",
            "n_days",
            (
                1.0
                - F.sum("ssw_w").over(warm)
                / (
                    F.col("s2_all")
                    - (F.col("s1_all") / F.col("n_days")) * F.col("s1_all")
                )
            )
            .cast("float")
            .alias("seasonal_strength_f"),
            F.row_number().over(wrn).alias("_rn"),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy("event_type")
    )
