"""Behavioral / warehouse-history operators over the events and orders
tables: gap-based sessionization, cohort retention, and SCD2 (slowly
changing dimension, type 2) history construction.

Scale design: all three are single-shuffle plans — each partitions by
its natural entity key (user_id / o_custkey) and does every window
computation inside that partition, so the shuffle key equals the output
grouping key and Catalyst reuses one Exchange across the window chain
and the final aggregate. At 100 TB the events table would be bucketed
by user_id, making all three shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from boltzmannclean_spark.functions.exact import dec
from boltzmannclean_spark.plans.registry import register
from boltzmannclean_spark.sources.catalog import load_table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap
WEEK_US = 7 * 24 * 3600 * 1_000_000
# open-ended SCD2 rows: 9999-12-31T00:00:00Z in epoch-µs (literal on
# both engines — no timestamp arithmetic near the max range)
SCD2_OPEN_END_US = 253_402_214_400_000_000


@register(
    "events_sessionize",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us, value FROM events
),
flagged AS (
  SELECT *, CASE WHEN t_us - LAG(t_us) OVER w > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
),
runs AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       COUNT(*) AS n_events,
       MIN(t_us) AS start_us, MAX(t_us) AS end_us,
       MAX(t_us) - MIN(t_us) AS duration_us,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sum_value
FROM runs
GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
""",
    tags=("behavioral", "sessionize", "window"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based batch sessionization: a new session starts when the gap
    to the previous event of the same user exceeds 30 minutes (lag +
    running sum of new-session flags — the standard island-building
    recipe). One shuffle on user_id serves the lag, the running sum and
    the per-session aggregate."""
    from boltzmannclean_spark.pipeline import sessionize

    return sessionize(
        load_table(spark, sf_dir, "events"),
        gap_minutes=SESSION_GAP_US / 60_000_000,
    )


@register(
    "events_retention_cohort",
    oracle=f"""
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
)
SELECT epoch_us(f.cohort_week) AS cohort_week_us,
       (epoch_us(date_trunc('week', e.ts)) - epoch_us(f.cohort_week))
         // {WEEK_US} AS week_offset,
       COUNT(DISTINCT e.user_id) AS n_users,
       COUNT(*) AS n_events
FROM events e JOIN firsts f USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
""",
    tags=("behavioral", "retention", "cohort"),
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users are cohorted by the ISO week of
    their first event; each cell counts distinct users (and raw events)
    active k weeks after their cohort week. The first-event lookup is an
    aggregate on the same user_id key the join consumes — one shuffle,
    and AQE broadcasts the cohort side when it is small."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        ev.join(firsts, "user_id")
        .select(
            F.unix_micros("cohort_week").alias("cohort_week_us"),
            (
                (
                    F.unix_micros(F.date_trunc("week", F.col("ts")))
                    - F.unix_micros("cohort_week")
                )
                / F.lit(WEEK_US)
            )
            .cast("long")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week_us", "week_offset")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("cohort_week_us", "week_offset")
    )


@register(
    "scd2_order_status_history",
    oracle=f"""
WITH flagged AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
         CASE WHEN LAG(o_orderstatus) OVER w IS DISTINCT FROM o_orderstatus
              THEN 1 ELSE 0 END AS chg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
runs AS (
  SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey
                           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged
),
grp AS (
  SELECT o_custkey, run_id, o_orderstatus AS status,
         MIN(o_orderdate) AS vf, COUNT(*) AS n_orders
  FROM runs GROUP BY o_custkey, run_id, o_orderstatus
)
SELECT o_custkey, CAST(run_id AS BIGINT) AS version, status,
       epoch_us(vf) AS valid_from_us,
       COALESCE(LEAD(epoch_us(vf)) OVER (PARTITION BY o_custkey ORDER BY run_id),
                {SCD2_OPEN_END_US}) AS valid_to_us,
       n_orders
FROM grp
ORDER BY o_custkey, version
""",
    tags=("behavioral", "scd2", "history"),
)
def scd2_order_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build: collapse each customer's order-status
    timeline into validity intervals — consecutive same-status runs
    become one row with [valid_from, valid_to) stitched via lead(), the
    open row carrying a 9999-12-31 sentinel. The run-id island trick,
    the grouping, and the lead() all ride one o_custkey shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = orders.select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus"
    ).withColumn(
        "chg",
        F.when(
            F.lag("o_orderstatus").over(w).isNull()
            | (F.lag("o_orderstatus").over(w) != F.col("o_orderstatus")),
            1,
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("chg")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    grp = runs.groupBy(
        "o_custkey", "run_id", F.col("o_orderstatus").alias("status")
    ).agg(
        F.min("o_orderdate").alias("vf"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    wv = Window.partitionBy("o_custkey").orderBy("run_id")
    return grp.select(
        "o_custkey",
        F.col("run_id").alias("version"),
        "status",
        F.unix_micros(F.col("vf").cast("timestamp")).alias("valid_from_us"),
        F.coalesce(
            F.lead(F.unix_micros(F.col("vf").cast("timestamp"))).over(wv),
            F.lit(SCD2_OPEN_END_US),
        ).alias("valid_to_us"),
        "n_orders",
    ).orderBy("o_custkey", "version")


@register(
    "window_session_batch",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us, value FROM events
),
flagged AS (
  SELECT *, CASE WHEN t_us - LAG(t_us) OVER w >= {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
),
runs AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(t_us) AS session_start_us,
       MAX(t_us) + {SESSION_GAP_US} AS session_end_us,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sum_value
FROM runs
GROUP BY user_id, sid
ORDER BY user_id, session_start_us
""",
    tags=("behavioral", "session-window", "native"),
)
def window_session_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` in BATCH mode: Spark's built-in gap
    sessionizer works in plain groupBy too (not just streaming) — one
    aggregation, no window-function chain. The oracle rebuilds the same
    sessions with the lag/cumsum island recipe (new session when the
    gap is >= 30 min, window end = last event + gap), proving the
    native operator and the manual idiom (events_sessionize) agree."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("session_start_us"),
            F.unix_micros("sw.end").alias("session_end_us"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start_us")
    )


@register(
    "events_markov_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS nxt
  FROM events
),
cnt AS (
  SELECT cur, nxt, COUNT(*) AS n
  FROM seq WHERE nxt IS NOT NULL
  GROUP BY cur, nxt
)
SELECT cur, nxt, n,
       CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY cur) AS p
FROM cnt
ORDER BY cur, nxt
""",
    tags=("behavioral", "markov", "sequence"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: lead() pairs consecutive events (one user_id shuffle),
    the count aggregate shuffles only distinct (cur, next) cells, and
    the row-normalized probability divides two exact counts — the
    empirical behavior model feeding next-event prediction and anomaly
    scoring."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    cnt = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    wrow = Window.partitionBy("cur")
    return (
        cnt.select(
            "cur",
            "nxt",
            "n",
            (F.col("n").cast("double") / F.sum("n").over(wrow)).alias("p"),
        )
        .orderBy("cur", "nxt")
    )


@register(
    "events_rfm_segmentation",
    oracle="""
WITH base AS (
  SELECT user_id,
         MAX(epoch_us(ts)) AS last_us,
         COUNT(*) AS frequency,
         CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS monetary
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
),
scored AS (
  SELECT *,
         NTILE(4) OVER (ORDER BY last_us DESC, user_id) AS r_score,
         NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS f_score,
         NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS m_score
  FROM base
)
SELECT user_id, last_us, frequency, monetary, r_score, f_score, m_score,
       CASE WHEN r_score = 1 AND f_score = 1 THEN 'champion'
            WHEN r_score <= 2 AND m_score <= 2 THEN 'loyal'
            WHEN r_score = 4 THEN 'at_risk'
            ELSE 'regular' END AS segment
FROM scored
ORDER BY user_id
""",
    tags=("behavioral", "rfm", "segmentation"),
)
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency/frequency/monetary quartiles (ntile
    over a UNIQUE total order — value desc then user_id — so tile
    membership is deterministic) folded into named segments. One
    aggregate pass + three global ntiles over the small per-user
    rollup; at 100 TB the rollup is ~users-sized, not events-sized."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    base = ev.groupBy("user_id").agg(
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(dec("value")).cast("double").alias("monetary"),
    )
    r = F.ntile(4).over(Window.orderBy(F.desc("last_us"), "user_id"))
    f = F.ntile(4).over(Window.orderBy(F.desc("frequency"), "user_id"))
    m = F.ntile(4).over(Window.orderBy(F.desc("monetary"), "user_id"))
    scored = base.select(
        "user_id", "last_us", "frequency", "monetary",
        r.alias("r_score"), f.alias("f_score"), m.alias("m_score"),
    )
    seg = (
        F.when((F.col("r_score") == 1) & (F.col("f_score") == 1), "champion")
        .when((F.col("r_score") <= 2) & (F.col("m_score") <= 2), "loyal")
        .when(F.col("r_score") == 4, "at_risk")
        .otherwise("regular")
    )
    return scored.withColumn("segment", seg).orderBy("user_id")


@register(
    "orders_abc_pareto",
    oracle="""
WITH rev AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(16,2))) AS DECIMAL(18,2))
           AS revenue
  FROM orders GROUP BY o_custkey
),
tot AS (SELECT CAST(SUM(revenue) AS DECIMAL(20,2)) AS total FROM rev),
run AS (
  SELECT o_custkey, CAST(revenue AS DOUBLE) AS revenue,
         CAST(SUM(revenue) OVER (ORDER BY revenue DESC, o_custkey
                                 ROWS UNBOUNDED PRECEDING) AS DECIMAL(20,2)) AS cum,
         total
  FROM rev CROSS JOIN tot
)
SELECT o_custkey, revenue,
       CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share,
       CASE WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.5 THEN 'A'
            WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.8 THEN 'B'
            ELSE 'C' END AS abc_class
FROM run
ORDER BY revenue DESC, o_custkey
""",
    tags=("behavioral", "pareto", "abc"),
)
def orders_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of customers by cumulative revenue
    share: the running total accumulates in EXACT decimal over a unique
    (revenue desc, custkey) order, so the cumulative share — and
    therefore every A/B/C boundary decision — is bit-deterministic; a
    double running sum would flip classes at the boundaries under
    re-partitioning. Global window over the customer rollup, not the
    fact table."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice", 16)).cast("decimal(18,2)").alias("revenue")
    )
    tot = rev.agg(F.sum("revenue").cast("decimal(20,2)").alias("total"))
    w = Window.orderBy(F.desc("revenue"), "o_custkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = rev.crossJoin(F.broadcast(tot)).select(
        "o_custkey",
        F.col("revenue").cast("double").alias("revenue"),
        F.sum("revenue").over(w).cast("decimal(20,2)").alias("cum"),
        "total",
    )
    share = F.col("cum").cast("double") / F.col("total").cast("double")
    return (
        run.select(
            "o_custkey",
            "revenue",
            share.alias("cum_share"),
            F.when(share <= 0.5, "A")
            .when(share <= 0.8, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
        .orderBy(F.desc("revenue"), "o_custkey")
    )


COVER_DAYS = 30  # each order "covers" [o_orderdate, o_orderdate + 30d)


@register(
    "intervals_merge_overlapping",
    oracle=f"""
WITH iv AS (
  SELECT o_custkey, o_orderkey,
         epoch_us(o_orderdate) AS s,
         epoch_us(o_orderdate) + {COVER_DAYS}::BIGINT * 86400000000 AS e
  FROM orders
),
-- o_orderkey tiebreak: duplicate (s, e) intervals otherwise leave the
-- island flag's row and the cumsum's row order unpinned (see the
-- Spark twin's comment; surfaced by the x10 replica's duplicated
-- order dates).
flagged AS (
  SELECT *, CASE WHEN s > MAX(e) OVER (PARTITION BY o_custkey
                                       ORDER BY s, e, o_orderkey
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT *, SUM(new_island) OVER (PARTITION BY o_custkey
                                  ORDER BY s, e, o_orderkey
                                  ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
)
SELECT o_custkey, CAST(island AS BIGINT) AS island,
       MIN(s) AS start_us, MAX(e) AS end_us,
       COUNT(*) AS n_intervals,
       (MAX(e) - MIN(s)) // 86400000000 AS span_days
FROM islands
GROUP BY o_custkey, island
ORDER BY o_custkey, island
""",
    tags=("behavioral", "intervals", "islands"),
)
def intervals_merge_overlapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping intervals per key (each order covers 30 days;
    touching/overlapping coverage windows collapse into maximal
    'coverage islands'). The classic sweep: an interval starts a new
    island iff its start exceeds the running MAX(end) of everything
    before it — a window max with an UNBOUNDED..1 PRECEDING frame, then
    the usual flag-cumsum island id. One customer-keyed shuffle for the
    sweep, the island grouping, and the rollup."""
    orders = load_table(spark, sf_dir, "orders")
    iv = orders.select(
        "o_custkey",
        "o_orderkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("s"),
        (
            F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            + F.lit(COVER_DAYS * 86_400_000_000)
        ).alias("e"),
    )
    # o_orderkey makes the sweep order TOTAL: with duplicate (s, e)
    # intervals (same customer ordering twice on one day — common at
    # scale; the x10 replica surfaced it), an (s, e)-only ROWS window
    # leaves which tied row carries the new-island flag up to physical
    # row order, and the flag window and the cumsum window need not
    # agree on it — the islands come out split nondeterministically.
    # A unique tiebreak pins both windows to one order in BOTH engines.
    w = Window.partitionBy("o_custkey").orderBy("s", "e", "o_orderkey")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_island",
        F.when(F.col("s") > prev_max_e, 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return (
        islands.groupBy("o_custkey", "island")
        .agg(
            F.min("s").alias("start_us"),
            F.max("e").alias("end_us"),
            F.count(F.lit(1)).alias("n_intervals"),
            ((F.max("e") - F.min("s")) / F.lit(86_400_000_000))
            .cast("long")
            .alias("span_days"),
        )
        .orderBy("o_custkey", "island")
    )


@register(
    "events_rolling_wau",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events
),
contrib AS (
  SELECT user_id, UNNEST(generate_series(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS rd
  FROM ud
)
SELECT CAST(CAST(rd AS DATE) AS VARCHAR) AS report_day,
       COUNT(DISTINCT user_id) AS wau
FROM contrib
GROUP BY rd
ORDER BY report_day
""",
    tags=("behavioral", "wau", "rolling-distinct"),
)
def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) per day — the metric SQL can't
    express as a window (COUNT DISTINCT over a RANGE frame is
    unsupported everywhere) — via the scatter trick: each (user, day)
    activity contributes itself to the 7 report days it makes active,
    then one distinct-count per report day. Contribution fan-out is a
    constant ×7 on the DEDUPED user-day table (≪ raw events), which is
    the shape that survives 100 TB of events."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), 6), F.expr("INTERVAL 1 DAY")
            )
        ).alias("rd"),
    )
    return (
        contrib.groupBy(F.col("rd").cast("string").alias("report_day"))
        .agg(F.count_distinct("user_id").alias("wau"))
        .orderBy("report_day")
    )


ATTR_WINDOW_US = 24 * 3600 * 1_000_000  # clicks within 1 day before purchase


@register(
    "events_attribution_linear",
    oracle=f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us,
         CAST(value AS DECIMAL(12,2)) AS amount
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
  FROM events WHERE event_type = 'click'
),
touch AS (
  SELECT p.purchase_id, p.user_id, p.amount, c.click_id,
         COUNT(*) OVER (PARTITION BY p.purchase_id) AS n_touches
  FROM p JOIN c ON p.user_id = c.user_id
              AND c.c_us <= p.p_us
              AND c.c_us > p.p_us - {ATTR_WINDOW_US}
)
SELECT purchase_id, user_id, click_id,
       CAST(amount AS DOUBLE) / n_touches AS credit,
       CAST(n_touches AS BIGINT) AS n_touches
FROM touch
ORDER BY purchase_id, click_id
""",
    tags=("behavioral", "attribution", "range-join"),
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click in the 24 h before a
    purchase shares the purchase amount equally. The purchase⋈click
    range join is user-equi + time-banded — pairs only materialize per
    user within the window (at 100 TB: pre-bucket both sides by
    (user, day) so the band never crosses more than two buckets).
    Credit divides a decimal-exact amount by an integer touch count —
    bit-identical splits, which is what makes attribution revenue
    reconcile with finance's totals."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
        dec("value").alias("amount"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.unix_micros("ts").alias("c_us"),
    )
    touch = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_us") <= F.col("p_us"))
        & (F.col("c_us") > F.col("p_us") - ATTR_WINDOW_US),
    )
    w = Window.partitionBy("purchase_id")
    return (
        touch.withColumn("n_touches", F.count(F.lit(1)).over(w))
        .select(
            "purchase_id",
            "user_id",
            "click_id",
            (F.col("amount").cast("double") / F.col("n_touches")).alias("credit"),
            F.col("n_touches").cast("long").alias("n_touches"),
        )
        .orderBy("purchase_id", "click_id")
    )


@register(
    "events_cumulative_reach",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS first_day
  FROM events GROUP BY user_id
),
new_per_day AS (
  SELECT first_day AS d, COUNT(*) AS new_users FROM firsts GROUP BY first_day
),
days AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d FROM events)
SELECT CAST(days.d AS VARCHAR) AS day,
       COALESCE(n.new_users, 0) AS new_users,
       CAST(SUM(COALESCE(n.new_users, 0)) OVER (ORDER BY days.d
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_reach
FROM days LEFT JOIN new_per_day n ON n.d = days.d
ORDER BY day
""",
    tags=("behavioral", "reach", "cumulative-distinct"),
)
def events_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative reach (running distinct users ever seen, per day):
    the cumulative-COUNT-DISTINCT that windows can't express becomes
    exact integer arithmetic via first-touch reduction — each user
    contributes once on their first day, and a running SUM of new users
    IS the distinct total. Events-sized input collapses to a users-
    sized aggregate, then a days-sized window."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    firsts = ev.select("user_id", day.alias("d")).groupBy("user_id").agg(
        F.min("d").alias("first_day")
    )
    new_per_day = firsts.groupBy(F.col("first_day").alias("d")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    days = ev.select(day.alias("d")).distinct()
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        days.join(new_per_day, "d", "left")
        .select("d", F.coalesce("new_users", F.lit(0)).alias("new_users"))
        .withColumn("cumulative_reach", F.sum("new_users").over(w).cast("long"))
        .select(F.col("d").cast("string").alias("day"), "new_users", "cumulative_reach")
        .orderBy("day")
    )


PATH_TOP_N = 20


@register(
    "events_path_analysis",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type AS e1,
         LEAD(event_type) OVER w AS e2,
         LEAD(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
paths AS (
  SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
  FROM seq WHERE e3 IS NOT NULL
  GROUP BY e1 || '>' || e2 || '>' || e3
)
SELECT path, n
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, path) AS rk FROM paths)
WHERE rk <= {PATH_TOP_N}
ORDER BY n DESC, path
""",
    tags=("behavioral", "paths", "sequence"),
)
def events_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type trigram paths (view>click>purchase …): two leads
    per event build the 3-step journeys on one user_id shuffle, then a
    count + deterministic top-N. The n-gram-over-sequences pattern that
    powers funnel discovery — same shape at 100 TB because paths
    aggregate to a tiny distinct set."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type").over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    paths = seq.select(
        F.concat_ws(">", "e1", "e2", "e3").alias("path")
    ).groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    wr = Window.orderBy(F.desc("n"), "path")
    return (
        paths.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= PATH_TOP_N)
        .drop("rk")
        .orderBy(F.desc("n"), "path")
    )


@register(
    "events_time_to_convert",
    oracle="""
WITH stage AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
  FROM events GROUP BY user_id
),
latency AS (
  SELECT user_id, t_purchase - t_view AS us_to_convert
  FROM stage
  WHERE t_view IS NOT NULL AND t_purchase IS NOT NULL AND t_purchase >= t_view
)
SELECT COUNT(*) AS n_converters,
       CAST(MIN(us_to_convert) AS BIGINT) AS min_us,
       CAST(quantile_disc(us_to_convert, 0.50) AS BIGINT) AS p50_us,
       CAST(quantile_disc(us_to_convert, 0.90) AS BIGINT) AS p90_us,
       CAST(MAX(us_to_convert) AS BIGINT) AS max_us
FROM latency
""",
    tags=("behavioral", "latency", "funnel"),
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: first-view → first-purchase
    latency per user (conditional MINs in one aggregation pass, the
    funnel trick), summarized with DISCRETE percentiles over integer µs
    — actual data elements, so the p50/p90 are bit-exact cross-engine
    with no float recipe. Two aggregations, both on user_id then
    global."""
    ev = load_table(spark, sf_dir, "events")
    t_view = F.min(
        F.when(F.col("event_type") == "view", F.unix_micros("ts"))
    ).alias("t_view")
    t_purch = F.min(
        F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
    ).alias("t_purchase")
    stage = ev.groupBy("user_id").agg(t_view, t_purch)
    latency = stage.where(
        F.col("t_view").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") >= F.col("t_view"))
    ).select((F.col("t_purchase") - F.col("t_view")).alias("us_to_convert"))
    return latency.agg(
        F.count(F.lit(1)).alias("n_converters"),
        F.min("us_to_convert").alias("min_us"),
        F.expr(
            "percentile_disc(0.50) WITHIN GROUP (ORDER BY us_to_convert)"
        ).cast("long").alias("p50_us"),
        F.expr(
            "percentile_disc(0.90) WITHIN GROUP (ORDER BY us_to_convert)"
        ).cast("long").alias("p90_us"),
        F.max("us_to_convert").alias("max_us"),
    )


@register(
    "events_dau_mau_stickiness",
    oracle="""
WITH dau AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         COUNT(DISTINCT user_id) AS dau
  FROM events GROUP BY 1
),
mau AS (
  SELECT CAST(date_trunc('month', ts) AS DATE) AS m,
         COUNT(DISTINCT user_id) AS mau
  FROM events GROUP BY 1
)
SELECT CAST(dau.d AS VARCHAR) AS day, dau.dau, mau.mau,
       CAST(dau.dau AS DOUBLE) / mau.mau AS stickiness
FROM dau JOIN mau ON date_trunc('month', dau.d) = mau.m
ORDER BY day
""",
    tags=("behavioral", "stickiness", "dau-mau"),
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day: two distinct-count aggregates at
    different grains joined on the calendar month — the engagement
    ratio every product dashboard leads with. Exact distinct counts
    divide to a deterministic double; the month side is tiny and
    broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    dau = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("d"), "user_id"
    ).groupBy("d").agg(F.count_distinct("user_id").alias("dau"))
    mau = ev.select(
        F.date_trunc("month", "ts").cast("date").alias("m"), "user_id"
    ).groupBy("m").agg(F.count_distinct("user_id").alias("mau"))
    return (
        dau.join(
            F.broadcast(mau),
            F.date_trunc("month", F.col("d").cast("timestamp")).cast("date")
            == F.col("m"),
        )
        .select(
            F.col("d").cast("string").alias("day"),
            "dau",
            "mau",
            (F.col("dau").cast("double") / F.col("mau")).alias("stickiness"),
        )
        .orderBy("day")
    )


_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.t_click
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
       (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
       (SELECT COUNT(*) FROM p) AS n_purchased_after_click,
       CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
         / (SELECT COUNT(*) FROM v) AS view_to_click,
       CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
         / (SELECT COUNT(*) FROM c) AS click_to_purchase
"""


@register(
    "events_funnel_ordered",
    oracle=_FUNNEL_ORACLE,
    tags=("behavioral", "funnel", "ordered"),
)
def events_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED funnel: each stage only counts if it happens AT/AFTER
    the user's previous stage (first view → first click after that →
    first purchase after that) — the semantics product analytics means
    by "funnel", unlike the any-order conditional-MIN variant
    (events_funnel). Three same-key aggregations chain on user_id, so
    one shuffle partitioning serves the whole cascade; conversion
    rates divide exact counts."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t")
    )
    return funnel_ordered_from(ev)


def funnel_ordered_from(ev: DataFrame) -> DataFrame:
    """The ordered-funnel reduction over a (user_id, event_type, t)
    frame — factored so `stream_funnel_monitor` can run the LITERAL
    batch expression tree over its accumulated event log (the shared-
    oracle discipline that makes stream-batch parity hash-exact)."""
    v = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("t").alias("t_view")
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("t") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("t") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_purchase"))
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after_click")))
    )
    return counts.select(
        "n_viewed",
        "n_clicked_after_view",
        "n_purchased_after_click",
        (
            F.col("n_clicked_after_view").cast("double") / F.col("n_viewed")
        ).alias("view_to_click"),
        (
            F.col("n_purchased_after_click").cast("double")
            / F.col("n_clicked_after_view")
        ).alias("click_to_purchase"),
    )


@register(
    "orders_rank_shift",
    oracle="""
WITH y95 AS (
  SELECT o_custkey,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(16,2))) AS STRING) AS DOUBLE) AS rev,
         RANK() OVER (ORDER BY SUM(CAST(o_totalprice AS DECIMAL(16,2))) DESC,
                      o_custkey) AS rk
  FROM orders WHERE YEAR(o_orderdate) = 1995
  GROUP BY o_custkey
),
y96 AS (
  SELECT o_custkey,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(16,2))) AS STRING) AS DOUBLE) AS rev,
         RANK() OVER (ORDER BY SUM(CAST(o_totalprice AS DECIMAL(16,2))) DESC,
                      o_custkey) AS rk
  FROM orders WHERE YEAR(o_orderdate) = 1996
  GROUP BY o_custkey
)
SELECT a.o_custkey, a.rk AS rank_1995, b.rk AS rank_1996,
       CAST(a.rk AS BIGINT) - CAST(b.rk AS BIGINT) AS places_gained,
       a.rev AS rev_1995, b.rev AS rev_1996
FROM y95 a JOIN y96 b ON a.o_custkey = b.o_custkey
WHERE a.rk <= 50 OR b.rk <= 50
ORDER BY a.o_custkey
""",
    tags=("behavioral", "leaderboard", "rank-shift"),
)
def orders_rank_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard movement: customer revenue rank in 1995 vs 1996 and
    places gained — the period-over-period comparison behind every
    'top movers' report. Ranks break ties on (revenue desc, custkey),
    so they are total orders and shuffle-stable; revenues are exact
    decimal sums. Two grouped aggregates + rank windows + an equi-join
    on the customer rollup, never the fact table."""
    orders = load_table(spark, sf_dir, "orders")

    def year_rank(year: int, suffix: str) -> DataFrame:
        rev = (
            orders.where(F.year("o_orderdate") == year)
            .groupBy("o_custkey")
            .agg(F.sum(dec("o_totalprice", 16)).alias("rev_dec"))
        )
        w = Window.orderBy(F.desc("rev_dec"), "o_custkey")
        return rev.select(
            "o_custkey",
            F.col("rev_dec").cast("double").alias(f"rev_{suffix}"),
            F.rank().over(w).alias(f"rank_{suffix}"),
        )

    a = year_rank(1995, "1995")
    b = year_rank(1996, "1996")
    return (
        a.join(b, "o_custkey")
        .where((F.col("rank_1995") <= 50) | (F.col("rank_1996") <= 50))
        .select(
            "o_custkey",
            "rank_1995",
            "rank_1996",
            (
                F.col("rank_1995").cast("long") - F.col("rank_1996").cast("long")
            ).alias("places_gained"),
            "rev_1995",
            "rev_1996",
        )
        .orderBy("o_custkey")
    )


@register(
    "events_bounce_rate",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events
),
flagged AS (
  SELECT *, CASE WHEN t_us - LAG(t_us) OVER w > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
),
sess AS (
  SELECT user_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid,
         t_us
  FROM flagged
),
per_sess AS (
  SELECT user_id, sid, COUNT(*) AS n_events,
         CAST(date_trunc('day', make_timestamp(MIN(t_us))) AS DATE) AS d
  FROM sess GROUP BY user_id, sid
)
SELECT CAST(d AS VARCHAR) AS day,
       COUNT(*) AS n_sessions,
       COUNT(CASE WHEN n_events = 1 THEN 1 END) AS n_bounces,
       CAST(COUNT(CASE WHEN n_events = 1 THEN 1 END) AS DOUBLE) / COUNT(*)
         AS bounce_rate
FROM per_sess
GROUP BY d
ORDER BY day
""",
    tags=("behavioral", "bounce", "sessions"),
)
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of sessions (30-min-gap islands, dated
    by their first event) containing exactly one event — the classic
    engagement-quality metric layered on the sessionizer. Same single
    user_id shuffle as events_sessionize plus a days-sized rollup;
    the rate divides exact counts."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("t_us")
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    flagged = ev.withColumn(
        "new_sess",
        F.when(F.col("t_us") - F.lag("t_us").over(w) > SESSION_GAP_US, 1).otherwise(
            0
        ),
    )
    sess = flagged.withColumn(
        "sid",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_sess = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_trunc("day", F.timestamp_micros(F.min("t_us")))
        .cast("date")
        .alias("d"),
    )
    bounces = F.count_if(F.col("n_events") == 1)
    return (
        per_sess.groupBy(F.col("d").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            bounces.alias("n_bounces"),
            (bounces.cast("double") / F.count(F.lit(1))).alias("bounce_rate"),
        )
        .orderBy("day")
    )


DAY_US = 86_400_000_000


@register(
    "events_sessionize_skew",
    oracle=f"""
WITH e AS (
  SELECT CASE WHEN user_id % 3 = 0 THEN -1 ELSE user_id END AS uid,
         event_id, epoch_us(ts) AS t_us
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN t_us - LAG(t_us) OVER w > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY uid ORDER BY t_us, event_id)
),
runs AS (
  SELECT *, SUM(brk) OVER (PARTITION BY uid ORDER BY t_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT uid, CAST(sid AS BIGINT) AS session_idx,
       COUNT(*) AS n_events,
       MIN(t_us) AS start_us, MAX(t_us) AS end_us,
       MAX(t_us) - MIN(t_us) AS duration_us
FROM runs
GROUP BY uid, sid
ORDER BY uid, session_idx
""",
    tags=("behavioral", "sessionize", "skew"),
)
def events_sessionize_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant sessionization, demonstrated on a SYNTHESIZED hot
    key: every user_id divisible by 3 is collapsed onto uid -1, putting
    ~1/3 of ALL events on one key — the bot-traffic shape that turns a
    plain per-user window (events_sessionize) into a single straggler
    task, since window state cannot be salted the way join keys can.

    Mitigation is BUCKETED two-stage sessionization (the windowed-family
    analogue of a salted join): stage 1 sessionizes within (uid, utc-day)
    — the hot key shards across days, bounding any window partition by
    one key-day of events — and stage 2 merges sessions that span a
    bucket boundary (gap ≤ 30 min across midnight) with the SAME islands
    idiom over session-level rows, which are smaller than event rows by
    the mean session length. Two narrow exchanges replace one skewed
    one; the residual stage-2 skew is bounded by the hot key's session
    count, the honest worst case being gap-alternating traffic (≈ n/2
    sessions). AQE's skew handling splits shuffle-read side only, so it
    cannot fix a skewed window partition — the bucketing has to be in
    the plan shape. The oracle is the UNBUCKETED single-pass islands
    computation: boundary-merge equivalence is exactly what it checks.
    All arithmetic is integer µs — bit-exact at any parallelism."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.when(F.col("user_id") % 3 == 0, F.lit(-1))
        .otherwise(F.col("user_id"))
        .alias("uid"),
        "event_id",
        F.unix_micros("ts").alias("t_us"),
    ).withColumn("day", F.expr(f"t_us div {DAY_US}"))
    w1 = Window.partitionBy("uid", "day").orderBy("t_us", "event_id")
    runs = (
        e.withColumn(
            "brk",
            F.when(
                F.col("t_us") - F.lag("t_us").over(w1) > SESSION_GAP_US, 1
            ).otherwise(0),
        )
        .withColumn(
            "lidx",
            F.sum("brk").over(
                w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    sess1 = runs.groupBy("uid", "day", "lidx").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("t_us").alias("s_us"),
        F.max("t_us").alias("e_us"),
    )
    # Stage 2 over SESSION rows: session starts are unique per uid
    # (distinct (t_us, event_id) within a day), so the order is total.
    w2 = Window.partitionBy("uid").orderBy("s_us")
    merged = sess1.withColumn(
        "brk2",
        F.when(
            F.col("s_us") - F.lag("e_us").over(w2) > SESSION_GAP_US, 1
        ).otherwise(0),
    ).withColumn(
        "sid",
        F.sum("brk2").over(
            w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        merged.groupBy("uid", "sid")
        .agg(
            F.sum("n").alias("n_events"),
            F.min("s_us").alias("start_us"),
            F.max("e_us").alias("end_us"),
            (F.max("e_us") - F.min("s_us")).alias("duration_us"),
        )
        .select(
            "uid",
            F.col("sid").cast("long").alias("session_idx"),
            "n_events",
            "start_us",
            "end_us",
            "duration_us",
        )
        .orderBy("uid", "session_idx")
    )


@register(
    "events_pattern_vshape",
    oracle="""
WITH s AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
  FROM events
),
steps AS (
  SELECT user_id, event_id, t_us,
         CASE WHEN c > LAG(c) OVER w THEN 1
              WHEN c < LAG(c) OVER w THEN -1 ELSE 0 END AS s
  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
),
m AS (
  SELECT user_id, t_us,
         (LAG(s, 3) OVER w = -1 AND LAG(s, 2) OVER w = -1
          AND LAG(s, 1) OVER w = 1 AND s = 1) AS hit
  FROM steps WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
)
SELECT user_id,
       COUNT(*) FILTER (hit) AS n_matches,
       MIN(CASE WHEN hit THEN t_us END) AS first_match_us
FROM m
GROUP BY user_id
HAVING COUNT(*) FILTER (hit) > 0
ORDER BY user_id
""",
    tags=("behavioral", "pattern", "sequence"),
)
def events_pattern_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern detection without the SQL
    extension Spark lacks: find V-shapes (two consecutive drops followed
    by two consecutive rises) in each user's value series. Steps are
    classified by exact integer cents comparison, the 4-step pattern is
    a LAG-chain conjunction, and everything — step signs, the lag chain,
    the final per-user aggregate — reuses ONE user_id exchange (the
    windowed-family contract this repo plan-gates). Fixed-length
    patterns compile to lag chains like this one; variable-length
    patterns (A+ B+) compile to the islands idiom (events_sessionize).
    Emits users with ≥1 match, their match count, and the first match
    time — all integer-exact."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    s = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t_us"),
        (dec("value") * 100).cast("long").alias("c"),
    )
    steps = s.withColumn(
        "s",
        F.when(F.col("c") > F.lag("c").over(w), 1)
        .when(F.col("c") < F.lag("c").over(w), -1)
        .otherwise(0),
    )
    hit = (
        (F.lag("s", 3).over(w) == -1)
        & (F.lag("s", 2).over(w) == -1)
        & (F.lag("s", 1).over(w) == 1)
        & (F.col("s") == 1)
    )
    return (
        steps.withColumn("hit", hit)
        .groupBy("user_id")
        .agg(
            F.count_if(F.col("hit")).alias("n_matches"),
            F.min(F.when(F.col("hit"), F.col("t_us"))).alias(
                "first_match_us"
            ),
        )
        .where(F.col("n_matches") > 0)
        .orderBy("user_id")
    )


CUSUM_THRESHOLD_CENTS = 5000


@register(
    "events_cusum_alarm",
    oracle=f"""
WITH s AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
  FROM events
),
base AS (
  SELECT user_id, event_id, t_us,
         c - first_value(c) OVER w AS d
  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
p1 AS (
  SELECT user_id, event_id, t_us,
         SUM(d) OVER w AS p
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
pfx AS (
  SELECT user_id, t_us, p,
         MIN(p) OVER w2 AS minp
  FROM p1
  WINDOW w2 AS (PARTITION BY user_id ORDER BY t_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cs AS (
  SELECT user_id, t_us,
         p - LEAST(minp, 0) AS cusum
  FROM pfx
)
SELECT user_id,
       COUNT(*) FILTER (cusum >= {CUSUM_THRESHOLD_CENTS}) AS n_alarms,
       CAST(MAX(cusum) AS BIGINT) AS max_cusum_cents,
       MIN(CASE WHEN cusum >= {CUSUM_THRESHOLD_CENTS} THEN t_us END)
         AS first_alarm_us
FROM cs
GROUP BY user_id
HAVING COUNT(*) FILTER (cusum >= {CUSUM_THRESHOLD_CENTS}) > 0
ORDER BY user_id
""",
    tags=("behavioral", "cusum", "changepoint"),
)
def events_cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point alarms per user: the classic control-chart
    recursion s_i = max(0, s_{{i-1}} + d_i) looks window-inexpressible,
    but the identity s_i = P_i − min(0, min_{{j≤i}} P_j) (P = prefix sum
    of deviations) turns it into a prefix sum plus a RUNNING MIN OF THE
    RUNNING SUM — two stacked frames on the same user_id ordering, so
    the whole detector still costs one exchange, no recursion, no UDF.
    Deviations are exact integer cents from each user's first observed
    value (level-shift detection); an alarm fires when the CUSUM
    statistic reaches {CUSUM_THRESHOLD_CENTS} cents. Emits alarming
    users with alarm count, peak statistic, and first alarm time."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t_us"),
        (dec("value") * 100).cast("long").alias("c"),
    )
    base = s.withColumn(
        "d", F.col("c") - F.first("c").over(wrun)
    )
    pfx = base.withColumn("p", F.sum("d").over(wrun)).withColumn(
        "minp", F.min("p").over(wrun)
    )
    cusum = F.col("p") - F.least(F.col("minp"), F.lit(0))
    alarmed = pfx.select(
        "user_id", "t_us", cusum.alias("cusum")
    )
    return (
        alarmed.groupBy("user_id")
        .agg(
            F.count_if(
                F.col("cusum") >= CUSUM_THRESHOLD_CENTS
            ).alias("n_alarms"),
            F.max("cusum").alias("max_cusum_cents"),
            F.min(
                F.when(
                    F.col("cusum") >= CUSUM_THRESHOLD_CENTS, F.col("t_us")
                )
            ).alias("first_alarm_us"),
        )
        .where(F.col("n_alarms") > 0)
        .orderBy("user_id")
    )


@register(
    "join_pit_scd2",
    oracle=f"""
WITH flagged AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
         CASE WHEN LAG(o_orderstatus) OVER w IS DISTINCT FROM o_orderstatus
              THEN 1 ELSE 0 END AS chg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
runs AS (
  SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey
                           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged
),
grp AS (
  SELECT o_custkey, run_id, o_orderstatus AS status,
         MIN(o_orderdate) AS vf
  FROM runs GROUP BY o_custkey, run_id, o_orderstatus
),
hist AS (
  SELECT o_custkey AS custkey, CAST(run_id AS BIGINT) AS version, status,
         epoch_us(vf) AS valid_from_us,
         COALESCE(LEAD(epoch_us(vf)) OVER (PARTITION BY o_custkey
                                           ORDER BY run_id),
                  {SCD2_OPEN_END_US}) AS valid_to_us
  FROM grp
)
SELECT o.o_orderkey, o.o_custkey,
       epoch_us(o.o_orderdate) AS orderdate_us,
       h.version AS pit_version, h.status AS pit_status,
       (h.status = o.o_orderstatus) AS match_ok
FROM orders o
JOIN hist h
  ON h.custkey = o.o_custkey
 AND epoch_us(o.o_orderdate) >= h.valid_from_us
 AND epoch_us(o.o_orderdate) <  h.valid_to_us
ORDER BY o.o_orderkey
""",
    tags=("behavioral", "scd2", "point-in-time", "join"),
)
def join_pit_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against an SCD2 dimension: enrich every order
    with the customer-status VERSION that was valid at its order date —
    the leakage-safe way to attach slowly-changing attributes to
    training examples (using today's dimension row would leak the
    future). Reuses the registered SCD2 build
    (``scd2_order_status_history``) and joins fact rows into the
    half-open validity interval [valid_from, valid_to).

    Plan: an equi-join on the entity key (custkey) with the interval
    containment as a residual predicate. Per-key fan-out is the
    customer's VERSION count — small and bounded by business reality,
    never corpus-sized — so unlike a general range join this stays
    linear: shuffle facts and versions on the same key, filter in place.
    Intervals are disjoint by construction, so each fact matches exactly
    one version (deterministic without any tie-break). ``match_ok``
    audits the build: the PIT status must equal the order's own status
    wherever one status-run covers the date (ties inside a date can
    legitimately differ — that disagreement is the PIT-correctness
    signal a feature-store backfill monitors)."""
    hist = scd2_order_status_history(spark, sf_dir).select(
        F.col("o_custkey").alias("custkey"),
        F.col("version").alias("pit_version"),
        F.col("status").alias("pit_status"),
        "valid_from_us",
        "valid_to_us",
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
            "orderdate_us"
        ),
    )
    return (
        orders.join(
            hist,
            (orders.o_custkey == hist.custkey)
            & (F.col("orderdate_us") >= F.col("valid_from_us"))
            & (F.col("orderdate_us") < F.col("valid_to_us")),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "orderdate_us",
            "pit_version",
            "pit_status",
            (F.col("pit_status") == F.col("o_orderstatus")).alias("match_ok"),
        )
        .orderBy("o_orderkey")
    )


OVERLAP_BIN_US = 3_600_000_000  # 1-hour bins for the interval-overlap join

_OVERLAP_PAIRS_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events
),
flagged AS (
  SELECT *, CASE WHEN t_us - LAG(t_us) OVER w > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
),
runs AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
),
s AS (
  SELECT user_id, session_idx, MIN(t_us) AS st, MAX(t_us) AS en
  FROM runs GROUP BY user_id, session_idx
),
overlap_pairs AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b,
         COUNT(*) AS n_overlaps,
         MIN(GREATEST(a.st, b.st)) AS first_overlap_us
  FROM s a JOIN s b
    ON a.user_id < b.user_id AND a.st <= b.en AND b.st <= a.en
  GROUP BY a.user_id, b.user_id
)"""


@register(
    "sessions_overlap_pairs",
    oracle=_OVERLAP_PAIRS_SQL
    + """
SELECT user_a, user_b, n_overlaps, first_overlap_us
FROM overlap_pairs
ORDER BY user_a, user_b
""",
    tags=("behavioral", "interval-join", "overlap"),
)
def sessions_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: which pairs of users had concurrently
    active sessions, and how many times — the co-presence signal behind
    fraud rings, shared-account detection and collaboration graphs.

    A naive overlap join (θ-join on a.st <= b.en AND b.st <= a.en) is a
    cross product. The scale path used here is BINNED RANGE JOIN — the
    standard distributed interval-join technique: explode each session
    into the 1-hour bins it touches (``sequence`` — executor-side, no
    driver loop), EQUI-join on the bin, deduplicate the (session,
    session) candidates that met in several bins, then verify the exact
    overlap predicate. Candidate volume is Σ per-bin-concurrency², i.e.
    driven by true temporal density, not corpus size²; a globally hot
    bin (everyone online at noon) is a skewed join key that AQE's
    skew-split handles, and the bin width is the knob to keep per-bin
    groups bounded (match it to median session length). Sessions come
    from the same island-build as ``events_sessionize`` — one user_id
    exchange — and the final pair aggregation shuffles only surviving
    pairs."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("t_us")
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    runs = ev.withColumn(
        "new_sess",
        F.when(F.col("t_us") - F.lag("t_us").over(w) > SESSION_GAP_US, 1).otherwise(
            0
        ),
    ).withColumn(
        "session_idx",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    s = (
        runs.groupBy("user_id", "session_idx")
        .agg(F.min("t_us").alias("st"), F.max("t_us").alias("en"))
        .localCheckpoint()
    )
    binned = s.select(
        "user_id",
        "session_idx",
        "st",
        "en",
        F.explode(
            F.sequence(
                F.expr(f"st div {OVERLAP_BIN_US}"),
                F.expr(f"en div {OVERLAP_BIN_US}"),
            )
        ).alias("bin"),
    )
    a = binned.select(
        F.col("user_id").alias("user_a"),
        F.col("session_idx").alias("sess_a"),
        F.col("st").alias("st_a"),
        F.col("en").alias("en_a"),
        "bin",
    )
    b = binned.select(
        F.col("user_id").alias("user_b"),
        F.col("session_idx").alias("sess_b"),
        F.col("st").alias("st_b"),
        F.col("en").alias("en_b"),
        "bin",
    )
    pairs = (
        a.join(b, "bin")
        .where(
            (F.col("user_a") < F.col("user_b"))
            & (F.col("st_a") <= F.col("en_b"))
            & (F.col("st_b") <= F.col("en_a"))
        )
        .select(
            "user_a", "sess_a", "user_b", "sess_b", "st_a", "st_b"
        )
        .distinct()
    )
    return (
        pairs.groupBy("user_a", "user_b")
        .agg(
            F.count(F.lit(1)).alias("n_overlaps"),
            F.min(F.greatest("st_a", "st_b")).alias("first_overlap_us"),
        )
        .orderBy("user_a", "user_b")
    )


OVERLAP_HIST_CAP = 10  # histogram buckets: n_overlaps 1..9, 10 = "10+"


@register(
    "sessions_overlap_profile",
    oracle=_OVERLAP_PAIRS_SQL
    + f"""
SELECT LEAST(n_overlaps, {OVERLAP_HIST_CAP}) AS overlap_bucket,
       COUNT(*) AS n_pairs,
       CAST(SUM(n_overlaps) AS BIGINT) AS n_overlaps_total,
       MIN(first_overlap_us) AS min_first_overlap_us
FROM overlap_pairs
GROUP BY LEAST(n_overlaps, {OVERLAP_HIST_CAP})
ORDER BY overlap_bucket
""",
    tags=("behavioral", "interval-join", "overlap", "profile"),
)
def sessions_overlap_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-sized readout of the interval-overlap join (r12 verdict
    #6): the pair-level sessions_overlap_pairs output is INHERENTLY
    quadratic in concurrent-session density (×10 users in a fixed time
    range really do overlap ×100 — 128.3M rows at ×30, uncollectable
    for hash comparison), so this companion reduces the identical pair
    computation to a ≤{OVERLAP_HIST_CAP}-row histogram: pairs bucketed
    by overlap count (capped at {OVERLAP_HIST_CAP} = '10+'), with pair
    counts, total overlap mass, and the earliest co-presence instant
    per bucket. Same binned-range-join plan, same exact verify
    predicate — only the final aggregation differs — which makes the
    pair operator's correctness checkable at scales where its raw
    output is not. All-integer output, bit-reproducible."""
    pairs = sessions_overlap_pairs(spark, sf_dir)
    return (
        pairs.groupBy(
            F.least(F.col("n_overlaps"), F.lit(OVERLAP_HIST_CAP)).alias(
                "overlap_bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("n_overlaps").cast("long").alias("n_overlaps_total"),
            F.min("first_overlap_us").alias("min_first_overlap_us"),
        )
        .orderBy("overlap_bucket")
    )


TRIGRAM_TOP = 25  # most frequent event-type trigrams emitted


@register(
    "events_sequence_trigrams",
    oracle=f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id, event_type FROM events
),
tri AS (
  SELECT user_id, event_type AS e1,
         LEAD(event_type, 1) OVER w AS e2,
         LEAD(event_type, 2) OVER w AS e3
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
)
SELECT e1, e2, e3, COUNT(*) AS n_occurrences,
       COUNT(DISTINCT user_id) AS n_users
FROM tri
WHERE e3 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY n_occurrences DESC, e1, e2, e3
LIMIT {TRIGRAM_TOP}
""",
    tags=("behavioral", "sequence", "ngram"),
)
def events_sequence_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining, n=3: the {TRIGRAM_TOP} most frequent
    event-type trigrams across user timelines (with how many distinct
    users produce each) — the order-sensitive extension of
    ``events_markov_transitions``' bigram matrix, and the raw material
    for next-action models and funnel discovery. Two leads on ONE
    user_id exchange build every trigram in place (no self-joins — the
    classic SQL n-gram formulation needs n-1 self-joins; lead() needs
    none); the aggregation output is bounded by |event_type|³, not by
    corpus size."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    tri = ev.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    return (
        tri.groupBy("e1", "e2", "e3")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_occurrences"), "e1", "e2", "e3")
        .limit(TRIGRAM_TOP)
    )


@register(
    "events_gaps_islands_streaks",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY epoch_us(ts), event_id) AS rn_t
  FROM events
),
islands AS (
  SELECT user_id, event_type, rn - rn_t AS grp, COUNT(*) AS streak_len
  FROM seq GROUP BY user_id, event_type, rn - rn_t
)
SELECT event_type,
       MAX(streak_len) AS max_streak,
       CAST(SUM(CASE WHEN streak_len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_streaks_ge3,
       COUNT(*) AS n_islands
FROM islands
GROUP BY event_type
ORDER BY event_type
""",
    tags=("behavioral", "gaps-islands", "window"),
)
def events_gaps_islands_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive same-type events
    per user (streak detection — the canonical SQL shape for "N in a
    row" features). The island key is the row_number difference trick:
    rn (per user) − rn_t (per user+type) is constant exactly along a
    run of one type, so runs fall out of a plain groupBy with NO
    iterative logic. Both row_numbers and the island aggregation sit
    on the SAME user-keyed exchange (the per-(user,type) window is a
    finer partitioning of it, and Spark plans one sort); ordering is
    the unique (ts, event_id) pair so runs are identical in both
    engines. The final per-type rollup is |event_type|-sized."""
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    wt = Window.partitionBy("user_id", "event_type").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    seq = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(wu).alias("rn"),
        F.row_number().over(wt).alias("rn_t"),
    )
    islands = seq.groupBy(
        "user_id", "event_type", (F.col("rn") - F.col("rn_t")).alias("grp")
    ).agg(F.count(F.lit(1)).alias("streak_len"))
    return (
        islands.groupBy("event_type")
        .agg(
            F.max("streak_len").alias("max_streak"),
            F.sum(F.when(F.col("streak_len") >= 3, 1).otherwise(0))
            .cast("long")
            .alias("n_streaks_ge3"),
            F.count(F.lit(1)).alias("n_islands"),
        )
        .orderBy("event_type")
    )


@register(
    "events_cohort_ltv_curve",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         MIN(epoch_us(ts)) // 604800000000 AS cohort_wk
  FROM events GROUP BY user_id
),
cohort_sizes AS (
  SELECT cohort_wk, COUNT(*) AS n_users FROM firsts GROUP BY cohort_wk
),
rev AS (
  SELECT f.cohort_wk,
         (epoch_us(e.ts) // 604800000000) - f.cohort_wk AS age_wk,
         SUM(CAST(CAST(e.value AS DECIMAL(12,2)) * 100 AS BIGINT))
           AS wk_revenue_cents
  FROM events e JOIN firsts f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT r.cohort_wk, r.age_wk, s.n_users,
       CAST(SUM(r.wk_revenue_cents) OVER (PARTITION BY r.cohort_wk
              ORDER BY r.age_wk) AS BIGINT) AS cum_revenue_cents
FROM rev r JOIN cohort_sizes s ON r.cohort_wk = s.cohort_wk
ORDER BY r.cohort_wk, age_wk
""",
    tags=("behavioral", "cohort", "ltv"),
)
def events_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users grouped by first-seen week,
    cumulative purchase revenue by weeks-since-cohort — the retention
    economics readout next to events_retention_cohort's count version.
    The week key is epoch-µs integer division (a pure bucket index —
    no calendar semantics to disagree on across engines). Plan: one
    user-keyed aggregation for first-touch, the purchase join ships
    only (user, cohort_wk) — user-count-sized, AQE broadcasts it while
    small — and the cumulative window runs over the (cohort, age)
    AGGREGATE (weeks × cohorts rows, not events). Revenue in exact
    integer cents; LongType sums are safe (cents × corpus « 2^63 per
    (cohort, age) cell) and the window then sums ≤hundreds of cells."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        # `div` is exact int64 division (matches DuckDB's `//`); a
        # float divide + floor could round across a week boundary.
        F.expr("min(unix_micros(ts)) div 604800000000")
        .cast("long")
        .alias("cohort_wk")
    )
    cohort_sizes = firsts.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    rev = (
        ev.where(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy(
            "cohort_wk",
            (
                F.expr("unix_micros(ts) div 604800000000").cast("long")
                - F.col("cohort_wk")
            ).alias("age_wk"),
        )
        .agg(
            F.sum((dec("value") * 100).cast("long")).alias("wk_revenue_cents")
        )
    )
    w = Window.partitionBy("cohort_wk").orderBy("age_wk")
    return (
        rev.join(cohort_sizes, "cohort_wk")
        .select(
            "cohort_wk",
            "age_wk",
            "n_users",
            F.sum("wk_revenue_cents").over(w).cast("long").alias(
                "cum_revenue_cents"
            ),
        )
        .orderBy("cohort_wk", "age_wk")
    )


_PRESENCE_US = 300_000_000  # 5-minute presence window per event
_DAY_US = 86_400_000_000


@register(
    "events_peak_concurrency",
    oracle=f"""
WITH iv AS (
  SELECT event_id, epoch_us(ts) AS s_us,
         epoch_us(ts) + {_PRESENCE_US} AS e_us
  FROM events
),
clipped AS (
  SELECT event_id,
         d,
         GREATEST(s_us, d * {_DAY_US}) AS cs,
         LEAST(e_us, (d + 1) * {_DAY_US}) AS ce
  FROM iv, UNNEST(range(s_us // {_DAY_US}, e_us // {_DAY_US} + 1)) AS u(d)
  WHERE GREATEST(s_us, d * {_DAY_US}) < LEAST(e_us, (d + 1) * {_DAY_US})
),
pts AS (
  SELECT d, cs AS t_us, 1 AS delta, event_id FROM clipped
  UNION ALL
  SELECT d, ce AS t_us, -1 AS delta, event_id FROM clipped
),
run AS (
  SELECT d, t_us, delta,
         SUM(delta) OVER (PARTITION BY d
                          ORDER BY t_us, delta, event_id
                          ROWS UNBOUNDED PRECEDING) AS running
  FROM pts
),
pk AS (
  SELECT d, MAX(running) AS peak_concurrent FROM run GROUP BY d
)
SELECT run.d AS day_idx,
       CAST(pk.peak_concurrent AS BIGINT) AS peak_concurrent,
       CAST(MIN(t_us) AS BIGINT) AS first_peak_us
FROM run JOIN pk ON run.d = pk.d AND run.running = pk.peak_concurrent
GROUP BY run.d, pk.peak_concurrent
ORDER BY day_idx
""",
    tags=("behavioral", "intervals", "sweep", "concurrency"),
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per day — the interval-sweep (+1/−1 endpoint
    running sum) that sizes connection pools and capacity plans. Each
    event contributes a 5-minute presence interval; intervals are
    CLIPPED to the days they span (bounded 2-way explode), which is
    what makes the sweep scale: the running sum partitions by DAY
    instead of one global order, and no carry-in is needed because
    clipping restarts every day at zero. Endpoint ordering is the
    deterministic (t, delta, event_id) triple with ends before starts
    at the same instant (adjacent intervals never overlap); everything
    is int64 µs. The peak row joins back day-keyed — same exchange."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "event_id",
        F.unix_micros("ts").alias("s_us"),
        (F.unix_micros("ts") + F.lit(_PRESENCE_US)).alias("e_us"),
    )
    clipped = (
        iv.select(
            "event_id",
            "s_us",
            "e_us",
            F.explode(
                F.sequence(
                    F.expr(f"s_us div {_DAY_US}"), F.expr(f"e_us div {_DAY_US}")
                )
            ).alias("d"),
        )
        .select(
            "event_id",
            "d",
            F.greatest(F.col("s_us"), F.col("d") * _DAY_US).alias("cs"),
            F.least(F.col("e_us"), (F.col("d") + 1) * _DAY_US).alias("ce"),
        )
        .where(F.col("cs") < F.col("ce"))
    )
    pts = clipped.select(
        "d", F.col("cs").alias("t_us"), F.lit(1).alias("delta"), "event_id"
    ).unionAll(
        clipped.select(
            "d", F.col("ce").alias("t_us"), F.lit(-1).alias("delta"), "event_id"
        )
    )
    w = (
        Window.partitionBy("d")
        .orderBy("t_us", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select(
        "d", "t_us", F.sum("delta").over(w).alias("running")
    )
    pk = run.groupBy(F.col("d").alias("pd")).agg(
        F.max("running").alias("peak_concurrent")
    )
    return (
        run.join(
            pk,
            (F.col("d") == F.col("pd"))
            & (F.col("running") == F.col("peak_concurrent")),
        )
        .groupBy(F.col("d").alias("day_idx"), "peak_concurrent")
        .agg(F.min("t_us").cast("long").alias("first_peak_us"))
        .orderBy("day_idx")
    )


@register(
    "orders_cohort_repeat_rate",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey,
         MIN(epoch_us(o_orderdate) // 2592000000000) AS cohort_mo,
         COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT cohort_mo,
       COUNT(*) AS n_customers,
       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat,
       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS repeat_rate
FROM per_cust
GROUP BY cohort_mo
ORDER BY cohort_mo
""",
    tags=("behavioral", "cohort", "retention"),
)
def orders_cohort_repeat_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase rate by acquisition cohort — the one-number
    retention readout next to the LTV curve: of customers whose FIRST
    order fell in 30-day bucket m, what share ever ordered again.
    Cohort is integer epoch-µs division (30-day buckets, no calendar
    drift); one customer-keyed aggregation produces both the cohort
    and the order count, then a bucket-count-sized rollup. The rate
    divides two exact integers."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.expr(
            "min(unix_micros(cast(o_orderdate as timestamp))"
            " div 2592000000000)"
        ).alias("cohort_mo"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    rep = F.when(F.col("n_orders") >= 2, 1).otherwise(0)
    return (
        per_cust.groupBy("cohort_mo")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(rep).cast("long").alias("n_repeat"),
            (F.sum(rep).cast("double") / F.count(F.lit(1))).alias(
                "repeat_rate"
            ),
        )
        .orderBy("cohort_mo")
    )


_US_DAY_KM = 86_400_000_000


@register(
    "events_survival_risk_table",
    oracle=f"""
WITH u AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events
),
r AS (
  SELECT user_id, us,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY us, event_id) AS rn
  FROM u
),
f AS (
  SELECT user_id,
         MAX(CASE WHEN rn = 1 THEN us END) AS t1,
         MAX(CASE WHEN rn = 2 THEN us END) AS t2
  FROM r WHERE rn <= 2 GROUP BY user_id
),
b AS (SELECT MAX(us) AS tend FROM u),
subj AS (
  SELECT user_id,
         CASE WHEN t2 IS NOT NULL
              THEN (t2 - t1) // {_US_DAY_KM}
              ELSE (tend - t1) // {_US_DAY_KM} END AS day,
         CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM f CROSS JOIN b
),
d AS (
  SELECT day, CAST(SUM(ev) AS BIGINT) AS n_deaths,
         CAST(SUM(1 - ev) AS BIGINT) AS n_censored,
         COUNT(*) AS n_total
  FROM subj GROUP BY day
)
SELECT day,
       CAST(SUM(n_total) OVER (ORDER BY day DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_at_risk,
       n_deaths, n_censored
FROM d
ORDER BY day
""",
    tags=("events", "survival", "kaplan-meier"),
)
def events_survival_risk_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier RISK TABLE for time-to-second-event — the survival
    analysis behind every retention/churn curve, reduced to its exact
    integer sufficient statistics: per day-since-first-event, the
    number at risk, observed "deaths" (second event occurred that day)
    and right-censored subjects (users with one event, censored at
    corpus end). The KM product-limit estimate Π(1 - d/n) is a
    sequential float product (order-dependent — the survival twin of
    the perplexity trap), so the engine emits the risk table and
    leaves the product to the consumer: every column here is exact and
    engine-independent.

    Plan: one user-keyed window picks each user's first two events
    (the per-user shuffle all behavioral ops share), corpus end is a
    1-row broadcast, and the risk table is a reverse running sum over
    the DAY table (bounded by the observation span, ~tens of rows —
    the single-partition window is over that bounded table, never the
    corpus)."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    f = (
        u.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("us"))).alias("t1"),
            F.max(F.when(F.col("rn") == 2, F.col("us"))).alias("t2"),
        )
    )
    tend = u.agg(F.max("us").alias("tend"))
    subj = f.crossJoin(F.broadcast(tend)).select(
        F.when(
            F.col("t2").isNotNull(),
            (F.col("t2") - F.col("t1")),
        )
        .otherwise(F.col("tend") - F.col("t1"))
        .alias("dur_us"),
        F.when(F.col("t2").isNotNull(), 1).otherwise(0).alias("ev"),
    ).select(
        F.expr(f"dur_us div {_US_DAY_KM}").alias("day"), "ev"
    )
    d = subj.groupBy("day").agg(
        F.sum("ev").cast("long").alias("n_deaths"),
        F.sum(1 - F.col("ev")).cast("long").alias("n_censored"),
        F.count(F.lit(1)).alias("n_total"),
    )
    w_rev = Window.orderBy(F.desc("day")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        d.withColumn("n_at_risk", F.sum("n_total").over(w_rev).cast("long"))
        .select("day", "n_at_risk", "n_deaths", "n_censored")
        .orderBy("day")
    )


@register(
    "events_pareto_concentration",
    oracle="""
WITH per_user AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT n,
         CAST(ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS BIGINT) AS rk,
         CAST(SUM(n) OVER (ORDER BY n DESC, user_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum
  FROM per_user
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS total_events,
         CAST(COUNT(*) AS BIGINT) AS total_users
  FROM per_user
),
pcts AS (SELECT CAST(p AS BIGINT) AS pct FROM (VALUES (50), (80), (90)) t(p)),
crossing AS (
  SELECT pcts.pct, r.rk, r.cum, tot.total_events, tot.total_users,
         ROW_NUMBER() OVER (PARTITION BY pcts.pct ORDER BY r.rk) AS hit
  FROM ranked r CROSS JOIN tot JOIN pcts
    ON 100 * r.cum >= pcts.pct * tot.total_events
)
SELECT pct, rk AS n_users, cum AS cum_events, total_events, total_users
FROM crossing WHERE hit = 1
ORDER BY pct
""",
    tags=("behavioral", "pareto", "concentration", "skew"),
)
def events_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration curve readout: the smallest number of users
    whose events cover 50% / 80% / 90% of all traffic — the one-table
    answer to "how head-heavy is this workload", which is also the
    input to every skew decision in this repo (salting thresholds,
    AQE skew-join expectations). The crossing rank is decided entirely
    in exact integers (100·cum ≥ pct·total — no float shares), ties on
    equal activity pinned by user_id, so the readout is
    bit-reproducible at any parallelism.

    Scale: one map-combined groupBy compresses the event stream to the
    user domain; the global prefix sum over that domain runs SHARDED
    (``functions/prefix.sharded_prefix_sum`` — r10 verdict item 5's
    executable version of the count-bucket recipe): shard key =
    (-n, user_id div 4096), monotone in the global (n DESC, user_id)
    order, so the local windows parallelize across count buckets AND
    across user sub-ranges inside a crowded count, and the only global
    window runs over shard totals, never the user domain. The three
    threshold probes ride a 3-row broadcast join, and the min-crossing
    per threshold is a min/min_by AGGREGATE over the candidates
    (map-side combined, 3 output groups) — the crossing set for pct=50
    is roughly half the user domain, so a per-pct ranking window would
    be a skewed single-partition sort; the aggregate reduces it
    without ever sorting it."""
    from boltzmannclean_spark.functions.prefix import sharded_prefix_sum

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    sharded = per_user.withColumn(
        "__shard",
        F.struct(
            (F.col("n") * -1).alias("s1"),
            F.expr("user_id div 4096").alias("s2"),
        ),
    )
    ranked = sharded_prefix_sum(
        sharded,
        shard_col="__shard",
        order=[F.desc("n"), "user_id"],
        value="n",
        cum_col="cum",
        rank_col="rk",
    ).select("n", "rk", "cum")
    tot = per_user.agg(
        F.sum("n").cast("long").alias("total_events"),
        F.count(F.lit(1)).cast("long").alias("total_users"),
    )
    pcts = F.array(*[F.lit(p).cast("long") for p in (50, 80, 90)])
    crossing = (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "rk", "cum", "total_events", "total_users", F.explode(pcts).alias("pct")
        )
        .where(100 * F.col("cum") >= F.col("pct") * F.col("total_events"))
    )
    best = crossing.groupBy("pct").agg(
        F.min("rk").cast("long").alias("n_users"),
        F.min_by("cum", "rk").cast("long").alias("cum_events"),
        F.max("total_events").cast("long").alias("total_events"),
        F.max("total_users").cast("long").alias("total_users"),
    )
    return best.select(
        "pct", "n_users", "cum_events", "total_events", "total_users"
    ).orderBy("pct")


@register(
    "events_lorenz_gini",
    oracle="""
WITH per_user AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, user_id
),
ranked AS (
  SELECT event_type, n,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY n, user_id) AS BIGINT) AS rk
  FROM per_user
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n) AS BIGINT) AS total_events,
       CAST(2 * SUM(rk * n) - (COUNT(*) + 1) * SUM(n) AS BIGINT)
         AS gini_num,
       CAST(2 * SUM(rk * n) - (COUNT(*) + 1) * SUM(n) AS BIGINT)
         / (CAST(COUNT(*) AS BIGINT) * CAST(SUM(n) AS BIGINT)) AS gini
FROM ranked
GROUP BY event_type
ORDER BY event_type
""",
    tags=("behavioral", "gini", "lorenz", "concentration", "skew"),
)
def events_lorenz_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user activity, per event arm — the
    scalar companion to events_pareto_concentration's crossing-point
    readout (Pareto answers "how many users cover 80%", Gini compresses
    the whole Lorenz curve into one comparable inequality number —
    trendable across days, comparable across arms). Computed by the
    rank identity G = (2·Σ(rank·n) − (N+1)·Σn) / (N·Σn) with ranks
    ascending by activity (ties pinned by user_id): every term is an
    exact bigint — gini_num is emitted as the exact integer numerator,
    and the display coefficient is ONE correctly-rounded IEEE division
    of exact integers, bit-equal in both engines.

    Width: Σ(rank·n) ≤ N·Σn; at 1e7 users × 1e9 events that is 1e16 —
    inside int64 with ×900 headroom; the rank identity never needs the
    O(N²) pairwise |n_i − n_j| form.

    Scale: one map-combined groupBy compresses the event stream to the
    (arm, user) domain; ONE arm-partitioned ranking window over that
    domain-sized table — at an unbounded per-arm user domain, route
    the rank through ``functions/prefix.sharded_prefix_sum`` with an
    (arm-composed) shard key exactly as events_pareto_concentration
    now does (the recipe is code, not prose) — then a map-combined
    per-arm aggregate."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ranked = per_user.select(
        "event_type",
        "n",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("n", "user_id"))
        .cast("long")
        .alias("rk"),
    )
    g_num = (
        2 * F.sum(F.col("rk") * F.col("n"))
        - (F.count(F.lit(1)) + 1) * F.sum("n")
    ).cast("long")
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("n").cast("long").alias("total_events"),
            g_num.alias("gini_num"),
            (
                g_num
                / (
                    F.count(F.lit(1)).cast("long")
                    * F.sum("n").cast("long")
                )
            ).alias("gini"),
        )
        .orderBy("event_type")
    )


@register(
    "events_interarrival_burstiness",
    oracle="""
WITH seq AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS gap
  FROM events
),
per_user AS (
  SELECT user_id,
         CAST(COUNT(gap) AS BIGINT) AS n_gaps,
         CAST(CAST(SUM(gap) AS VARCHAR) AS DOUBLE) AS s1,
         CAST(CAST(SUM(CAST(gap AS HUGEINT) * gap) AS VARCHAR) AS DOUBLE)
           AS s2
  FROM seq WHERE gap IS NOT NULL
  GROUP BY user_id
  HAVING COUNT(gap) >= 2
),
scored AS (
  SELECT user_id, n_gaps, s1 / n_gaps AS mean_gap_us,
         (SQRT(s2 / n_gaps - (s1 / n_gaps) * (s1 / n_gaps))
            - s1 / n_gaps)
         / (SQRT(s2 / n_gaps - (s1 / n_gaps) * (s1 / n_gaps))
            + s1 / n_gaps) AS burstiness
  FROM per_user
)
SELECT user_id, n_gaps, mean_gap_us, burstiness
FROM scored
ORDER BY n_gaps DESC, user_id
LIMIT 20
""",
    tags=("behavioral", "burstiness", "interarrival", "bot-detection"),
)
def events_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabási burstiness B = (σ−μ)/(σ+μ) of each user's
    inter-event gaps — the standard temporal-signature score behind
    bot/automation detection in training-data curation: B → −1 is a
    metronome (scripted traffic), B ≈ 0 Poisson (organic), B → +1
    heavy-tailed human sessions. Gaps are exact integer microseconds
    over the unique (ts, event_id) order (the gaps-islands tie
    discipline); per-user Σgap telescopes to the user's time span
    (bigint) and Σgap² accumulates in HUGEINT/DECIMAL(38,0) — both
    string-hop to double, so mean, population σ (one correctly-rounded
    SQRT), and B are a single fixed IEEE tree per user, bit-equal
    across engines with no float aggregation. Users with <2 gaps carry
    no signal and are dropped.

    Scale: the lag window and the per-user aggregation share ONE
    user-keyed exchange (the window's sort feeds the partial agg);
    output is top-20 by activity via orderBy+limit, which Spark plans
    as TakeOrderedAndProject — per-partition heaps + a 20-row driver
    merge, never a global sort."""
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    seq = ev.select(
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wu)).alias(
            "gap"
        ),
    ).where(F.col("gap").isNotNull())
    per_user = (
        seq.groupBy("user_id")
        .agg(
            F.count("gap").cast("long").alias("n_gaps"),
            F.expr("CAST(CAST(SUM(gap) AS STRING) AS DOUBLE)").alias("s1"),
            F.expr(
                "CAST(CAST(SUM(CAST(gap AS DECIMAL(38,0)) * gap)"
                " AS STRING) AS DOUBLE)"
            ).alias("s2"),
        )
        .where(F.col("n_gaps") >= 2)
    )
    sd = F.sqrt(
        F.col("s2") / F.col("n_gaps")
        - (F.col("s1") / F.col("n_gaps")) * (F.col("s1") / F.col("n_gaps"))
    )
    mean = F.col("s1") / F.col("n_gaps")
    return (
        per_user.select(
            "user_id",
            "n_gaps",
            mean.alias("mean_gap_us"),
            ((sd - mean) / (sd + mean)).alias("burstiness"),
        )
        .orderBy(F.desc("n_gaps"), "user_id")
        .limit(20)
    )


@register(
    "events_markov_eval",
    oracle="""
WITH bounds AS (
  SELECT (CAST(MIN(epoch_us(ts)) AS BIGINT)
          + CAST(MAX(epoch_us(ts)) AS BIGINT)) // 2 AS mid
  FROM events
),
seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS t_us,
         LEAD(event_type) OVER w AS next_type,
         LEAD(epoch_us(ts)) OVER w AS next_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
pairs AS (
  SELECT s.event_type AS prev_type, s.next_type,
         CASE WHEN s.next_us <= b.mid THEN 0
              WHEN s.t_us > b.mid THEN 1 END AS half
  FROM seq s CROSS JOIN bounds b
  WHERE s.next_type IS NOT NULL
    AND (s.next_us <= b.mid OR s.t_us > b.mid)
),
train AS (
  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM pairs WHERE half = 0 GROUP BY prev_type, next_type
),
model AS (
  SELECT prev_type, next_type AS predicted_next FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY prev_type
                                 ORDER BY c DESC, next_type) AS rk
    FROM train
  ) t WHERE rk = 1
),
test_ AS (
  SELECT prev_type, next_type FROM pairs WHERE half = 1
)
SELECT t.prev_type,
       COALESCE(m.predicted_next, 'none') AS predicted_next,
       CAST(COUNT(*) AS BIGINT) AS n_test_pairs,
       CAST(SUM(CASE WHEN t.next_type = m.predicted_next
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST(SUM(CASE WHEN t.next_type = m.predicted_next
                     THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS accuracy
FROM test_ t LEFT JOIN model m ON m.prev_type = t.prev_type
GROUP BY t.prev_type, m.predicted_next
ORDER BY t.prev_type
""",
    tags=("behavioral", "markov", "train-eval", "model-lifecycle"),
)
def events_markov_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/evaluate lifecycle for the first-order Markov next-event
    model: fit transition counts on the first time half, predict each
    prev-type's argmax next event, score top-1 accuracy on the second
    half — the temporal-holdout eval events_markov_transitions (the
    descriptive matrix) deliberately omits, and the baseline every
    sequence model must beat before it ships. The split is the PSI
    midpoint convention; a pair belongs to a half only if BOTH its
    events do (straddling pairs dropped — no train/test leakage
    through the boundary). The argmax is deterministic (count desc,
    then type — the mode_deterministic tiebreak); counts, hits, and
    the accuracy division are exact. Unseen prev-types surface as
    'none' (never NULL — the comparator contract).

    Scale: one user-keyed window builds pairs (shared with every
    sessionize-family exchange); train counts and the model are
    |types|²-sized; the eval is a broadcast join of the model onto
    the test pairs. Scan-bound at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    mid = ev.agg(
        F.expr(
            "(CAST(MIN(unix_micros(ts)) AS BIGINT)"
            " + CAST(MAX(unix_micros(ts)) AS BIGINT)) div 2"
        ).alias("mid")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    seq = ev.select(
        F.col("event_type").alias("prev_type"),
        F.unix_micros("ts").alias("t_us"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    ).where(F.col("next_type").isNotNull())
    pairs = (
        seq.crossJoin(F.broadcast(mid))
        .where((F.col("next_us") <= F.col("mid")) | (F.col("t_us") > F.col("mid")))
        .select(
            "prev_type",
            "next_type",
            F.when(F.col("next_us") <= F.col("mid"), 0)
            .otherwise(1)
            .alias("half"),
        )
    )
    train = (
        pairs.where(F.col("half") == 0)
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wrk = Window.partitionBy("prev_type").orderBy(
        F.desc("c"), "next_type"
    )
    model = (
        train.withColumn("rk", F.row_number().over(wrk))
        .where(F.col("rk") == 1)
        .select("prev_type", F.col("next_type").alias("predicted_next"))
    )
    test_ = pairs.where(F.col("half") == 1).select("prev_type", "next_type")
    hit = F.when(
        F.col("next_type") == F.col("predicted_next"), 1
    ).otherwise(0)
    return (
        test_.join(F.broadcast(model), "prev_type", "left")
        .groupBy(
            "prev_type",
            F.coalesce(F.col("predicted_next"), F.lit("none")).alias(
                "predicted_next"
            ),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test_pairs"),
            F.sum(hit).cast("long").alias("n_correct"),
            (
                F.sum(hit).cast("double") / F.count(F.lit(1))
            ).alias("accuracy"),
        )
        .orderBy("prev_type")
    )
