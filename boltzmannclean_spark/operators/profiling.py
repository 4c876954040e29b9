"""Data-profiling / data-quality operators: per-column table profiling
(the `DESCRIBE`-on-steroids every warehouse exposes) and statistical
outlier detection over the events stream.

Scale design: both are single-pass aggregations. The profiler computes
every column's stats in ONE scan (count/null-count/distinct/min/max as
parallel aggregate expressions, then a stack() pivot of the 1-row
result); the z-score pass is a groupBy on user_id plus a same-key join
back — two exchanges on the same key, which AQE plans as one shuffle
reused by both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from boltzmannclean_spark.functions.exact import dec
from boltzmannclean_spark.plans.registry import register
from boltzmannclean_spark.sources.catalog import load_table

# (column, min/max rendering) — money is rendered through DECIMAL(14,2)
# so both engines print '857.71', not a shortest-double representation.
_PROFILE_COLS = (
    ("o_orderkey", "BIGINT"),
    ("o_custkey", "BIGINT"),
    ("o_orderstatus", None),
    ("o_totalprice", "DECIMAL(14,2)"),
    ("o_orderdate", None),
    ("o_orderpriority", None),
)


def _render(col: str, typ: str | None) -> str:
    return f"CAST(CAST({col} AS {typ}) AS STRING)" if typ else f"CAST({col} AS STRING)"


def _render_duck(col: str, typ: str | None) -> str:
    return (
        f"CAST(CAST({col} AS {typ}) AS VARCHAR)" if typ else f"CAST({col} AS VARCHAR)"
    )


@register(
    "agg_profile_columns",
    oracle="\nUNION ALL\n".join(
        f"""
SELECT '{c}' AS column_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       {_render_duck(f"MIN({c})", t)} AS min_value,
       {_render_duck(f"MAX({c})", t)} AS max_value
FROM orders"""
        for c, t in _PROFILE_COLS
    )
    + "\nORDER BY column_name",
    tags=("profiling", "aggregate"),
)
def agg_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan table profiler: row count, null count, exact distinct
    count, and min/max (string-rendered) for every column of `orders`,
    one output row per column. All 6×4 aggregates evaluate in one
    partial+final aggregation over one scan — the oracle's UNION ALL of
    per-column scans is the semantic twin but 6 scans; at 100 TB the
    one-pass shape is the only affordable one."""
    orders = load_table(spark, sf_dir, "orders")
    # r15: the distinct counts no longer ride the same aggregation as
    # min/max. Six COUNT(DISTINCT c) in one agg forced the Expand path
    # (7x the scan) and the string-buffered MIN/MAX pushed the whole
    # aggregation onto SortAggregate — a full SORT of the expanded scan
    # (measured 3.3 s warm at sf0.1; plan: Expand -> Sort ->
    # SortAggregate x3). Split: (a) counts/nulls/min/max in one
    # no-grouping pass (SortAggregate without grouping keys needs no
    # sort); (b) distinct counts over an unpivoted (column, rendered
    # value) frame through two hash aggregations — the shuffle carries
    # each column's distinct DOMAIN, exactly what the Expand path
    # shuffled, without the 7x sort. Rendering is injective per column
    # (BIGINT/DECIMAL(14,2)/DATE/string — no double columns, so no
    # -0.0/NaN collapse), so COUNT(DISTINCT rendered) ==
    # COUNT(DISTINCT native); all-NULL columns come back via the left
    # join as an exact 0. Measured 0.58 s warm; rows bit-identical.
    aggs = []
    for c, t in _PROFILE_COLS:
        aggs += [
            F.expr(f"COUNT(*)").alias(f"{c}__rows"),
            F.expr(f"COUNT(*) - COUNT({c})").alias(f"{c}__nulls"),
            F.expr(_render(f"MIN({c})", t)).alias(f"{c}__min"),
            F.expr(_render(f"MAX({c})", t)).alias(f"{c}__max"),
        ]
    one = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__min, {c}__max"
        for c, _ in _PROFILE_COLS
    )
    base = one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_rows, n_nulls, min_value, max_value)"
    )
    vals = ", ".join(f"'{c}', {_render(c, t)}" for c, t in _PROFILE_COLS)
    dv = orders.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {vals}) AS (column_name, v)"
    )
    dcnt = (
        dv.where(F.col("v").isNotNull())
        .groupBy("column_name", "v")
        .agg(F.lit(1))
        .groupBy("column_name")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    return (
        base.join(F.broadcast(dcnt), "column_name", "left")
        .select(
            "column_name",
            "n_rows",
            "n_nulls",
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
            "min_value",
            "max_value",
        )
        .orderBy("column_name")
    )


@register(
    "events_zscore_outliers",
    oracle="""
WITH stats AS (
  SELECT user_id, COUNT(*) AS n,
         CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS ss
  FROM events GROUP BY user_id
),
m AS (
  SELECT user_id, n, s / n AS mean, ss / n - (s / n) * (s / n) AS var
  FROM stats WHERE n >= 10
)
SELECT e.user_id, e.event_id, e.value,
       (e.value - m.mean) / sqrt(m.var) AS zscore
FROM events e JOIN m ON e.user_id = m.user_id
WHERE m.var > 0 AND abs((e.value - m.mean) / sqrt(m.var)) > 2.5
ORDER BY e.user_id, e.event_id
""",
    tags=("profiling", "outliers", "zscore"),
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score outlier detection: population moments from
    EXACT decimal power sums (order-free), then a deterministic scalar
    formula per row — both engines difference bit-identical doubles, so
    even the |z| > 2.5 cut needs no tolerance. The moments groupBy and
    the events join share the user_id key: one shuffle feeds both."""
    ev = load_table(spark, sf_dir, "events")
    v = dec("value")
    stats = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v).cast("double").alias("s"),
            F.sum(v * v).cast("double").alias("ss"),
        )
        .where(F.col("n") >= 10)
        .select(
            "user_id",
            (F.col("s") / F.col("n")).alias("mean"),
            (
                F.col("ss") / F.col("n")
                - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n"))
            ).alias("var"),
        )
    )
    z = (F.col("value") - F.col("mean")) / F.sqrt(F.col("var"))
    return (
        ev.join(stats, "user_id")
        .where((F.col("var") > 0) & (F.abs(z) > 2.5))
        .select("user_id", "event_id", "value", z.alias("zscore"))
        .orderBy("user_id", "event_id")
    )


@register(
    "stats_chi_square",
    oracle="""
WITH obs AS (
  SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY lang, source
),
rows_ AS (SELECT lang, SUM(o) AS r FROM obs GROUP BY lang),
cols_ AS (SELECT source, SUM(o) AS c FROM obs GROUP BY source),
tot AS (SELECT SUM(o) AS n FROM obs),
cells AS (
  SELECT obs.lang, obs.source, obs.o,
         CAST(rows_.r * cols_.c AS DOUBLE) / tot.n AS expected
  FROM obs JOIN rows_ USING (lang) JOIN cols_ USING (source) CROSS JOIN tot
)
SELECT lang, source, CAST(o AS BIGINT) AS observed, expected,
       (o - expected) * (o - expected) / expected AS contrib,
       CAST(SUM((o - expected) * (o - expected) / expected) OVER () AS FLOAT)
         AS chi2_total
FROM cells
ORDER BY lang, source
""",
    tags=("profiling", "statistics", "chi-square"),
)
def stats_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test on the lang × source contingency
    table — the drift/bias check for corpus composition. Counts and
    marginals are exact integers; expected = r·c/n and each cell's
    contribution evaluate per row from identical doubles, and only the
    cross-cell total (a merge-order-sensitive sum) is FLOAT-truncated.
    One groupBy of the corpus, then marginal joins over the tiny cell
    table."""
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rows_ = obs.groupBy("lang").agg(F.sum("o").alias("r"))
    cols_ = obs.groupBy("source").agg(F.sum("o").alias("c"))
    tot = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(rows_, "lang")
        .join(cols_, "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "o",
            ((F.col("r") * F.col("c")).cast("double") / F.col("n")).alias(
                "expected"
            ),
        )
    )
    contrib = (F.col("o") - F.col("expected")) * (
        F.col("o") - F.col("expected")
    ) / F.col("expected")
    return (
        cells.select(
            "lang",
            "source",
            F.col("o").alias("observed"),
            "expected",
            contrib.alias("contrib"),
        )
        .withColumn(
            "chi2_total",
            F.sum("contrib").over(Window.partitionBy()).cast("float"),
        )
        .orderBy("lang", "source")
    )


@register(
    "agg_entropy",
    oracle="""
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type
),
t AS (SELECT user_id, SUM(n) AS total FROM c GROUP BY user_id)
SELECT c.user_id,
       CAST(t.total AS BIGINT) AS n_events,
       COUNT(*) AS n_types,
       CAST(-SUM((CAST(c.n AS DOUBLE) / t.total)
                 * ln(CAST(c.n AS DOUBLE) / t.total)) AS FLOAT) AS entropy
FROM c JOIN t USING (user_id)
GROUP BY c.user_id, t.total
ORDER BY c.user_id
""",
    tags=("profiling", "statistics", "entropy"),
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix — the diversity /
    bot-detection signal (entropy ≈ 0 → single-action automation).
    Probabilities divide exact counts; the Σ p·ln p aggregate is the
    one merge-order-sensitive step, so it is FLOAT-truncated (the
    proven transcendental recipe). Two same-key aggregations ride one
    user_id shuffle."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("user_id").agg(F.sum("n").alias("total"))
    p = F.col("n").cast("double") / F.col("total")
    return (
        c.join(t, "user_id")
        .groupBy("user_id", "total")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            (-F.sum(p * F.log(p))).cast("float").alias("entropy"),
        )
        .select(
            "user_id",
            F.col("total").alias("n_events"),
            "n_types",
            "entropy",
        )
        .orderBy("user_id")
    )


@register(
    "events_anomaly_iqr",
    oracle="""
WITH q AS (
  SELECT event_type,
         quantile_disc(value, 0.25) AS q1,
         quantile_disc(value, 0.75) AS q3
  FROM events GROUP BY event_type
),
b AS (
  SELECT event_type, q1, q3,
         q1 - 1.5 * (q3 - q1) AS lo,
         q3 + 1.5 * (q3 - q1) AS hi
  FROM q
)
SELECT e.event_type, e.event_id, e.value, b.lo, b.hi
FROM events e JOIN b ON e.event_type = b.event_type
WHERE e.value < b.lo OR e.value > b.hi
ORDER BY e.event_type, e.event_id
""",
    tags=("profiling", "outliers", "iqr"),
)
def events_anomaly_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence (IQR) outlier detection per event type — the ROBUST
    twin of the z-score pass (quartiles ignore the very outliers that
    inflate a standard deviation). percentile_disc returns actual data
    elements, so the fences derive from bit-identical doubles in both
    engines and the cut is tolerance-free. Tiny per-type fence table
    broadcasts back over the stream."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)").alias("q1"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)").alias("q3"),
    )
    b = q.select(
        "event_type",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    return (
        ev.join(F.broadcast(b), "event_type")
        .where((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")))
        .select("event_type", "event_id", "value", "lo", "hi")
        .orderBy("event_type", "event_id")
    )


@register(
    "events_mad_outliers",
    oracle="""
WITH c AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM events
),
med AS (
  SELECT event_type, quantile_disc(cents, 0.5) AS med FROM c GROUP BY 1
),
dev AS (
  SELECT c.event_type, c.cents, ABS(c.cents - med.med) AS ad, med.med
  FROM c JOIN med ON c.event_type = med.event_type
),
mad AS (
  SELECT event_type, quantile_disc(ad, 0.5) AS mad FROM dev GROUP BY 1
)
SELECT dev.event_type,
       COUNT(*) AS n,
       CAST(ANY_VALUE(dev.med) AS BIGINT) AS median_cents,
       CAST(ANY_VALUE(mad.mad) AS BIGINT) AS mad_cents,
       COUNT(*) FILTER (dev.ad > 3 * mad.mad) AS n_outliers
FROM dev JOIN mad ON dev.event_type = mad.event_type
GROUP BY dev.event_type
ORDER BY dev.event_type
""",
    tags=("profiling", "outliers", "robust", "mad"),
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by MEDIAN ABSOLUTE DEVIATION — the
    estimator that survives what breaks z-scores (events_zscore uses
    moments, which the outliers themselves inflate; median/MAD have a
    50% breakdown point). Values in exact integer cents; medians via
    percentile_disc (an actual data element, so cross-engine exact,
    matching DuckDB quantile_disc); the outlier test |x−med| > 3·MAD is
    an integer comparison — no division, no floats anywhere. Three
    small aggregations on event_type with the per-type medians
    broadcast back; everything shuffles a handful of rows."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_type", (dec("value") * 100).cast("long").alias("cents")
    )
    med = c.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)")
        .cast("long")
        .alias("med")
    )
    dev = c.join(F.broadcast(med), "event_type").select(
        "event_type",
        "cents",
        "med",
        F.abs(F.col("cents") - F.col("med")).alias("ad"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY ad)")
        .cast("long")
        .alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.any_value("med").alias("median_cents"),
            F.any_value("mad").alias("mad_cents"),
            F.count_if(F.col("ad") > 3 * F.col("mad")).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@register(
    "dq_referential_integrity",
    oracle="""
SELECT 'orders.o_custkey->customer' AS relation,
       (SELECT COUNT(*) FROM orders) AS n_rows,
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS n_orphans
UNION ALL
SELECT 'lineitem.l_orderkey->orders',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'lineitem.l_partkey->part',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p
                          WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'lineitem.l_suppkey->supplier',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM supplier s
                          WHERE s.s_suppkey = l.l_suppkey))
UNION ALL
SELECT 'customer.c_nationkey->nation',
       (SELECT COUNT(*) FROM customer),
       (SELECT COUNT(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n
                          WHERE n.n_nationkey = c.c_nationkey))
UNION ALL
SELECT 'supplier.s_nationkey->nation',
       (SELECT COUNT(*) FROM supplier),
       (SELECT COUNT(*) FROM supplier s
        WHERE NOT EXISTS (SELECT 1 FROM nation n
                          WHERE n.n_nationkey = s.s_nationkey))
UNION ALL
SELECT 'nation.n_regionkey->region',
       (SELECT COUNT(*) FROM nation),
       (SELECT COUNT(*) FROM nation n
        WHERE NOT EXISTS (SELECT 1 FROM region r
                          WHERE r.r_regionkey = n.n_regionkey))
ORDER BY relation
""",
    tags=("profiling", "quality", "integrity"),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key integrity audit across the whole schema: for each of
    the 7 FK relations, total child rows and orphan rows (child keys
    with no parent) — the first data-quality gate before any pipeline
    trusts its joins. Each orphan count is a LEFT ANTI join; every
    parent side is a dimension (customer/part/supplier/nation/region)
    or a key-projected fact, so AQE broadcasts the small side and the
    fact tables are scanned with only their key column (column pruning
    — the scan reads one int64 column of the 100 TB table, and the
    orders-parent side for lineitem is a key projection that
    deduplicates before the join). The 7 one-row results union into a
    fixed 7-row report."""
    child_parent = [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]
    reports = []
    for child, fk, parent, pk in child_parent:
        c = load_table(spark, sf_dir, child).select(fk)
        p = load_table(spark, sf_dir, parent).select(pk).distinct()
        n_rows = c.agg(F.count(F.lit(1)).alias("n_rows"))
        orphans = c.join(p, c[fk] == p[pk], "left_anti").agg(
            F.count(F.lit(1)).alias("n_orphans")
        )
        reports.append(
            n_rows.crossJoin(F.broadcast(orphans)).select(
                F.lit(f"{child}.{fk}->{parent}").alias("relation"),
                "n_rows",
                "n_orphans",
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    return out.orderBy("relation")


@register(
    "dq_constraint_violations",
    oracle="""
SELECT 'lineitem.quantity_positive' AS check_name,
       (SELECT COUNT(*) FROM lineitem) AS n_rows,
       (SELECT COUNT(*) FROM lineitem WHERE NOT (l_quantity > 0)
          OR l_quantity IS NULL) AS n_violations
UNION ALL
SELECT 'lineitem.discount_unit_range',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem
        WHERE NOT (l_discount BETWEEN 0 AND 1) OR l_discount IS NULL)
UNION ALL
SELECT 'lineitem.price_nonnegative',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem
        WHERE NOT (l_extendedprice >= 0) OR l_extendedprice IS NULL)
UNION ALL
SELECT 'orders.totalprice_positive',
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM orders
        WHERE NOT (o_totalprice > 0) OR o_totalprice IS NULL)
UNION ALL
SELECT 'orders.status_domain',
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM orders
        WHERE o_orderstatus NOT IN ('F', 'O', 'P') OR o_orderstatus IS NULL)
UNION ALL
SELECT 'events.ts_not_null',
       (SELECT COUNT(*) FROM events),
       (SELECT COUNT(*) FROM events WHERE ts IS NULL)
UNION ALL
SELECT 'documents.n_chars_matches_text',
       (SELECT COUNT(*) FROM documents),
       (SELECT COUNT(*) FROM documents
        WHERE n_chars IS DISTINCT FROM LEN(text))
ORDER BY check_name
""",
    tags=("profiling", "quality", "constraints"),
)
def dq_constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative CHECK-constraint audit: per named rule, total rows
    and violating rows (NULL counts as a violation for NOT-NULL-style
    rules, mirroring SQL CHECK semantics where NULL fails a required
    predicate audit). Each table contributes ONE full scan producing
    all of its rule counts via conditional aggregation — at 100 TB this
    is 4 column-pruned scans total, no joins, no shuffle beyond the
    final 1-row partials; the fixed 7-row report then unions. The
    cross-field rule (n_chars == length(text)) is the shape that
    catches silent upstream re-encoding."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")

    def viol(pred):
        return F.sum(F.when(pred, 1).otherwise(0))

    li_agg = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        viol(~(F.col("l_quantity") > 0) | F.col("l_quantity").isNull()).alias(
            "v_qty"
        ),
        viol(
            ~F.col("l_discount").between(0, 1) | F.col("l_discount").isNull()
        ).alias("v_disc"),
        viol(
            ~(F.col("l_extendedprice") >= 0)
            | F.col("l_extendedprice").isNull()
        ).alias("v_price"),
    )
    o_agg = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        viol(~(F.col("o_totalprice") > 0) | F.col("o_totalprice").isNull()).alias(
            "v_total"
        ),
        viol(
            ~F.col("o_orderstatus").isin("F", "O", "P")
            | F.col("o_orderstatus").isNull()
        ).alias("v_status"),
    )
    e_agg = events.agg(
        F.count(F.lit(1)).alias("n_rows"),
        viol(F.col("ts").isNull()).alias("v_ts"),
    )
    d_agg = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        # Null-safe equality (<=>) mirrors the oracle's IS DISTINCT
        # FROM exactly: both-NULL is a match (no violation), one-side
        # NULL is a violation (ADVICE r5: the isNull-disjunction form
        # counted both-NULL rows as violations, diverging from DuckDB).
        viol(~F.col("n_chars").eqNullSafe(F.length("text"))).alias("v_chars"),
    )
    # Unpivot each table's single aggregate row via stack() so every
    # table is scanned ONCE (a per-rule select over the same agg would
    # re-run the scan per union branch).
    def unpivot(agg_df, pairs):
        stack_args = ", ".join(
            f"'{name}', CAST({col} AS BIGINT)" for name, col in pairs
        )
        return agg_df.select(
            F.col("n_rows"),
            F.expr(
                f"stack({len(pairs)}, {stack_args}) AS (check_name, n_violations)"
            ),
        ).select("check_name", "n_rows", "n_violations")

    out = unpivot(
        li_agg,
        [
            ("lineitem.quantity_positive", "v_qty"),
            ("lineitem.discount_unit_range", "v_disc"),
            ("lineitem.price_nonnegative", "v_price"),
        ],
    )
    out = out.unionAll(
        unpivot(
            o_agg,
            [
                ("orders.totalprice_positive", "v_total"),
                ("orders.status_domain", "v_status"),
            ],
        )
    )
    out = out.unionAll(unpivot(e_agg, [("events.ts_not_null", "v_ts")]))
    out = out.unionAll(
        unpivot(d_agg, [("documents.n_chars_matches_text", "v_chars")])
    )
    return out.orderBy("check_name")


@register(
    "dq_join_key_skew",
    oracle="""
WITH g1 AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY k),
g2 AS (SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem GROUP BY k),
g3 AS (SELECT l_suppkey AS k, COUNT(*) AS c FROM lineitem GROUP BY k),
g4 AS (SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY k),
g5 AS (SELECT user_id AS k, COUNT(*) AS c FROM events GROUP BY k)
SELECT 'lineitem.l_orderkey' AS key_column,
       CAST(SUM(c) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
       MAX(c) AS max_per_key,
       CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c) AS skew_ratio
FROM g1
UNION ALL
SELECT 'lineitem.l_partkey', CAST(SUM(c) AS BIGINT), COUNT(*), MAX(c),
       CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c) FROM g2
UNION ALL
SELECT 'lineitem.l_suppkey', CAST(SUM(c) AS BIGINT), COUNT(*), MAX(c),
       CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c) FROM g3
UNION ALL
SELECT 'orders.o_custkey', CAST(SUM(c) AS BIGINT), COUNT(*), MAX(c),
       CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c) FROM g4
UNION ALL
SELECT 'events.user_id', CAST(SUM(c) AS BIGINT), COUNT(*), MAX(c),
       CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c) FROM g5
ORDER BY key_column
""",
    tags=("profiling", "skew", "diagnostics"),
)
def dq_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler: for each frequently-joined key column,
    row count, distinct-key count, the heaviest key's row count, and
    the skew ratio max·keys/rows (1.0 = perfectly uniform; ≫1 = a hot
    key that will straggle a shuffle join or window) — the diagnostic
    that decides WHERE salting (``join_salted_skew``) or bucketed
    windows (``events_sessionize_skew``) are worth their cost, run
    BEFORE the expensive job rather than discovered from its straggler.
    Per column: one column-pruned scan → per-key counts (map-side
    combined) → a 1-row summary; the per-key intermediate never leaves
    the executors. Exact integers; the ratio is one IEEE division of
    exact operands."""
    specs = [
        ("lineitem", "l_orderkey"),
        ("lineitem", "l_partkey"),
        ("lineitem", "l_suppkey"),
        ("orders", "o_custkey"),
        ("events", "user_id"),
    ]
    out = None
    for table, col in specs:
        per_key = (
            load_table(spark, sf_dir, table)
            .select(F.col(col).alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        summary = per_key.agg(
            F.sum("c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("c").alias("max_per_key"),
        ).select(
            F.lit(f"{table}.{col}").alias("key_column"),
            "n_rows",
            "n_keys",
            "max_per_key",
            (
                F.col("max_per_key").cast("double")
                * F.col("n_keys")
                / F.col("n_rows")
            ).alias("skew_ratio"),
        )
        out = summary if out is None else out.unionAll(summary)
    return out.orderBy("key_column")


@register(
    "stats_ab_test_proportions",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         CAST(user_id % 2 AS BIGINT) AS variant,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' AND value > 100
                            THEN 1 ELSE 0 END) >= 3
              THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
),
arms AS (
  SELECT variant,
         COUNT(*) AS n_users,
         CAST(SUM(converted) AS BIGINT) AS n_converted
  FROM per_user GROUP BY variant
),
wide AS (
  SELECT MAX(CASE WHEN variant = 0 THEN n_users END) AS n0,
         MAX(CASE WHEN variant = 0 THEN n_converted END) AS x0,
         MAX(CASE WHEN variant = 1 THEN n_users END) AS n1,
         MAX(CASE WHEN variant = 1 THEN n_converted END) AS x1
  FROM arms
)
SELECT n0, x0, n1, x1,
       CAST(x0 AS DOUBLE) / n0 AS p0,
       CAST(x1 AS DOUBLE) / n1 AS p1,
       (CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)
       / sqrt((CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
              * (1 - CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
              * (1.0 / n0 + 1.0 / n1)) AS z_score
FROM wide
""",
    tags=("stats", "ab-test", "hypothesis"),
)
def stats_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on a hash-split experiment: variant =
    user_id % 2, conversion = "user ever purchased". The entire test
    reduces to four exact integers (n0, x0, n1, x1) produced by two
    partial-aggregated passes (per-user flag, then per-arm counts);
    the z statistic is computed from those integers by the IDENTICAL
    arithmetic expression in both engines — each operand is a single
    division of exact ints, sqrt is IEEE correctly-rounded, so even
    the float statistic hash-matches. At 100 TB the per-user
    aggregation is the only shuffle (user-count-sized); the arms and
    the final 1-row test are trivial. This is the experimentation
    readout shape: counts distributed, statistics driver-free."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 100),
                    1,
                ).otherwise(0)
            )
            >= 3,
            1,
        )
        .otherwise(0)
        .alias("converted")
    ).select(
        (F.col("user_id") % 2).cast("long").alias("variant"), "converted"
    )
    arms = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("x0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("x1"),
    )
    p0 = F.col("x0").cast("double") / F.col("n0")
    p1 = F.col("x1").cast("double") / F.col("n1")
    pp = (F.col("x0") + F.col("x1")).cast("double") / (F.col("n0") + F.col("n1"))
    return wide.select(
        "n0",
        "x0",
        "n1",
        "x1",
        p0.alias("p0"),
        p1.alias("p1"),
        (
            (p1 - p0)
            / F.sqrt(pp * (1 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1")))
        ).alias("z_score"),
    )


@register(
    "stats_ab_cuped_adjustment",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         CAST(user_id % 2 AS BIGINT) AS variant,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                        AND ts < TIMESTAMP '2024-01-16 00:00:00'
                       THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                        AND ts >= TIMESTAMP '2024-01-16 00:00:00'
                       THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY user_id
),
pooled AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * x AS HUGEINT)) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x * y AS HUGEINT)) AS DOUBLE) AS sxy
  FROM per_user
),
arms AS (
  SELECT variant, COUNT(*) AS n_users,
         CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx_v,
         CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy_v
  FROM per_user GROUP BY variant
)
SELECT variant, n_users,
       sy_v / n_users AS mean_post_cents,
       sy_v / n_users
       - ((pooled.n * sxy - sx * sy) / (pooled.n * sxx - sx * sx))
         * (sx_v / n_users - sx / pooled.n) AS mean_cuped_cents
FROM arms, pooled
ORDER BY variant
""",
    tags=("stats", "ab-test", "cuped", "variance-reduction"),
)
def stats_ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted experiment readout (Deng et al., WSDM'13): each
    arm's post-period revenue mean is corrected by θ·(pre-period mean
    deviation), θ = cov(X,Y)/var(X) from the POOLED pre/post covariate
    — the variance-reduction every mature experimentation platform
    applies before calling a winner, typically worth a 30-70% CI
    shrink when pre-period behavior predicts post. Everything reduces
    to seven exact integers per arm plus five pooled (one per-user
    aggregation, then two tiny ones); θ and the adjusted means are
    closed float expressions over those integers, written in the same
    operand order in both engines — float output, still hash-exact.
    The pre/post split is a fixed timestamp literal, so assignment is
    row-local."""
    ev = load_table(spark, sf_dir, "events")
    cents = (dec("value") * 100).cast("long")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    is_p = F.col("event_type") == "purchase"
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(is_p & (F.col("ts") < cut), cents).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(is_p & (F.col("ts") >= cut), cents).otherwise(0))
        .cast("long")
        .alias("y"),
    ).select((F.col("user_id") % 2).cast("long").alias("variant"), "x", "y")
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    pooled = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d38(F.col("x"))).cast("double").alias("sx"),
        F.sum(d38(F.col("y"))).cast("double").alias("sy"),
        F.sum(d38(F.col("x") * F.col("x"))).cast("double").alias("sxx"),
        F.sum(d38(F.col("x") * F.col("y"))).cast("double").alias("sxy"),
    )
    arms = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(d38(F.col("x"))).cast("double").alias("sx_v"),
        F.sum(d38(F.col("y"))).cast("double").alias("sy_v"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return (
        arms.crossJoin(F.broadcast(pooled))
        .select(
            "variant",
            "n_users",
            (F.col("sy_v") / F.col("n_users")).alias("mean_post_cents"),
            (
                F.col("sy_v") / F.col("n_users")
                - theta * (F.col("sx_v") / F.col("n_users") - sx / n)
            ).alias("mean_cuped_cents"),
        )
        .orderBy("variant")
    )


@register(
    "dq_primary_key_uniqueness",
    oracle="""
SELECT 'customer.c_custkey' AS key_name, COUNT(*) AS n_rows,
       COUNT(DISTINCT c_custkey) AS n_distinct,
       CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT) AS n_dup_rows
FROM customer
UNION ALL
SELECT 'events.event_id', COUNT(*), COUNT(DISTINCT event_id),
       CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) FROM events
UNION ALL
SELECT 'lineitem.(l_orderkey,l_linenumber)', COUNT(*),
       COUNT(DISTINCT l_orderkey * 100 + l_linenumber),
       CAST(COUNT(*) - COUNT(DISTINCT l_orderkey * 100 + l_linenumber)
            AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orders.o_orderkey', COUNT(*), COUNT(DISTINCT o_orderkey),
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders
UNION ALL
SELECT 'part.p_partkey', COUNT(*), COUNT(DISTINCT p_partkey),
       CAST(COUNT(*) - COUNT(DISTINCT p_partkey) AS BIGINT) FROM part
ORDER BY key_name
""",
    tags=("profiling", "dq", "primary-key"),
)
def dq_primary_key_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit — the third leg of the DQ triad
    (FK orphans: dq_referential_integrity; CHECK rules:
    dq_constraint_violations; PK duplicates: here). Spark enforces no
    constraints, so upserts/replays silently double rows and every
    downstream join fans out — this is the gate a landing zone runs
    per batch. Per table: one column-pruned scan, exact distinct on
    the key (composite keys fold to an injective integer — linenumber
    < 100 — instead of concat-string hashing); fixed 5-row report.
    At 100 TB exact COUNT(DISTINCT) is a full shuffle of key hashes —
    the cheap screening variant swaps in approx_count_distinct and
    only escalates to exact on suspicion."""
    specs = [
        ("customer.c_custkey", "customer", F.col("c_custkey")),
        ("events.event_id", "events", F.col("event_id")),
        (
            "lineitem.(l_orderkey,l_linenumber)",
            "lineitem",
            F.col("l_orderkey") * 100 + F.col("l_linenumber"),
        ),
        ("orders.o_orderkey", "orders", F.col("o_orderkey")),
        ("part.p_partkey", "part", F.col("p_partkey")),
    ]
    out = None
    for key_name, table, key in specs:
        t = load_table(spark, sf_dir, table)
        s = t.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(key).alias("n_distinct"),
        ).select(
            F.lit(key_name).alias("key_name"),
            "n_rows",
            "n_distinct",
            (F.col("n_rows") - F.col("n_distinct")).cast("long").alias(
                "n_dup_rows"
            ),
        )
        out = s if out is None else out.unionAll(s)
    return out.orderBy("key_name")


@register(
    "dq_benford_distribution",
    oracle="""
WITH d AS (
  SELECT CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS VARCHAR),
                        1, 1) AS BIGINT) AS digit
  FROM orders
),
n AS (SELECT COUNT(*) AS total FROM d)
SELECT digit,
       COUNT(*) AS n_obs,
       CAST(CAST(COUNT(*) AS DOUBLE) / CAST(total AS DOUBLE) AS FLOAT)
         AS obs_share,
       CAST(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS FLOAT)
         AS benford_share
FROM d CROSS JOIN n
GROUP BY digit, total
ORDER BY digit
""",
    tags=("dq", "benford", "distribution"),
)
def dq_benford_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screening — the forensic-accounting DQ
    classic: naturally-occurring money amounts follow
    P(d) = log10(1 + 1/d); a ledger whose leading-digit histogram
    deviates hard (too many 5s, missing 1s) is synthetic, truncated,
    or manipulated. Emits the observed first-digit distribution next
    to the Benford expectation per digit (9 rows). The leading digit
    comes from the exact-decimal string rendering (no float-format
    drift); counts are exact; both shares are single float divisions
    over exact operands, FLOAT-cast under the libm-1-ulp rule for the
    log10 leg. One map-side-combined aggregation + a 1-row broadcast
    total — any fact table size."""
    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        F.substring(
            F.col("o_totalprice").cast("decimal(14,2)").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    n = d.agg(F.count(F.lit(1)).alias("total"))
    return (
        d.crossJoin(F.broadcast(n))
        .groupBy("digit", "total")
        .agg(F.count(F.lit(1)).alias("n_obs"))
        .select(
            "digit",
            "n_obs",
            (F.col("n_obs").cast("double") / F.col("total").cast("double"))
            .cast("float")
            .alias("obs_share"),
            F.log10(1.0 + 1.0 / F.col("digit").cast("double"))
            .cast("float")
            .alias("benford_share"),
        )
        .orderBy("digit")
    )


@register(
    "stats_ab_did_uplift",
    oracle="""
WITH b AS (SELECT MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS t1
           FROM events),
cells AS (
  SELECT (user_id % 2 = 0) AS treated,
         (epoch_us(ts) >= (t0 + (t1 - t0) // 2)) AS post,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS cents
  FROM events CROSS JOIN b
  GROUP BY 1, 2
),
m AS (
  SELECT treated, post,
         CAST(cents AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents, n
  FROM cells
)
SELECT t.treated, t.post, t.n, t.mean_cents,
       (SELECT (tp.mean_cents - tb.mean_cents) - (cp.mean_cents - cb.mean_cents)
        FROM m tp, m tb, m cp, m cb
        WHERE tp.treated AND tp.post AND tb.treated AND NOT tb.post
          AND NOT cp.treated AND cp.post AND NOT cb.treated AND NOT cb.post)
         AS did_uplift_cents
FROM m t
ORDER BY t.treated, t.post
""",
    tags=("stats", "experiment", "did"),
)
def stats_ab_did_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences uplift — the third leg of the
    experimentation family (two-proportion z-test, CUPED, now DiD):
    when assignment isn't randomized per-exposure, the treatment effect
    is (treated post − treated pre) − (control post − control pre),
    which cancels both the group baseline and the common time trend.
    Cells: treated = even user_id, post = second half of the observed
    time span (bounds from one 1-row broadcast aggregate — no
    calendar, pure int64 µs). Per-cell sums are exact integer cents;
    the four means are single divisions of exact operands and the DiD
    estimate one fixed expression over them — hash-exact despite being
    float. One pass over events + a 4-row self-combination."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    )
    cells = (
        ev.crossJoin(F.broadcast(b))
        .groupBy(
            (F.col("user_id") % 2 == 0).alias("treated"),
            (
                F.unix_micros("ts")
                >= F.col("t0") + F.expr("(t1 - t0) div 2")
            ).alias("post"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value") * 100).cast("long").alias("cents"),
        )
    )
    m = cells.select(
        "treated",
        "post",
        "n",
        (F.col("cents").cast("double") / F.col("n").cast("double")).alias(
            "mean_cents"
        ),
    )
    pick = lambda tr, po: F.max(  # noqa: E731
        F.when((F.col("treated") == tr) & (F.col("post") == po), F.col("mean_cents"))
    )
    did = m.agg(
        (
            (pick(True, True) - pick(True, False))
            - (pick(False, True) - pick(False, False))
        ).alias("did_uplift_cents")
    )
    return (
        m.crossJoin(F.broadcast(did))
        .select("treated", "post", "n", "mean_cents", "did_uplift_cents")
        .orderBy("treated", "post")
    )


# SPRT hypotheses (H0: p=0.35, H1: p=0.40, alpha=beta=0.05). The four
# log constants are computed ONCE here with math.log and interpolated
# into the oracle SQL as full-precision repr literals, so Spark
# (F.lit of the same Python float, via sprt_monitor) and DuckDB parse
# the SAME doubles by construction and every LLR value k*A + (n-k)*B
# is a bit-identical IEEE computation.
import math as _math

_SPRT_P0, _SPRT_P1 = 0.35, 0.40
_SPRT_ALPHA = _SPRT_BETA = 0.05
# Expressions MUST mirror sprt_monitor's formulas token-for-token so
# the floats are identical (1.0 - 0.05 is not the literal 0.95).
_SPRT_LA = _math.log(_SPRT_P1 / _SPRT_P0)
_SPRT_LB = _math.log((1.0 - _SPRT_P1) / (1.0 - _SPRT_P0))
_SPRT_UPPER = _math.log((1.0 - _SPRT_BETA) / _SPRT_ALPHA)
_SPRT_LOWER = _math.log(_SPRT_BETA / (1.0 - _SPRT_ALPHA))


def _dlit(x: float) -> str:
    """Render a float as a DuckDB DOUBLE literal via the string hop.
    A bare 17-digit literal parses as DECIMAL(20,20) in DuckDB, the
    whole LLR walk then runs in exact decimal, and the final
    DECIMAL->DOUBLE cast is NOT correctly rounded once the mantissa
    exceeds 2^53 — at sf0.01 every decision row happened to round the
    same, but the x10 sweep caught a last-ulp llr divergence (round-9;
    the same defect class as the r8 2^53 decimal-cast fixes)."""
    return f"CAST('{x!r}' AS DOUBLE)"


@register(
    "stats_sequential_sprt",
    oracle=f"""
WITH trials AS (
  SELECT event_type,
         CASE WHEN value > 50 THEN 1 ELSE 0 END AS success,
         ts, event_id
  FROM events
),
walk AS (
  SELECT event_type,
         COUNT(*) OVER w AS n,
         CAST(SUM(success) OVER w AS BIGINT) AS k
  FROM trials
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
llrs AS (
  SELECT event_type, n, k,
         (k * {_dlit(_SPRT_LA)}) + ((n - k) * {_dlit(_SPRT_LB)}) AS llr
  FROM walk
),
crossings AS (
  SELECT event_type,
         MIN(n) FILTER (WHERE llr >= {_dlit(_SPRT_UPPER)}
                           OR llr <= {_dlit(_SPRT_LOWER)}) AS n_dec
  FROM llrs GROUP BY event_type
),
finals AS (
  SELECT event_type, MAX(n) AS n_total FROM llrs GROUP BY event_type
)
SELECT f.event_type,
       CASE WHEN c.n_dec IS NULL THEN 'continue'
            WHEN l.llr >= {_dlit(_SPRT_UPPER)} THEN 'accept_h1'
            ELSE 'accept_h0' END AS decision,
       COALESCE(c.n_dec, f.n_total) AS n_at_decision,
       l2.k AS k_at_decision,
       CAST(l2.llr AS FLOAT) AS llr_at_decision
FROM finals f
LEFT JOIN crossings c ON f.event_type = c.event_type
LEFT JOIN llrs l ON l.event_type = f.event_type AND l.n = c.n_dec
JOIN llrs l2 ON l2.event_type = f.event_type
            AND l2.n = COALESCE(c.n_dec, f.n_total)
ORDER BY f.event_type
""",
    tags=("stats", "abtest", "sequential", "sprt"),
)
def stats_sequential_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald sequential probability-ratio test (SPRT) over each event
    arm — the always-valid "peek after every trial" alternative to
    fixed-horizon A/B tests: trials arrive in (ts, event_id) order,
    the cumulative log-likelihood ratio LLR = k·ln(p1/p0) +
    (n−k)·ln((1−p1)/(1−p0)) is a window cumsum, and the arm stops at
    the FIRST n where LLR exits (ln β/(1−α), ln (1−β)/α). Arms whose
    walk never exits report 'continue' with their final state. All
    boundary comparisons are deterministic: k and n are integers, the
    four constants are shared full-precision literals, and one
    multiply-add per row is bit-identical IEEE in both engines.

    Scale: one window cumsum per arm (single shuffle on event_type —
    at 100 TB an arm's trials sort within its partitions via the
    window's local sort; hot arms are exactly the AQE skew case), one
    filtered min-aggregate for the crossing point, and two tiny
    broadcast joins back to fetch the state AT the decision row. No
    driver loop — the sequential test is expressed as a prefix scan,
    which is how an always-valid monitor runs over a 100 TB event log.
    Delegates to the public ``sprt_monitor`` API (pipeline.py), which
    recomputes the identical constants from (p0, p1, alpha, beta)."""
    from boltzmannclean_spark.pipeline import sprt_monitor

    ev = load_table(spark, sf_dir, "events")
    return sprt_monitor(
        ev,
        arm_col="event_type",
        order_cols=("ts", "event_id"),
        success=(F.col("value") > 50),
        p0=_SPRT_P0,
        p1=_SPRT_P1,
        alpha=0.05,
        beta=0.05,
    )


_MWU_G1, _MWU_G2 = "click", "view"


@register(
    "stats_mann_whitney_u",
    oracle=f"""
WITH pool AS (
  SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
         CASE WHEN event_type = '{_MWU_G1}' THEN 1 ELSE 0 END AS g1
  FROM events WHERE event_type IN ('{_MWU_G1}', '{_MWU_G2}')
),
per_v AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(g1) AS BIGINT) AS t1
  FROM pool GROUP BY v
),
ranked AS (
  SELECT v, t, t1,
         CAST(COALESCE(SUM(t) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS below
  FROM per_v
),
agg AS (
  SELECT CAST(SUM(t1) AS BIGINT) AS n1,
         CAST(SUM(t - t1) AS BIGINT) AS n2,
         CAST(SUM(t1 * (2 * below + t + 1)) AS BIGINT) AS r1_sum_x2,
         CAST(SUM(CASE WHEN t > 1 THEN t * t * t - t ELSE 0 END)
              AS BIGINT) AS tie_term
  FROM ranked
)
SELECT n1, n2, r1_sum_x2,
       r1_sum_x2 - n1 * (n1 + 1) AS u1_x2,
       2 * n1 * n2 - (r1_sum_x2 - n1 * (n1 + 1)) AS u2_x2,
       tie_term
FROM agg
""",
    tags=("stats", "nonparametric", "mann-whitney", "ranks"),
)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test between two event arms — the
    nonparametric two-sample location test (no normality assumption,
    robust to the heavy-tailed value distributions A/B metrics
    actually have). Average ranks for ties are kept in EXACT x2
    integer units (avg rank of a tie group = below + (t+1)/2, so
    x2 = 2*below + t + 1 is always integral): R1, U1 = R1 - n1(n1+1)/2
    and U2 = n1*n2 - U1 all emit as x2 bigints, plus the tie term
    sum(t^3 - t) the caller needs for the tie-corrected variance —
    bit-exact in both engines with zero float operations.

    Scale: ranking is per DISTINCT VALUE, not per row — one groupBy of
    the two arms compresses N rows to the value domain (2-dp bounded
    money data: <=10k groups), and the prefix sum that turns counts
    into ranks runs over that tiny table (the one ordered window; at
    an unbounded domain route it through
    ``functions/prefix.sharded_prefix_sum`` — the two-pass count-bucket
    prefix sum is CODE since r11, wired and proven on
    events_pareto_concentration). The arm aggregates are map-combined;
    nothing touches
    the raw rows twice. Delegates to the public ``mann_whitney_u``
    API (pipeline.py)."""
    from boltzmannclean_spark.pipeline import mann_whitney_u

    ev = load_table(spark, sf_dir, "events")
    return mann_whitney_u(
        ev,
        value=(dec("value") * 100),
        group_col="event_type",
        group_a=_MWU_G1,
        group_b=_MWU_G2,
    )


@register(
    "stats_skewness_kurtosis_exact",
    oracle="""
WITH c AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
  FROM events
),
sums AS (
  -- power chain in HUGEINT: a BIGINT x^4 wraps past ~10^4.7 units
  -- (x10-sweep finding: both engines overflow-check 64-bit multiplies)
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(CAST(x AS HUGEINT)) AS VARCHAR) AS DOUBLE) AS s1,
         CAST(CAST(SUM(CAST(x AS HUGEINT) * x) AS VARCHAR) AS DOUBLE) AS s2,
         CAST(CAST(SUM(CAST(x AS HUGEINT) * x * x) AS VARCHAR) AS DOUBLE) AS s3,
         CAST(CAST(SUM(CAST(x AS HUGEINT) * x * x * x) AS VARCHAR) AS DOUBLE) AS s4
  FROM c GROUP BY event_type
),
m AS (
  SELECT event_type, n, s1 / n AS mean,
         s2 / n - (s1 / n) * (s1 / n) AS m2,
         s3 / n - 3.0 * (s1 / n) * (s2 / n)
              + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
         s4 / n - 4.0 * (s1 / n) * (s3 / n)
              + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
              - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
  FROM sums
)
SELECT event_type, n, mean AS mean_cents, m2 AS var_cents2,
       m3 / (m2 * sqrt(m2)) AS skewness,
       m4 / (m2 * m2) - 3.0 AS kurtosis_excess
FROM m
ORDER BY event_type
""",
    tags=("stats", "moments", "skewness", "kurtosis", "single-pass"),
)
def stats_skewness_kurtosis_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis per event arm from ONE pass of
    exact integer power sums — the mergeable-moments primitive every
    distributed stats engine needs: Σx, Σx², Σx³, Σx⁴ accumulate in
    integer cents (DECIMAL(38,0) sums — a bigint sum of x⁴ would wrap
    at ~10⁵ rows of 2-dp money data), so partial aggregation is
    order-free and bit-exact at any parallelism. The central-moment
    and standardization arithmetic then runs on doubles derived from
    identical exact sums via the string-hop, with every operation
    (+,-,*,/,sqrt) correctly rounded IEEE — both engines evaluate the
    same expression tree, so even the 4th-power cancellations agree
    bit-for-bit. mean/variance emit in cent units (the exact domain);
    skewness/kurtosis are dimensionless.

    Scale: one map-combined aggregation, 5 numbers per group of
    state; no second pass, no broadcast of means (the naive two-pass
    Σ(x-mean)³ needs the mean first — the power-sum identity is what
    makes moments mergeable across 1000 executors)."""
    ev = load_table(spark, sf_dir, "events")
    x = (dec("value") * 100).cast("long")
    c = ev.select("event_type", x.alias("x"))
    # Per-row powers multiply in DECIMAL, not LONG: a bigint x^4
    # overflow-errors past ~10^4.7 fixed-point units (caught by the
    # x10 sweep — larger value domain than sf0.01), and the ANSI
    # checked multiply would kill the job exactly when the data gets
    # interesting. decimal(19,0) x's keep every power exact.
    #
    # Round-10 overflow guard (advisor): past the DECIMAL chain's own
    # limit, Spark's ANSI-off decimal arithmetic NULLs silently while
    # the oracle's HUGEINT raises — a silent-divergence class. Bound
    # the per-row domain so x^4 (<= 8.1e29) stays far inside 38
    # digits, leaving >=1e8 rows/group of headroom before the SUM
    # itself could overflow; beyond the bound BOTH engines now fail
    # loudly (raise_error here, HUGEINT overflow error in DuckDB).
    d38 = "decimal(38,0)"
    domain_cents = 3 * 10**7
    xd = (
        F.when(F.abs(F.col("x")) <= F.lit(domain_cents), F.col("x"))
        .otherwise(
            F.raise_error(
                F.lit(
                    "stats_skewness_kurtosis_exact: |value| exceeds the"
                    " exact-power domain bound (3e7 cents) — the"
                    " decimal(38,0) x^4 chain would overflow silently"
                )
            )
        )
        .cast("decimal(19,0)")
    )
    x2 = (xd * xd).cast("decimal(38,0)")
    sums = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(xd.cast(d38)).cast("string").cast("double").alias("s1"),
        F.sum(x2.cast(d38)).cast("string").cast("double").alias("s2"),
        F.sum((x2 * xd).cast(d38)).cast("string").cast("double").alias("s3"),
        F.sum((x2 * x2).cast(d38)).cast("string").cast("double").alias("s4"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1") / n
    m2 = F.col("s2") / n - mean * mean
    m3 = (
        F.col("s3") / n
        - F.lit(3.0) * mean * (F.col("s2") / n)
        + F.lit(2.0) * mean * mean * mean
    )
    m4 = (
        F.col("s4") / n
        - F.lit(4.0) * mean * (F.col("s3") / n)
        + F.lit(6.0) * mean * mean * (F.col("s2") / n)
        - F.lit(3.0) * mean * mean * mean * mean
    )
    return (
        sums.select(
            "event_type",
            "n",
            mean.alias("mean_cents"),
            m2.alias("var_cents2"),
            (m3 / (m2 * F.sqrt(m2))).alias("skewness"),
            (m4 / (m2 * m2) - F.lit(3.0)).alias("kurtosis_excess"),
        )
        .orderBy("event_type")
    )


@register(
    "stats_ks_two_sample",
    oracle=f"""
WITH pool AS (
  SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
         CASE WHEN event_type = '{_MWU_G1}' THEN 1 ELSE 0 END AS g1
  FROM events WHERE event_type IN ('{_MWU_G1}', '{_MWU_G2}')
),
per_v AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(g1) AS BIGINT) AS t1
  FROM pool GROUP BY v
),
tot AS (
  SELECT CAST(SUM(t1) AS BIGINT) AS n1,
         CAST(SUM(t - t1) AS BIGINT) AS n2
  FROM per_v
),
cum AS (
  SELECT v,
         CAST(SUM(t1) OVER (ORDER BY v) AS BIGINT) AS c1,
         CAST(SUM(t - t1) OVER (ORDER BY v) AS BIGINT) AS c2
  FROM per_v
),
d AS (
  SELECT v, n1, n2,
         CAST(ABS(c1 * n2 - c2 * n1) AS BIGINT) AS ks_num
  FROM cum, tot
)
SELECT n1, n2, ks_num, v AS at_v,
       ks_num / (n1 * n2) AS ks_d
FROM d ORDER BY ks_num DESC, v LIMIT 1
""",
    tags=("stats", "nonparametric", "kolmogorov-smirnov", "ecdf"),
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D between the click and view
    value distributions — the nonparametric whole-distribution test
    (location AND shape, where Mann-Whitney sees only location). The
    supremum of |ECDF1 - ECDF2| is decided entirely in exact integers:
    ks_num = max_v |c1(v)*n2 - c2(v)*n1| over the n1*n2 common
    denominator, the argmax pinned to the smallest attaining value, and
    the display statistic is ONE correctly-rounded IEEE division of
    identical exact integers — bit-equal in both engines.

    Scale: identical shape to stats_mann_whitney_u — one map-combined
    groupBy compresses the event stream to its distinct-value domain
    (2-dp bounded money data), one prefix-sum window over that tiny
    table, (n1, n2) broadcast; the TakeOrdered(1) argmax never sorts
    globally. Delegates to the public ``ks_two_sample`` API
    (pipeline.py)."""
    from boltzmannclean_spark.pipeline import ks_two_sample

    ev = load_table(spark, sf_dir, "events")
    return ks_two_sample(
        ev,
        value=(dec("value") * 100),
        group_col="event_type",
        group_a=_MWU_G1,
        group_b=_MWU_G2,
    )


@register(
    "stats_kruskal_wallis",
    oracle="""
WITH pool AS (
  SELECT event_type AS g,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
  FROM events
),
per_vg AS (
  SELECT v, g, CAST(COUNT(*) AS BIGINT) AS tg
  FROM pool GROUP BY v, g
),
per_v AS (
  SELECT v, CAST(SUM(tg) AS BIGINT) AS t
  FROM per_vg GROUP BY v
),
ranked AS (
  SELECT v, t,
         CAST(COALESCE(SUM(t) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS below
  FROM per_v
),
shared AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n_total,
         CAST(SUM(CASE WHEN t > 1 THEN t * t * t - t ELSE 0 END)
              AS BIGINT) AS tie_term
  FROM ranked
),
grp AS (
  SELECT pg.g, CAST(SUM(pg.tg) AS BIGINT) AS n_g,
         CAST(SUM(pg.tg * (2 * r.below + r.t + 1)) AS BIGINT) AS r_sum_x2
  FROM per_vg pg JOIN ranked r ON pg.v = r.v
  GROUP BY pg.g
)
SELECT g AS event_type, n_g, r_sum_x2, n_total, tie_term
FROM grp, shared
ORDER BY event_type
""",
    tags=("stats", "nonparametric", "kruskal-wallis", "ranks"),
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis k-sample rank state across ALL event arms — the
    one-way ANOVA-on-ranks generalization of Mann-Whitney. Emits the
    MERGEABLE exact-integer state per group: (n_g, r_sum_x2) with
    average tied ranks in x2 units (2*below + t + 1 is always
    integral), plus the shared (n_total, tie_term = sum(t^3 - t))
    columns. The scalar H = [12/(N(N+1)) * sum(R_g^2/n_g)] - 3(N+1)
    over the tie correction 1 - tie_term/(N^3 - N) is one driver-side
    formula away — deliberately NOT emitted: summing k double terms
    R_g^2/n_g has no order-deterministic distributed form, while these
    bigints are bit-exact at any parallelism (the same
    components-not-p-value contract as stats_mann_whitney_u).

    Scale: one groupBy to the (value, group) domain, one groupBy to
    the value domain, ONE prefix-sum window over the domain-sized
    table, a domain-sized equi-join back, map-combined group
    aggregates; the shared scalars ride a 1-row broadcast."""
    ev = load_table(spark, sf_dir, "events")
    pool = ev.select(
        F.col("event_type").alias("g"),
        (dec("value") * 100).cast("long").alias("v"),
    )
    per_vg = pool.groupBy("v", "g").agg(
        F.count(F.lit(1)).cast("long").alias("tg")
    )
    per_v = per_vg.groupBy("v").agg(F.sum("tg").cast("long").alias("t"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_v.select(
        "v",
        "t",
        F.coalesce(F.sum("t").over(w), F.lit(0)).cast("long").alias("below"),
    )
    shared = ranked.agg(
        F.sum("t").cast("long").alias("n_total"),
        F.sum(
            F.when(
                F.col("t") > 1,
                F.col("t") * F.col("t") * F.col("t") - F.col("t"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("tie_term"),
    )
    grp = (
        per_vg.join(ranked, "v")
        .groupBy("g")
        .agg(
            F.sum("tg").cast("long").alias("n_g"),
            F.sum(
                F.col("tg") * (2 * F.col("below") + F.col("t") + 1)
            )
            .cast("long")
            .alias("r_sum_x2"),
        )
    )
    return (
        grp.crossJoin(F.broadcast(shared))
        .select(
            F.col("g").alias("event_type"),
            "n_g",
            "r_sum_x2",
            "n_total",
            "tie_term",
        )
        .orderBy("event_type")
    )


@register(
    "stats_welch_ttest",
    oracle=f"""
WITH pool AS (
  SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS HUGEINT) AS x,
         CASE WHEN event_type = '{_MWU_G1}' THEN 1 ELSE 0 END AS g1
  FROM events WHERE event_type IN ('{_MWU_G1}', '{_MWU_G2}')
),
sums AS (
  SELECT CAST(SUM(g1) AS BIGINT) AS n_a,
         CAST(COUNT(*) - SUM(g1) AS BIGINT) AS n_b,
         CAST(CAST(SUM(CASE WHEN g1 = 1 THEN x ELSE 0 END) AS VARCHAR)
              AS DOUBLE) AS s1a,
         CAST(CAST(SUM(CASE WHEN g1 = 1 THEN x * x ELSE 0 END) AS VARCHAR)
              AS DOUBLE) AS s2a,
         CAST(CAST(SUM(CASE WHEN g1 = 0 THEN x ELSE 0 END) AS VARCHAR)
              AS DOUBLE) AS s1b,
         CAST(CAST(SUM(CASE WHEN g1 = 0 THEN x * x ELSE 0 END) AS VARCHAR)
              AS DOUBLE) AS s2b
  FROM pool
),
m AS (
  SELECT n_a, n_b, s1a / n_a AS mean_a, s1b / n_b AS mean_b,
         ((s2a - (s1a / n_a) * s1a) / (n_a - 1)) / n_a AS se2a,
         ((s2b - (s1b / n_b) * s1b) / (n_b - 1)) / n_b AS se2b
  FROM sums
)
SELECT n_a, n_b, mean_a, mean_b,
       (mean_a - mean_b) / SQRT(se2a + se2b) AS welch_t,
       (se2a + se2b) * (se2a + se2b)
         / (se2a * se2a / (n_a - 1) + se2b * se2b / (n_b - 1)) AS welch_df
FROM m
""",
    tags=("stats", "parametric", "welch", "ab-test", "moments"),
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between the click and view value
    distributions — the parametric companion to stats_mann_whitney_u
    (means, where MW-U tests location-shift on ranks). Sufficient
    statistics (n, Σx, Σx² in integer cents) accumulate as exact
    DECIMAL(38,0)/HUGEINT sums — mergeable and order-free — then the t
    statistic and Welch–Satterthwaite df are one fixed double
    expression tree over the string-hopped exact sums, every operation
    correctly-rounded IEEE, so both engines agree bit-for-bit (the
    same exactness contract as stats_skewness_kurtosis_exact).

    Scale: ONE map-combined aggregation over the filtered stream, six
    numbers of state; no second pass, no broadcast of means. Delegates
    to the public ``welch_ttest`` API (pipeline.py)."""
    from boltzmannclean_spark.pipeline import welch_ttest

    ev = load_table(spark, sf_dir, "events")
    return welch_ttest(
        ev,
        value=(dec("value") * 100),
        group_col="event_type",
        group_a=_MWU_G1,
        group_b=_MWU_G2,
    )


@register(
    "dq_freshness_lag",
    oracle="""
WITH per_arm AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_us
  FROM events GROUP BY event_type
),
wm AS (SELECT CAST(MAX(max_us) AS BIGINT) AS g_us FROM per_arm),
recent AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS rows_last_7d
  FROM events, wm
  WHERE epoch_us(ts) > wm.g_us - 604800000000
  GROUP BY event_type
)
SELECT p.event_type, p.n_rows,
       g.g_us - p.max_us AS lag_us,
       (g.g_us - p.max_us) // 3600000000 AS lag_hours_floor,
       COALESCE(r.rows_last_7d, 0) AS rows_last_7d
FROM per_arm p
CROSS JOIN wm g
LEFT JOIN recent r ON r.event_type = p.event_type
ORDER BY p.event_type
""",
    tags=("dq", "freshness", "monitoring", "operational"),
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness report — the first page of any pipeline
    health dashboard: how stale is each event stream relative to the
    newest data ANYWHERE in the table (lag in exact microseconds and
    floor-hours — watermark semantics, no wall-clock dependence, so
    the oracle and a backfilled rerun agree forever), plus the 7-day
    trailing volume that distinguishes "this stream is dead" from
    "this stream is slow". All arithmetic in exact int64 micros.

    Scale: one map-combined groupBy for (n, max_ts) per stream, a
    1-row broadcast of the global watermark, and one filtered recount
    for the trailing window — two scans total, nothing shuffles but
    per-arm aggregates. At 100 TB with date-partitioned storage the
    trailing-window scan prunes to the last 7 days of partitions."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("us")
    )
    per_arm = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.max("us").cast("long").alias("max_us"),
    )
    glob = per_arm.agg(F.max("max_us").cast("long").alias("g_us"))
    recent = (
        ev.crossJoin(F.broadcast(glob))
        .where(F.col("us") > F.col("g_us") - F.lit(604800000000))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("rows_last_7d"))
    )
    return (
        per_arm.crossJoin(F.broadcast(glob))
        .join(recent, "event_type", "left")
        .select(
            "event_type",
            "n_rows",
            (F.col("g_us") - F.col("max_us")).alias("lag_us"),
            F.expr("(g_us - max_us) div 3600000000").alias("lag_hours_floor"),
            F.coalesce(F.col("rows_last_7d"), F.lit(0))
            .cast("long")
            .alias("rows_last_7d"),
        )
        .orderBy("event_type")
    )


@register(
    "stats_brown_forsythe",
    oracle="""
WITH pool AS (
  SELECT event_type AS g,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
  FROM events
),
per_vg AS (
  SELECT g, v, CAST(COUNT(*) AS BIGINT) AS t
  FROM pool GROUP BY g, v
),
cum AS (
  SELECT g, v, t,
         CAST(COALESCE(SUM(t) OVER (PARTITION BY g ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS below
  FROM per_vg
),
n AS (SELECT g, CAST(SUM(t) AS BIGINT) AS n_g FROM per_vg GROUP BY g),
med AS (
  SELECT c.g,
         CAST(SUM(CASE WHEN c.below < (n.n_g + 1) // 2
                        AND (n.n_g + 1) // 2 <= c.below + c.t
                       THEN c.v ELSE 0 END)
            + SUM(CASE WHEN c.below < (n.n_g + 2) // 2
                        AND (n.n_g + 2) // 2 <= c.below + c.t
                       THEN c.v ELSE 0 END) AS BIGINT) AS med2
  FROM cum c JOIN n ON n.g = c.g
  GROUP BY c.g
)
SELECT p.g AS event_type, n.n_g, med.med2 AS med2_halfcents,
       CAST(SUM(p.t * ABS(2 * p.v - med.med2)) AS BIGINT)
         AS z_sum_halfcents,
       CAST(CAST(SUM(CAST(p.t AS HUGEINT)
                     * (2 * p.v - med.med2) * (2 * p.v - med.med2))
            AS VARCHAR) AS DOUBLE) AS z_sumsq
FROM per_vg p
JOIN med ON med.g = p.g
JOIN n ON n.g = p.g
GROUP BY p.g, n.n_g, med.med2
ORDER BY event_type
""",
    tags=("stats", "variance", "brown-forsythe", "levene", "robust"),
)
def stats_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-equality state across all event arms —
    the robust Levene variant (deviations from the MEDIAN, not the
    mean) that decides whether equal-variance assumptions hold before
    anyone trusts a pooled test. Emits the MERGEABLE exact state per
    arm: n_g, the exact 2×median in half-cent units (lower+upper
    middle of the sorted multiset — always integral), z_sum = Σ|2x −
    med2| in exact half-cents, and z_sumsq = Σ(2x − med2)² via exact
    HUGEINT/DECIMAL(38,0) sums string-hopped to one correctly-rounded
    double. The F statistic over these components is one driver-side
    formula away — deliberately NOT emitted: summing k per-group
    double terms has no order-deterministic distributed form (the same
    components-not-p-value contract as stats_kruskal_wallis).

    Scale: everything lives on the (arm, value) DOMAIN, never rows —
    one groupBy compresses the stream, one arm-partitioned prefix-sum
    window locates both middle positions (no arm ever becomes a
    single-partition row-scale window), the k-row median table joins
    back by arm, and the final moment aggregation is map-combined with
    per-value multiplicities carrying the row weight."""
    ev = load_table(spark, sf_dir, "events")
    pool = ev.select(
        F.col("event_type").alias("g"),
        (dec("value") * 100).cast("long").alias("v"),
    )
    per_vg = pool.groupBy("g", "v").agg(F.count(F.lit(1)).cast("long").alias("t"))
    wb = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = per_vg.select(
        "g",
        "v",
        "t",
        F.coalesce(F.sum("t").over(wb), F.lit(0)).cast("long").alias("below"),
    )
    n = per_vg.groupBy("g").agg(F.sum("t").cast("long").alias("n_g"))
    lo = F.expr("(n_g + 1) div 2")
    hi = F.expr("(n_g + 2) div 2")
    med = (
        cum.join(F.broadcast(n), "g")
        .groupBy("g")
        .agg(
            (
                F.sum(
                    F.when(
                        (F.col("below") < lo) & (lo <= F.col("below") + F.col("t")),
                        F.col("v"),
                    ).otherwise(0)
                )
                + F.sum(
                    F.when(
                        (F.col("below") < hi) & (hi <= F.col("below") + F.col("t")),
                        F.col("v"),
                    ).otherwise(0)
                )
            )
            .cast("long")
            .alias("med2")
        )
    )
    dev = (2 * F.col("v") - F.col("med2")).cast("decimal(19,0)")
    return (
        per_vg.join(F.broadcast(med), "g")
        .join(F.broadcast(n), "g")
        .groupBy("g", "n_g", "med2")
        .agg(
            F.sum(F.col("t") * F.abs(2 * F.col("v") - F.col("med2")))
            .cast("long")
            .alias("z_sum_halfcents"),
            F.sum(
                (F.col("t").cast("decimal(19,0)") * dev * dev).cast("decimal(38,0)")
            )
            .cast("string")
            .cast("double")
            .alias("z_sumsq"),
        )
        .select(
            F.col("g").alias("event_type"),
            "n_g",
            F.col("med2").alias("med2_halfcents"),
            "z_sum_halfcents",
            "z_sumsq",
        )
        .orderBy("event_type")
    )


# Shared with streaming/queries.stream_psi_drift: the streaming leg
# accumulates the same (arm, bucket, half) histogram via foreachBatch
# and reduces through pipeline._psi_from_counts, so one oracle serves
# both — stream-batch parity IS its correctness check.
_PSI_ORACLE = """
WITH pool AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
         CAST(epoch_us(ts) AS BIGINT) AS us
  FROM events
),
wm AS (
  SELECT (CAST(MIN(us) AS BIGINT) + CAST(MAX(us) AS BIGINT)) // 2 AS mid
  FROM pool
),
halves AS (
  SELECT event_type, x // 10000 AS bucket,
         CASE WHEN us <= wm.mid THEN 0 ELSE 1 END AS cur
  FROM pool, wm
),
counts AS (
  SELECT event_type, bucket, cur, CAST(COUNT(*) AS BIGINT) AS n
  FROM halves GROUP BY 1, 2, 3
),
buckets AS (
  SELECT DISTINCT event_type, bucket FROM counts
),
b AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_buckets
  FROM buckets GROUP BY event_type
),
tot AS (
  SELECT event_type, cur, CAST(SUM(n) AS BIGINT) AS t
  FROM counts GROUP BY event_type, cur
),
grid AS (
  SELECT bk.event_type, bk.bucket, h.cur,
         COALESCE(c.n, 0) AS n, tot.t, b.n_buckets
  FROM buckets bk
  CROSS JOIN (SELECT 0 AS cur UNION ALL SELECT 1) h
  LEFT JOIN counts c ON c.event_type = bk.event_type
   AND c.bucket = bk.bucket AND c.cur = h.cur
  LEFT JOIN tot ON tot.event_type = bk.event_type AND tot.cur = h.cur
  JOIN b ON b.event_type = bk.event_type
),
rates AS (
  SELECT event_type, bucket, n_buckets,
         MAX(CASE WHEN cur = 0 THEN
             CAST(n + 1 AS DOUBLE) / (COALESCE(t, 0) + n_buckets) END) AS p,
         MAX(CASE WHEN cur = 1 THEN
             CAST(n + 1 AS DOUBLE) / (COALESCE(t, 0) + n_buckets) END) AS q
  FROM grid GROUP BY event_type, bucket, n_buckets
)
SELECT event_type, CAST(MAX(n_buckets) AS BIGINT) AS n_buckets,
       CAST(SUM((p - q) * ln(p / q)) AS FLOAT) AS psi
FROM rates GROUP BY event_type
ORDER BY event_type
"""


@register(
    "dq_distribution_psi",
    oracle=_PSI_ORACLE,
    tags=("dq", "drift", "psi", "mlops", "monitoring"),
)
def dq_distribution_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event arm — THE standard ML-ops
    drift metric: how far the value distribution of the newer half of
    the data (split at the exact integer midpoint of the observed time
    range — watermark semantics, no wall clock) has moved from the
    older half, over fixed $100 buckets with Laplace (+1) smoothing so
    an empty bucket — or an entirely empty HALF (a retired or
    late-starting arm; the empty half's total coalesces to 0, so each
    bucket reads the pure-smoothing rate 1/n_buckets) — contributes a
    finite term. PSI < 0.1 is stable,
    0.1-0.25 drifting, > 0.25 action. Counts, totals, the time split,
    and the bucket grid are all exact integers; only the final
    (p-q)·ln(p/q) sum runs in doubles and the result is FLOAT-cast —
    the same libm-absorbing contract as text_unigram_logprob.

    Scale: one map-combined groupBy compresses the stream to the
    (arm, bucket, half) grid — bucket width is fixed, so the grid is
    value-domain-sized, not row-sized; the per-arm PSI reduction runs
    over that tiny grid. A 1-row broadcast carries the time midpoint;
    nothing row-scale shuffles twice. Delegates to the public
    ``psi_drift`` API (pipeline.py)."""
    from boltzmannclean_spark.pipeline import psi_drift

    ev = load_table(spark, sf_dir, "events")
    return psi_drift(
        ev,
        value=(dec("value") * 100),
        group_col="event_type",
        time_col="ts",
        bucket_width=10000,
        smoothing=1,
    )


_PERM_R = 64


@register(
    "stats_permutation_test",
    oracle=f"""
WITH pool AS (
  SELECT event_id AS u,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
         CASE WHEN event_type = '{_MWU_G1}' THEN 1 ELSE 0 END AS g1
  FROM events WHERE event_type IN ('{_MWU_G1}', '{_MWU_G2}')
),
obs AS (
  SELECT CAST(SUM(g1) AS BIGINT) AS n_a,
         CAST(COUNT(*) - SUM(g1) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN g1 = 1 THEN x ELSE 0 END) AS BIGINT) AS s_a,
         CAST(SUM(CASE WHEN g1 = 0 THEN x ELSE 0 END) AS BIGINT) AS s_b
  FROM pool
),
obs2 AS (SELECT n_a, n_b, s_a / n_a - s_b / n_b AS diff_obs FROM obs),
fanned AS (
  SELECT p.x, t.r,
         ((((p.u % 2147483647) + 2147483647) % 2147483647)
            * 2654435761 + t.r * 40503)
           % 2147483647 % 2 AS lbl
  FROM pool p
  CROSS JOIN (SELECT CAST(r AS BIGINT) AS r
              FROM range(1, {_PERM_R + 1}) t(r)) t
),
per AS (
  SELECT r, lbl, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s
  FROM fanned GROUP BY r, lbl
),
diffs AS (
  SELECT r,
         CAST(MAX(CASE WHEN lbl = 1 THEN s END) AS BIGINT)
           / CAST(MAX(CASE WHEN lbl = 1 THEN n END) AS BIGINT)
       - CAST(MAX(CASE WHEN lbl = 0 THEN s END) AS BIGINT)
           / CAST(MAX(CASE WHEN lbl = 0 THEN n END) AS BIGINT) AS d
  FROM per GROUP BY r
)
SELECT o.n_a, o.n_b, o.diff_obs,
       CAST(COUNT(*) AS BIGINT) AS n_resamples,
       CAST(SUM(CASE WHEN d IS NULL OR ABS(d) >= ABS(o.diff_obs)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_as_extreme,
       (CAST(SUM(CASE WHEN d IS NULL OR ABS(d) >= ABS(o.diff_obs)
                THEN 1 ELSE 0 END) AS BIGINT) + 1)
         / (CAST(COUNT(*) AS BIGINT) + 1) AS p_value
FROM diffs CROSS JOIN obs2 o
GROUP BY o.n_a, o.n_b, o.diff_obs
""",
    tags=("stats", "permutation", "randomization", "monte-carlo", "ab-test"),
)
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monte-Carlo randomization test on the click-vs-view mean
    difference — the assumption-free tier above Welch: 64 deterministic
    random-relabeling replicas (fixed LCG mix over event_id — no engine
    hash() in the plan, so the DuckDB twin reproduces every replica
    bit-for-bit), observed |diff| ranked against the replica
    distribution, add-one p-value. n_as_extreme is an exact integer;
    every double feeding its comparisons is a fixed expression tree
    over exact cent sums.

    Scale: one pass; the 64-way explode feeds an immediate map-side
    partial aggregation, so the shuffle carries 128 groups per
    partition, never the fanned stream. Delegates to the public
    ``permutation_test`` API (pipeline.py)."""
    from boltzmannclean_spark.pipeline import permutation_test

    ev = load_table(spark, sf_dir, "events")
    return permutation_test(
        ev,
        value=(dec("value") * 100),
        group_col="event_type",
        group_a=_MWU_G1,
        group_b=_MWU_G2,
        unit_col="event_id",
        n_resamples=_PERM_R,
    )


_BH_SEGS = 20
_BH_R = 32
_BH_Q_NUM, _BH_Q_DEN = 1, 10  # q = 0.10


@register(
    "stats_bh_fdr_permutation",
    oracle=f"""
WITH pool AS (
  SELECT user_id % {_BH_SEGS} AS seg, event_id AS u,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
         CASE WHEN event_type = '{_MWU_G1}' THEN 1 ELSE 0 END AS g1
  FROM events WHERE event_type IN ('{_MWU_G1}', '{_MWU_G2}')
),
obs AS (
  SELECT seg,
         CAST(SUM(g1) AS BIGINT) AS n_a,
         CAST(COUNT(*) - SUM(g1) AS BIGINT) AS n_b,
         CAST(SUM(CASE WHEN g1 = 1 THEN x ELSE 0 END) AS BIGINT) AS s_a,
         CAST(SUM(CASE WHEN g1 = 0 THEN x ELSE 0 END) AS BIGINT) AS s_b
  FROM pool GROUP BY seg
),
obs2 AS (
  SELECT seg, n_a, n_b, s_a / n_a - s_b / n_b AS diff_obs FROM obs
),
fanned AS (
  SELECT p.seg, p.x, t.r,
         ((((p.u % 2147483647) + 2147483647) % 2147483647)
            * 2654435761 + t.r * 40503)
           % 2147483647 % 2 AS lbl
  FROM pool p
  CROSS JOIN (SELECT CAST(r AS BIGINT) AS r
              FROM range(1, {_BH_R + 1}) t(r)) t
),
per AS (
  SELECT seg, r, lbl, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s
  FROM fanned GROUP BY seg, r, lbl
),
diffs AS (
  SELECT seg, r,
         CAST(MAX(CASE WHEN lbl = 1 THEN s END) AS BIGINT)
           / CAST(MAX(CASE WHEN lbl = 1 THEN n END) AS BIGINT)
       - CAST(MAX(CASE WHEN lbl = 0 THEN s END) AS BIGINT)
           / CAST(MAX(CASE WHEN lbl = 0 THEN n END) AS BIGINT) AS d
  FROM per GROUP BY seg, r
),
pv AS (
  SELECT o.seg, o.n_a, o.n_b,
         CAST(SUM(CASE WHEN d.d IS NULL OR ABS(d.d) >= ABS(o.diff_obs)
                  THEN 1 ELSE 0 END) AS BIGINT) + 1 AS ext1
  FROM diffs d JOIN obs2 o ON o.seg = d.seg
  GROUP BY o.seg, o.n_a, o.n_b
),
ranked AS (
  SELECT seg, n_a, n_b, ext1,
         CAST(ROW_NUMBER() OVER (ORDER BY ext1, seg) AS BIGINT) AS bh_rank,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM pv
),
cond AS (
  SELECT *,
         CASE WHEN ext1 * m * {_BH_Q_DEN}
                   <= bh_rank * {_BH_Q_NUM} * ({_BH_R} + 1)
              THEN bh_rank ELSE 0 END AS ok_rank
  FROM ranked
),
kstar AS (SELECT CAST(MAX(ok_rank) AS BIGINT) AS k_star FROM cond)
SELECT c.seg, c.n_a, c.n_b,
       c.ext1 / ({_BH_R} + 1) AS p_value,
       c.bh_rank,
       CAST(CASE WHEN c.bh_rank <= k.k_star THEN 1 ELSE 0 END AS BIGINT)
         AS is_discovery
FROM cond c CROSS JOIN kstar k
ORDER BY c.seg
""",
    tags=("stats", "fdr", "benjamini-hochberg", "permutation", "multiple-testing"),
)
def stats_bh_fdr_permutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over a FLEET of per-segment
    randomization tests — what an experimentation platform actually
    runs: 20 user-hash segments, each with its own click-vs-view
    permutation p-value (32 deterministic LCG-relabeled replicas, the
    stats_permutation_test machinery with a segment key), then the BH
    step-up at q = 0.10 decided ENTIRELY in integers: p_i <= q·i/m
    rewrites to (n_extreme_i + 1)·m·q_den <= i·q_num·(R + 1) — no
    float ever enters the discovery decision, and ties in p are pinned
    by segment id, so the discovery set is bit-reproducible at any
    parallelism. Output per segment: p_value (one exact-integer
    division, display only), BH rank, and the step-up discovery flag.

    Scale: the replica fan-out combines map-side to (seg, r, lbl) =
    20·32·2 groups per partition — never the fanned stream; the BH
    ranking is a window over a 20-row table. The m hypotheses here are
    segments, but the same plan shape handles thousands of metrics ×
    slices (m grows the tiny table, never the scan count)."""
    ev = load_table(spark, sf_dir, "events")
    big_p = 2147483647
    pool = ev.where(F.col("event_type").isin(_MWU_G1, _MWU_G2)).select(
        F.expr(f"user_id % {_BH_SEGS}").alias("seg"),
        F.col("event_id").alias("u"),
        (dec("value") * 100).cast("long").alias("x"),
        F.when(F.col("event_type") == _MWU_G1, 1).otherwise(0).alias("g1"),
    )
    obs = pool.groupBy("seg").agg(
        F.sum("g1").cast("long").alias("n_a"),
        (F.count(F.lit(1)) - F.sum("g1")).cast("long").alias("n_b"),
        F.sum(F.when(F.col("g1") == 1, F.col("x")).otherwise(0))
        .cast("long")
        .alias("s_a"),
        F.sum(F.when(F.col("g1") == 0, F.col("x")).otherwise(0))
        .cast("long")
        .alias("s_b"),
    )
    obs2 = obs.select(
        "seg",
        "n_a",
        "n_b",
        (F.col("s_a") / F.col("n_a") - F.col("s_b") / F.col("n_b")).alias(
            "diff_obs"
        ),
    )
    fanned = pool.select(
        "seg",
        "x",
        F.explode(
            F.array(*[F.lit(r).cast("long") for r in range(1, _BH_R + 1)])
        ).alias("r"),
        "u",
    ).select(
        "seg",
        "x",
        "r",
        (
            (
                F.pmod(F.col("u"), F.lit(big_p)) * F.lit(2654435761)
                + F.col("r") * F.lit(40503)
            )
            % big_p
            % 2
        ).alias("lbl"),
    )
    per = fanned.groupBy("seg", "r", "lbl").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    diffs = per.groupBy("seg", "r").agg(
        (
            F.max(F.when(F.col("lbl") == 1, F.col("s"))).cast("long")
            / F.max(F.when(F.col("lbl") == 1, F.col("n"))).cast("long")
            - F.max(F.when(F.col("lbl") == 0, F.col("s"))).cast("long")
            / F.max(F.when(F.col("lbl") == 0, F.col("n"))).cast("long")
        ).alias("d")
    )
    pv = (
        diffs.join(F.broadcast(obs2), "seg")
        .groupBy("seg", "n_a", "n_b")
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("d").isNull()
                        | (F.abs(F.col("d")) >= F.abs(F.col("diff_obs"))),
                        1,
                    ).otherwise(0)
                )
                + 1
            )
            .cast("long")
            .alias("ext1")
        )
    )
    w = Window.orderBy("ext1", "seg")
    ranked = pv.select(
        "seg",
        "n_a",
        "n_b",
        "ext1",
        F.row_number().over(w).cast("long").alias("bh_rank"),
        F.count(F.lit(1))
        .over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .cast("long")
        .alias("m"),
    )
    cond = ranked.withColumn(
        "ok_rank",
        F.when(
            F.col("ext1") * F.col("m") * _BH_Q_DEN
            <= F.col("bh_rank") * _BH_Q_NUM * (_BH_R + 1),
            F.col("bh_rank"),
        ).otherwise(0),
    )
    kstar = cond.agg(F.max("ok_rank").cast("long").alias("k_star"))
    return (
        cond.crossJoin(F.broadcast(kstar))
        .select(
            "seg",
            "n_a",
            "n_b",
            (F.col("ext1") / F.lit(_BH_R + 1)).alias("p_value"),
            "bh_rank",
            F.when(F.col("bh_rank") <= F.col("k_star"), 1)
            .otherwise(0)
            .cast("long")
            .alias("is_discovery"),
        )
        .orderBy("seg")
    )


@register(
    "stats_chi_square_independence",
    oracle="""
WITH pool AS (
  SELECT event_type,
         CAST(props ->> '$.k' AS BIGINT) // 25 AS kb
  FROM events
),
cells AS (
  SELECT event_type, kb, CAST(COUNT(*) AS BIGINT) AS o
  FROM pool GROUP BY 1, 2
),
rows_ AS (
  SELECT event_type, CAST(SUM(o) AS BIGINT) AS row_tot FROM cells GROUP BY 1
),
cols_ AS (
  SELECT kb, CAST(SUM(o) AS BIGINT) AS col_tot FROM cells GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(o) AS BIGINT) AS n_total,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r,
         CAST(COUNT(DISTINCT kb) AS BIGINT) AS c
  FROM cells
),
grid AS (
  SELECT r_.event_type, c_.kb, COALESCE(ce.o, 0) AS o,
         r_.row_tot, c_.col_tot, t.n_total,
         (r_.row_tot * c_.col_tot) AS e_num,
         (t.n_total * COALESCE(ce.o, 0) - r_.row_tot * c_.col_tot) AS d,
         (t.r - 1) * (t.c - 1) AS dof
  FROM rows_ r_ CROSS JOIN cols_ c_ CROSS JOIN tot t
  LEFT JOIN cells ce
    ON ce.event_type = r_.event_type AND ce.kb = c_.kb
),
terms AS (
  SELECT event_type, kb, o, row_tot, col_tot, n_total, dof,
         CAST(CAST(CAST(d AS DECIMAL(38,0)) * CAST(d AS DECIMAL(38,0))
                   AS STRING) AS DOUBLE)
           / CAST(e_num * n_total AS DOUBLE) AS term
  FROM grid
)
SELECT event_type, kb, o, row_tot, col_tot, n_total, dof,
       term,
       CAST(SUM(term) OVER () AS FLOAT) AS chi2_f
FROM terms
ORDER BY event_type, kb
""",
    tags=("stats", "chi-square", "independence", "contingency", "ab-test"),
)
def stats_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence on the event_type ×
    k-segment contingency table (k from events.props JSON, bucketed
    div 25) — the categorical companion to the two-sample tier: "is
    the event mix independent of the user segment", the test behind
    every funnel-mix or device-mix alarm. Every component is exact:
    cell counts, margins, N, dof, and the per-cell discrepancy
    d = N·O − row·col as a bigint with its square in DECIMAL(38,0)
    (string-hopped to double, the correctly-rounded cast); each cell's
    term (d²/(row·col·N)) is ONE fixed expression tree over exact
    values so it is bit-equal across engines as a DOUBLE. The full
    r×c grid is materialized from the margins (absent combinations
    enter as O=0 — they contribute, exactly as the textbook statistic
    requires). chi2_f is the FLOAT-cast sum of the 20 cell terms (the
    libm-absorbing contract, psi precedent); the exact per-cell terms
    ride along so a consumer needing more precision re-sums —
    the components-not-p-value contract of welch/brown-forsythe.

    Scale: one map-combined groupBy compresses the stream to the r×c
    cell grid; margins/total are grid-sized aggregations; the grid
    cross-join is r×c rows. Nothing row-scale shuffles twice."""
    ev = load_table(spark, sf_dir, "events")
    pool = ev.select(
        "event_type",
        F.expr("CAST(get_json_object(props, '$.k') AS BIGINT) div 25").alias(
            "kb"
        ),
    )
    cells = pool.groupBy("event_type", "kb").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    rows_ = cells.groupBy("event_type").agg(
        F.sum("o").cast("long").alias("row_tot")
    )
    cols_ = cells.groupBy("kb").agg(F.sum("o").cast("long").alias("col_tot"))
    tot = cells.agg(
        F.sum("o").cast("long").alias("n_total"),
        F.countDistinct("event_type").cast("long").alias("r"),
        F.countDistinct("kb").cast("long").alias("c"),
    )
    grid = (
        rows_.crossJoin(F.broadcast(cols_))
        .crossJoin(F.broadcast(tot))
        .join(cells, ["event_type", "kb"], "left")
        .select(
            "event_type",
            "kb",
            F.coalesce(F.col("o"), F.lit(0)).cast("long").alias("o"),
            "row_tot",
            "col_tot",
            "n_total",
            (F.col("row_tot") * F.col("col_tot")).alias("e_num"),
            (
                F.col("n_total") * F.coalesce(F.col("o"), F.lit(0))
                - F.col("row_tot") * F.col("col_tot")
            ).alias("d"),
            ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        )
    )
    terms = grid.select(
        "event_type",
        "kb",
        "o",
        "row_tot",
        "col_tot",
        "n_total",
        "dof",
        (
            F.expr(
                "CAST(CAST(CAST(d AS DECIMAL(38,0))"
                " * CAST(d AS DECIMAL(38,0)) AS STRING) AS DOUBLE)"
            )
            / (F.col("e_num") * F.col("n_total")).cast("double")
        ).alias("term"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        terms.withColumn("chi2_f", F.sum("term").over(w_all).cast("float"))
        .orderBy("event_type", "kb")
    )


@register(
    "stats_anova_oneway",
    oracle="""
WITH pool AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS HUGEINT) AS x
  FROM events
),
grp AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS s1e,
         CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS s1,
         CAST(CAST(SUM(x * x) AS VARCHAR) AS DOUBLE) AS s2
  FROM pool GROUP BY event_type
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(CAST(SUM(s1e) AS VARCHAR) AS DOUBLE) AS s1_all
  FROM grp
),
terms AS (
  SELECT g.event_type, g.n, g.s1 / g.n AS mean_x,
         (g.s1 / g.n) * g.s1 AS t_between,
         g.s2 - (g.s1 / g.n) * g.s1 AS ss_within,
         t.n_total, t.k, t.s1_all,
         (t.k - 1) AS df_between, (t.n_total - t.k) AS df_within
  FROM grp g CROSS JOIN tot t
)
SELECT event_type, n, mean_x, ss_within, n_total, k,
       df_between, df_within,
       CAST(
         ((SUM(t_between) OVER () - (s1_all / n_total) * s1_all)
            / (k - 1))
         / ((SUM(ss_within) OVER ()) / (n_total - k))
       AS FLOAT) AS f_stat
FROM terms
ORDER BY event_type
""",
    tags=("stats", "anova", "f-test", "ab-test", "parametric"),
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F over the k=5 event_type arms (value in exact
    cent units) — the k-group parametric companion to welch_ttest
    (k=2) and kruskal_wallis (k-group nonparametric): "does mean value
    differ across arms at all", the omnibus gate run before any
    pairwise test. Sufficient statistics are exact: per-group n,
    Σx, Σx² accumulate in HUGEINT/DECIMAL(38,0) and string-hop to
    double (the correctly-rounded cast), so every per-group component
    — mean, between-term (Σx/n)·Σx, within-SS Σx² − (Σx/n)·Σx — is
    ONE fixed IEEE expression tree, bit-equal across engines. The two
    grand sums (SSB's Σ t_between and SSW's Σ ss_within) run over the
    k=5 group rows, and f_stat absorbs their merge-order last-ulp in
    the FLOAT cast (the chi2_f/psi contract); the exact per-group
    components ride along for a consumer needing full precision.

    Scale: one map-combined groupBy compresses N rows to k group rows;
    everything after is k-row arithmetic with a broadcast 1-row total.
    Identical shape at 100 TB — the scan dominates, nothing row-scale
    shuffles twice."""
    ev = load_table(spark, sf_dir, "events")
    pool = ev.select(
        "event_type",
        (dec("value") * 100).cast("decimal(38,0)").alias("x"),
    )
    grp = pool.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("SUM(x)").alias("s1e"),
        F.expr("CAST(CAST(SUM(x) AS STRING) AS DOUBLE)").alias("s1"),
        F.expr("CAST(CAST(SUM(x * x) AS STRING) AS DOUBLE)").alias("s2"),
    )
    tot = grp.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.expr("CAST(CAST(SUM(s1e) AS STRING) AS DOUBLE)").alias("s1_all"),
    )
    terms = grp.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean_x"),
        ((F.col("s1") / F.col("n")) * F.col("s1")).alias("t_between"),
        (F.col("s2") - (F.col("s1") / F.col("n")) * F.col("s1")).alias(
            "ss_within"
        ),
        "n_total",
        "k",
        "s1_all",
        (F.col("k") - 1).alias("df_between"),
        (F.col("n_total") - F.col("k")).alias("df_within"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        terms.withColumn(
            "f_stat",
            (
                (
                    (
                        F.sum("t_between").over(w_all)
                        - (F.col("s1_all") / F.col("n_total"))
                        * F.col("s1_all")
                    )
                    / (F.col("k") - 1)
                )
                / (
                    F.sum("ss_within").over(w_all)
                    / (F.col("n_total") - F.col("k"))
                )
            ).cast("float"),
        )
        .drop("t_between", "s1_all")
        .orderBy("event_type")
    )


@register(
    "stats_spearman_rho",
    oracle="""
WITH pool AS (
  SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
         CAST(props ->> '$.k' AS BIGINT) AS y
  FROM events
),
rx AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS t FROM pool GROUP BY x
),
rx2 AS (
  SELECT x,
         2 * (SUM(t) OVER (ORDER BY x) - t) + t + 1 AS rx2
  FROM rx
),
ry AS (
  SELECT y, CAST(COUNT(*) AS BIGINT) AS t FROM pool GROUP BY y
),
ry2 AS (
  SELECT y,
         2 * (SUM(t) OVER (ORDER BY y) - t) + t + 1 AS ry2
  FROM ry
),
ranked AS (
  SELECT rx2.rx2 AS rxx, ry2.ry2 AS ryy
  FROM pool JOIN rx2 USING (x) JOIN ry2 USING (y)
),
sums AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(rxx AS HUGEINT)) AS sx,
         SUM(CAST(ryy AS HUGEINT)) AS sy,
         SUM(CAST(rxx AS HUGEINT) * ryy) AS sxy,
         SUM(CAST(rxx AS HUGEINT) * rxx) AS sxx,
         SUM(CAST(ryy AS HUGEINT) * ryy) AS syy
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS cov_num,
       CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS var_x_num,
       CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS var_y_num,
       CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
         / SQRT(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
                * CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE))
         AS spearman_rho
FROM sums
""",
    tags=("stats", "spearman", "rank-correlation", "nonparametric"),
)
def stats_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between event value (cent units) and
    the k property — the monotone-association companion to
    agg_corr_matrix's Pearson: robust to the heavy tails and outliers
    that dominate raw usage metrics. Average ranks for ties are kept
    in EXACT ×2 integer units (the mann_whitney_u identity: avg rank
    of a tie group = below + (t+1)/2, so ×2 = 2·below + t + 1 is
    always integral); the ×2 scaling cancels in rho. All five
    correlation sums (Σr, Σr², Σrxry) accumulate exactly in
    HUGEINT/DECIMAL(38,0) — rank² ≤ (2N)², so N·Σr² ≤ 4N⁴ stays
    inside 38 digits to N ≈ 10⁹ rows — and the three covariance
    numerators n·Σxy − Σx·Σy are formed in EXACT integer arithmetic
    before ONE string-hopped cast each, so rho is a single IEEE
    div/sqrt tree over bit-identical operands: bit-equal across
    engines with no float aggregation anywhere.

    Scale: ranking is per DISTINCT VALUE, not per row — each variable
    compresses to its value domain (2-dp money / small-int k), the
    prefix sums run over those tiny tables (route through
    ``functions/prefix.sharded_prefix_sum`` at an unbounded domain),
    and the rank maps broadcast back onto the single row-scale scan.

    r15 (guide §2.3): ONE row-scale pass total. The events scan (and
    its per-row JSON parse, the measured cost center) previously ran
    three times — once per rank domain and once for the ranked join.
    Now a single groupBy compresses the scan to the JOINT (x, y)
    domain with an exact int64 weight c; both rank domains are
    re-aggregations of the joint frame (pinned, domain-sized) and the
    five correlation sums accumulate c·rxx·ryy etc. in the same
    DECIMAL(38,0) arithmetic. Weighted integer sums over the joint
    domain equal the per-row sums in any order (exact decimal adds
    commute), so every output bit is unchanged; c·rxx·ryy ≤ 8N³ keeps
    38-digit headroom to the same N ≈ 10⁹ bound."""
    ev = load_table(spark, sf_dir, "events")
    pool = ev.select(
        (dec("value") * 100).cast("long").alias("x"),
        F.expr("CAST(get_json_object(props, '$.k') AS BIGINT)").alias("y"),
    )
    joint = (
        pool.groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    rxd = joint.groupBy("x").agg(F.sum("c").cast("long").alias("t"))
    wx = Window.orderBy("x")
    rx2 = rxd.select(
        "x",
        (2 * (F.sum("t").over(wx) - F.col("t")) + F.col("t") + 1).alias(
            "rx2"
        ),
    )
    ryd = joint.groupBy("y").agg(F.sum("c").cast("long").alias("t"))
    wy = Window.orderBy("y")
    ry2 = ryd.select(
        "y",
        (2 * (F.sum("t").over(wy) - F.col("t")) + F.col("t") + 1).alias(
            "ry2"
        ),
    )
    ranked = (
        joint.join(F.broadcast(rx2), "x")
        .join(F.broadcast(ry2), "y")
        .select(
            F.col("c").cast("decimal(38,0)").alias("c"),
            F.col("rx2").cast("decimal(38,0)").alias("rxx"),
            F.col("ry2").cast("decimal(38,0)").alias("ryy"),
        )
    )
    sums = ranked.agg(
        F.sum(F.col("c")).alias("n"),
        F.sum(F.col("c") * F.col("rxx")).alias("sx"),
        F.sum(F.col("c") * F.col("ryy")).alias("sy"),
        F.sum(F.col("c") * F.col("rxx") * F.col("ryy")).alias("sxy"),
        F.sum(F.col("c") * F.col("rxx") * F.col("rxx")).alias("sxx"),
        F.sum(F.col("c") * F.col("ryy") * F.col("ryy")).alias("syy"),
    )
    return sums.selectExpr(
        "CAST(n AS BIGINT) AS n_rows",
        "CAST(CAST(n * sxy - sx * sy AS STRING) AS DOUBLE) AS cov_num",
        "CAST(CAST(n * sxx - sx * sx AS STRING) AS DOUBLE) AS var_x_num",
        "CAST(CAST(n * syy - sy * sy AS STRING) AS DOUBLE) AS var_y_num",
        "CAST(CAST(n * sxy - sx * sy AS STRING) AS DOUBLE)"
        " / SQRT(CAST(CAST(n * sxx - sx * sx AS STRING) AS DOUBLE)"
        " * CAST(CAST(n * syy - sy * sy AS STRING) AS DOUBLE))"
        " AS spearman_rho",
    )


@register(
    "stats_cramers_v",
    oracle="""
WITH pool AS (
  SELECT event_type,
         CAST(props ->> '$.k' AS BIGINT) // 25 AS kb
  FROM events
),
cells AS (
  SELECT event_type, kb, CAST(COUNT(*) AS BIGINT) AS o
  FROM pool GROUP BY 1, 2
),
rows_ AS (
  SELECT event_type, CAST(SUM(o) AS BIGINT) AS row_tot FROM cells GROUP BY 1
),
cols_ AS (
  SELECT kb, CAST(SUM(o) AS BIGINT) AS col_tot FROM cells GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(o) AS BIGINT) AS n_total,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r,
         CAST(COUNT(DISTINCT kb) AS BIGINT) AS c
  FROM cells
),
diffs AS (
  -- d and e_den in HUGEINT (128-bit): the BIGINT products overflow
  -- loudly at n ~ 2-3e9 events; HUGEINT mirrors Spark's DECIMAL(38,0)
  -- width. String-hop to DOUBLE is correctly rounded on both engines.
  SELECT t.n_total, t.r, t.c,
         CAST(t.n_total AS HUGEINT) * COALESCE(ce.o, 0)
           - CAST(r_.row_tot AS HUGEINT) * c_.col_tot AS d,
         CAST(r_.row_tot AS HUGEINT) * c_.col_tot * t.n_total AS e_den
  FROM rows_ r_ CROSS JOIN cols_ c_ CROSS JOIN tot t
  LEFT JOIN cells ce
    ON ce.event_type = r_.event_type AND ce.kb = c_.kb
),
terms AS (
  SELECT n_total, r, c,
         CAST(CAST(d * d AS VARCHAR) AS DOUBLE)
           / CAST(CAST(e_den AS VARCHAR) AS DOUBLE) AS term
  FROM diffs
)
SELECT n_total, r, c,
       CAST(SUM(term) AS FLOAT) AS chi2_f,
       CAST(SQRT(CAST(CAST(SUM(term) AS FLOAT) AS DOUBLE)
                 / (n_total * LEAST(r - 1, c - 1))) AS FLOAT) AS cramers_v
FROM terms
GROUP BY n_total, r, c
""",
    tags=("stats", "cramers-v", "effect-size", "contingency"),
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size over the event_type × k-segment
    contingency table — the companion stats_chi_square_independence
    omits by contract: χ² says WHETHER the mix depends on the segment,
    V = √(χ²/(N·min(r−1,c−1))) says HOW MUCH on a 0..1 scale that a
    monitoring threshold can be written against (χ² itself grows with
    N, so "alert when χ² > T" silently tightens as traffic grows —
    the exact failure mode effect sizes exist to fix). Reuses the
    chi-square cell discipline: exact counts/margins, per-cell
    d = N·O − row·col squared in DECIMAL(38,0) and string-hopped; the
    20-term sum lands as FLOAT (the merge-order-absorbing contract)
    and V is one fixed sqrt tree over that float — bit-equal across
    engines. Output is the 1-row summary (n, r, c, χ², V).

    Scale: identical to chi_square_independence — one map-combined
    groupBy to the r×c grid, margins are grid-sized, output is 1 row."""
    ev = load_table(spark, sf_dir, "events")
    pool = ev.select(
        "event_type",
        F.expr("CAST(get_json_object(props, '$.k') AS BIGINT) div 25").alias(
            "kb"
        ),
    )
    cells = pool.groupBy("event_type", "kb").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    rows_ = cells.groupBy("event_type").agg(
        F.sum("o").cast("long").alias("row_tot")
    )
    cols_ = cells.groupBy("kb").agg(F.sum("o").cast("long").alias("col_tot"))
    tot = cells.agg(
        F.sum("o").cast("long").alias("n_total"),
        F.countDistinct("event_type").cast("long").alias("r"),
        F.countDistinct("kb").cast("long").alias("c"),
    )
    grid = (
        rows_.crossJoin(F.broadcast(cols_))
        .crossJoin(F.broadcast(tot))
        .join(cells, ["event_type", "kb"], "left")
        .select(
            "n_total",
            "r",
            "c",
            # d likewise in DECIMAL(38,0): n*o and row*col are n²-bounded
            # products, overflowing 64-bit at n ≈ 3.04e9 events.
            F.expr(
                "CAST(n_total AS DECIMAL(38,0))"
                " * CAST(COALESCE(o, 0) AS DECIMAL(38,0))"
                " - CAST(row_tot AS DECIMAL(38,0))"
                " * CAST(col_tot AS DECIMAL(38,0))"
            ).alias("d"),
            # e_den = row_tot * col_tot * n_total formed in
            # DECIMAL(38,0), not 64-bit longs (r11 ADVICE): the triple
            # product is bounded by n³, which exceeds 2^63 at
            # n ≈ 2.1M events — DuckDB's BIGINT fails loudly there but
            # non-ANSI Spark would wrap silently. DECIMAL(38,0) holds
            # up to n = 10^12 events; string-hop to double is correctly
            # rounded on both engines (same discipline as d²).
            F.expr(
                "CAST(row_tot AS DECIMAL(38,0)) * CAST(col_tot AS"
                " DECIMAL(38,0)) * CAST(n_total AS DECIMAL(38,0))"
            ).alias("e_den"),
        )
    )
    terms = grid.select(
        "n_total",
        "r",
        "c",
        (
            F.expr(
                "CAST(CAST(CAST(d AS DECIMAL(38,0))"
                " * CAST(d AS DECIMAL(38,0)) AS STRING) AS DOUBLE)"
            )
            / F.expr("CAST(CAST(e_den AS STRING) AS DOUBLE)")
        ).alias("term"),
    )
    return (
        terms.groupBy("n_total", "r", "c")
        .agg(F.sum("term").cast("float").alias("chi2_f"))
        .select(
            "n_total",
            "r",
            "c",
            "chi2_f",
            F.sqrt(
                F.col("chi2_f").cast("double")
                / (
                    F.col("n_total")
                    * F.least(F.col("r") - 1, F.col("c") - 1)
                )
            )
            .cast("float")
            .alias("cramers_v"),
        )
    )


_SRM_ORACLE = """
WITH users AS (
  SELECT DISTINCT user_id FROM events
),
bucketed AS (
  SELECT substring(md5(user_id::VARCHAR), 1, 1) AS bucket
  FROM users
),
cells AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM bucketed GROUP BY bucket
),
tot AS (
  SELECT CAST(SUM(n_users) AS BIGINT) AS n_total,
         CAST(SUM(n_users * n_users) AS BIGINT) AS sum_sq
  FROM cells
)
SELECT c.bucket, c.n_users, t.n_total,
       CAST(15 AS BIGINT) AS dof,
       (16.0 * t.sum_sq - CAST(t.n_total AS DOUBLE) * t.n_total)
         / t.n_total AS srm_chi2
FROM cells c CROSS JOIN tot t
ORDER BY c.bucket
"""


@register(
    "stats_srm_check",
    oracle=_SRM_ORACLE,
    tags=("stats", "srm", "experiment-assignment", "goodness-of-fit"),
)
def stats_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check over deterministic hash assignment —
    the guardrail every experimentation platform runs before reading a
    single metric: assign each user to one of 16 buckets by the first
    md5 hex digit of user_id (the engine-portable assignment idiom,
    sample_hash_reproducible precedent: stable under reruns,
    repartitioning, and engine migrations), then a chi-square
    goodness-of-fit against the uniform 1/16 expectation. The GOF
    statistic collapses to the EXACT integer identity
    χ² = (16·ΣOᵢ² − N²)/N (expand Σ(Oᵢ−N/16)²/(N/16)), so both counts
    and the statistic's numerator are exact bigints and srm_chi2 is
    one IEEE division of identical operands — no float aggregation,
    bit-equal across engines. dof = 15 rides along; the caller
    compares against its own critical value (components-not-p-value
    contract).

    Scale: distinct users is one map-combined aggregation; 16 cells
    after. The md5 evaluates per distinct user, not per event. At
    100 TB the scan dominates; the statistic is grid-sized."""
    ev = load_table(spark, sf_dir, "events")
    return srm_from_users(ev.select("user_id").distinct())


def srm_from_users(users: DataFrame) -> DataFrame:
    """The SRM reduction over a distinct-user DataFrame — shared by
    the batch leg (stats_srm_check) and the streaming monitor
    (streaming/queries.stream_srm_monitor), so both run the LITERAL
    same expression tree and agree bit-for-bit (the
    stream_psi_drift / _psi_from_counts precedent)."""
    cells = (
        users.select(
            F.substring(
                F.md5(F.col("user_id").cast("string")), 1, 1
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    tot = cells.agg(
        F.sum("n_users").cast("long").alias("n_total"),
        F.sum(F.col("n_users") * F.col("n_users")).cast("long").alias(
            "sum_sq"
        ),
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_users",
            "n_total",
            F.lit(15).cast("long").alias("dof"),
            (
                (
                    16.0 * F.col("sum_sq")
                    - F.col("n_total").cast("double") * F.col("n_total")
                )
                / F.col("n_total")
            ).alias("srm_chi2"),
        )
        .orderBy("bucket")
    )


@register(
    "dq_rowcount_anomaly",
    oracle="""
WITH daily AS (
  SELECT epoch_us(date_trunc('day', ts)) AS day_us,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM events GROUP BY 1
),
med AS (
  SELECT day_us, n_rows,
         (SELECT CAST(lst[(LEN(lst) + 1) // 2] AS BIGINT)
          FROM (SELECT LIST(n_rows ORDER BY n_rows) AS lst FROM daily))
           AS med_rows
  FROM daily
),
mad AS (
  SELECT day_us, n_rows, med_rows,
         (SELECT CAST(lst[(LEN(lst) + 1) // 2] AS BIGINT)
          FROM (SELECT LIST(ABS(n_rows - med_rows)
                            ORDER BY ABS(n_rows - med_rows)) AS lst
                FROM med))
           AS mad_rows
  FROM med
)
SELECT day_us, n_rows, med_rows, mad_rows,
       CASE WHEN mad_rows = 0 THEN CAST(n_rows - med_rows AS DOUBLE)
            ELSE CAST(n_rows - med_rows AS DOUBLE) / mad_rows END
         AS robust_z,
       CASE WHEN 2 * ABS(n_rows - med_rows) > 7 * mad_rows THEN 1
            ELSE 0 END AS is_alarm
FROM mad
ORDER BY day_us
""",
    tags=("dq", "rowcount", "anomaly", "monitoring"),
)
def dq_rowcount_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-volume anomaly monitor: per-day ingest row counts
    flagged by robust (median/MAD) z-score — the "did yesterday's
    partition land short" check every warehouse runs before letting
    consumers read, robust where a mean/stddev gate is poisoned by the
    very outage it should catch. Counts, the lower median (the
    window_rolling_median element-of-sorted-list idiom), MAD, and the
    alarm decision 2·|n−med| > 7·mad (3.5 MAD units) are ALL exact
    integer arithmetic — the flag can never flip on a float last-ulp;
    robust_z rides along as one IEEE division (zero-MAD days fall back
    to the raw deviation — the window_hampel_filter contract).

    Scale: one map-combined groupBy compresses the stream to the day
    domain; the two medians run on that domain-sized table (at an
    unbounded partition domain use the count-bucket sharded prefix
    sum, functions/prefix.py). The scan dominates at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("day_us")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    lst = F.array_sort(F.collect_list("n_rows").over(w_all))
    med = daily.withColumn(
        "med_rows",
        F.element_at(lst, ((F.size(lst) + 1) / 2).cast("int")).cast("long"),
    )
    dlst = F.array_sort(
        F.collect_list(F.abs(F.col("n_rows") - F.col("med_rows"))).over(w_all)
    )
    mad = med.withColumn(
        "mad_rows",
        F.element_at(dlst, ((F.size(dlst) + 1) / 2).cast("int")).cast(
            "long"
        ),
    )
    d = F.col("n_rows") - F.col("med_rows")
    return (
        mad.select(
            "day_us",
            "n_rows",
            "med_rows",
            "mad_rows",
            F.when(F.col("mad_rows") == 0, d.cast("double"))
            .otherwise(d.cast("double") / F.col("mad_rows"))
            .alias("robust_z"),
            F.when(
                2 * F.abs(d) > 7 * F.col("mad_rows"), F.lit(1)
            )
            .otherwise(F.lit(0))
            .alias("is_alarm"),
        )
        .orderBy("day_us")
    )


_JK_B = 32  # jackknife blocks


@register(
    "stats_jackknife_ci_mean",
    oracle=f"""
WITH pool AS (
  SELECT CAST((event_id * 1103515245 + 12345) % 2147483648 AS BIGINT)
           % {_JK_B} AS block,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS HUGEINT) AS x
  FROM events
),
blk AS (
  SELECT block, CAST(COUNT(*) AS BIGINT) AS n_b,
         SUM(x) AS s_be,
         CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS s_b
  FROM pool GROUP BY block
),
tot AS (
  SELECT CAST(SUM(n_b) AS BIGINT) AS n_total,
         CAST(CAST(SUM(s_be) AS VARCHAR) AS DOUBLE) AS s_all,
         CAST(COUNT(*) AS BIGINT) AS b
  FROM blk
),
loo AS (
  SELECT blk.block, blk.n_b,
         (t.s_all - blk.s_b) / (t.n_total - blk.n_b) AS mean_loo,
         t.s_all / t.n_total AS mean_all, t.b
  FROM blk CROSS JOIN tot t
)
SELECT block, n_b, mean_loo, mean_all, b AS n_blocks,
       CAST(1.96 * SQRT(
         (CAST(b - 1 AS DOUBLE) / b)
         * (SUM(mean_loo * mean_loo) OVER ()
            - (SUM(mean_loo) OVER ()) * (SUM(mean_loo) OVER ()) / b)
       ) AS FLOAT) AS ci_half_f
FROM loo
ORDER BY block
""",
    tags=("stats", "jackknife", "confidence-interval", "resampling"),
)
def stats_jackknife_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-jackknife 95% confidence interval for the mean event
    value — the assumption-free interval the experimentation tier
    reports next to its test statistics, and the estimator that stays
    honest under within-block correlation (users/sessions landing in
    the same block) where the naive s/√n interval is too narrow. The
    32 blocks come from the fixed LCG mix over event_id (the
    permutation-test discipline — deterministic in any engine at any
    parallelism); per-block and grand sums are exact
    HUGEINT/DECIMAL(38,0) string-hopped, so every leave-one-block-out
    mean (S−s_b)/(N−n_b) is ONE fixed IEEE tree, bit-equal across
    engines. The CI half-width needs Σm_b and Σm_b² over the 32
    block rows — two window sums whose merge-order last-ulp is
    absorbed by the single final FLOAT cast (the anova/chi2 contract);
    the exact per-block components ride along.

    Scale: one map-combined groupBy to 32 block rows; everything
    after is 32-row arithmetic. The LCG is a per-row projection —
    no extra pass, no shuffle beyond the block aggregation."""
    ev = load_table(spark, sf_dir, "events")
    pool = ev.select(
        F.expr(
            "CAST((event_id * CAST(1103515245 AS BIGINT) + 12345)"
            f" % 2147483648 AS BIGINT) % {_JK_B}"
        ).alias("block"),
        (dec("value") * 100).cast("decimal(38,0)").alias("x"),
    )
    blk = pool.groupBy("block").agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.expr("SUM(x)").alias("s_be"),
        F.expr("CAST(CAST(SUM(x) AS STRING) AS DOUBLE)").alias("s_b"),
    )
    tot = blk.agg(
        F.sum("n_b").cast("long").alias("n_total"),
        F.expr("CAST(CAST(SUM(s_be) AS STRING) AS DOUBLE)").alias("s_all"),
        F.count(F.lit(1)).cast("long").alias("b"),
    )
    loo = blk.crossJoin(F.broadcast(tot)).select(
        "block",
        "n_b",
        (
            (F.col("s_all") - F.col("s_b"))
            / (F.col("n_total") - F.col("n_b"))
        ).alias("mean_loo"),
        (F.col("s_all") / F.col("n_total")).alias("mean_all"),
        F.col("b"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        loo.select(
            "block",
            "n_b",
            "mean_loo",
            "mean_all",
            F.col("b").alias("n_blocks"),
            (
                1.96
                * F.sqrt(
                    ((F.col("b") - 1).cast("double") / F.col("b"))
                    * (
                        F.sum(
                            F.col("mean_loo") * F.col("mean_loo")
                        ).over(w_all)
                        - F.sum("mean_loo").over(w_all)
                        * F.sum("mean_loo").over(w_all)
                        / F.col("b")
                    )
                )
            )
            .cast("float")
            .alias("ci_half_f"),
        )
        .orderBy("block")
    )


@register(
    "stats_proportion_ci_wilson",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS conv
  FROM events GROUP BY user_id
),
armed AS (
  SELECT CASE WHEN substring(md5(user_id::VARCHAR), 1, 1)
                IN ('0','1','2','3','4','5','6','7')
              THEN 'A' ELSE 'B' END AS arm,
         conv
  FROM per_user
),
cells AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(conv) AS BIGINT) AS x
  FROM armed GROUP BY arm
)
SELECT arm, n, x,
       CAST(x AS DOUBLE) / n AS p_hat,
       (x + 3.8416 / 2) / (n + 3.8416)
         - 1.96 / (n + 3.8416)
           * SQRT(CAST(x * (n - x) AS DOUBLE) / n + 3.8416 / 4) AS ci_lo,
       (x + 3.8416 / 2) / (n + 3.8416)
         + 1.96 / (n + 3.8416)
           * SQRT(CAST(x * (n - x) AS DOUBLE) / n + 3.8416 / 4) AS ci_hi
FROM cells
ORDER BY arm
""",
    tags=("stats", "wilson", "confidence-interval", "proportion", "ab-test"),
)
def stats_proportion_ci_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% confidence interval for per-arm conversion
    rate — the interval every A/B readout should print instead of the
    Wald p̂ ± z·√(p̂q̂/n) (which collapses to zero width at p̂ ∈ {0,1}
    and undercovers at small x; Wilson is the standard fix, Brown et
    al. 2001). Users split into arms by the md5-digit hash (the
    stats_srm_check assignment — the two operators together are the
    readout pair: SRM gate first, then this interval); conversion is
    "user has ≥1 purchase event". n, x, and x·(n−x) are exact
    bigints; the interval endpoints are ONE fixed IEEE tree each over
    exact operands and the double literals 1.96/3.8416 (decimal
    literals parse to identical doubles in both engines) — bit-equal
    with no float aggregation.

    Scale: one map-combined per-user groupBy (the scan), then a
    2-row arm aggregation. Nothing row-scale shuffles twice."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("conv")
    )
    armed = per_user.select(
        F.when(
            F.substring(
                F.md5(F.col("user_id").cast("string")), 1, 1
            ).isin("0", "1", "2", "3", "4", "5", "6", "7"),
            "A",
        )
        .otherwise("B")
        .alias("arm"),
        "conv",
    )
    cells = armed.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("x"),
    )
    center = (F.col("x") + 3.8416 / 2) / (F.col("n") + 3.8416)
    half = (
        1.96
        / (F.col("n") + 3.8416)
        * F.sqrt(
            (F.col("x") * (F.col("n") - F.col("x"))).cast("double")
            / F.col("n")
            + 3.8416 / 4
        )
    )
    return (
        cells.select(
            "arm",
            "n",
            "x",
            (F.col("x").cast("double") / F.col("n")).alias("p_hat"),
            (center - half).alias("ci_lo"),
            (center + half).alias("ci_hi"),
        )
        .orderBy("arm")
    )


@register(
    "stats_delta_method_ratio_ci",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS HUGEINT)) AS x,
         CAST(COUNT(*) AS HUGEINT) AS y
  FROM events GROUP BY user_id
),
armed AS (
  SELECT CASE WHEN substring(md5(user_id::VARCHAR), 1, 1)
                IN ('0','1','2','3','4','5','6','7')
              THEN 'A' ELSE 'B' END AS arm,
         x, y
  FROM per_user
),
cells AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(y * y) AS VARCHAR) AS DOUBLE) AS syy,
         CAST(CAST(SUM(x * y) AS VARCHAR) AS DOUBLE) AS sxy
  FROM armed GROUP BY arm
),
m AS (
  SELECT arm, n, sx, sy,
         sx / sy AS ratio,
         ((sxx - (sx / n) * sx) / (n - 1)
          - 2 * (sx / sy) * ((sxy - (sx / n) * sy) / (n - 1))
          + (sx / sy) * (sx / sy) * ((syy - (sy / n) * sy) / (n - 1)))
           / (n * (sy / n) * (sy / n)) AS var_ratio
  FROM cells
)
SELECT arm, n AS n_users, ratio AS ratio_cents_per_event,
       SQRT(var_ratio) AS se,
       ratio - 1.96 * SQRT(var_ratio) AS ci_lo,
       ratio + 1.96 * SQRT(var_ratio) AS ci_hi
FROM m
ORDER BY arm
""",
    tags=("stats", "delta-method", "ratio-metric", "ab-test"),
)
def stats_delta_method_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method 95% CI for a RATIO metric (cents per event, per
    arm) — the estimator every experimentation platform needs for
    revenue-per-session-class metrics, where the naive per-user-mean
    t-test answers the wrong question (a ratio of sums is not a mean
    of ratios) and treating the ratio's numerator alone ignores the
    denominator's variance. Per-user (x=cents, y=events) pairs
    aggregate to exact HUGEINT/DECIMAL(38,0) arm sums (Σx, Σy, Σx²,
    Σy², Σxy), string-hopped once; Var(x̄/ȳ) ≈ (s²ₓ − 2R·s_xy +
    R²·s²ᵧ)/(n·ȳ²) and the interval endpoints are ONE fixed IEEE
    tree each (SQRT is correctly rounded) — bit-equal across engines
    with no float aggregation. Arms come from the md5 assignment
    shared with stats_srm_check / stats_proportion_ci_wilson — the
    three form the readout set: SRM gate, proportion CI, ratio CI.

    Scale: one map-combined per-user groupBy, then a 2-row arm
    aggregation of six sufficient statistics. Nothing row-scale
    shuffles twice."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum((dec("value") * 100).cast("decimal(38,0)")).alias("x"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("y"),
    )
    armed = per_user.select(
        F.when(
            F.substring(
                F.md5(F.col("user_id").cast("string")), 1, 1
            ).isin("0", "1", "2", "3", "4", "5", "6", "7"),
            "A",
        )
        .otherwise("B")
        .alias("arm"),
        "x",
        "y",
    )
    cells = armed.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("CAST(CAST(SUM(x) AS STRING) AS DOUBLE)").alias("sx"),
        F.expr("CAST(CAST(SUM(y) AS STRING) AS DOUBLE)").alias("sy"),
        F.expr("CAST(CAST(SUM(x * x) AS STRING) AS DOUBLE)").alias("sxx"),
        F.expr("CAST(CAST(SUM(y * y) AS STRING) AS DOUBLE)").alias("syy"),
        F.expr("CAST(CAST(SUM(x * y) AS STRING) AS DOUBLE)").alias("sxy"),
    )
    ratio = F.col("sx") / F.col("sy")
    var_ratio = (
        (F.col("sxx") - (F.col("sx") / F.col("n")) * F.col("sx"))
        / (F.col("n") - 1)
        - 2
        * ratio
        * (
            (F.col("sxy") - (F.col("sx") / F.col("n")) * F.col("sy"))
            / (F.col("n") - 1)
        )
        + ratio
        * ratio
        * (
            (F.col("syy") - (F.col("sy") / F.col("n")) * F.col("sy"))
            / (F.col("n") - 1)
        )
    ) / (F.col("n") * (F.col("sy") / F.col("n")) * (F.col("sy") / F.col("n")))
    return (
        cells.select(
            "arm",
            F.col("n").alias("n_users"),
            ratio.alias("ratio_cents_per_event"),
            F.sqrt(var_ratio).alias("se"),
            (ratio - 1.96 * F.sqrt(var_ratio)).alias("ci_lo"),
            (ratio + 1.96 * F.sqrt(var_ratio)).alias("ci_hi"),
        )
        .orderBy("arm")
    )


@register(
    "stats_power_sample_size",
    oracle="""
WITH pool AS (
  SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS HUGEINT) AS x
  FROM events WHERE event_type = 'purchase'
),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS s1,
         CAST(CAST(SUM(x * x) AS VARCHAR) AS DOUBLE) AS s2
  FROM pool
),
m AS (
  SELECT n, s1 / n AS mean_cents,
         (s2 - (s1 / n) * s1) / (n - 1) AS var_cents
  FROM sums
),
mde AS (
  SELECT m.*, g.rel_mde,
         m.mean_cents * g.rel_mde AS delta
  FROM m CROSS JOIN (
    SELECT UNNEST(ARRAY[0.01, 0.02, 0.05, 0.10]) AS rel_mde
  ) g
)
SELECT rel_mde, n AS n_observed, mean_cents,
       CAST(CEIL(2.0 * var_cents * (1.959964 + 0.841621)
                 * (1.959964 + 0.841621) / (delta * delta))
            AS BIGINT) AS n_per_arm
FROM mde
ORDER BY rel_mde
""",
    tags=("stats", "power", "sample-size", "experiment-design"),
)
def stats_power_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-experiment sample-size calculator: observations per arm to
    detect a 1/2/5/10% lift in mean purchase value at α = 0.05
    (two-sided) and 80% power — the DESIGN-side companion to the
    readout set (SRM → Wilson/ratio CIs → Welch), answering "how long
    must this test run" from the metric's OWN observed variance
    instead of a guessed σ. Formula: n = 2σ²(z₀.₉₇₅ + z₀.₈)²/δ²
    with the z-constants as fixed double literals (1.959964,
    0.841621 — identical parses in both engines); n and the variance
    come from exact HUGEINT sums string-hopped, so each n_per_arm is
    ONE fixed IEEE tree ending in CEIL of identical doubles —
    bit-equal, no float aggregation.

    Scale: one map-combined scan to (n, Σx, Σx²); the MDE grid is a
    4-row broadcast. The calculator is scan-bound at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    pool = ev.where(F.col("event_type") == "purchase").select(
        (dec("value") * 100).cast("decimal(38,0)").alias("x")
    )
    sums = pool.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("CAST(CAST(SUM(x) AS STRING) AS DOUBLE)").alias("s1"),
        F.expr("CAST(CAST(SUM(x * x) AS STRING) AS DOUBLE)").alias("s2"),
    )
    m = sums.select(
        "n",
        (F.col("s1") / F.col("n")).alias("mean_cents"),
        (
            (F.col("s2") - (F.col("s1") / F.col("n")) * F.col("s1"))
            / (F.col("n") - 1)
        ).alias("var_cents"),
    )
    grid = spark.createDataFrame(
        [(0.01,), (0.02,), (0.05,), (0.10,)], "rel_mde double"
    )
    zsum = 1.959964 + 0.841621
    mde = m.crossJoin(F.broadcast(grid)).withColumn(
        "delta", F.col("mean_cents") * F.col("rel_mde")
    )
    return (
        mde.select(
            "rel_mde",
            F.col("n").alias("n_observed"),
            "mean_cents",
            F.ceil(
                2.0
                * F.col("var_cents")
                * zsum
                * zsum
                / (F.col("delta") * F.col("delta"))
            )
            .cast("long")
            .alias("n_per_arm"),
        )
        .orderBy("rel_mde")
    )


@register(
    "stats_g_test",
    oracle="""
WITH pool AS (
  SELECT event_type,
         CAST(props ->> '$.k' AS BIGINT) // 25 AS kb
  FROM events
),
cells AS (
  SELECT event_type, kb, CAST(COUNT(*) AS BIGINT) AS o
  FROM pool GROUP BY 1, 2
),
rows_ AS (
  SELECT event_type, CAST(SUM(o) AS BIGINT) AS row_tot FROM cells GROUP BY 1
),
cols_ AS (
  SELECT kb, CAST(SUM(o) AS BIGINT) AS col_tot FROM cells GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(o) AS BIGINT) AS n_total,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r,
         CAST(COUNT(DISTINCT kb) AS BIGINT) AS c
  FROM cells
),
terms AS (
  SELECT t.n_total, t.r, t.c, (t.r - 1) * (t.c - 1) AS dof,
         2.0 * ce.o * ln(CAST(ce.o * t.n_total AS DOUBLE)
                         / (r_.row_tot * c_.col_tot)) AS term
  FROM cells ce
  JOIN rows_ r_ ON r_.event_type = ce.event_type
  JOIN cols_ c_ ON c_.kb = ce.kb
  CROSS JOIN tot t
)
SELECT n_total, r, c, CAST(dof AS BIGINT) AS dof,
       CAST(SUM(term) AS FLOAT) AS g_stat_f
FROM terms
GROUP BY n_total, r, c, dof
""",
    tags=("stats", "g-test", "likelihood-ratio", "contingency"),
)
def stats_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (likelihood-ratio) of independence on the same
    event_type × k-segment table as the Pearson chi-square — the
    variant information-theoretic pipelines prefer (G = 2·N·MI in
    nats, so it composes with the PMI/entropy tier, and it is
    additive across table partitions where Pearson's χ² is not —
    the property that lets a sharded monitor sum per-shard G values
    exactly). Empty cells contribute exactly 0 (lim x·ln x = 0) and
    are simply absent from the cell join; each present cell's term
    2·O·ln(O·N/(row·col)) is one fixed tree over exact integers
    whose ln is absorbed by the final FLOAT-cast sum (the chi2_f
    contract). dof rides along exact.

    Scale: identical to chi_square_independence — one map-combined
    groupBy to the cell grid, grid-sized margins, 1-row output."""
    ev = load_table(spark, sf_dir, "events")
    pool = ev.select(
        "event_type",
        F.expr("CAST(get_json_object(props, '$.k') AS BIGINT) div 25").alias(
            "kb"
        ),
    )
    cells = pool.groupBy("event_type", "kb").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    rows_ = cells.groupBy("event_type").agg(
        F.sum("o").cast("long").alias("row_tot")
    )
    cols_ = cells.groupBy("kb").agg(F.sum("o").cast("long").alias("col_tot"))
    tot = cells.agg(
        F.sum("o").cast("long").alias("n_total"),
        F.countDistinct("event_type").cast("long").alias("r"),
        F.countDistinct("kb").cast("long").alias("c"),
    )
    terms = (
        cells.join(F.broadcast(rows_), "event_type")
        .join(F.broadcast(cols_), "kb")
        .crossJoin(F.broadcast(tot))
        .select(
            "n_total",
            "r",
            "c",
            ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
            (
                2.0
                * F.col("o")
                * F.log(
                    (F.col("o") * F.col("n_total")).cast("double")
                    / (F.col("row_tot") * F.col("col_tot"))
                )
            ).alias("term"),
        )
    )
    return terms.groupBy("n_total", "r", "c", "dof").agg(
        F.sum("term").cast("float").alias("g_stat_f")
    )
