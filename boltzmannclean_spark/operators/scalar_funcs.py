"""Scalar function families (SURVEY.md §2.B "Scalar function families").

One oracle-checked query per family: string, date/time, math, array,
map, JSON, hash. All expressions are JVM-side Catalyst builtins inside
whole-stage codegen — zero Python in the row path.

Cross-dialect notes baked into the oracles:
- day-of-week: Spark ``weekday()+1`` == DuckDB ``isodow`` (Mon=1).
- dates are emitted as formatted strings (pandas date dtypes differ).
- transcendental funcs (exp/ln/sin) are NOT correctly-rounded and may
  differ in the last ulp between libm and the JVM → rows-only query.
- xxhash64/crc32 are engine-specific → exercised in pytest, not oracles;
  md5/sha2 are standardized and oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from boltzmannclean_spark.plans.registry import register
from boltzmannclean_spark.sources.catalog import load_table


@register(
    "func_string",
    oracle="""
SELECT
  p_partkey,
  UPPER(p_name)                                   AS name_upper,
  LOWER(p_brand)                                  AS brand_lower,
  LENGTH(p_name)                                  AS name_len,
  SUBSTRING(p_name, 1, 4)                         AS name_prefix,
  CONCAT(p_brand, ':', p_type)                    AS brand_type,
  LPAD(CAST(p_size AS VARCHAR), 4, '0')           AS size_padded,
  TRIM('  ' || p_type || ' ')                     AS type_trimmed,
  REPLACE(p_name, ' ', '_')                       AS name_snake,
  STRPOS(p_name, 'red')                           AS red_pos,
  TRANSLATE(p_brand, '#', '-')                    AS brand_dashed,
  REGEXP_EXTRACT(p_brand, '[0-9]+', 0)            AS brand_num,
  REGEXP_REPLACE(p_name, '[aeiou]', '', 'g')      AS name_novowel,
  SPLIT_PART(p_name, ' ', 1)                      AS first_word,
  LEVENSHTEIN(p_type, 'STANDARD')                 AS type_dist
FROM part
WHERE p_partkey < 500
ORDER BY p_partkey
""",
    tags=("functions", "string"),
)
def func_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family over part names/brands/types."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("type_trimmed"),
        F.regexp_replace(F.col("p_name"), " ", "_").alias("name_snake"),
        F.instr("p_name", "red").alias("red_pos"),
        F.translate(F.col("p_brand"), "#", "-").alias("brand_dashed"),
        F.regexp_extract(F.col("p_brand"), "[0-9]+", 0).alias("brand_num"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "").alias("name_novowel"),
        F.element_at(F.split(F.col("p_name"), " "), 1).alias("first_word"),
        F.levenshtein(F.col("p_type"), F.lit("STANDARD")).alias("type_dist"),
    ).orderBy("p_partkey")


@register(
    "func_datetime",
    oracle="""
SELECT
  o_orderkey,
  YEAR(o_orderdate)                                        AS order_year,
  MONTH(o_orderdate)                                       AS order_month,
  DAY(o_orderdate)                                         AS order_day,
  ISODOW(o_orderdate)                                      AS order_isodow,
  STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d')   AS month_start,
  STRFTIME(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
  DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')     AS days_to_98,
  CAST(EPOCH(o_orderdate) AS BIGINT)                       AS epoch_sec,
  STRFTIME(o_orderdate, '%Y-%m-%d')                        AS order_date_str
FROM orders
WHERE o_orderkey < 2000
ORDER BY o_orderkey
""",
    tags=("functions", "datetime"),
)
def func_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extraction, truncation, arithmetic, formatting."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        (F.weekday(d) + 1).alias("order_isodow"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.lit("1998-01-01").cast("date"), d.cast("date")).alias(
            "days_to_98"
        ),
        F.unix_timestamp(d).alias("epoch_sec"),
        F.date_format(d, "yyyy-MM-dd").alias("order_date_str"),
    ).orderBy("o_orderkey")


@register(
    "func_math",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
  CAST(CEIL(l_discount * 100) AS BIGINT)        AS disc_pct_ceil,
  ABS(l_quantity - 25)                 AS qty_dev,
  CAST(SIGN(l_quantity - 25) AS BIGINT)         AS qty_side,
  SQRT(l_quantity)                     AS qty_sqrt,
  POWER(l_quantity, 2)                 AS qty_sq,
  MOD(CAST(l_quantity AS BIGINT), 7)   AS qty_mod7,
  GREATEST(l_tax, l_discount)          AS max_rate,
  LEAST(l_tax, l_discount)             AS min_rate
FROM lineitem
WHERE l_orderkey < 400
ORDER BY l_orderkey, l_linenumber
""",
    tags=("functions", "math"),
)
def func_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family on IEEE-deterministic operations (sqrt is correctly
    rounded; pow on small integers is exact; exp/ln live in the
    rows-only func_math_transcendental)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 400)
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.abs(q - 25).alias("qty_dev"),
        F.signum(q - 25).cast("bigint").alias("qty_side"),
        F.sqrt(q).alias("qty_sqrt"),
        F.pow(q, 2).alias("qty_sq"),
        (q.cast("bigint") % 7).alias("qty_mod7"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "func_math_transcendental",
    # JVM StrictMath and DuckDB's libm agree to well within a double ulp
    # or two on exp/ln/sin; casting both engines' outputs to FLOAT
    # truncates 29 mantissa bits of headroom below that, making the hash
    # stable while still checking ~7 significant digits. rand() is
    # replaced by an LCG-style hash of the row key — deterministic
    # integer arithmetic, identical in both engines (a real rand() can
    # never be oracle-checked).
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  CAST(exp(l_quantity / 10) AS FLOAT) AS qty_exp,
  CAST(ln(l_quantity + 1) AS FLOAT)   AS qty_ln,
  CAST(sin(l_quantity) AS FLOAT)      AS qty_sin,
  CAST((l_orderkey * 1103515245 + l_linenumber * 12345) % 2147483648
       AS DOUBLE) / 2147483648 AS noise
FROM lineitem
WHERE l_orderkey < 400
ORDER BY l_orderkey, l_linenumber
""",
    tags=("functions", "math"),
)
def func_math_transcendental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcendental functions, float-cast for cross-engine hash parity
    (see oracle note), plus deterministic LCG-hash noise standing in for
    seeded rand (whose value stream is engine- and partitioning-
    specific)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 400)
    q = F.col("l_quantity")
    lcg = (
        F.col("l_orderkey") * F.lit(1103515245).cast("bigint")
        + F.col("l_linenumber") * F.lit(12345).cast("bigint")
    ) % F.lit(2147483648).cast("bigint")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.exp(q / 10).cast("float").alias("qty_exp"),
        F.log(q + 1).cast("float").alias("qty_ln"),
        F.sin(q).cast("float").alias("qty_sin"),
        (lcg.cast("double") / F.lit(2147483648.0)).alias("noise"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "func_array",
    oracle="""
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS tokens FROM documents
)
SELECT
  doc_id,
  LEN(tokens)                                            AS n_tokens,
  tokens[1]                                              AS first_token,
  LIST_CONTAINS(tokens, 'spark')                         AS has_spark,
  ARRAY_TO_STRING(tokens[1:5], ' ')                      AS head5,
  ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(tokens)), ',') AS vocab,
  LEN(LIST_DISTINCT(tokens))                             AS n_unique
FROM toks
WHERE doc_id < 200
ORDER BY doc_id
""",
    tags=("functions", "array"),
)
def func_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over tokenized document text (split/size/element_at/
    contains/slice/distinct/sort; arrays emitted as joined strings so the
    value-hash is representation-independent)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(toks, 1, 5), " ").alias("head5"),
        F.array_join(F.sort_array(F.array_distinct(toks)), ",").alias("vocab"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
    ).orderBy("doc_id")


@register(
    "func_higher_order",
    oracle="""
WITH v AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100
)
SELECT
  vec_id,
  LEN(LIST_FILTER(embedding, x -> x > 0))                         AS n_positive,
  LIST_REDUCE(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
              (s, x) -> s + x)                                    AS sq_norm,
  LIST_REDUCE(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)),
              (s, x) -> CASE WHEN x > s THEN x ELSE s END)        AS max_val
FROM v
ORDER BY vec_id
""",
    tags=("functions", "array", "higher_order"),
)
def func_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform/filter/aggregate) — the
    primitives behind vector math (similarity.py). Sequential left folds
    on both engines → deterministic double results."""
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    e = F.col("embedding")
    as_double = F.transform(e, lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0)).alias("n_positive"),
        F.aggregate(
            F.transform(e, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda s, x: s + x,
        ).alias("sq_norm"),
        F.aggregate(
            F.slice(as_double, 2, 63),
            F.element_at(as_double, 1),
            lambda s, x: F.when(x > s, x).otherwise(s),
        ).alias("max_val"),
    ).orderBy("vec_id")


@register(
    "func_map_json",
    oracle="""
SELECT
  event_id,
  CAST(props ->> '$.k' AS INT)       AS k_value,
  JSON_EXTRACT_STRING(props, '$.k')  AS k_string,
  event_type                         AS map_key,
  value                              AS map_value
FROM events
WHERE event_id < 2000
ORDER BY event_id
""",
    tags=("functions", "json", "map"),
)
def func_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family over events.props (from_json struct + string extract),
    with a map constructed and read back (map_keys/map_values → scalars,
    so the map round-trip is oracle-checkable)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    parsed = F.from_json(F.col("props"), "k INT")
    m = F.create_map(F.col("event_type"), F.col("value"))
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k_value"),
        F.get_json_object(F.col("props"), "$.k").alias("k_string"),
        F.element_at(F.map_keys(m), 1).alias("map_key"),
        F.element_at(F.map_values(m), 1).alias("map_value"),
    ).orderBy("event_id")


@register(
    "func_hash",
    oracle="""
SELECT
  doc_id,
  MD5(text)         AS text_md5,
  SHA256(text)      AS text_sha256,
  LENGTH(text)      AS text_len
FROM documents
WHERE doc_id < 200
ORDER BY doc_id
""",
    tags=("functions", "hash"),
)
def func_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized hash functions (md5/sha2-256) — the exact-dedup
    primitive; engine-specific hashes (xxhash64, hash, crc32) are tested
    for self-consistency in pytest instead."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return docs.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.length("text").alias("text_len"),
    ).orderBy("doc_id")


@register(
    "func_conversion_null",
    oracle="""
SELECT
  p_partkey,
  CAST(p_size AS VARCHAR)                          AS size_str,
  CAST(FLOOR(p_retailprice) AS BIGINT)             AS price_floor_int,
  COALESCE(TRY_CAST(p_type AS INT), -1)            AS type_as_int,
  COALESCE(TRY_CAST(SPLIT_PART(p_brand, '#', 2) AS INT), -1) AS brand_num,
  isnan(CASE WHEN p_size % 2 = 0 THEN 'NaN'::DOUBLE
             ELSE p_retailprice END)               AS even_is_nan,
  CASE WHEN isnan(CASE WHEN p_size % 2 = 0 THEN 'NaN'::DOUBLE
                       ELSE p_retailprice END)
       THEN 0.0
       ELSE CASE WHEN p_size % 2 = 0 THEN 'NaN'::DOUBLE
                 ELSE p_retailprice END END        AS nan_patched,
  COALESCE(TRY_CAST(NULL AS INT), p_size)          AS ifnull_size
FROM part
WHERE p_partkey < 500
ORDER BY p_partkey
""",
    tags=("functions", "conversion", "null"),
)
def func_conversion_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion/NULL family: cast, try_cast (failed parse → NULL,
    surfaced via a -1 sentinel so the comparator never sees NULL),
    isnan/nanvl on a synthesized NaN column, ifnull. NaN is synthesized
    via a 'NaN' string cast, which both engines parse identically."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 500)
    maybe_nan = F.when(F.col("p_size") % 2 == 0, F.lit("NaN").cast("double")).otherwise(
        F.col("p_retailprice")
    )
    return p.select(
        "p_partkey",
        F.col("p_size").cast("string").alias("size_str"),
        F.floor("p_retailprice").cast("bigint").alias("price_floor_int"),
        F.coalesce(F.expr("try_cast(p_type AS INT)"), F.lit(-1)).alias("type_as_int"),
        F.coalesce(
            F.expr("try_cast(split_part(p_brand, '#', 2) AS INT)"), F.lit(-1)
        ).alias("brand_num"),
        F.isnan(maybe_nan).alias("even_is_nan"),
        F.nanvl(maybe_nan, F.lit(0.0)).alias("nan_patched"),
        F.ifnull(F.expr("try_cast(NULL AS INT)"), F.col("p_size")).alias(
            "ifnull_size"
        ),
    ).orderBy("p_partkey")


@register(
    "func_bitwise",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255         AS low_byte,
       o_orderkey | 4096        AS set_bit,
       xor(o_orderkey, o_custkey) AS key_xor,
       o_orderkey << 2          AS shl2,
       o_orderkey >> 3          AS shr3,
       ~o_orderkey              AS inverted
FROM orders
WHERE o_orderkey < 2000
ORDER BY o_orderkey
""",
    tags=("functions", "bitwise"),
)
def func_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family (&, |, xor, shifts, complement) — two's-complement
    integer ops are bit-identical across engines by definition. Powers
    bitmask feature flags and the SimHash/LSH bit tricks elsewhere."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("set_bit"),
        k.bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
        F.bitwise_not(k).alias("inverted"),
    ).orderBy("o_orderkey")


@register(
    "func_variant",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT)  AS k_int,
       CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str,
       (json_extract(props, '$.missing') IS NULL
        OR json_extract(props, '$.missing') = 'null') AS missing_is_null
FROM events
WHERE event_id < 3000
ORDER BY event_id
""",
    tags=("functions", "variant", "json"),
)
def func_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4.x VARIANT type: parse_json once into a binary
    semi-structured value, then typed variant_get path extraction —
    the scan-once/shred-many pattern that replaces repeated
    get_json_object string re-parsing (at 100 TB, parsing the JSON text
    once per row instead of once per extracted field is the difference).
    Oracle extracts the same paths with DuckDB's JSON functions."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 3000)
    v = ev.select("event_id", F.parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.variant_get("v", "$.k", "bigint").alias("k_int"),
        F.variant_get("v", "$.k", "string").alias("k_str"),
        F.variant_get("v", "$.missing", "string").isNull().alias("missing_is_null"),
    ).orderBy("event_id")


@register(
    "func_try_safe",
    oracle="""
SELECT o_orderkey,
       TRY_CAST(o_orderpriority AS BIGINT)            AS prio_as_int,
       TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio_digit,
       CAST(o_totalprice AS DOUBLE)
         / NULLIF(o_orderkey % 5, 0)                  AS risky_div,
       COALESCE(CAST(o_totalprice AS DOUBLE)
         / NULLIF(o_orderkey % 5, 0), -1.0)           AS safe_div
FROM orders
WHERE o_orderkey < 2000
ORDER BY o_orderkey
""",
    tags=("functions", "try", "null-safe"),
)
def func_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family: try_cast turns malformed casts into
    NULL instead of failing the job, try_divide NULLs division by zero —
    the difference between one bad row and a dead 100 TB job. DuckDB's
    TRY_CAST / NULLIF twins reproduce the same NULL semantics."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("bigint").alias("prio_as_int"),
        F.substring("o_orderpriority", 1, 1).try_cast("bigint").alias(
            "prio_digit"
        ),
        F.try_divide(F.col("o_totalprice").cast("double"), F.col("o_orderkey") % 5)
        .alias("risky_div"),
        F.coalesce(
            F.try_divide(
                F.col("o_totalprice").cast("double"), F.col("o_orderkey") % 5
            ),
            F.lit(-1.0),
        ).alias("safe_div"),
    ).orderBy("o_orderkey")


@register(
    "func_map_higher_order",
    oracle="""
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events
  GROUP BY user_id, event_type
),
entries AS (
  SELECT user_id,
         STRING_AGG(event_type || '=' || n, ',' ORDER BY event_type)
           AS type_counts,
         STRING_AGG(event_type || '=' || n * 2, ',' ORDER BY event_type)
           AS doubled,
         STRING_AGG(CASE WHEN n > 3 THEN event_type || '=' || n END, ','
                    ORDER BY event_type) AS frequent,
         CAST(SUM(n) AS BIGINT) AS total
  FROM counts
  GROUP BY user_id
)
SELECT user_id, type_counts, doubled,
       COALESCE(frequent, '') AS frequent, total
FROM entries
ORDER BY user_id
""",
    tags=("functions", "map", "higher-order"),
)
def func_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + higher-order map functions: per-user
    event_type→count maps built with map_from_entries, then
    transform_values (double each count), map_filter (keep counts > 3),
    and aggregate over map_values — all JVM lambda expressions. Maps are
    rendered as sorted 'k=v' strings so the value-hash is representation-
    independent (DuckDB's MAP has no higher-order functions; its oracle
    computes the same strings relationally, which also proves the map
    ops equal their relational meaning)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("tc")
    )

    def render(mp):
        return F.array_join(
            F.transform(
                F.map_entries(mp),
                lambda e: F.concat(
                    e.getField("key"), F.lit("="), e.getField("value").cast("string")
                ),
            ),
            ",",
        )

    doubled = F.transform_values("tc", lambda k, v: v * 2)
    frequent = F.map_filter("tc", lambda k, v: v > 3)
    total = F.aggregate(
        F.map_values("tc"), F.lit(0).cast("bigint"), lambda s, x: s + x
    )
    return m.select(
        "user_id",
        render(F.col("tc")).alias("type_counts"),
        render(doubled).alias("doubled"),
        render(frequent).alias("frequent"),
        total.alias("total"),
    ).orderBy("user_id")


@register(
    "func_generators",
    oracle="""
WITH src AS (
  SELECT doc_id, string_split(text, ' ') AS toks, lang, n_chars
  FROM documents WHERE doc_id < 100
),
-- explode_outer twin: docs keep a row even when the filtered array is
-- empty (LEFT JOIN the unnest)
rare AS (
  SELECT doc_id, LIST_FILTER(toks, x -> LENGTH(x) > 8) AS rares FROM src
),
exploded AS (
  SELECT r.doc_id, COALESCE(u.tok, '(none)') AS rare_tok
  FROM rare r LEFT JOIN (
    SELECT doc_id, UNNEST(rares) AS tok FROM rare
  ) u ON u.doc_id = r.doc_id
),
-- stack twin: two literal (metric, value) rows per doc
stacked AS (
  SELECT doc_id, 'n_chars' AS metric, CAST(n_chars AS BIGINT) AS value FROM src
  UNION ALL
  SELECT doc_id, 'n_tokens' AS metric, CAST(LEN(toks) AS BIGINT) AS value FROM src
)
SELECT e.doc_id, e.rare_tok, s.metric, s.value
FROM exploded e JOIN stacked s ON e.doc_id = s.doc_id
ORDER BY e.doc_id, e.rare_tok, s.metric
""",
    tags=("functions", "generators", "explode"),
)
def func_generators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator family beyond plain explode: explode_outer keeps the
    parent row when the array is empty (LEFT-JOIN-unnest semantics —
    without it, docs with no long tokens silently vanish from the
    output), and stack() pivots literal column pairs into rows. Both
    are executor-side row generation — no shuffle until the final
    join/sort."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    toks = F.split("text", " ")
    src = docs.select("doc_id", toks.alias("toks"), "n_chars")
    rare = src.select(
        "doc_id", F.filter("toks", lambda x: F.length(x) > 8).alias("rares")
    )
    exploded = rare.select(
        "doc_id", F.explode_outer("rares").alias("tok")
    ).select("doc_id", F.coalesce("tok", F.lit("(none)")).alias("rare_tok"))
    stacked = src.selectExpr(
        "doc_id",
        "stack(2, 'n_chars', CAST(n_chars AS BIGINT),"
        " 'n_tokens', CAST(size(toks) AS BIGINT)) AS (metric, value)",
    )
    return (
        exploded.join(stacked, "doc_id")
        .select("doc_id", "rare_tok", "metric", "value")
        .orderBy("doc_id", "rare_tok", "metric")
    )


@register(
    "func_encoding",
    oracle="""
SELECT n_nationkey,
       base64(ENCODE(n_name)) AS b64,
       DECODE(from_base64(base64(ENCODE(n_name)))) AS b64_roundtrip,
       lower(to_hex(n_nationkey)) AS key_hex,
       ascii(n_name) AS first_ascii,
       chr(65 + n_nationkey % 26) AS letter,
       bit_length(n_name) AS bits,
       octet_length(ENCODE(n_name)) AS octets
FROM nation
ORDER BY n_nationkey
""",
    tags=("functions", "encoding"),
)
def func_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary/encoding scalar family: base64 round-trip, hex rendering,
    ascii/chr, bit/octet lengths — the blob-wrangling toolkit for
    multimodal columns (every one a JVM builtin; base64 is RFC 4648 on
    both engines, so values hash-match)."""
    n = load_table(spark, sf_dir, "nation")
    b64 = F.base64(F.col("n_name").cast("binary"))
    return n.select(
        "n_nationkey",
        b64.alias("b64"),
        F.unbase64(b64).cast("string").alias("b64_roundtrip"),
        F.lower(F.hex(F.col("n_nationkey"))).alias("key_hex"),
        F.ascii("n_name").alias("first_ascii"),
        F.chr(F.lit(65) + F.col("n_nationkey") % 26).alias("letter"),
        F.bit_length("n_name").alias("bits"),
        F.octet_length("n_name").alias("octets"),
    ).orderBy("n_nationkey")


@register(
    "func_collation",
    oracle="""
SELECT lower(mixed) AS canonical,
       COUNT(*) AS n_events,
       COUNT(DISTINCT mixed) AS n_case_variants
FROM (
  SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
              ELSE event_type END AS mixed
  FROM events
)
GROUP BY lower(mixed)
ORDER BY canonical
""",
    tags=("functions", "collation", "4.x"),
)
def func_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (4.x): grouping under UTF8_LCASE merges case
    variants engine-side — the declarative alternative to sprinkling
    lower() through every predicate, and the only way to get
    case-insensitive semantics into joins/aggregations without
    rewriting expressions. The oracle is the lower()-normalized twin;
    COUNT(DISTINCT raw) proves real case variants were merged."""
    ev = load_table(spark, sf_dir, "events")
    mixed = F.when(
        F.col("event_id") % 2 == 0, F.upper("event_type")
    ).otherwise(F.col("event_type"))
    return (
        ev.select(
            mixed.alias("mixed"),
            F.collate(mixed, "UTF8_LCASE").alias("ci"),
        )
        .groupBy("ci")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("mixed").alias("n_case_variants"),
        )
        .select(
            F.lower(F.col("ci")).alias("canonical"),
            "n_events",
            "n_case_variants",
        )
        .orderBy("canonical")
    )


@register(
    "func_datetime_make",
    oracle="""
SELECT o_orderkey,
       CAST(make_date(2024, MONTH(o_orderdate), 1) AS VARCHAR) AS month_marker,
       CAST(make_timestamp(YEAR(o_orderdate), MONTH(o_orderdate),
                           DAY(o_orderdate), 12, 30, 0.0) AS VARCHAR)
         AS noon_ts,
       CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS VARCHAR)
         AS plus_month,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
       DATEDIFF('day', CAST(o_orderdate AS DATE),
                last_day(CAST(o_orderdate AS DATE))) AS days_left_in_month
FROM orders
WHERE o_orderkey < 1000
ORDER BY o_orderkey
""",
    tags=("functions", "datetime", "constructors"),
)
def func_datetime_make(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/timestamp constructors and calendar arithmetic: make_date /
    make_timestamp build temporal values from parts (the inverse of the
    extraction family), add_months clamps to month end exactly like
    DuckDB's +INTERVAL (Jan 31 + 1 month = Feb 28/29 in both), and
    last_day anchors month-window logic. All string-rendered so the
    comparison is calendar semantics, not dtype trivia."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 1000)
    d = F.col("o_orderdate")
    dd = d.cast("date")
    return o.select(
        "o_orderkey",
        F.make_date(F.lit(2024), F.month(d), F.lit(1))
        .cast("string")
        .alias("month_marker"),
        F.date_format(
            F.make_timestamp(
                F.year(d), F.month(d), F.dayofmonth(d),
                F.lit(12), F.lit(30), F.lit(0),
            ),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("noon_ts"),
        F.add_months(dd, 1).cast("string").alias("plus_month"),
        F.last_day(dd).cast("string").alias("month_end"),
        F.datediff(F.last_day(dd), dd).alias("days_left_in_month"),
    ).orderBy("o_orderkey")


@register(
    "func_url_parse",
    oracle="""
SELECT doc_id,
       source || '.example.com' AS host,
       '/docs/' || CAST(doc_id AS VARCHAR) AS path,
       'lang=' || lang AS query,
       lang AS lang_param,
       'sec' || CAST(doc_id % 3 AS VARCHAR) AS fragment
FROM documents
WHERE doc_id < 200
ORDER BY doc_id
""",
    tags=("functions", "url", "web"),
)
def func_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing (parse_url): host / path / query / named query
    parameter / fragment extraction — the first operator of every
    web-crawl pipeline (domain blocklists, per-site rate stats, dedup
    by canonical URL). URLs are synthesized deterministically from
    columns, so the oracle states the expected parts as ground truth
    and the check validates Spark's parser itself. JVM-side regex —
    no Python in the row path."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
        F.lit("#sec"), (F.col("doc_id") % 3).cast("string"),
    )
    u = docs.select("doc_id", url.alias("u"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("u"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("u"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("u"), F.lit("QUERY")).alias("query"),
        F.parse_url(F.col("u"), F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url(F.col("u"), F.lit("REF")).alias("fragment"),
    ).orderBy("doc_id")


@register(
    "func_regexp",
    oracle="""
SELECT event_id,
       COALESCE(list_aggregate(regexp_extract_all(props, '[0-9]+'),
                               'string_agg', ','), '') AS digit_runs_csv,
       LEN(regexp_extract_all(props, '[0-9]+')) AS n_digit_runs,
       regexp_matches(props, '"k": [0-9]{2}\\}') AS has_2digit_k,
       regexp_extract(props, '"k": ([0-9]+)', 1) AS k_str
FROM events
WHERE event_id < 2000
ORDER BY event_id
""",
    tags=("functions", "regexp"),
)
def func_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function family: extract-all (array output), match counts,
    boolean rlike, and group extraction over the JSON-ish props
    payload. Patterns stay in the POSIX-compatible subset Java regex
    and RE2 agree on (no lookaround/backrefs) — the portability rule
    for cross-engine pipelines. JVM-side, codegen-friendly."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        # CSV render, not a raw array: the harness's pandas sort-canon
        # cannot order list cells (see tests/test_oracle_parity.py gate).
        F.concat_ws(",", F.regexp_extract_all("props", F.lit("[0-9]+"), 0)).alias(
            "digit_runs_csv"
        ),
        F.size(F.regexp_extract_all("props", F.lit("[0-9]+"), 0)).alias(
            "n_digit_runs"
        ),
        F.col("props").rlike('"k": [0-9]{2}\\}').alias("has_2digit_k"),
        F.regexp_extract("props", '"k": ([0-9]+)', 1).alias("k_str"),
    ).orderBy("event_id")


_TZ_TARGETS = ("America/New_York", "Asia/Kolkata", "Asia/Tokyo")


@register(
    "func_convert_timezone",
    oracle="\nUNION ALL\n".join(
        f"""
SELECT '{tz}' AS tz,
       EXTRACT(hour FROM (ts AT TIME ZONE 'UTC' AT TIME ZONE '{tz}'))::BIGINT
         AS local_hour,
       COUNT(*) AS n_events
FROM events
GROUP BY local_hour"""
        for tz in _TZ_TARGETS
    )
    + "\nORDER BY tz, local_hour",
    tags=("functions", "timezone", "4.x"),
)
def func_convert_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``convert_timezone`` (4.x three-arg form) — the
    local-business-hours lens every global events table needs: the UTC
    event stream re-expressed in three operating regions' wall clocks
    (including Asia/Kolkata's +5:30 half-hour offset, which breaks any
    naive hour-shift arithmetic) and histogrammed by local hour.
    Cross-engine exactness rides on BOTH engines resolving offsets from
    the IANA tzdb (DST transitions included) — the conversion itself is
    per-row and deterministic, the histogram an exact-count
    aggregation. The session stays pinned to UTC (harness rule); all
    zone math is explicit in the expression, never ambient. Plan: ONE
    scan — the three conversions fan out row-locally (explode of a
    3-struct array), then one map-combined aggregation; the UNION-ALL
    oracle is the semantic twin but three scans."""
    ev = load_table(spark, sf_dir, "events")
    fanned = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(tz).alias("tz"),
                    F.hour(F.expr(f"convert_timezone('UTC', '{tz}', ts)"))
                    .cast("long")
                    .alias("local_hour"),
                )
                for tz in _TZ_TARGETS
            ]
        )
    )
    return (
        ev.select(fanned.alias("g"))
        .select("g.tz", "g.local_hour")
        .groupBy("tz", "local_hour")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("tz", "local_hour")
    )


AES_KEY = "0123456789abcdef"  # 16-byte demo key (AES-128)
AES_WRONG_KEY = "fedcba9876543210"


@register(
    "func_crypto_aes",
    oracle="""
SELECT n_nationkey,
       n_name AS roundtrip,
       CAST(16 * (length(n_name) // 16 + 1) AS BIGINT) AS ct_bytes,
       TRUE AS wrong_key_never_recovers,
       TRUE AS ct_differs_from_plain
FROM nation
ORDER BY n_nationkey
""",
    tags=("functions", "crypto", "aes"),
)
def func_crypto_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption scalars — the at-rest PII pattern
    (encrypt on write, decrypt on read, tolerate bad keys):
    ``aes_encrypt`` in ECB/PKCS mode (deterministic — no random IV —
    so the query is reproducible; GCM is the at-rest default when
    nondeterminism is fine), ``aes_decrypt`` proving the exact
    roundtrip IN-QUERY (DuckDB has no AES, so the oracle checks the
    recovered plaintext plus the PKCS ciphertext-length law
    16*(len/16+1) and the two boolean proofs), and ``try_aes_decrypt``
    returning NULL — not an exception — under a wrong key, the
    total-function form a pipeline needs when key rotation leaves
    mixed-key data. Pure row-local JVM crypto; one scan, no shuffle
    before the output sort.

    Oracle-robustness note (r7 ADVICE): a wrong AES-ECB key is caught
    only by the PKCS padding check, which random garbage PASSES with
    probability ~1/256 per row — so asserting NULL-ness alone is a
    latent fixture-sensitive trap (a future key/data change could
    produce one non-NULL garbage decrypt and break the oracle
    confusingly). wrong_key_never_recovers therefore asserts the
    semantically meaningful property — the wrong key never yields the
    PLAINTEXT — true whether the padding check fires (NULL) or garbage
    slips through (bytes != n_name)."""
    nation = load_table(spark, sf_dir, "nation")
    ct = F.expr(
        f"aes_encrypt(n_name, '{AES_KEY}', 'ECB', 'PKCS')"
    )
    return (
        nation.select("n_nationkey", "n_name", ct.alias("ct"))
        .select(
            "n_nationkey",
            F.expr(
                f"CAST(aes_decrypt(ct, '{AES_KEY}', 'ECB', 'PKCS') AS STRING)"
            ).alias("roundtrip"),
            F.length("ct").cast("long").alias("ct_bytes"),
            F.coalesce(
                F.expr(
                    f"CAST(try_aes_decrypt(ct, '{AES_WRONG_KEY}',"
                    " 'ECB', 'PKCS') AS STRING)"
                )
                != F.col("n_name"),
                F.lit(True),
            ).alias("wrong_key_never_recovers"),
            (F.base64("ct") != F.col("n_name")).alias("ct_differs_from_plain"),
        )
        .orderBy("n_nationkey")
    )
