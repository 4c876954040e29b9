"""Similarity search over embedding columns (SURVEY.md §2.B
"similarity search"): brute-force cosine top-k as the exact baseline,
plus a random-hyperplane LSH-bucketed variant as the scale path.

Scale design: brute force is queries × corpus — fine for a broadcast
query set, linear in corpus size, and embarrassingly parallel (no
shuffle: queries broadcast, corpus streams). The LSH variant prunes the
corpus per query to matching sign-buckets first, trading recall for a
candidate set ~bucket_fraction of the corpus; recall is asserted in
tests/test_similarity.py. At 100 TB the same two plans hold — the
broadcast side is the query set either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from boltzmannclean_spark.functions.topk import topk_per_key
from boltzmannclean_spark.functions.vectors import (
    as_double,
    cosine,
    dot,
    dot_unrolled,
    norm,
)
from boltzmannclean_spark.plans.registry import register
from boltzmannclean_spark.sources.catalog import load_table

TOP_K = 10
N_QUERY = 5
N_PLANES = 4  # 16 sign buckets

# --- shared exact-integer helpers -------------------------------------------
#
# Cross-engine float determinism: wherever a result depends on SUMS of
# floats (centroids, distances-for-argmin, Gram matrices), values are
# quantized to integer micro-units — round(x * 1e6) as BIGINT — summed
# exactly (order-free), and compared/divided in integer arithmetic, so
# the outcome is bit-identical in any engine at any parallelism.
# Per-row IEEE arithmetic (dot products, cosine) needs no such recipe.

MICRO = 1_000_000


def _qvec(col):
    """array<float> -> array<long> micro-unit quantization."""
    return F.transform(col, lambda x: F.round(x.cast("double") * MICRO, 0).cast("long"))


# Sign-safe integer division (shared definition: functions/exact.py).
from boltzmannclean_spark.functions.exact import (  # noqa: E402
    sdiv_duck as _sdiv_duck,
    sdiv_spark as _sdiv_spark,
)

# Vectorized Lloyd trainer/encoder (r15 optimization; see
# functions/lloyd.py for the exactness contract that keeps the DuckDB
# oracles hash-identical).
from boltzmannclean_spark.functions.lloyd import (  # noqa: E402
    assign_blocks,
    train_blocks,
)


SIM_TOPK_ORACLE = f"""
WITH v AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id, label, e,
         sqrt(list_reduce(list_transform(e, x -> x * x), (s, x) -> s + x)) AS nrm
  FROM v
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
         list_reduce(list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i]),
                     (s, x) -> s + x) / (q.nrm * c.nrm) AS cosine
  FROM n q JOIN n c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERY}
)
SELECT query_id, neighbor_id, neighbor_label, cosine, rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
) t
WHERE rk <= {TOP_K}
ORDER BY query_id, rk
"""


@register(
    "similarity_cosine_topk",
    oracle=SIM_TOPK_ORACLE,
    tags=("similarity", "topk"),
)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast query vectors against the
    corpus, then salted two-stage top-k per query — with only N_QUERY
    keys, a plain per-query window would land the whole scored corpus
    on N_QUERY tasks (the round-2 bench regression); the salted local
    stage keeps all 32 cores busy and the final window ranks only
    n_salt * k survivors per query."""
    from boltzmannclean_spark.pipeline import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    # r15: dims=None — the HOF fold, NOT dot_unrolled. At this call
    # site the scored volume is only |corpus| × N_QUERY rows, and the
    # unrolled 128-node expression tree costs more in analysis/codegen
    # than it saves per row (bench regression x1.95 caught at round
    # close; same-session A/B: unrolled 1.39-1.80 s vs fold
    # 0.71-0.91 s, rows identical). The unrolled form stays where the
    # pair fan-out is large (kNN, SemDeDup, ANN serve legs).
    return cosine_topk(
        emb, emb.where(F.col("vec_id") < N_QUERY), k=TOP_K, dims=None
    )


# Deterministic pseudo-random hyperplanes: coefficient for (plane p, dim i)
# is +1 if hex digit (i mod 32) of md5('p|i') is >= '8' else -1. Both
# engines derive identical planes from md5, so bucket assignment is
# portable and the whole ANN pipeline is oracle-checkable.
ANN_ORACLE = f"""
WITH v AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id, label, e,
         sqrt(list_reduce(list_transform(e, x -> x * x), (s, x) -> s + x)) AS nrm
  FROM v
),
planes AS (
  SELECT p, list_transform(range(1, 65),
           i -> CASE WHEN substring(md5(p::VARCHAR || '|' || i::VARCHAR), 1, 1)
                       IN ('8','9','a','b','c','d','e','f')
                     THEN 1.0 ELSE -1.0 END) AS w
  FROM (SELECT UNNEST(range(0, {N_PLANES})) AS p)
),
bucketed AS (
  SELECT n.vec_id, n.label, n.e, n.nrm,
         STRING_AGG(CASE WHEN list_reduce(
             list_transform(range(1, 65), i -> n.e[i] * planes.w[i]),
             (s, x) -> s + x) >= 0 THEN '1' ELSE '0' END, '' ORDER BY planes.p)
           AS bucket
  FROM n CROSS JOIN planes
  GROUP BY n.vec_id, n.label, n.e, n.nrm
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_reduce(list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i]),
                     (s, x) -> s + x) / (q.nrm * c.nrm) AS cosine
  FROM bucketed q JOIN bucketed c
    ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERY}
)
SELECT query_id, neighbor_id, cosine, rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
) t
WHERE rk <= {TOP_K}
ORDER BY query_id, rk
"""


@register("similarity_ann_lsh", oracle=ANN_ORACLE, tags=("similarity", "lsh", "ann"))
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: md5-derived ±1 planes → sign-bit
    bucket key → candidates restricted to the query's bucket → exact
    cosine + top-k. The bucket equi-join replaces the corpus scan with
    ~1/2^planes of it; planes are deterministic so the oracle replicates
    the identical pipeline."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.select("vec_id", "label", as_double("embedding").alias("e")).withColumn(
        "nrm", norm(F.col("e"))
    )
    planes = spark.range(N_PLANES).select(
        F.col("id").cast("int").alias("p"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: F.when(
                F.substring(
                    F.md5(F.concat(F.col("id").cast("string"), F.lit("|"), i.cast("string"))),
                    1,
                    1,
                ).isin("8", "9", "a", "b", "c", "d", "e", "f"),
                1.0,
            ).otherwise(-1.0),
        ).alias("w"),
    )
    bucketed = (
        n.crossJoin(F.broadcast(planes))
        .select(
            "vec_id",
            "label",
            "e",
            "nrm",
            "p",
            F.when(dot_unrolled(F.col("e"), F.col("w"), _EMB_DIMS) >= 0, "1").otherwise("0").alias("bit"),
        )
        .groupBy("vec_id", "label", "e", "nrm")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("p", "bit"))),
                    lambda s: s.getField("bit"),
                ),
            ).alias("bucket")
        )
    )
    q = bucketed.where(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qnrm"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        bucketed.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot_unrolled(F.col("qe"), F.col("e"), _EMB_DIMS)
             / (F.col("qnrm") * F.col("nrm"))).alias(
                "cosine"
            ),
        )
    )
    return topk_per_key(
        scored,
        keys=["query_id"],
        order=[F.desc("cosine"), F.col("neighbor_id")],
        k=TOP_K,
        salt_col="neighbor_id",
    ).orderBy("query_id", "rk")


# IVF ANN with a TRAINED coarse quantizer: centroids are initialized
# from the seed vectors (vec_id % CENT_MOD == 0) and refined by
# KMEANS_ITERS rounds of Lloyd's algorithm in exact integer micro-units
# — assignment by exact integer squared-L2 (ties to the smallest
# centroid id), update by sign-safe TRUNCATED integer mean — so both
# engines iterate bit-identically and the final cells are oracle-exact.
# A query then scans only its own cell (nprobe=1) with exact cosine.
CENT_MOD = 100
KMEANS_ITERS = 4


# The oracle Lloyd iterations are PIVOTED (one row per vector with the
# dims as columns, distance as one inline expression, argmin via
# arg_min over a HUGEINT (dist, cid) pack) instead of the textbook
# per-(vec, dim) join + per-(vec, cid) grouped distance. Identical
# results — arg_min on dist·2^40 + cid IS lexicographic (dist, cid)
# because every cid < 2^40 and dist >= 0 — but the heavy hash
# aggregation shrinks from corpus×k groups to corpus groups: measured
# 46.5 s → 1.0 s per PQ iteration at the 20k-vector replica with
# k=256, the difference between tractable and intractable ×10/×30
# oracle sweeps (SCALING.md round 11).
_ARGMIN_PACK = 1 << 40  # cid domain bound; dist·2^40 stays << 2^127


_EMB_DIMS = 64


def _kmeans_pivot_cols(expr: str, out: str) -> str:
    return ", ".join(
        f"MAX(CASE WHEN d = {d} THEN {expr} END) AS {out}{d}"
        for d in range(_EMB_DIMS)
    )


def _kmeans_dist_expr() -> str:
    return " + ".join(
        f"(q.x{d} - c.c{d}) * (q.x{d} - c.c{d})" for d in range(_EMB_DIMS)
    )


def _kmeans_iter_sql(k: int, prev: str) -> str:
    """One unrolled Lloyd iteration over the pivoted form; emits the
    updated codebook BOTH pivoted (kw-naming, consumed by iteration
    k+1 / final helpers) and unpivoted as ``c{k}`` (cid, d, cx) so
    downstream SQL is shape-compatible with the persisted artifact."""
    pivot_src = (
        f"kv1 AS (\n  SELECT vec_id, {_kmeans_pivot_cols('qx', 'x')}"
        "\n  FROM q GROUP BY vec_id\n),\n"
        if k == 1
        else ""
    )
    means = ", ".join(
        _sdiv_duck(f"CAST(SUM(q.x{d}) AS BIGINT)", "COUNT(*)") + f" AS m{d}"
        for d in range(_EMB_DIMS)
    )
    d_list = ", ".join(str(d) for d in range(_EMB_DIMS))
    m_list = ", ".join(f"m{d}" for d in range(_EMB_DIMS))
    return f"""
{pivot_src}kw{k} AS (
  SELECT cid, {_kmeans_pivot_cols('cx', 'c')} FROM {prev} GROUP BY cid
),
ka{k} AS (
  SELECT q.vec_id,
         arg_min(c.cid, CAST({_kmeans_dist_expr()} AS HUGEINT)
                          * {_ARGMIN_PACK}::HUGEINT + c.cid) AS cid
  FROM kv1 q CROSS JOIN kw{k} c
  GROUP BY q.vec_id
),
km{k} AS (
  SELECT a.cid, {means}
  FROM kv1 q JOIN ka{k} a ON q.vec_id = a.vec_id
  GROUP BY a.cid
),
c{k} AS (
  SELECT cid, UNNEST([{d_list}]) AS d, UNNEST([{m_list}]) AS cx
  FROM km{k}
)"""


def _kmeans_assign_sql(final_cb: str, out: str = "af") -> str:
    """Final full-corpus nearest-cell assignment against the trained
    codebook ``final_cb`` — the same pivoted arg_min as the iterations
    (reuses kv1 from them)."""
    return f"""
{out}w AS (
  SELECT cid, {_kmeans_pivot_cols('cx', 'c')} FROM {final_cb} GROUP BY cid
),
{out} AS (
  SELECT q.vec_id,
         arg_min(c.cid, CAST({_kmeans_dist_expr()} AS HUGEINT)
                          * {_ARGMIN_PACK}::HUGEINT + c.cid) AS cid
  FROM kv1 q CROSS JOIN {out}w c
  GROUP BY q.vec_id
)"""


def _ivf_trained_oracle() -> str:
    iters = []
    prev = "c0"
    for k in range(1, KMEANS_ITERS + 1):
        iters.append(_kmeans_iter_sql(k, prev))
        prev = f"c{k}"
    return f"""
WITH v AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id, label, e,
         sqrt(list_reduce(list_transform(e, x -> x * x), (s, x) -> s + x)) AS nrm
  FROM v
),
q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * {MICRO}) AS BIGINT) AS qx
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, d, qx AS cx FROM q WHERE vec_id % {CENT_MOD} = 0),{",".join(iters)},{_kmeans_assign_sql(prev)},
cells AS (
  SELECT n.vec_id, n.e, n.nrm, af.cid
  FROM n JOIN af ON n.vec_id = af.vec_id
),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         list_reduce(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i]),
                     (s, x) -> s + x) / (a.nrm * b.nrm) AS cosine
  FROM cells a JOIN cells b
    ON a.cid = b.cid AND b.vec_id <> a.vec_id
  WHERE a.vec_id < {N_QUERY}
)
SELECT query_id, neighbor_id, cosine, rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
) t
WHERE rk <= {TOP_K}
ORDER BY query_id, rk
"""


IVF_ORACLE = _ivf_trained_oracle()


def _assign_cells(n: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid cell assignment without a per-vector window.

    The naive form — crossJoin(broadcast(cent)) then ``row_number() OVER
    (PARTITION BY vec_id)`` — forces an Exchange of the fanned-out
    corpus (k× the data) just to pick each vector's argmax. A grouped
    ``max_by`` computes the same nearest centroid with MAP-SIDE partial
    aggregation: each task reduces its fan-out back to one row per
    vector before the shuffle, so the Exchange carries ~corpus rows
    regardless of k. Ties break to the smallest centroid_id via the
    (ccos, -centroid_id) ordering struct, matching the oracle's
    ``ORDER BY ccos DESC, centroid_id``."""
    ccos = dot_unrolled(F.col("e"), F.col("ce"), _EMB_DIMS) / (
        F.col("nrm") * F.col("cnrm")
    )
    return (
        n.crossJoin(F.broadcast(cent))
        .select("vec_id", "label", "e", "nrm", "centroid_id", ccos.alias("ccos"))
        .groupBy("vec_id", "label", "e", "nrm")
        .agg(
            F.max_by(
                "centroid_id",
                F.struct(F.col("ccos"), (-F.col("centroid_id")).alias("nid")),
            ).alias("centroid_id")
        )
    )


def _int_dist(a, b):
    """Exact squared-L2 between two array<long> micro-unit vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _int_dist_unrolled(a, b, dims: int):
    """Exact squared-L2 as a fixed sum of ``dims`` element terms —
    identical result to ``_int_dist`` (integer adds commute), but plain
    whole-stage-codegen arithmetic instead of per-row higher-order
    lambda evaluation. Use for SMALL fixed dims in hot inner loops
    (the PQ sub-vector distance is evaluated corpus × PQ_K times per
    Lloyd round; the HOF form was the measured bottleneck)."""
    terms = [
        (F.element_at(a, d) - F.element_at(b, d))
        * (F.element_at(a, d) - F.element_at(b, d))
        for d in range(1, dims + 1)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _kmeans_cells(n: DataFrame) -> DataFrame:
    """Train the IVF coarse quantizer and return final cell assignments.

    KMEANS_ITERS rounds of Lloyd's algorithm entirely in exact integer
    micro-units, via the shared vectorized trainer (functions/lloyd.py,
    r15: one NumPy mapInArrow pass + codebook-sized partial sums per
    round — the round-11 min_by fan-out aggregation was the measured
    per-round cost center). Assignment ties break to the smallest cid
    and the update is truncate-toward-zero integer division, so the
    final centroids stay bit-identical to the round-11 dataflow and the
    DuckDB oracle. Empty cells drop out of the update deterministically
    in both engines. The final full-corpus assignment is the SAME NumPy
    encoder the trainer uses (assign_blocks: one mapInArrow pass,
    first-occurrence argmin over cid-sorted centroids == the former
    min_by(cid, struct(dist, cid)) tie-break, test-pinned), joined back
    to the corpus by the unique vec_id. The former JVM broadcast
    fan-out reduced through a grouped min_by whose GROUP KEY was the
    64-double embedding array — an ObjectHashAggregate that measured
    1.4 s warm at sf0.1 vs 0.45 s for the encoder+join (bit-identical
    assignments, checked in-session)."""
    dims = 64
    cent = train_blocks(
        n.select("vec_id", "qvec"),
        n.where(F.col("vec_id") % CENT_MOD == 0).select("vec_id"),
        id_col="vec_id",
        vec_col="qvec",
        dims=dims,
        n_blocks=1,
        iters=KMEANS_ITERS,
    )
    asg = assign_blocks(
        n.select("vec_id", "qvec"),
        cent,
        id_col="vec_id",
        vec_col="qvec",
        dims=dims,
        n_blocks=1,
    ).select("vec_id", "cid")
    return n.join(asg, "vec_id").select("vec_id", "label", "e", "nrm", "cid")


@register("similarity_ann_ivf", oracle=IVF_ORACLE, tags=("similarity", "ivf", "ann"))
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a trained coarse quantizer: seeded fixed-iteration
    k-means (exact integer micro-units, see _kmeans_cells) assigns every
    vector to a data-distribution-aware cell; a query then searches only
    its own cell (nprobe=1) with exact cosine + top-k.

    Scale path: training touches the corpus KMEANS_ITERS+1 times but
    each pass is a broadcast + map-side partial aggregation (the
    centroid table is k rows); the candidate join is an equi-join on
    cid, so a query touches ~corpus/k vectors. Raising recall = raising
    nprobe (probe the query's top-p cells) — same plan shape."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.select(
        "vec_id",
        "label",
        as_double("embedding").alias("e"),
        _qvec(F.col("embedding")).alias("qvec"),
    ).withColumn("nrm", norm(F.col("e")))
    cells = _kmeans_cells(n)
    q = cells.where(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qnrm"),
        F.col("cid").alias("qcid"),
    )
    scored = cells.join(
        F.broadcast(q),
        (F.col("cid") == F.col("qcid")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot_unrolled(F.col("qe"), F.col("e"), _EMB_DIMS)
             / (F.col("qnrm") * F.col("nrm"))).alias(
            "cosine"
        ),
    )
    return topk_per_key(
        scored,
        keys=["query_id"],
        order=[F.desc("cosine"), F.col("neighbor_id")],
        k=TOP_K,
        salt_col="neighbor_id",
    ).orderBy("query_id", "rk")


NPROBE = 2

IVF_NPROBE_ORACLE = f"""
WITH v AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id, label, e,
         sqrt(list_reduce(list_transform(e, x -> x * x), (s, x) -> s + x)) AS nrm
  FROM v
),
cent AS (
  SELECT vec_id AS centroid_id, e AS ce, nrm AS cnrm FROM n
  WHERE vec_id % {CENT_MOD} = 0
),
-- NARROW rank (the r12 autotuner lesson, applied here after the x30
-- sweep spilled 24 GiB): the vec x centroid window carries only ids +
-- the score, never the embedding arrays; arrays re-join by id AFTER
-- the crk filter. MATERIALIZED so the double reference (assigned +
-- probes) does not re-evaluate the cross join.
ranked AS MATERIALIZED (
  SELECT n.vec_id, cent.centroid_id,
         ROW_NUMBER() OVER (
           PARTITION BY n.vec_id
           ORDER BY list_reduce(list_transform(range(1, len(n.e) + 1),
                                               i -> n.e[i] * cent.ce[i]),
                                (s, x) -> s + x) / (n.nrm * cent.cnrm) DESC,
                    cent.centroid_id) AS crk
  FROM n CROSS JOIN cent
),
assigned AS MATERIALIZED (
  SELECT n.vec_id, n.label, n.e, n.nrm, r.centroid_id
  FROM ranked r JOIN n ON n.vec_id = r.vec_id WHERE r.crk = 1
),
probes AS (
  SELECT n.vec_id, n.e, n.nrm, r.centroid_id
  FROM ranked r JOIN n ON n.vec_id = r.vec_id
  WHERE r.crk <= {NPROBE} AND r.vec_id < {N_QUERY}
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_reduce(list_transform(range(1, len(q.e) + 1), i -> q.e[i] * c.e[i]),
                     (s, x) -> s + x) / (q.nrm * c.nrm) AS cosine
  FROM probes q JOIN assigned c
    ON q.centroid_id = c.centroid_id AND c.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, cosine, rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
) t
WHERE rk <= {TOP_K}
ORDER BY query_id, rk
"""


@register(
    "similarity_ann_ivf_nprobe",
    oracle=IVF_NPROBE_ORACLE,
    tags=("similarity", "ivf", "ann", "nprobe"),
)
def similarity_ann_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with multi-cell probing (nprobe=2): queries search their 2
    nearest coarse cells instead of 1, trading ~2× candidates for higher
    recall — the standard IVF recall knob. Corpus assignment (crk=1) is
    unchanged; only the query side fans out, so the plan is the same
    cell equi-join with a 2-rows-per-query probe table. Probed cells are
    distinct per query, so candidate pairs are already unique — no
    dedup stage needed. Corpus assignment is the shared map-side max_by
    kernel (_assign_cells); only the N_QUERY-row query side needs a
    full centroid ranking, and that window runs over a table the size
    of the query set, not the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.select("vec_id", "label", as_double("embedding").alias("e")).withColumn(
        "nrm", norm(F.col("e"))
    )
    cent = n.where(F.col("vec_id") % CENT_MOD == 0).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cnrm"),
    )
    assigned = _assign_cells(n, cent)
    ccos = dot_unrolled(F.col("e"), F.col("ce"), _EMB_DIMS) / (
        F.col("nrm") * F.col("cnrm")
    )
    w_probe = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), "centroid_id")
    probes = (
        n.where(F.col("vec_id") < N_QUERY)
        .crossJoin(F.broadcast(cent))
        .withColumn("ccos", ccos)
        .withColumn("crk", F.row_number().over(w_probe))
        .where(F.col("crk") <= NPROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("nrm").alias("qnrm"),
            F.col("centroid_id").alias("qcent"),
        )
    )
    scored = assigned.join(
        F.broadcast(probes),
        (F.col("centroid_id") == F.col("qcent"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot_unrolled(F.col("qe"), F.col("e"), _EMB_DIMS)
             / (F.col("qnrm") * F.col("nrm"))).alias(
            "cosine"
        ),
    )
    return topk_per_key(
        scored,
        keys=["query_id"],
        order=[F.desc("cosine"), F.col("neighbor_id")],
        k=TOP_K,
        salt_col="neighbor_id",
    ).orderBy("query_id", "rk")


# --- embedding aggregation / classification ---------------------------------
#
# Group averages of floats are merge-order dependent, so centroids are
# computed in exact integer micro-units (see the shared helpers at the
# top of this module): quantize, sum exactly, divide in integers.


@register(
    "embedding_centroids",
    oracle=f"""
WITH q AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * {MICRO}) AS BIGINT) AS qx
  FROM embeddings
)
SELECT label, dim, COUNT(*) AS n_vecs,
       CAST(SUM(qx) AS DOUBLE) / (COUNT(*) * {MICRO}) AS centroid
FROM q GROUP BY label, dim
ORDER BY label, dim
""",
    tags=("similarity", "embedding", "centroid"),
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid, one row per (label, dimension).

    posexplode fans each vector into 64 (dim, value) rows; the partial
    aggregation combines map-side, so the shuffle carries one partial
    sum per (label, dim) per partition — constant in corpus size. The
    flat layout is what a feature store would join against."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("label", F.posexplode(_qvec(F.col("embedding"))).alias("dim", "qx"))
    return (
        q.groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (F.sum("qx").cast("double") / (F.count(F.lit(1)) * MICRO)).alias(
                "centroid"
            ),
        )
        .orderBy("label", "dim")
    )


@register(
    "embedding_nearest_centroid",
    oracle=f"""
WITH q AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * {MICRO}) AS BIGINT) AS qx
  FROM embeddings
),
c AS (
  SELECT label AS cl, d,
         CAST(ROUND(CAST(SUM(qx) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cx
  FROM q GROUP BY label, d
),
ss AS (
  SELECT q.vec_id, q.label, c.cl,
         CAST(SUM((q.qx - c.cx) * (q.qx - c.cx)) AS BIGINT) AS dist_sq
  FROM q JOIN c ON q.d = c.d
  GROUP BY q.vec_id, q.label, c.cl
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY dist_sq, cl) AS rn
  FROM ss
)
SELECT vec_id, label, cl AS assigned_label, dist_sq,
       CASE WHEN label = cl THEN 1 ELSE 0 END AS correct
FROM r WHERE rn = 1
ORDER BY vec_id
""",
    tags=("similarity", "embedding", "classify"),
)
def embedding_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification (one k-means assignment step):
    label centroids in exact micro-units, then every vector scores all
    k centroids via a JVM-side zip_with/aggregate fold — no explode of
    the corpus, no shuffle beyond the 640-row centroid aggregate; the
    k-row centroid table broadcasts. The argmin is a grouped min_by
    (map-side partial aggregation — the k× fan-out never shuffles),
    and the integer distance makes it reproducible across engines and
    partitionings."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", "label", _qvec(F.col("embedding")).alias("qvec"))
    qx = q.select("label", F.posexplode("qvec").alias("d", "qx"))
    cent = qx.groupBy("label", "d").agg(
        F.round(F.sum("qx").cast("double") / F.count(F.lit(1)), 0)
        .cast("long")
        .alias("cx")
    )
    carr = cent.groupBy(F.col("label").alias("cl")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "cx"))), lambda s: s.cx
        ).alias("cvec")
    )
    scored = q.crossJoin(F.broadcast(carr)).select(
        "vec_id",
        "label",
        "cl",
        F.aggregate(
            F.zip_with("qvec", "cvec", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dist_sq"),
    )
    best = scored.groupBy("vec_id", "label").agg(
        F.min_by(F.struct("cl", "dist_sq"), F.struct("dist_sq", "cl")).alias("b")
    )
    return (
        best.select(
            "vec_id",
            "label",
            F.col("b.cl").alias("assigned_label"),
            F.col("b.dist_sq").alias("dist_sq"),
            F.when(F.col("label") == F.col("b.cl"), 1).otherwise(0).alias("correct"),
        )
        .orderBy("vec_id")
    )


N_NORM_DIMS = 8  # normalize the leading dims (all 64 works identically)


@register(
    "embedding_quantile_normalize",
    oracle=f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(UNNEST(embedding) AS DOUBLE) AS x
  FROM embeddings
)
SELECT vec_id, dim,
       CAST(RANK() OVER w - 1 AS DOUBLE)
         / (COUNT(*) OVER (PARTITION BY dim) - 1) AS pct
FROM q
WHERE dim < {N_NORM_DIMS}
WINDOW w AS (PARTITION BY dim ORDER BY x)
ORDER BY vec_id, dim
""",
    tags=("similarity", "embedding", "normalize"),
)
def embedding_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension quantile (rank) normalization of embeddings — the
    distribution-free rescaling for mixed-source vectors. percent_rank
    is (rank-1)/(n-1) over exact integer ranks, so outputs are
    bit-identical cross-engine with zero float recipes; ties share a
    rank by definition in both. One shuffle on dim (64 partitions of
    corpus-size each — at 100 TB, range-partition within dim)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("dim", "x"),
    ).where(F.col("dim") < N_NORM_DIMS)
    w = Window.partitionBy("dim").orderBy("x")
    return (
        q.select(
            "vec_id",
            "dim",
            F.percent_rank().over(w).alias("pct"),
        )
        .orderBy("vec_id", "dim")
    )


# --- dominant principal direction via integer power iteration ---------------

GRAM_DOWNSCALE = 1_000_000_000
PCA_ITERS = 3


def _pca_oracle() -> str:
    its = []
    prev = "v0"
    for k in range(1, PCA_ITERS + 1):
        its.append(
            f"""
u{k} AS (
  SELECT g.i AS d, CAST(SUM(g.gs * {prev}.v) AS BIGINT) AS u
  FROM g JOIN {prev} ON {prev}.d = g.j GROUP BY g.i
),
m{k} AS (SELECT MAX(ABS(u)) AS m FROM u{k}),
v{k} AS (
  SELECT d, {_sdiv_duck("u * 1000000", "m")} AS v
  FROM u{k} CROSS JOIN m{k}
)"""
        )
        prev = f"v{k}"
    return f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * {MICRO}) AS BIGINT) AS qx
  FROM embeddings
),
g AS (
  SELECT a.d AS i, b.d AS j,
         {_sdiv_duck(f"CAST(SUM(a.qx * b.qx) AS BIGINT)", str(GRAM_DOWNSCALE))} AS gs
  FROM q a JOIN q b ON a.vec_id = b.vec_id
  GROUP BY a.d, b.d
),
v0 AS (SELECT DISTINCT d, CAST({MICRO} AS BIGINT) AS v FROM q),{",".join(its)}
SELECT d AS dim, v AS eigvec_micro FROM {prev} ORDER BY dim
"""


@register(
    "embedding_pca_power_iteration",
    oracle=_pca_oracle(),
    tags=("similarity", "pca", "iterative"),
)
def embedding_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding corpus by power
    iteration on the Gram matrix — the first step of distributed PCA.
    The Gram accumulates as EXACT integer products over one corpus pass
    (the classic outer-product aggregation: 64×64 partial sums per
    partition, constant-size shuffle regardless of corpus rows); the
    64×64 iteration itself is tiny and stays declarative. Every step is
    integer arithmetic with sign-safe scaling divisions, so all three
    iterations are bit-identical in any engine at any parallelism."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id", F.posexplode(_qvec(F.col("embedding"))).alias("d", "qx")
    )
    a, b = q.alias("a"), q.alias("b")
    g = (
        a.join(b, F.col("a.vec_id") == F.col("b.vec_id"))
        .groupBy(F.col("a.d").alias("i"), F.col("b.d").alias("j"))
        .agg(F.sum(F.col("a.qx") * F.col("b.qx")).alias("s"))
        .selectExpr("i", "j", _sdiv_spark("s", str(GRAM_DOWNSCALE)) + " AS gs")
    )
    v = q.select("d").distinct().select("d", F.lit(MICRO).cast("long").alias("v"))
    for _ in range(PCA_ITERS):
        u = (
            g.join(v, g.j == v.d)
            .groupBy("i")
            .agg(F.sum(F.col("gs") * F.col("v")).alias("u"))
            .withColumnRenamed("i", "d")
        )
        m = u.agg(F.max(F.abs(F.col("u"))).alias("m"))
        v = u.crossJoin(F.broadcast(m)).selectExpr(
            "d", _sdiv_spark("u * 1000000", "m") + " AS v"
        )
    return v.select(F.col("d").alias("dim"), F.col("v").alias("eigvec_micro")).orderBy(
        "dim"
    )


# --- kNN imputation over embeddings ----------------------------------------

KNN_K = 5
MASK_MOD = 10  # vec_id % 10 == 0 -> dimension 0 treated as missing


@register(
    "impute_knn_embedding",
    oracle=f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * {MICRO}) AS BIGINT) AS qx
  FROM embeddings
),
masked AS (SELECT * FROM q WHERE vec_id % {MASK_MOD} = 0),
cands  AS (SELECT * FROM q WHERE vec_id % {MASK_MOD} <> 0),
ss AS (
  SELECT m.vec_id AS m_id, c.vec_id AS c_id,
         CAST(SUM((m.qx - c.qx) * (m.qx - c.qx)) AS BIGINT) AS dist_sq
  FROM masked m JOIN cands c ON m.d = c.d
  WHERE m.d >= 1
  GROUP BY m.vec_id, c.vec_id
),
nn AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY m_id ORDER BY dist_sq, c_id) AS rn
  FROM ss
),
imp AS (
  SELECT nn.m_id AS vec_id,
         CAST(ROUND(SUM(c0.qx) / {KNN_K}.0) AS BIGINT) AS imputed_micro
  FROM nn JOIN cands c0 ON c0.vec_id = nn.c_id AND c0.d = 0
  WHERE nn.rn <= {KNN_K}
  GROUP BY nn.m_id
)
SELECT imp.vec_id, t.qx AS true_micro, imp.imputed_micro,
       ABS(t.qx - imp.imputed_micro) AS abs_err_micro
FROM imp JOIN masked t ON t.vec_id = imp.vec_id AND t.d = 0
ORDER BY imp.vec_id
""",
    tags=("imputation", "knn", "embedding"),
)
def impute_knn_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN imputation of a masked embedding dimension: vectors with
    vec_id % 10 == 0 'lose' dimension 0; each is reconstructed as the
    mean of its 5 nearest neighbors (distance over the 63 observed
    dims) — the distributed-kNN alternative to the RBM imputer on the
    vector side of the house. The small masked side broadcasts and the
    candidate corpus STREAMS (at 100 TB: prune candidates to LSH
    bucket-mates first — similarity_ann_lsh is the pruner). Integer
    micro-unit distances make neighbor choice and the imputed value
    bit-deterministic; abs_err_micro reports reconstruction quality."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", _qvec(F.col("embedding")).alias("qvec"))
    masked = q.where(F.col("vec_id") % MASK_MOD == 0).select(
        F.col("vec_id").alias("m_id"), F.col("qvec").alias("m_vec")
    )
    cands = q.where(F.col("vec_id") % MASK_MOD != 0).select(
        F.col("vec_id").alias("c_id"), F.col("qvec").alias("c_vec")
    )
    # r16 (guide §4.2 — the r15 cosine-verify treatment, VERDICT r15
    # #4): the pair fan-out AND the 63-term distance move into ONE
    # mapInArrow pass over the streaming candidate corpus. The former
    # shape (r15: unrolled JVM projection over a
    # BroadcastNestedLoopJoin cross, 57 s → 3.0 s) still materialized
    # every pair row carrying BOTH 64-long arrays (~370 MB at sf0.1's
    # 360k pairs) just so codegen could fold them down to 4 longs;
    # here each Arrow batch emits (m_id, c_id, dist_sq, c0) directly.
    # The masked side is driver-collected — the same scale posture as
    # the former F.broadcast(masked), which also materializes the
    # relation on the driver (corpus/10 rows by construction; at
    # 100 TB prune BOTH sides to LSH bucket-mates first, per the
    # docstring). Exactness: int64 throughout; the distance uses the
    # |m|²+|c|²−2·m·c expansion — exact integer arithmetic, equal to
    # the oracle's Σ(m−c)² (integer adds commute); the (chunk × n_m)
    # distance temp is row-chunked exactly like lloyd's assignment.
    import numpy as np
    import pyarrow as pa

    from boltzmannclean_spark.functions.lloyd import _list_to_matrix

    mrows = masked.collect()
    mrows.sort(key=lambda r: r[0])
    n_m = len(mrows)
    M = (
        np.array([r[1] for r in mrows], dtype=np.int64)
        if n_m
        else np.zeros((0, _EMB_DIMS), dtype=np.int64)
    )
    m_ids = np.array([r[0] for r in mrows], dtype=np.int64)
    Msub = M[:, 1:]  # observed dims 2..64 (dim 1 is the masked one)
    msq = np.einsum("ij,ij->i", Msub, Msub)
    step = max(1, 16_000_000 // max(1, n_m))

    def _pairs(batches):
        for b in batches:
            if b.num_rows == 0 or n_m == 0:
                continue
            c_ids = b.column(0).to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False
            )
            C = _list_to_matrix(b.column(1), _EMB_DIMS)
            c0 = C[:, 0]
            Csub = C[:, 1:]
            csq = np.einsum("ij,ij->i", Csub, Csub)
            for lo in range(0, Csub.shape[0], step):
                Cc = Csub[lo : lo + step]
                D = Cc @ Msub.T  # (chunk, n_m) int64, exact
                np.multiply(D, -2, out=D)
                D += csq[lo : lo + step, None]
                D += msq[None, :]
                n = Cc.shape[0]
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.tile(m_ids, n)),
                        pa.array(np.repeat(c_ids[lo : lo + step], n_m)),
                        pa.array(D.reshape(-1)),
                        pa.array(np.repeat(c0[lo : lo + step], n_m)),
                    ],
                    ["m_id", "c_id", "dist_sq", "c0"],
                )

    pairs = cands.mapInArrow(
        _pairs, "m_id long, c_id long, dist_sq long, c0 long"
    )
    imp = (
        topk_per_key(
            pairs,
            keys=["m_id"],
            order=[F.col("dist_sq"), F.col("c_id")],
            k=KNN_K,
            salt_col="c_id",
            rank_col="rn",
        )
        .groupBy("m_id")
        .agg(
            F.round(F.sum("c0") / float(KNN_K), 0).cast("long").alias(
                "imputed_micro"
            )
        )
    )
    truth = masked.select(
        "m_id", F.element_at("m_vec", 1).alias("true_micro")
    )
    return (
        imp.join(truth, "m_id")
        .select(
            F.col("m_id").alias("vec_id"),
            "true_micro",
            "imputed_micro",
            F.abs(F.col("true_micro") - F.col("imputed_micro")).alias(
                "abs_err_micro"
            ),
        )
        .orderBy("vec_id")
    )


@register(
    "similarity_ann_brp_mllib",
    oracle=None,  # MLlib's random-projection hash family is JVM-internal;
    # invariants (exact-distance verification, recall vs brute force)
    # live in tests/test_llm_ops.py.
    tags=("similarity", "ann", "mllib", "euclidean"),
)
def similarity_ann_brp_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib BucketedRandomProjectionLSH ANN — the idiomatic-Spark
    alternate to the hand-built LSH/IVF variants, on EUCLIDEAN distance
    (completing the MLlib pairing with dedup_minhash_mllib's Jaccard).
    approxNearestNeighbors serves one query at a time (driver-looped —
    fine for interactive lookup, not batch); the batch path used here
    is approxSimilarityJoin(queries, corpus, radius): same bucketed
    equi-join economics as the SQL-composable variants — candidates are
    bucket-colliders, verified with the exact distance, so precision is
    1.0 and only recall is approximate. Seeded and deterministic;
    rows-only at the harness because the hash family is JVM-internal."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", array_to_vector(as_double("embedding")).alias("features")
    )
    q = v.where(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"), F.col("features").alias("qf")
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=2.0,
        numHashTables=4,
        seed=42,
    )
    model = brp.fit(v)
    qf = q.withColumnRenamed("qf", "features")
    pairs = (
        model.approxSimilarityJoin(qf, v, 12.0, distCol="euclid_dist")
        .where(F.col("datasetA.query_id") != F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.query_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("neighbor_id"),
            F.col("euclid_dist").cast("double").alias("euclid_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("euclid_dist", "neighbor_id")
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "euclid_dist", "rk")
        .orderBy("query_id", "rk")
    )


# Product quantization (Jégou et al. 2011): split the 64-dim space into
# PQ_M blocks of PQ_DSUB dims; per block, train a PQ_K-code codebook by
# Lloyd iterations in exact integer micro-units (same recipe as the IVF
# coarse quantizer, with the block id as an extra grouping key), encode
# every vector as PQ_M small codes, and answer queries by ADC —
# Asymmetric Distance Computation: a per-query lookup table of exact
# block distances to every code, summed over blocks per neighbor. All
# distances are exact integer sums, so both engines agree bit-for-bit.
# r11 config: 32 blocks × 256 codes (8-bit codes, the industry
# standard; 2-dim sub-vectors). Chosen from a measured grid at sf0.1
# (2000 near-isotropic vectors, 50 queries, full-scan recall@10):
#   m=8  k=16  it=6: 0.168   (the r10 config at this scale)
#   m=8  k=256 it=6: 0.400
#   m=16 k=256 it=6: 0.612
#   m=32 k=64  it=3: 0.666
#   m=32 k=128 it=3: 0.760
#   m=32 k=256 it=2: 0.814   <- chosen (it=3 adds only +0.006)
# Residual (IVF-centered) PQ was measured on the same grid and adds
# ~nothing here (m=16 k=256: 0.600 res vs 0.612 raw) because the
# fixture embeddings are near-isotropic (SVD spectrum 3.7..1.8) — the
# coarse centroids capture almost no variance. The residual option
# ships in ann.py (build_ann_index(residual=True)) as the scale path
# for clustered real-world corpora; see SCALING.md round-11.
PQ_M = 32
PQ_DSUB = 2
PQ_K = 256
PQ_ITERS = 2


def _pq_pivot_cols(expr: str, out: str) -> str:
    return ", ".join(
        f"MAX(CASE WHEN d = {d} THEN {expr} END) AS {out}{d}"
        for d in range(PQ_DSUB)
    )


def _pq_dist_expr() -> str:
    return " + ".join(
        f"(q.x{d} - c.c{d}) * (q.x{d} - c.c{d})" for d in range(PQ_DSUB)
    )


def _pq_iter_sql(k: int, prev: str, src: str = "pq") -> str:
    """One unrolled per-block Lloyd iteration (block id `b` rides along
    every key of the IVF iteration shape), in the pivoted arg_min form
    (see _ARGMIN_PACK note above — measured 46.5 s → 1.0 s per
    iteration at the ×10 replica with k=256). ``src`` selects the
    training population CTE (the incremental-assign oracle trains on a
    filtered subset). Emits the updated codebook pivoted (pw-naming)
    AND unpivoted as ``pc{{k}}`` (cid, b, d, cx) for shape-compatible
    downstream SQL."""
    pivot_src = (
        f"pv1 AS (\n  SELECT vec_id, b, {_pq_pivot_cols('qx', 'x')}"
        f"\n  FROM {src} GROUP BY vec_id, b\n),\n"
        if k == 1
        else ""
    )
    means = ", ".join(
        _sdiv_duck(f"CAST(SUM(q.x{d}) AS BIGINT)", "COUNT(*)") + f" AS m{d}"
        for d in range(PQ_DSUB)
    )
    d_list = ", ".join(str(d) for d in range(PQ_DSUB))
    m_list = ", ".join(f"m{d}" for d in range(PQ_DSUB))
    return f"""
{pivot_src}pw{k} AS (
  SELECT cid, b, {_pq_pivot_cols('cx', 'c')} FROM {prev} GROUP BY cid, b
),
pa{k} AS (
  SELECT q.vec_id, q.b,
         arg_min(c.cid, CAST({_pq_dist_expr()} AS HUGEINT)
                          * {_ARGMIN_PACK}::HUGEINT + c.cid) AS cid
  FROM pv1 q JOIN pw{k} c ON q.b = c.b
  GROUP BY q.vec_id, q.b
),
pm{k} AS (
  SELECT a.cid, q.b, {means}
  FROM pv1 q JOIN pa{k} a ON q.vec_id = a.vec_id AND q.b = a.b
  GROUP BY a.cid, q.b
),
pc{k} AS (
  SELECT cid, b, UNNEST([{d_list}]) AS d, UNNEST([{m_list}]) AS cx
  FROM pm{k}
)"""


def _pq_codes_sql(final_cb: str, out: str = "codes", src: str = "pq") -> str:
    """Full-corpus code assignment against the trained codebook — the
    pivoted arg_min form. ``src`` may differ from the training
    population (delta assignment encodes vectors the training never
    saw), so it re-pivots under its own name."""
    return f"""
{out}v AS (
  SELECT vec_id, b, {_pq_pivot_cols('qx', 'x')} FROM {src} GROUP BY vec_id, b
),
{out}w AS (
  SELECT cid, b, {_pq_pivot_cols('cx', 'c')} FROM {final_cb} GROUP BY cid, b
),
{out} AS (
  SELECT q.vec_id, q.b,
         arg_min(c.cid, CAST({_pq_dist_expr()} AS HUGEINT)
                          * {_ARGMIN_PACK}::HUGEINT + c.cid) AS cid
  FROM {out}v q JOIN {out}w c ON q.b = c.b
  GROUP BY q.vec_id, q.b
)"""


def _pq_lut_sql(final_cb: str, out: str = "lut", src: str = "pq") -> str:
    """Per-(query, block, code) exact block distances — the ADC LUT.
    Query-set-sized (N_QUERY × PQ_M × PQ_K rows), so the textbook
    grouped-distance shape is kept but the scan is pushed down to the
    query vectors BEFORE the codebook join."""
    return f"""
{out} AS (
  SELECT q.vec_id AS query_id, q.b, c.cid,
         CAST(SUM((q.qx - c.cx) * (q.qx - c.cx)) AS BIGINT) AS pdist
  FROM (SELECT * FROM {src} WHERE vec_id < {{n_query}}) q
  JOIN {final_cb} c ON q.b = c.b AND q.d = c.d
  GROUP BY q.vec_id, q.b, c.cid
)""".replace("{n_query}", str(N_QUERY))


def _pq_oracle() -> str:
    iters = []
    prev = "pc0"
    for k in range(1, PQ_ITERS + 1):
        iters.append(_pq_iter_sql(k, prev))
        prev = f"pc{k}"
    return f"""
WITH pq AS (
  SELECT vec_id,
         (generate_subscripts(embedding, 1) - 1) // {PQ_DSUB} AS b,
         (generate_subscripts(embedding, 1) - 1) % {PQ_DSUB} AS d,
         CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * {MICRO}) AS BIGINT) AS qx
  FROM embeddings
),
pc0 AS (SELECT vec_id AS cid, b, d, qx AS cx FROM pq WHERE vec_id < {PQ_K}),{",".join(iters)},{_pq_codes_sql(prev)},{_pq_lut_sql(prev)},
scored AS (
  SELECT l.query_id, c.vec_id AS neighbor_id,
         CAST(SUM(l.pdist) AS BIGINT) AS adc_dist
  FROM codes c JOIN lut l ON c.b = l.b AND c.cid = l.cid
  WHERE c.vec_id <> l.query_id
  GROUP BY l.query_id, c.vec_id
)
SELECT query_id, neighbor_id, adc_dist, rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY adc_dist, neighbor_id) AS rk
  FROM scored
) t
WHERE rk <= {TOP_K}
ORDER BY query_id, rk
"""


def _pq_subvectors(n: DataFrame) -> DataFrame:
    """(vec_id, qvec) -> one row per (vec_id, block) with the block's
    PQ_DSUB-dim integer sub-vector. A row-local explode — no shuffle."""
    subs = F.array(
        *[
            F.struct(
                F.lit(b).alias("b"),
                F.slice("qvec", b * PQ_DSUB + 1, PQ_DSUB).alias("qsub"),
            )
            for b in range(PQ_M)
        ]
    )
    return n.select("vec_id", F.explode(subs).alias("s")).select(
        "vec_id", F.col("s.b").alias("b"), F.col("s.qsub").alias("qsub")
    )


def _pq_train(nvec: DataFrame) -> DataFrame:
    """Per-block codebooks via PQ_ITERS Lloyd rounds in exact integer
    micro-units over ``nvec = (vec_id, qvec)``, via the shared
    vectorized trainer (functions/lloyd.py, r15: the round-11 min_by
    fan-out aggregation measured 4-7 s PER round at sf0.1 on the
    ObjectHashAggregate path; the NumPy pass replaces it at identical
    exact-integer semantics). Seeds are the first PQ_K vectors, ties
    break to the smallest cid, the update is truncate-toward-zero
    division — bit-identical to the DuckDB oracle's derivation.
    Returns (b, cid, cvec array<long>), codebook-sized."""
    return train_blocks(
        nvec,
        nvec.where(F.col("vec_id") < PQ_K).select("vec_id"),
        id_col="vec_id",
        vec_col="qvec",
        dims=PQ_M * PQ_DSUB,
        n_blocks=PQ_M,
        iters=PQ_ITERS,
    )


@register(
    "similarity_ann_pq_adc",
    oracle=_pq_oracle(),
    tags=("similarity", "ann", "pq", "quantization"),
)
def similarity_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with ADC scoring (Jégou et al. 2011) —
    the COMPRESSION leg of a 100 TB vector store: each 64-dim float
    vector is stored as PQ_M=32 one-byte codes (8× smaller than
    float32), and a query scans codes, not vectors. Per-block codebooks
    (PQ_K=256 codes — 8-bit, the industry standard; chosen from the
    measured recall grid above) are trained by integer-exact Lloyd rounds
    (the IVF recipe with the block id as an extra key); ADC sums each
    query's precomputed exact block-distance LUT over a neighbor's
    codes. LUT is (queries × PQ_M × PQ_K) rows broadcast; the scan
    is a code-table equi-join + sum — at scale this composes with IVF
    (restrict the scan to probed cells) without changing shape. Every
    distance is an exact integer sum, so codebooks, codes, LUT, and
    ADC totals are all bit-identical to the DuckDB oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    # localCheckpoint once: the quantized corpus feeds PQ_ITERS training
    # passes plus the encode pass — checkpointing the (vec_id, qvec)
    # frame (32× narrower than the old per-block explode) stops each
    # pass re-scanning + re-quantizing the source.
    n = emb.select(
        "vec_id", _qvec(F.col("embedding")).alias("qvec")
    ).localCheckpoint()
    # Training materializes the codebook driver-side (codebook-sized;
    # functions/lloyd.py), so the codes and LUT branches below share it
    # with no cache() and no re-run.
    cent = _pq_train(n)
    codes = assign_blocks(
        n, cent, id_col="vec_id", vec_col="qvec",
        dims=PQ_M * PQ_DSUB, n_blocks=PQ_M,
    )
    # LUT: filter to the N_QUERY query vectors BEFORE the codebook
    # fan-out (r15 — the old shape fanned the whole corpus out and then
    # filtered, a full extra corpus×PQ_K pass for 5 queries' rows).
    lut = (
        _pq_subvectors(n.where(F.col("vec_id") < N_QUERY))
        .join(F.broadcast(cent), "b")
        .select(
            F.col("vec_id").alias("query_id"),
            "b",
            "cid",
            _int_dist_unrolled(F.col("qsub"), F.col("cvec"), PQ_DSUB).alias(
                "pdist"
            ),
        )
    )
    scored = (
        codes.join(F.broadcast(lut), ["b", "cid"])
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("pdist").alias("adc_dist"))
    )
    return topk_per_key(
        scored,
        keys=["query_id"],
        order=[F.col("adc_dist"), F.col("neighbor_id")],
        k=TOP_K,
        salt_col="neighbor_id",
    ).orderBy("query_id", "rk")


def _ivfpq_oracle() -> str:
    """IVF coarse quantizer CTEs (q/c*/af) + PQ codebook CTEs
    (pq/pc*/codes/lut), then ADC scoring restricted to the query's IVF
    cell — both trainings unrolled exactly as in their standalone
    oracles."""
    ivf_iters, prev = [], "c0"
    for k in range(1, KMEANS_ITERS + 1):
        ivf_iters.append(_kmeans_iter_sql(k, prev))
        prev = f"c{k}"
    ivf_final = prev
    pq_iters, prev = [], "pc0"
    for k in range(1, PQ_ITERS + 1):
        pq_iters.append(_pq_iter_sql(k, prev))
        prev = f"pc{k}"
    pq_final = prev
    return f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * {MICRO}) AS BIGINT) AS qx
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, d, qx AS cx FROM q WHERE vec_id % {CENT_MOD} = 0),{",".join(ivf_iters)},{_kmeans_assign_sql(ivf_final)},
pq AS (
  SELECT vec_id,
         (generate_subscripts(embedding, 1) - 1) // {PQ_DSUB} AS b,
         (generate_subscripts(embedding, 1) - 1) % {PQ_DSUB} AS d,
         CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * {MICRO}) AS BIGINT) AS qx
  FROM embeddings
),
pc0 AS (SELECT vec_id AS cid, b, d, qx AS cx FROM pq WHERE vec_id < {PQ_K}),{",".join(pq_iters)},{_pq_codes_sql(pq_final)},{_pq_lut_sql(pq_final)},
scored AS (
  SELECT l.query_id, c.vec_id AS neighbor_id,
         CAST(SUM(l.pdist) AS BIGINT) AS adc_dist
  FROM codes c
  JOIN lut l ON c.b = l.b AND c.cid = l.cid
  JOIN af an ON an.vec_id = c.vec_id
  JOIN af aq ON aq.vec_id = l.query_id AND aq.cid = an.cid
  WHERE c.vec_id <> l.query_id
  GROUP BY l.query_id, c.vec_id
)
SELECT query_id, neighbor_id, adc_dist, rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY adc_dist, neighbor_id) AS rk
  FROM scored
) t
WHERE rk <= {TOP_K}
ORDER BY query_id, rk
"""


@register(
    "similarity_ann_ivfpq",
    oracle=_ivfpq_oracle(),
    tags=("similarity", "ann", "ivf", "pq"),
)
def similarity_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN stack — IVF × PQ composed (FAISS's IVFPQ
    index): the IVF coarse quantizer restricts each query to its own
    cell (~corpus/k candidates), and PQ's ADC scores only those
    candidates from 1-byte codes instead of raw vectors. The two
    prunings multiply: scan cost drops by the cell factor AND each
    candidate costs a LUT lookup-sum instead of a 64-dim dot product,
    which is why a billion-vector store fits and answers. Spark shape:
    both quantizer trainings are the standalone operators' plans
    (broadcast codebooks, map-side argmin, constant-size shuffles);
    the scan is codes ⋈ broadcast LUT with the cell equi-join as the
    candidate filter. Everything is exact integer arithmetic end to
    end, so the composed pipeline stays bit-identical to the oracle's
    doubly-unrolled derivation."""
    emb = load_table(spark, sf_dir, "embeddings")
    # Checkpoint the quantized corpus once; the IVF and PQ trainings +
    # both encode passes stream it instead of re-scanning (see
    # similarity_ann_pq_adc).
    n = emb.select(
        "vec_id", _qvec(F.col("embedding")).alias("qvec")
    ).localCheckpoint()
    # IVF cells straight from the vectorized trainer/encoder (r15):
    # this query only needs (vec_id, cell) — the former _kmeans_cells
    # call dragged label/e/nrm arrays through the assignment
    # aggregation just to drop them. Cache: the cell table feeds TWO
    # join branches below (corpus cells + query cells).
    # r16 (guide §2.6 — overlap independent jobs, same move as
    # ann.build_ann_index): the IVF and PQ trainings both stream the
    # checkpointed n and share no state (raw codebooks here — the
    # fixture oracle re-derives raw), and each training is a sequence
    # of eager per-round jobs with driver-side updates between them,
    # so running them from two driver threads lets each one's jobs
    # back-fill the other's collect gaps. Per-thread dataflows are
    # unchanged — results bit-identical.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fut_ivf = pool.submit(
            train_blocks,
            n,
            n.where(F.col("vec_id") % CENT_MOD == 0).select("vec_id"),
            id_col="vec_id",
            vec_col="qvec",
            dims=PQ_M * PQ_DSUB,
            n_blocks=1,
            iters=KMEANS_ITERS,
        )
        fut_pq = pool.submit(_pq_train, n)
        ivf_cent = fut_ivf.result()
        cent = fut_pq.result()
    cells = assign_blocks(
        n, ivf_cent, id_col="vec_id", vec_col="qvec",
        dims=PQ_M * PQ_DSUB, n_blocks=1,
    ).select("vec_id", F.col("cid").alias("cell")).cache()
    codes = assign_blocks(
        n, cent, id_col="vec_id", vec_col="qvec",
        dims=PQ_M * PQ_DSUB, n_blocks=PQ_M,
    )
    # Query-filtered LUT (r15): fan out only the N_QUERY query vectors
    # against the codebook, never the whole corpus.
    lut = (
        _pq_subvectors(n.where(F.col("vec_id") < N_QUERY))
        .join(F.broadcast(cent), "b")
        .select(
            F.col("vec_id").alias("query_id"),
            "b",
            "cid",
            _int_dist_unrolled(F.col("qsub"), F.col("cvec"), PQ_DSUB).alias(
                "pdist"
            ),
        )
    )
    qcells = cells.where(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("qc_query"), F.col("cell").alias("qcell")
    )
    scored = (
        codes.join(cells, "vec_id")
        .join(F.broadcast(lut), ["b", "cid"])
        .join(
            F.broadcast(qcells),
            (F.col("cell") == F.col("qcell"))
            & (F.col("query_id") == F.col("qc_query"))
            & (F.col("vec_id") != F.col("qc_query")),
        )
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("pdist").alias("adc_dist"))
    )
    return topk_per_key(
        scored,
        keys=["query_id"],
        order=[F.col("adc_dist"), F.col("neighbor_id")],
        k=TOP_K,
        salt_col="neighbor_id",
    ).orderBy("query_id", "rk")


@register(
    "embedding_dim_stats",
    oracle=f"""
WITH x AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS v
  FROM embeddings
),
q AS (
  SELECT dim, v, CAST(round(v * {MICRO}, 0) AS BIGINT) AS qx FROM x
)
SELECT dim,
       COUNT(*) AS n_vecs,
       CAST(SUM(CAST(qx AS HUGEINT)) AS DOUBLE) / COUNT(*) AS mean_micro,
       (COUNT(*) * CAST(SUM(CAST(qx * qx AS HUGEINT)) AS DOUBLE)
        - CAST(SUM(CAST(qx AS HUGEINT)) AS DOUBLE)
          * CAST(SUM(CAST(qx AS HUGEINT)) AS DOUBLE))
       / (CAST(COUNT(*) AS DOUBLE) * COUNT(*)) AS var_micro2,
       MIN(v) AS min_val,
       MAX(v) AS max_val
FROM q
GROUP BY dim
ORDER BY dim
""",
    tags=("embedding", "profiling", "qc"),
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding QC: mean/variance/min/max for each of
    the 64 coordinates — the check that catches dead dimensions
    (var≈0), un-normalized batches (means far from 0), and clipped
    values before they poison an ANN index or a cosine threshold.
    Means/variances come from exact micro-unit integer sums (the
    module's standard recipe — float sums would be partition-order
    dependent), expanded by the same closed moment formula in both
    engines; min/max are order-free on the raw floats. The explode is
    map-side (64 rows per vector feeding a partial agg in the same
    stage); the shuffle carries 64 groups × 4 numbers per task
    regardless of corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        F.posexplode(
            F.transform("embedding", lambda v: v.cast("double"))
        ).alias("dim", "v")
    ).select(
        "dim",
        "v",
        F.round(F.col("v") * MICRO, 0).cast("long").alias("qx"),
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    st = x.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(d38(F.col("qx"))).cast("double").alias("sx"),
        F.sum(d38(F.col("qx") * F.col("qx"))).cast("double").alias("sxx"),
        F.min("v").alias("min_val"),
        F.max("v").alias("max_val"),
    )
    n = F.col("n_vecs")
    return st.select(
        "dim",
        "n_vecs",
        (F.col("sx") / n).alias("mean_micro"),
        (
            (n * F.col("sxx") - F.col("sx") * F.col("sx"))
            / (n.cast("double") * n)
        ).alias("var_micro2"),
        "min_val",
        "max_val",
    ).orderBy("dim")


HARD_NEG_QUERIES = 10  # anchors (vec_id < this)


@register(
    "pairs_hard_negatives",
    oracle=f"""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id, label, e,
         sqrt(list_reduce(list_transform(e, x -> x * x), (s, x) -> s + x))
           AS nrm
  FROM v
),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS query_label,
         c.vec_id AS neighbor_id, c.label AS neighbor_label,
         list_reduce(list_transform(range(1, len(q.e) + 1),
                                    i -> q.e[i] * c.e[i]),
                     (s, x) -> s + x) / (q.nrm * c.nrm) AS cosine
  FROM n q JOIN n c ON c.vec_id <> q.vec_id AND c.label <> q.label
  WHERE q.vec_id < {HARD_NEG_QUERIES}
)
SELECT query_id, query_label, neighbor_id, neighbor_label, cosine,
       CAST(rk AS INT) AS rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM scored
) t
WHERE rk <= {TOP_K}
ORDER BY query_id, rk
""",
    tags=("similarity", "hard-negatives", "contrastive", "training-pairs"),
)
def pairs_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the top-k most-SIMILAR vectors with a DIFFERENT label — the pairs
    that actually move an embedding model (random negatives are
    trivially separable; training signal lives in the near-but-wrong
    region), and the standard companion to pairs_negative_sampling's
    uniform negatives. Same IEEE-double cosine discipline as
    similarity_cosine_topk (per-pair fixed tree, bit-equal both
    engines); the label-mismatch filter applies BEFORE ranking, so the
    k slots are all hard negatives, not whatever survives a post-hoc
    filter of a plain top-k.

    Scale: anchors broadcast against the corpus scan (one pass);
    ranking via the salted two-stage top-k (functions/topk.py) — no
    single-partition-per-anchor window. For corpus-scale anchor sets,
    swap the brute-force scan for the IVF-bucketed path
    (ann_search + label filter) exactly as similarity_cosine_topk
    documents; the mining semantics are unchanged."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", "label", as_double("embedding").alias("e")
    ).withColumn("nrm", norm(F.col("e")))
    q = v.where(F.col("vec_id") < HARD_NEG_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .where(
            (F.col("vec_id") != F.col("query_id"))
            & (F.col("label") != F.col("query_label"))
        )
        .select(
            "query_id",
            "query_label",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            (
                dot_unrolled(F.col("qe"), F.col("e"), _EMB_DIMS)
                / (F.col("qnrm") * F.col("nrm"))
            ).alias("cosine"),
        )
    )
    return topk_per_key(
        scored,
        keys=["query_id"],
        order=[F.desc("cosine"), F.col("neighbor_id")],
        k=TOP_K,
        salt_col="neighbor_id",
    ).select(
        "query_id",
        "query_label",
        "neighbor_id",
        "neighbor_label",
        "cosine",
        F.col("rk").cast("int").alias("rk"),
    ).orderBy("query_id", "rk")


TUNE_LADDER = (1, 2, 4)  # nprobe ladder the auto-tuner sweeps
TUNE_TARGET_PCT = 90  # pick the smallest nprobe with recall >= 90%


def _nprobe_autotune_oracle() -> str:
    """DuckDB twin of the nprobe recall sweep: the IVF_NPROBE building
    blocks (seed centroids, crk-ranked probes), one exact brute-force
    truth CTE, and one hits CTE per ladder rung."""
    dot_sql = (
        "list_reduce(list_transform(range(1, len(q.e) + 1),"
        " i -> q.e[i] * c.e[i]), (s, x) -> s + x) / (q.nrm * c.nrm)"
    )
    rungs = ",\n".join(
        f"""h{p} AS (
  SELECT {p} AS nprobe, CAST(COUNT(*) AS BIGINT) AS hits
  FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rk
    FROM scored WHERE probe_rk <= {p}
  ) t JOIN truth USING (query_id, neighbor_id)
  WHERE t.rk <= {TOP_K}
)"""
        for p in TUNE_LADDER
    )
    unions = "\nUNION ALL\n".join(
        f"SELECT nprobe, hits FROM h{p}" for p in TUNE_LADDER
    )
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id, e,
         sqrt(list_reduce(list_transform(e, x -> x * x), (s, x) -> s + x)) AS nrm
  FROM v
),
cent AS (
  SELECT vec_id AS centroid_id, e AS ce, nrm AS cnrm FROM n
  WHERE vec_id % {CENT_MOD} = 0
),
pairs AS MATERIALIZED (
  -- 3 narrow columns ONLY: carrying the 64-double arrays through the
  -- corpus x centroids fan-out is what made the naive form spill past
  -- 24 GiB at the x30 replica; arrays re-join by id afterwards.
  SELECT n.vec_id, cent.centroid_id,
         list_reduce(list_transform(range(1, len(n.e) + 1),
                                    i -> n.e[i] * cent.ce[i]),
                     (s, x) -> s + x) / (n.nrm * cent.cnrm) AS ccos
  FROM n CROSS JOIN cent
),
ranked AS MATERIALIZED (
  SELECT vec_id, centroid_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY ccos DESC, centroid_id) AS crk
  FROM pairs
),
assigned AS (
  SELECT r.vec_id, n.e, n.nrm, r.centroid_id
  FROM ranked r JOIN n ON n.vec_id = r.vec_id WHERE r.crk = 1
),
probes AS (
  SELECT r.vec_id, n.e, n.nrm, r.centroid_id, r.crk AS probe_rk
  FROM ranked r JOIN n ON n.vec_id = r.vec_id
  WHERE r.crk <= {max(TUNE_LADDER)} AND r.vec_id < {N_QUERY}
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.probe_rk,
         {dot_sql} AS cosine
  FROM probes q JOIN assigned c
    ON q.centroid_id = c.centroid_id AND c.vec_id <> q.vec_id
),
truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {dot_sql} DESC, c.vec_id) AS rk
    FROM n q JOIN n c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < {N_QUERY}
  ) t WHERE rk <= {TOP_K}
),
poss AS (SELECT CAST(COUNT(*) AS BIGINT) AS possible FROM truth),
{rungs},
curve AS (
  SELECT nprobe, hits, possible,
         CAST(hits AS DOUBLE) / possible AS recall
  FROM ({unions}) u CROSS JOIN poss
)
SELECT CAST(nprobe AS BIGINT) AS nprobe, hits, possible, recall,
       CAST(CASE WHEN nprobe = COALESCE(
              MIN(CASE WHEN hits * 100 >= {TUNE_TARGET_PCT} * possible
                       THEN nprobe END) OVER (),
              {max(TUNE_LADDER)})
            THEN 1 ELSE 0 END AS BIGINT) AS chosen
FROM curve
ORDER BY nprobe
"""


@register(
    "similarity_ann_nprobe_autotune",
    oracle=_nprobe_autotune_oracle(),
    tags=("similarity", "ivf", "ann", "nprobe", "autotune", "recall"),
)
def similarity_ann_nprobe_autotune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF nprobe auto-tuner (r11 verdict #7): sweep the nprobe ladder
    (1, 2, 4), measure recall@{TOP_K} of each rung against the EXACT
    brute-force top-k, and flag the smallest nprobe whose measured
    recall clears the {TUNE_TARGET_PCT}% target — the knob-picking run
    an ANN deployment does once per corpus instead of guessing. The
    decision is integer-exact (hits·100 ≥ target·possible), so the
    chosen rung is bit-reproducible.

    Plan economics: the candidate table is scored ONCE at the ladder
    maximum with each candidate tagged by its cell's probe rank
    (corpus cell assignment is unique, so (query, neighbor) appears
    exactly once); every rung is then a FILTER + salted top-k over
    that one table — the sweep costs one IVF search at max(nprobe)
    plus ladder-many grid-sized reductions, not ladder-many searches.
    Ground truth is the exact top-k for the {N_QUERY}-query probe set
    only — brute force priced per QUERY, never corpus².

    The trained-index twin is ``ann.tune_nprobe`` (same sweep against
    a persisted ``build_ann_index`` artifact, zero training in the
    plan); this registry entry pins the semantics on the SQL-
    expressible seed-centroid IVF so the oracle can replicate every
    rung."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.select(
        "vec_id", "label", as_double("embedding").alias("e")
    ).withColumn("nrm", norm(F.col("e")))
    cent = n.where(F.col("vec_id") % CENT_MOD == 0).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cnrm"),
    )
    assigned = _assign_cells(n, cent)
    queries = n.where(F.col("vec_id") < N_QUERY)
    ccos = dot_unrolled(F.col("e"), F.col("ce"), _EMB_DIMS) / (
        F.col("nrm") * F.col("cnrm")
    )
    w_probe = Window.partitionBy("vec_id").orderBy(
        F.desc("ccos"), "centroid_id"
    )
    probes = (
        queries.crossJoin(F.broadcast(cent))
        .withColumn("ccos", ccos)
        .withColumn("probe_rk", F.row_number().over(w_probe))
        .where(F.col("probe_rk") <= max(TUNE_LADDER))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("nrm").alias("qnrm"),
            F.col("centroid_id").alias("qcent"),
            "probe_rk",
        )
    )
    scored = assigned.join(
        F.broadcast(probes),
        (F.col("centroid_id") == F.col("qcent"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "probe_rk",
        (
            dot_unrolled(F.col("qe"), F.col("e"), _EMB_DIMS)
            / (F.col("qnrm") * F.col("nrm"))
        ).alias("cosine"),
    )
    truth = topk_per_key(
        queries.alias("q")
        .crossJoin(n.alias("c"))
        .where(F.col("c.vec_id") != F.col("q.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            (
                dot_unrolled(F.col("q.e"), F.col("c.e"), _EMB_DIMS)
                / (F.col("q.nrm") * F.col("c.nrm"))
            ).alias("cosine"),
        ),
        keys=["query_id"],
        order=[F.desc("cosine"), F.col("neighbor_id")],
        k=TOP_K,
        salt_col="neighbor_id",
    ).select("query_id", "neighbor_id")
    possible = truth.agg(F.count(F.lit(1)).cast("long").alias("possible"))
    rungs = None
    for p in TUNE_LADDER:
        topp = topk_per_key(
            scored.where(F.col("probe_rk") <= p),
            keys=["query_id"],
            order=[F.desc("cosine"), F.col("neighbor_id")],
            k=TOP_K,
            salt_col="neighbor_id",
        ).select("query_id", "neighbor_id")
        h = (
            topp.join(truth, ["query_id", "neighbor_id"])
            .agg(F.count(F.lit(1)).cast("long").alias("hits"))
            .select(F.lit(p).cast("long").alias("nprobe"), "hits")
        )
        rungs = h if rungs is None else rungs.unionAll(h)
    curve = rungs.crossJoin(F.broadcast(possible)).select(
        "nprobe",
        "hits",
        "possible",
        (F.col("hits").cast("double") / F.col("possible")).alias("recall"),
    )
    w_all = Window.partitionBy()
    chosen_np = F.coalesce(
        F.min(
            F.when(
                F.col("hits") * 100 >= TUNE_TARGET_PCT * F.col("possible"),
                F.col("nprobe"),
            )
        ).over(w_all),
        F.lit(max(TUNE_LADDER)).cast("long"),
    )
    return (
        curve.select(
            "nprobe",
            "hits",
            "possible",
            "recall",
            F.when(F.col("nprobe") == chosen_np, 1)
            .otherwise(0)
            .cast("long")
            .alias("chosen"),
        )
        .orderBy("nprobe")
    )
