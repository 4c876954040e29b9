"""Parameterized ANN index lifecycle — the public build/search API
(round-7 verdict item 4).

``operators/ann_index.py`` exercises this lifecycle with fixture
constants so the driver can oracle-check it against DuckDB; THESE are
the same implementations with every knob exposed, so a user can build
an index over their own embedding table::

    import boltzmannclean_spark as bcs
    path = bcs.build_ann_index(vectors, "/data/idx", dims=768,
                               pq_m=96, pq_k=256, n_cells=4096)
    hits = bcs.ann_search(spark, path, queries, k=10, nprobe=8)

Design (FAISS IVF×PQ re-expressed as Spark dataflow, all exact-integer
micro-unit arithmetic so training is deterministic and parquet
round-trips losslessly):

- **build**: PQ per-block codebooks via Lloyd rounds where assignment
  is a grouped ``min_by`` over the broadcast codebook (map-side partial
  aggregation — the corpus×K fan-out never shuffles) and the update
  shuffles only (block, code, dim) partial sums — constant in corpus
  size. Optional IVF coarse quantizer trained the same way over the
  full vectors. Artifacts land as parquet: ``codebook/`` (pq_m×pq_k
  rows), ``codes/`` (corpus×pq_m rows — 1 byte/block/vector at scale),
  ``cells/`` + ``ivf_centroids/`` (when ``n_cells``), ``meta.json``.
- **search**: broadcast the stored codebook, compute each query's
  exact block-distance LUT (queries×pq_m×pq_k rows, broadcast), score
  by a code-table equi-join + sum (ADC), salted two-stage top-k. With
  ``nprobe`` the stored cell table restricts the scan to each query's
  ``nprobe`` nearest coarse cells — the multiplicative pruning that
  makes a billion-vector store answer. The serve plan contains ZERO
  training (plan-gated on the registry twins).

At cluster scale ``codes`` would be written partitioned/bucketed by
cell so the probed scan prunes files; the lifecycle wrapper
(``operators/ann_index.ensure_ann_index``) adds fingerprinting,
idempotence, and atomic tmp-dir+rename on top of ``build_ann_index``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from boltzmannclean_spark.functions.lloyd import assign_blocks, train_blocks
from boltzmannclean_spark.functions.topk import topk_per_key
from boltzmannclean_spark.functions.vectors import (
    as_double,
    dot,
    dot_unrolled,
    norm,
)

DEFAULT_MICRO = 1_000_000

#: Residual ADC LUTs are |queries|·probed_cells·pq_m·pq_k rows; above
#: this bound (~1.5 GiB of 5-long rows, safely under Spark's 8 GiB
#: broadcast hard cap) the serve path drops the broadcast hint and
#: lets the LUT shuffle — measured necessary at 50 probes × 200 cells
#: × 32 × 256 on the clustered ×10 corpus (9.2 GiB broadcast refused).
RESIDUAL_LUT_BROADCAST_MAX_ROWS = 20_000_000

META_FILE = "meta.json"


def _sdiv(num: str, den: str) -> str:
    """Truncate-toward-zero integer division (SQL expr): both Spark and
    DuckDB round their micro-unit centroid means identically under it —
    the one integer op where the engines' defaults differ (Spark DIV
    truncates, DuckDB // floors) and negatives would diverge."""
    return (
        f"CAST(CASE WHEN {num} >= 0 THEN {num} DIV {den} "
        f"ELSE -((-{num}) DIV {den}) END AS BIGINT)"
    )


def _quantize(col, micro: int):
    """array<float> -> array<long> micro-unit quantization."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * micro, 0).cast("long")
    )


def _int_dist(a, b):
    """Exact squared-L2 between two array<long> vectors (HOF form — use
    for full-dim vectors where unrolling would bloat codegen)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _int_dist_unrolled(a, b, dims: int):
    """Exact squared-L2 as a fixed sum of ``dims`` element terms — same
    integer result as ``_int_dist`` (adds commute) but plain
    whole-stage-codegen arithmetic; use for SMALL fixed dims in hot
    inner loops (the PQ sub-vector distance runs corpus×pq_k times per
    Lloyd round)."""
    terms = [
        (F.element_at(a, d) - F.element_at(b, d))
        * (F.element_at(a, d) - F.element_at(b, d))
        for d in range(1, dims + 1)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _subvectors(q: DataFrame, pq_m: int, pq_dsub: int) -> DataFrame:
    """(id, qvec) -> one row per (id, block) with the block's
    ``pq_dsub``-dim integer sub-vector. Row-local explode — no
    shuffle."""
    subs = F.array(
        *[
            F.struct(
                F.lit(b).alias("b"),
                F.slice("qvec", b * pq_dsub + 1, pq_dsub).alias("qsub"),
            )
            for b in range(pq_m)
        ]
    )
    return q.select("id", F.explode(subs).alias("s")).select(
        "id", F.col("s.b").alias("b"), F.col("s.qsub").alias("qsub")
    )


def _smallest_ids(q: DataFrame, n: int) -> DataFrame:
    """Deterministic default seeding: the ``n`` smallest ids. Tiny
    sort-limit job (n rows collected into a broadcast side)."""
    return q.select("id").orderBy("id").limit(n)


def _pq_train(
    vecs: DataFrame,
    *,
    pq_m: int,
    pq_iters: int,
    pq_dsub: int,
    seeds: DataFrame,
) -> DataFrame:
    """Per-block codebooks via ``pq_iters`` Lloyd rounds in exact
    integer units over ``vecs = (id, qvec)``, via the shared vectorized
    trainer (functions/lloyd.py — r15: one NumPy mapInArrow pass +
    codebook-sized partial sums per round replaces the min_by fan-out
    aggregation at identical exact-integer semantics). Returns
    (b, cid, cvec array<long>), codebook-sized, materialized on the
    driver (the MLlib-KMeans pattern). Seeded by the ``seeds`` id
    frame so training is deterministic."""
    return train_blocks(
        vecs,
        seeds,
        id_col="id",
        vec_col="qvec",
        dims=pq_m * pq_dsub,
        n_blocks=pq_m,
        iters=pq_iters,
    )


def _pq_assign(
    vecs: DataFrame, cent: DataFrame, *, pq_m: int, pq_dsub: int
) -> DataFrame:
    """Encode every vector against a (frozen) codebook: one vectorized
    assignment pass (exact int64 squared-L2, ties to the smallest cid).
    Returns (id, b, cid). This is also the incremental-update path —
    newly arrived vectors are absorbed by assignment alone, no
    retraining."""
    return assign_blocks(
        vecs,
        cent,
        id_col="id",
        vec_col="qvec",
        dims=pq_m * pq_dsub,
        n_blocks=pq_m,
    )


def _ivf_train(
    q: DataFrame, *, dims: int, kmeans_iters: int, seeds: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: ``kmeans_iters`` Lloyd rounds over the
    full vectors (the shared vectorized trainer with n_blocks=1).
    Returns (centroids (cell, cvec), assignments (id, cell)). Empty
    cells drop out of the update deterministically; ties break to the
    smallest cell id — bit-identical to the former min_by dataflow."""
    cent_b = train_blocks(
        q,
        seeds,
        id_col="id",
        vec_col="qvec",
        dims=dims,
        n_blocks=1,
        iters=kmeans_iters,
    )
    cent = cent_b.select(F.col("cid").alias("cell"), "cvec")
    assigned = assign_blocks(
        q, cent_b, id_col="id", vec_col="qvec", dims=dims, n_blocks=1
    ).select("id", F.col("cid").alias("cell"))
    return cent, assigned


def build_ann_index(
    df: DataFrame,
    out_dir: str,
    *,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pq_m: int = 8,
    pq_k: int = 16,
    pq_iters: int = 2,
    n_cells: int | None = None,
    kmeans_iters: int = 2,
    micro: int = DEFAULT_MICRO,
    pq_seed_pred: Column | None = None,
    cell_seed_pred: Column | None = None,
    residual: bool | None = None,
) -> str:
    """Train and persist a PQ (optionally IVF×PQ) ANN index for
    ``df[(id_col, vec_col)]`` under ``out_dir``. Returns ``out_dir``.

    - ``dims`` — vector dimensionality; must be divisible by ``pq_m``
      (each block quantizes a ``dims/pq_m``-dim sub-vector).
    - ``pq_m`` / ``pq_k`` / ``pq_iters`` — blocks per vector, codes per
      block, Lloyd rounds. At scale a code is 1 byte/block (pq_k ≤
      256), so the stored corpus is ``pq_m`` bytes/vector — the 64×
      compression that lets the scan never touch a float vector.
    - ``n_cells`` — train an IVF coarse quantizer with this many cells
      and persist both assignments and centroids, enabling
      ``ann_search(..., nprobe=...)`` pruning.
    - ``pq_seed_pred`` / ``cell_seed_pred`` — optional boolean Columns
      over ``id_col`` selecting the Lloyd seed vectors (FAISS-style
      explicit init); default = the ``pq_k`` / ``n_cells`` smallest
      ids. Seeding is the ONLY stochasticity-shaped knob and it is
      fully deterministic either way.
    - ``residual`` — IVF-centered PQ (the FAISS IVFPQ norm): the PQ
      codebooks are trained on, and every vector encoded as,
      ``x − centroid(cell(x))`` instead of the raw coordinates.
      Requires an IVF build (``n_cells``). Residuals are differences
      of exact integers, so the whole exact-arithmetic discipline
      composes unchanged. **Default (None): resolves to the IVF flag
      — IVF builds are residual, pure-PQ builds raw** — chosen from
      the r14 measurement (SCALING.md r14, fixture 32×256 config):
      on a realistic Zipf-sized-cluster corpus residual wins every
      nprobe rung (+0.076 recall@10 at nprobe 32, ceiling 0.828 vs
      0.744) while on the near-isotropic fixture it is neutral
      (0.812 vs 0.814) — the documented FAISS expectation, now
      measured here at the served config. Pass ``residual=False``
      explicitly to pin raw codebooks (the fixture lifecycle does:
      its DuckDB oracles re-derive raw).

    Everything is exact integer micro-unit arithmetic (``micro``), so
    rebuilds are bit-identical and parquet round-trips losslessly —
    the registry's ``sink_ann_index_build`` proves the persisted
    artifact matches an independent DuckDB re-derivation. The write is
    plain (no tmp+rename): idempotence/atomicity belongs to the
    lifecycle wrapper (``ensure_ann_index``) or the caller's
    orchestrator."""
    if dims % pq_m:
        raise ValueError(f"dims={dims} not divisible by pq_m={pq_m}")
    has_ivf = n_cells is not None or cell_seed_pred is not None
    if residual is None:
        residual = has_ivf  # measured default — docstring above
    if residual and not has_ivf:
        raise ValueError(
            "residual=True requires an IVF build (pass n_cells or "
            "cell_seed_pred): residual PQ encodes x - centroid(cell(x))"
        )
    pq_dsub = dims // pq_m
    # Checkpoint the quantized corpus once: it feeds every training and
    # encode pass (IVF rounds + PQ rounds + assignment) — 32× narrower
    # than the old per-block explode this replaces (r15).
    q = df.select(
        F.col(id_col).alias("id"), _quantize(F.col(vec_col), micro).alias("qvec")
    ).localCheckpoint()
    ivf_cent = cells = None

    def _ivf_part():
        cell_seeds = (
            df.where(cell_seed_pred).select(F.col(id_col).alias("id"))
            if cell_seed_pred is not None
            else _smallest_ids(q, n_cells)
        )
        cent_l, cells_l = _ivf_train(
            q, dims=dims, kmeans_iters=kmeans_iters, seeds=cell_seeds
        )
        cent_l = cent_l.localCheckpoint()
        cells_l = cells_l.localCheckpoint()
        cells_l.coalesce(4).write.mode("overwrite").parquet(
            os.path.join(out_dir, "cells")
        )
        cent_l.repartition(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "ivf_centroids")
        )
        return cent_l, cells_l

    def _pq_part(pq_src):
        # Seed predicates evaluate against the CALLER'S frame (their
        # own column names); the default is the pq_k smallest ids.
        pq_seeds = (
            df.where(pq_seed_pred).select(F.col(id_col).alias("id"))
            if pq_seed_pred is not None
            else _smallest_ids(q, pq_k)
        )
        # Codebook comes back driver-materialized (codebook-sized)
        # from the vectorized trainer, so the persist and encode
        # consumers share it with no checkpoint and no re-run.
        cent = _pq_train(
            pq_src, pq_m=pq_m, pq_iters=pq_iters, pq_dsub=pq_dsub,
            seeds=pq_seeds,
        )
        codes = _pq_assign(pq_src, cent, pq_m=pq_m, pq_dsub=pq_dsub)
        cent.repartition(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "codebook")
        )
        # At cluster scale: .write.partitionBy(cell) / bucketBy so the
        # probed ADC scan prunes files; at test SF a handful is right.
        codes.coalesce(4).write.mode("overwrite").parquet(
            os.path.join(out_dir, "codes")
        )

    if has_ivf and not residual:
        # r16 (guide §2.6 — overlap independent jobs): with raw (non-
        # residual) codebooks the IVF and PQ trainings read the same
        # checkpointed q and share NO state, so they run from two
        # driver threads and each training's jobs back-fill the
        # executor idle left by the other's driver-side centroid
        # updates and collects. Each thread's own dataflow is the
        # unchanged sequential one, so results are bit-identical (the
        # scheduler overlap cannot reorder any thread-local
        # arithmetic). Residual builds stay sequential below: PQ
        # trains on x − centroid(cell(x)), a real dependency.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            fut_ivf = pool.submit(_ivf_part)
            fut_pq = pool.submit(_pq_part, q)
            ivf_cent, cells = fut_ivf.result()
            fut_pq.result()
    else:
        if has_ivf:
            ivf_cent, cells = _ivf_part()
        if residual:
            # IVF-centered PQ: the encoded signal is
            # x - centroid(cell(x)). One broadcast join against the
            # tiny centroid table + a row-local zip_with difference —
            # exact integers throughout. Checkpointed: the residual
            # frame feeds pq_iters training passes plus the encode
            # pass.
            pq_src = (
                q.join(cells, "id")
                .join(F.broadcast(ivf_cent), "cell")
                .select(
                    "id",
                    F.zip_with(
                        "qvec", "cvec", lambda x, c: x - c
                    ).alias("qvec"),
                )
            ).localCheckpoint()
        else:
            pq_src = q
        _pq_part(pq_src)
    n_corpus = df.count()
    conf = {
        "dims": dims,
        "pq_m": pq_m,
        "pq_dsub": pq_dsub,
        "pq_k": pq_k,
        "pq_iters": pq_iters,
        "n_cells": n_cells,
        "kmeans_iters": kmeans_iters,
        "micro": micro,
        "has_ivf": has_ivf,
        "residual": residual,
    }
    with open(os.path.join(out_dir, META_FILE), "w") as fh:
        json.dump({"n": n_corpus, "conf": conf}, fh)
    return out_dir


def read_index_conf(index_dir: str) -> dict:
    """The persisted build configuration (meta.json ``conf`` block)."""
    with open(os.path.join(index_dir, META_FILE)) as fh:
        return json.load(fh)["conf"]


def ann_search(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    *,
    k: int = 10,
    nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """ADC top-``k`` against a persisted index built by
    ``build_ann_index``. Returns (query_id, neighbor_id, adc_dist, rk)
    with rk 1..k per query, ordered (query_id, rk).

    The plan contains ZERO training: the stored codebook (pq_m×pq_k
    rows) broadcasts; each query's exact block-distance LUT
    (queries×pq_m×pq_k rows) is computed from its raw sub-vectors ×
    the codebook and broadcast; candidates are scored by a code-table
    equi-join + map-side partial-aggregated sum; the final top-k is
    the salted two-stage reduction (never a single-partition window).

    ``nprobe`` (requires an IVF build): assign each query to its
    ``nprobe`` nearest coarse cells via the stored centroids and
    restrict the code scan to those cells — scan cost drops by
    ~n_cells/nprobe. ``exclude_self`` drops neighbor_id == query_id,
    the right default when queries are corpus members.

    A ``residual=True`` index is served transparently (the flag rides
    meta.json): the ADC LUT becomes per-(query, cell) — block
    distances between the query's RESIDUAL against each probed cell's
    centroid and the codebook. The LUT is queries × probed cells ×
    pq_m × pq_k rows: broadcast while that count fits
    ``RESIDUAL_LUT_BROADCAST_MAX_ROWS``, shuffled through the
    (b, cid, cell) equi-join beyond it (the no-``nprobe`` full-probe
    case crossed Spark's 8 GiB broadcast cap at 50×200×32×256 —
    measured r14; still pass ``nprobe`` on residual indexes at scale,
    the pruning is the point)."""
    conf = read_index_conf(index_dir)
    pq_dsub, pq_m, micro = conf["pq_dsub"], conf["pq_m"], conf["micro"]
    residual = conf.get("residual", False)
    cent = spark.read.parquet(os.path.join(index_dir, "codebook"))
    codes = spark.read.parquet(os.path.join(index_dir, "codes"))
    q = queries.select(
        F.col(id_col).alias("id"),
        _quantize(F.col(vec_col), micro).alias("qvec"),
    )
    if nprobe is not None and not conf.get("has_ivf"):
        raise ValueError(
            f"index at {index_dir} was built without n_cells; "
            "nprobe requires an IVF build"
        )
    qcells = None
    if nprobe is not None or residual:
        ivf_cent = spark.read.parquet(
            os.path.join(index_dir, "ivf_centroids")
        )
        cells = spark.read.parquet(os.path.join(index_dir, "cells"))
    if nprobe is not None:
        # Query -> nprobe nearest cells: the centroid table is tiny, so
        # fan out queries×n_cells and keep the nprobe best per query
        # (salted top-k; ties to the smaller cell id, matching the
        # build's assignment tie-break).
        qcells = topk_per_key(
            q.crossJoin(F.broadcast(ivf_cent)).select(
                F.col("id").alias("qc_query"),
                "cell",
                _int_dist(F.col("qvec"), F.col("cvec")).alias("cdist"),
            ),
            keys=["qc_query"],
            order=[F.col("cdist"), F.col("cell")],
            k=nprobe,
            salt_col="cell",
        ).select("qc_query", F.col("cell").alias("qcell"))
    self_filter = (
        (F.col("id") != F.col("query_id")) if exclude_self else F.lit(True)
    )
    if residual:
        # Per-(query, probed cell) residual LUT: block distance between
        # (qsub - csub) and each code. All frames feeding it are tiny
        # (queries, centroids, codebook) — the corpus only appears in
        # the final code-table equi-join.
        #
        # r14 MEASURED fix: the LUT is |queries| × probed_cells × pq_m
        # × pq_k rows — with no nprobe every cell is probed, and at 50
        # probes × 200 cells × 32 × 256 the forced broadcast hit
        # Spark's 8 GiB hard cap (9.2 GiB observed on the clustered
        # ×10 corpus). Decide the hint from the computed row count:
        # within budget → broadcast (map-side, zero shuffle); beyond →
        # drop the hint and let the (b, cid, cell) equi-join shuffle-
        # hash-partition both sides — the code scan is corpus-sized
        # and shuffling anyway, so the extra cost is the LUT's own
        # exchange, not a new corpus pass. Counting q/ivf_cent here is
        # two jobs over probe-/domain-sized frames, serve-path cheap.
        # Pin first (r14 ADVICE): if ``queries`` is an expensive
        # derived frame, its upstream work would otherwise run once for
        # this count and again inside the serve job. localCheckpoint
        # (not cache) so the blocks' lifetime is the returned
        # DataFrame's — the ContextCleaner reaps them once the caller
        # drops it, whereas cache() pinned the plan in the CacheManager
        # until an unpersist that no serve-path caller ever issued
        # (r15 ADVICE: repeated serve calls accumulated storage).
        q = q.localCheckpoint(eager=False)
        n_q = q.count()
        n_cells_probed = (
            nprobe if nprobe is not None else ivf_cent.count()
        )
        lut_rows = n_q * n_cells_probed * pq_m * conf["pq_k"]
        lut_hint = (
            F.broadcast if lut_rows <= RESIDUAL_LUT_BROADCAST_MAX_ROWS
            else (lambda df: df)
        )
        probed = (
            qcells
            if qcells is not None
            else q.select(F.col("id").alias("qc_query")).crossJoin(
                F.broadcast(ivf_cent.select(F.col("cell").alias("qcell")))
            )
        )
        csub = _subvectors(
            ivf_cent.select(
                F.col("cell").alias("id"), F.col("cvec").alias("qvec")
            ),
            pq_m,
            pq_dsub,
        ).select(
            F.col("id").alias("ccell"),
            F.col("b").alias("cb"),
            F.col("qsub").alias("csub"),
        )
        rsub = (
            _subvectors(q, pq_m, pq_dsub)
            .join(probed, F.col("id") == F.col("qc_query"))
            .join(
                F.broadcast(csub),
                (F.col("b") == F.col("cb"))
                & (F.col("qcell") == F.col("ccell")),
            )
            .select(
                F.col("id").alias("query_id"),
                "qcell",
                "b",
                F.zip_with("qsub", "csub", lambda x, c: x - c).alias("rsub"),
            )
        )
        lut = rsub.join(F.broadcast(cent), "b").select(
            "query_id",
            "qcell",
            F.col("b").alias("lb"),
            F.col("cid").alias("lcid"),
            _int_dist_unrolled(F.col("rsub"), F.col("cvec"), pq_dsub).alias(
                "pdist"
            ),
        )
        scan = codes.join(cells.withColumnRenamed("cell", "vcell"), "id")
        scored = (
            scan.join(
                lut_hint(lut),
                (F.col("b") == F.col("lb"))
                & (F.col("cid") == F.col("lcid"))
                & (F.col("vcell") == F.col("qcell")),
            )
            .where(self_filter)
            .groupBy("query_id", F.col("id").alias("neighbor_id"))
            .agg(F.sum("pdist").alias("adc_dist"))
        )
    else:
        qsub = _subvectors(q, pq_m, pq_dsub)
        lut = qsub.join(F.broadcast(cent), "b").select(
            F.col("id").alias("query_id"),
            "b",
            "cid",
            _int_dist_unrolled(F.col("qsub"), F.col("cvec"), pq_dsub).alias(
                "pdist"
            ),
        )
        if qcells is not None:
            scan = codes.join(cells.withColumnRenamed("cell", "vcell"), "id")
            scored = (
                scan.join(F.broadcast(lut), ["b", "cid"])
                .join(
                    F.broadcast(qcells),
                    (F.col("vcell") == F.col("qcell"))
                    & (F.col("query_id") == F.col("qc_query")),
                )
                .where(self_filter)
                .groupBy("query_id", F.col("id").alias("neighbor_id"))
                .agg(F.sum("pdist").alias("adc_dist"))
            )
        else:
            scored = (
                codes.join(F.broadcast(lut), ["b", "cid"])
                .where(self_filter)
                .groupBy("query_id", F.col("id").alias("neighbor_id"))
                .agg(F.sum("pdist").alias("adc_dist"))
            )
    return topk_per_key(
        scored,
        keys=["query_id"],
        order=[F.col("adc_dist"), F.col("neighbor_id")],
        k=k,
        salt_col="neighbor_id",
    ).orderBy("query_id", "rk")


def tune_nprobe(
    spark: SparkSession,
    index_dir: str,
    corpus: DataFrame,
    *,
    k: int = 10,
    target_recall: float = 0.9,
    ladder: tuple[int, ...] = (1, 2, 4, 8),
    n_queries: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[int, DataFrame]:
    """Pick ``nprobe`` for a persisted IVF index from its MEASURED
    recall curve (r11 verdict #7) instead of folklore: run
    ``ann_search`` at each ladder rung over an ``n_queries``-vector
    probe sample, score recall@``k`` against the exact cosine top-k
    (brute force priced per QUERY — ``n_queries × corpus`` dot
    products, never corpus²), and return ``(chosen, curve)`` where
    ``chosen`` is the smallest rung whose recall clears
    ``target_recall`` (falling back to the ladder max, so the caller
    always gets a valid knob) and ``curve`` is the full
    (nprobe, hits, possible, recall, chosen) DataFrame for logging.

    The decision is integer-exact (hits·10ⁿ ≥ target·possible with
    target taken at 4 decimal places), bit-reproducible like every
    other gate in this engine. Rungs beyond the index's cell count
    are skipped (probing every cell already equals the full scan).
    The query sample is the ``n_queries`` smallest ids —
    deterministic; pass a pre-filtered corpus for a different
    sampling policy. Plan-wise each rung is one zero-training
    ``ann_search``; the ground truth is computed ONCE and broadcast
    into each rung's hit join.

    Registry twin: ``similarity_ann_nprobe_autotune`` pins the same
    sweep semantics on the SQL-expressible seed-centroid IVF so the
    DuckDB oracle replicates every rung end-to-end.
    """
    conf = read_index_conf(index_dir)
    if not conf.get("has_ivf"):
        raise ValueError(
            f"index at {index_dir} was built without n_cells; "
            "nprobe tuning requires an IVF build"
        )
    n_cells = conf.get("n_cells")
    rungs = [p for p in ladder if n_cells is None or p <= n_cells]
    if not rungs:
        rungs = [1]
    target_pm = int(round(target_recall * 10_000))

    queries = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_queries)
    )
    qn = queries.select(
        F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qe")
    ).withColumn("qnrm", norm(F.col("qe")))
    cn = corpus.select(
        F.col(id_col).alias("cid"), as_double(F.col(vec_col)).alias("ce")
    ).withColumn("cnrm", norm(F.col("ce")))
    dims = conf["dims"]
    cos = dot_unrolled(F.col("qe"), F.col("ce"), dims) / (
        F.col("qnrm") * F.col("cnrm")
    )
    truth = topk_per_key(
        qn.crossJoin(cn)
        .where(F.col("cid") != F.col("qid"))
        .select(F.col("qid").alias("query_id"),
                F.col("cid").alias("neighbor_id"),
                cos.alias("cosine")),
        keys=["query_id"],
        order=[F.desc("cosine"), F.col("neighbor_id")],
        k=k,
        salt_col="neighbor_id",
    ).select("query_id", "neighbor_id").localCheckpoint()
    possible = truth.count()
    if possible == 0:
        # Empty ground truth (empty or single-vector corpus): every
        # rung would vacuously satisfy hits·10⁴ ≥ target·0 and rung[0]
        # would be reported as "meeting" a target it never measured.
        # Fall back to the ladder max explicitly — the conservative
        # knob — with recall 0.0 and no chosen flag set by recall.
        curve = spark.createDataFrame(
            [(int(p), 0, 0, 0.0, 1 if p == rungs[-1] else 0) for p in rungs],
            "nprobe long, hits long, possible long, recall double,"
            " chosen long",
        )
        return rungs[-1], curve

    rows = []
    for p in rungs:
        got = ann_search(
            spark,
            index_dir,
            queries,
            k=k,
            nprobe=p,
            id_col=id_col,
            vec_col=vec_col,
        ).select("query_id", "neighbor_id")
        hits = got.join(F.broadcast(truth), ["query_id", "neighbor_id"]).count()
        rows.append((p, hits))

    chosen = next(
        (p for p, h in rows if h * 10_000 >= target_pm * possible),
        rungs[-1],
    )
    curve = spark.createDataFrame(
        [
            (
                int(p),
                int(h),
                int(possible),
                float(h) / possible if possible else 0.0,
                1 if p == chosen else 0,
            )
            for p, h in rows
        ],
        "nprobe long, hits long, possible long, recall double, chosen long",
    )
    return chosen, curve
