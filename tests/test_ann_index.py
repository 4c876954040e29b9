"""ANN index lifecycle tests (round-6 verdict item 2): the persisted
artifact must be bit-identical to in-query training, reused without
rebuilding when valid, and rebuilt when invalidated."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from boltzmannclean_spark.operators import ann_index
from boltzmannclean_spark.plans.registry import all_queries


def _artifact_mtime(path: str) -> float:
    return os.path.getmtime(os.path.join(path, "meta.json"))


def test_prebuilt_matches_train_in_query(spark, sf_dir):
    """The PQ-ADC query leg over the persisted index must reproduce the
    train-in-query operator's output exactly — the artifact is exact
    integers, so persistence loses nothing."""
    qs = all_queries()
    prebuilt = sorted(
        tuple(r)
        for r in qs["similarity_ann_pq_adc_prebuilt"].spark_fn(spark, sf_dir).collect()
    )
    inquery = sorted(
        tuple(r)
        for r in qs["similarity_ann_pq_adc"].spark_fn(spark, sf_dir).collect()
    )
    assert prebuilt == inquery


def test_ivfpq_prebuilt_matches_train_in_query(spark, sf_dir):
    qs = all_queries()
    prebuilt = sorted(
        tuple(r)
        for r in qs["similarity_ann_ivfpq_prebuilt"].spark_fn(spark, sf_dir).collect()
    )
    inquery = sorted(
        tuple(r)
        for r in qs["similarity_ann_ivfpq"].spark_fn(spark, sf_dir).collect()
    )
    assert prebuilt == inquery


def test_artifact_reused_not_rebuilt(spark, sf_dir):
    """A valid artifact is reused: the second ensure call must not
    rewrite it (same meta.json mtime), including across the in-process
    validation memo being cold."""
    path = ann_index.ensure_ann_index(spark, sf_dir)
    t0 = _artifact_mtime(path)
    ann_index._VALIDATED.discard(path)  # force the fingerprint re-check
    path2 = ann_index.ensure_ann_index(spark, sf_dir)
    assert path2 == path
    assert _artifact_mtime(path) == t0


def test_artifact_rebuilt_on_fingerprint_mismatch(spark, sf_dir):
    """A stale artifact (wrong corpus count in the fingerprint) must be
    rebuilt, atomically replacing the old directory."""
    path = ann_index.ensure_ann_index(spark, sf_dir)
    meta_file = os.path.join(path, "meta.json")
    with open(meta_file) as fh:
        meta = json.load(fh)
    meta["n"] = meta["n"] + 1  # corpus "changed"
    with open(meta_file, "w") as fh:
        json.dump(meta, fh)
    ann_index._VALIDATED.discard(path)
    t0 = _artifact_mtime(path)
    path2 = ann_index.ensure_ann_index(spark, sf_dir)
    assert path2 == path
    assert _artifact_mtime(path) != t0  # rebuilt
    with open(meta_file) as fh:
        assert json.load(fh)["n"] == meta["n"] - 1  # true count restored


def test_source_content_drift_forces_rebuild(spark, sf_dir, tmp_path):
    """ADVICE r6: a corpus regenerated with the SAME row count must
    invalidate the index — the meta fingerprint covers source file
    size/mtime, not just count+config. Also covers the per-run
    BCS_ANN_INDEX_DIR scoping."""
    import shutil

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    src = os.path.join(sf_dir, "embeddings.parquet")
    dst = str(corpus / "embeddings.parquet")
    shutil.copytree(src, dst) if os.path.isdir(src) else shutil.copy(src, dst)

    old_env = os.environ.get("BCS_ANN_INDEX_DIR")
    os.environ["BCS_ANN_INDEX_DIR"] = str(tmp_path / "idx")
    (tmp_path / "idx").mkdir()
    try:
        path = ann_index.ensure_ann_index(spark, str(corpus))
        assert str(tmp_path / "idx") in path
        with open(os.path.join(path, "meta.json")) as fh:
            fp1 = json.load(fh)["src_fp"]
        # valid artifact: reused
        assert ann_index.ensure_ann_index(spark, str(corpus)) == path
        m1 = _artifact_mtime(path)
        # regenerate the source with identical contents AND row count —
        # only mtime changes; the index must rebuild anyway
        shutil.rmtree(dst) if os.path.isdir(dst) else os.remove(dst)
        shutil.copytree(src, dst) if os.path.isdir(src) else shutil.copy(src, dst)
        # Force the drift explicitly rather than relying on the copy
        # function's mtime semantics: shutil.copy happens to reset
        # mtime, but copytree preserves it via copy2, so a future
        # directory-style fixture would make this test fail spuriously
        # while blaming the implementation (r7 ADVICE).
        now = time.time()
        if os.path.isdir(dst):
            for root, _dirs, files in os.walk(dst):
                for f in files:
                    os.utime(os.path.join(root, f), (now, now))
        os.utime(dst, (now, now))
        ann_index._VALIDATED.discard(path)  # simulate a fresh process
        path2 = ann_index.ensure_ann_index(spark, str(corpus))
        assert path2 == path
        with open(os.path.join(path, "meta.json")) as fh:
            fp2 = json.load(fh)["src_fp"]
        assert fp2 != fp1, "source fingerprint did not track content drift"
        assert _artifact_mtime(path) > m1, "stale artifact served"
    finally:
        if old_env is None:
            os.environ.pop("BCS_ANN_INDEX_DIR", None)
        else:
            os.environ["BCS_ANN_INDEX_DIR"] = old_env


def test_rename_race_falls_back_to_winner(spark, sf_dir, tmp_path, monkeypatch):
    """ADVICE r6: rmtree+rename is not atomic — simulate a concurrent
    builder winning the race (path recreated between our rmtree and
    rename, making rename raise ENOTEMPTY) and assert the loser
    revalidates and serves the winner's artifact instead of crashing."""
    import shutil

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    src = os.path.join(sf_dir, "embeddings.parquet")
    dst = str(corpus / "embeddings.parquet")
    shutil.copytree(src, dst) if os.path.isdir(src) else shutil.copy(src, dst)
    monkeypatch.setenv("BCS_ANN_INDEX_DIR", str(tmp_path / "idx"))
    (tmp_path / "idx").mkdir()

    path = ann_index.ensure_ann_index(spark, str(corpus))
    winner = str(tmp_path / "winner_copy")
    shutil.copytree(path, winner)

    real_rename = os.rename
    calls = {"n": 0}

    def racing_rename(a, b):
        if b == path:
            # the competitor finishes first: path exists again, rename
            # onto a non-empty directory fails
            calls["n"] += 1
            if not os.path.exists(path):
                shutil.copytree(winner, path)
            raise OSError(39, "Directory not empty", a)
        return real_rename(a, b)

    monkeypatch.setattr(ann_index.os, "rename", racing_rename)
    ann_index._VALIDATED.discard(path)
    got = ann_index.ensure_ann_index(spark, str(corpus), force=True)
    assert calls["n"] == 1, "simulated race never hit the rename"
    assert got == path
    # the served artifact is the WINNER's and is complete/readable
    assert spark.read.parquet(os.path.join(got, "codebook")).count() > 0


def test_residual_index_lifecycle(spark, sf_dir, tmp_path):
    """Residual (IVF-centered) PQ, the FAISS IVFPQ norm (r10 verdict
    item 1a): build with residual=True, serve transparently, and the
    probe-all-cells search must equal the full-scan search exactly
    (same per-(query, cell) LUT domain either way)."""
    import pytest as _pytest

    from boltzmannclean_spark.ann import (
        ann_search,
        build_ann_index,
        read_index_conf,
    )
    from boltzmannclean_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = str(tmp_path / "res_idx")
    n_cells = 5
    build_ann_index(
        emb,
        out,
        dims=64,
        id_col="vec_id",
        vec_col="embedding",
        pq_m=8,
        pq_k=16,
        pq_iters=2,
        n_cells=n_cells,
        kmeans_iters=2,
        residual=True,
    )
    conf = read_index_conf(out)
    assert conf["residual"] is True and conf["has_ivf"] is True
    queries = emb.where(F.col("vec_id") < 3)
    full = ann_search(
        spark, out, queries, k=5, id_col="vec_id", vec_col="embedding"
    )
    rows = full.collect()
    assert len(rows) == 15  # 3 queries x k=5
    assert all(r.neighbor_id != r.query_id for r in rows)
    assert all(r.adc_dist >= 0 for r in rows)
    probed_all = ann_search(
        spark,
        out,
        queries,
        k=5,
        nprobe=n_cells,
        id_col="vec_id",
        vec_col="embedding",
    ).collect()
    assert sorted(map(tuple, probed_all)) == sorted(map(tuple, rows))
    # nprobe=1 is a strict subset of the scanned corpus: every hit it
    # returns must also score identically in the full scan.
    one = ann_search(
        spark, out, queries, k=5, nprobe=1,
        id_col="vec_id", vec_col="embedding",
    ).collect()
    full_scores = {(r.query_id, r.neighbor_id): r.adc_dist for r in rows}
    for r in one:
        got = full_scores.get((r.query_id, r.neighbor_id))
        assert got is None or got == r.adc_dist

    with _pytest.raises(ValueError, match="residual=True requires"):
        build_ann_index(
            emb,
            str(tmp_path / "bad"),
            dims=64,
            id_col="vec_id",
            vec_col="embedding",
            pq_m=8,
            pq_k=16,
            residual=True,
        )


def test_residual_beats_raw_on_clustered_corpus(spark, tmp_path):
    """The value proposition residual PQ ships for: on a CLUSTERED
    corpus the coarse centroid absorbs the cluster offset and the
    codebook spends its capacity on the remainder, so residual ADC
    distances reconstruct the truth better than raw-coordinate ADC at
    the same (pq_m, pq_k) budget. Deterministic synthetic corpus:
    5 well-separated cluster centers + small LCG jitter."""
    from boltzmannclean_spark.ann import ann_search, build_ann_index

    n, dims, n_cl = 200, 8, 5
    rows = []
    for i in range(n):
        c = i % n_cl
        # fixed LCG jitter in [-0.05, 0.05); cluster centers 2.0 apart
        vec = [
            float(c * 2.0 + (((i * 1103515245 + d * 12345 + 7) % 1000)
                             - 500) / 10000.0)
            for d in range(dims)
        ]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def recall(out_dir):
        hits = ann_search(
            spark, out_dir, emb.where(F.col("vec_id") < 10), k=10,
            id_col="vec_id", vec_col="embedding",
        ).collect()
        # ground truth: same cluster mod-5 members are the near set
        ok = sum(1 for r in hits if r.neighbor_id % n_cl == r.query_id % n_cl)
        return ok / len(hits)

    common = dict(dims=dims, id_col="vec_id", vec_col="embedding",
                  pq_m=4, pq_k=8, pq_iters=2, n_cells=n_cl,
                  kmeans_iters=3)
    raw_dir = str(tmp_path / "raw")
    res_dir = str(tmp_path / "res")
    build_ann_index(emb, raw_dir, residual=False, **common)
    build_ann_index(emb, res_dir, residual=True, **common)
    r_raw, r_res = recall(raw_dir), recall(res_dir)
    assert r_res >= r_raw
    assert r_res >= 0.9


def test_tune_nprobe_picks_from_measured_curve(spark, sf_dir, tmp_path):
    """ann.tune_nprobe (r11 verdict #7): the chosen rung is the
    smallest ladder nprobe whose MEASURED recall@k clears the target,
    and an impossible target falls back to the ladder max instead of
    failing. NOTE recall@k under pure ADC ranking is NOT guaranteed
    monotone in nprobe — a newly probed cell can contribute a false
    candidate whose approximate distance displaces a true neighbor
    from the top-k (measured here: 0.25/0.30/0.225 at nprobe 1/2/4 on
    the sf0.001 fixture) — which is precisely why the knob must be
    picked from the measured curve, not assumed."""
    import pytest as _pytest

    from boltzmannclean_spark.ann import build_ann_index, tune_nprobe
    from boltzmannclean_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = str(tmp_path / "tune_idx")
    build_ann_index(
        emb,
        out,
        dims=64,
        id_col="vec_id",
        vec_col="embedding",
        pq_m=8,
        pq_k=16,
        pq_iters=2,
        n_cells=5,
        kmeans_iters=2,
    )
    chosen, curve = tune_nprobe(
        spark, out, emb, k=5, target_recall=0.5,
        ladder=(1, 2, 4), n_queries=8,
    )
    rows = {r.nprobe: r for r in curve.collect()}
    assert set(rows) == {1, 2, 4}
    assert all(r.possible == rows[1].possible for r in rows.values())
    assert all(0.0 <= r.recall <= 1.0 for r in rows.values())
    assert all(r.hits <= r.possible for r in rows.values())
    assert rows[chosen].chosen == 1
    assert sum(r.chosen for r in rows.values()) == 1
    meeting = [p for p in (1, 2, 4) if rows[p].recall >= 0.5]
    assert chosen == (min(meeting) if meeting else 4)

    # Impossible target: fall back to the ladder max, never raise.
    chosen_hi, _ = tune_nprobe(
        spark, out, emb, k=5, target_recall=1.1, ladder=(1, 2), n_queries=4
    )
    assert chosen_hi == 2

    # Rungs beyond the cell count are dropped (probing every cell is
    # already the full scan).
    chosen_big, curve_big = tune_nprobe(
        spark, out, emb, k=5, target_recall=0.99,
        ladder=(1, 16), n_queries=4,
    )
    assert [r.nprobe for r in curve_big.collect()] == [1]
    assert chosen_big == 1

    # EMPTY ground truth (single-vector corpus: no (q, neighbor) pair
    # with neighbor != q exists): every rung would vacuously satisfy
    # hits >= target*0 and rung[0] would be reported as "meeting" a
    # target it never measured (r12 advisor). The guard falls back to
    # the ladder max explicitly, recall 0.0, chosen flag on the max.
    chosen_empty, curve_empty = tune_nprobe(
        spark, out, emb.limit(1), k=5, target_recall=0.5,
        ladder=(1, 2, 4), n_queries=4,
    )
    assert chosen_empty == 4
    empty_rows = {r.nprobe: r for r in curve_empty.collect()}
    assert set(empty_rows) == {1, 2, 4}
    assert all(
        r.possible == 0 and r.hits == 0 and r.recall == 0.0
        for r in empty_rows.values()
    )
    assert [p for p, r in empty_rows.items() if r.chosen] == [4]

    # A flat (non-IVF) index cannot be tuned.
    flat = str(tmp_path / "flat_idx")
    build_ann_index(
        emb, flat, dims=64, id_col="vec_id", vec_col="embedding",
        pq_m=8, pq_k=16, pq_iters=2,
    )
    with _pytest.raises(ValueError, match="without n_cells"):
        tune_nprobe(spark, flat, emb, ladder=(1,))


def test_build_residual_default_resolves_to_ivf(spark, sf_dir, tmp_path):
    """r13 verdict #4: the raw-vs-residual default is CHOSEN FROM the
    measured recall curves (SCALING.md r14 — residual wins every
    nprobe rung on the clustered corpus, neutral on the isotropic
    fixture): residual=None resolves to the IVF flag. Explicit
    residual=False still pins raw codebooks (the fixture lifecycle
    relies on it — its oracles re-derive raw)."""
    from boltzmannclean_spark.ann import build_ann_index, read_index_conf
    from boltzmannclean_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    common = dict(
        dims=64, id_col="vec_id", vec_col="embedding",
        pq_m=8, pq_k=16, pq_iters=1, kmeans_iters=1,
    )
    ivf = str(tmp_path / "ivf_default")
    build_ann_index(emb, ivf, n_cells=3, **common)
    assert read_index_conf(ivf)["residual"] is True

    flat = str(tmp_path / "flat_default")
    build_ann_index(emb, flat, **common)
    assert read_index_conf(flat)["residual"] is False

    pinned = str(tmp_path / "ivf_raw")
    build_ann_index(emb, pinned, n_cells=3, residual=False, **common)
    assert read_index_conf(pinned)["residual"] is False
