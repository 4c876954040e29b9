"""ANN index lifecycle tests (round-6 verdict item 2): the persisted
artifact must be bit-identical to in-query training, reused without
rebuilding when valid, and rebuilt when invalidated."""

from __future__ import annotations

import json
import os
import time

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
