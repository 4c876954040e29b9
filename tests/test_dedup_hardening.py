"""Round-13 hardening of the pair-verify dedup ops (r12 verdict #1).

Pins the OVERSIZED-BLOCK CAP semantics of dedup_fellegi_sunter_score:
blocks wider than FS_BLOCK_CAP are routed out of pair generation (the
production clerical discipline for fixed-domain keys whose width grows
linearly with the corpus), survivors from narrow blocks are untouched,
and the exclusion is visible in the dedup_fs_block_profile companion —
no silent truncation. The PF_DF_CAP twin lives in
test_prefix_filter_property.py; the recall-eval probe redesign is
covered by oracle parity (its semantics are the oracle)."""

from __future__ import annotations

from boltzmannclean_spark.operators.dedup import FS_BLOCK_CAP
from boltzmannclean_spark.plans.registry import all_queries

QUERIES = all_queries()


def _write_docs(spark, sf_dir, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(sf_dir / "documents.parquet"))


def test_fs_block_cap_routes_out_oversized_blocks(spark, tmp_path):
    n = FS_BLOCK_CAP + 100  # one size-bucket block, 100 over the cap
    rows = []
    for i in range(n):
        # Pair (2k, 2k+1): same head + same source -> found by the
        # (lang, head) pass (block width 2), score 1200+900+1500=3600.
        rows.append((i, f"h{i // 2} filler{i}", "en", f"s{i // 2}", 150))
    sf_dir = tmp_path / "fscap"
    sf_dir.mkdir()
    _write_docs(spark, sf_dir, rows)

    got = QUERIES["dedup_fellegi_sunter_score"].spark_fn(
        spark, str(sf_dir)
    ).collect()
    # Every doc shares the single (en, sb=1) block of width n > cap, so
    # the size-bucket pass contributes NOTHING: pairs agreeing only on
    # (source, size) — e.g. (0, 2) with different heads, score
    # 1200+900-200=1900 'review' under uncapped semantics — are routed
    # out with the block...
    pairs = {(r.doc_a, r.doc_b) for r in got}
    assert (0, 2) not in pairs
    # ...while the narrow (lang, head) blocks keep their survivors.
    assert len(got) == n // 2
    assert all(r.decision == "match" and r.score_milli == 3600 for r in got)
    assert pairs == {(2 * k, 2 * k + 1) for k in range(n // 2)}

    prof = {
        r.pass_key: r
        for r in QUERIES["dedup_fs_block_profile"]
        .spark_fn(spark, str(sf_dir))
        .collect()
    }
    sb = prof["lang_size_bucket"]
    assert sb.n_blocks == 1
    assert sb.n_blocks_dropped == 1
    assert sb.n_docs_in_dropped == n
    assert sb.max_width == n
    assert sb.kept_pairs_upper_bound == 0
    hd = prof["lang_head"]
    assert hd.n_blocks_dropped == 0
    assert hd.max_width == 2
    assert hd.kept_pairs_upper_bound == n // 2


def test_full_outer_count_identity_matches_intersect(spark):
    # r16 recall_eval restructure: |cand|, |truth|, |cand ∩ truth| via
    # one full-outer join with 1-flags must equal the intersect-based
    # counts for DISTINCT pair sets — including both empty-side edges
    # (coalesce must yield 0, never NULL).
    from pyspark.sql import functions as F

    cases = [
        ([(1, 2), (1, 3), (2, 4)], [(1, 3), (2, 4), (5, 6)]),
        ([(1, 2)], []),
        ([], [(3, 4)]),
        ([], []),
        ([(7, 8), (9, 10)], [(7, 8), (9, 10)]),
    ]
    for c_rows, t_rows in cases:
        cand = spark.createDataFrame(c_rows or [], "d1 long, d2 long")
        truth = spark.createDataFrame(t_rows or [], "d1 long, d2 long")
        j = cand.withColumn("c", F.lit(1)).join(
            truth.withColumn("t", F.lit(1)), ["d1", "d2"], "full_outer"
        )
        row = j.agg(
            F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("nt"),
            F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("nc"),
            F.coalesce(F.sum(F.col("c") * F.col("t")), F.lit(0))
            .cast("long")
            .alias("ntp"),
        ).collect()[0]
        inter = cand.intersect(truth).count()
        assert (row.nc, row.nt, row.ntp) == (
            len(c_rows),
            len(t_rows),
            inter,
        ), (c_rows, t_rows, row)
