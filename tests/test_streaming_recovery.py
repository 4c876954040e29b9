"""Checkpoint recovery: a stateful streaming aggregation stopped and
restarted from its checkpoint must (a) resume from recorded offsets —
reprocessing nothing — and (b) restore aggregation state, so totals over
a file feed split across two runs equal the one-shot batch answer.
This is the exactly-once story a 100 TB pipeline leans on; the same
checkpoint mechanics cover executor loss and job restarts on a cluster."""

from __future__ import annotations

from pyspark.sql import functions as F

def _run_stream(spark, land, ckpt, totals):
    """Drain all currently-available files (availableNow) into `totals`
    via an update-mode foreachBatch merge; returns rows seen this run."""
    seen = {"rows": 0}

    def merge(batch_df, batch_id):
        rows = batch_df.collect()
        for r in rows:
            totals[r.user_id] = (r.n_events, r.cents)

    stream = (
        # Footer-probed schema: tracks whichever ts layout landed.
        spark.readStream.schema(spark.read.parquet(land).schema)
        .parquet(land)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("value").cast("decimal(12,2)") * 100).cast("long")).alias(
                "cents"
            ),
        )
    )
    q = (
        stream.writeStream.outputMode("update")
        .foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.lastProgress
    if progress is not None:
        seen["rows"] = progress.get("numInputRows", 0)
    return seen["rows"]


def test_checkpoint_recovery_exactly_once(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    half_a = events.where(F.col("event_id") % 2 == 0)
    half_b = events.where(F.col("event_id") % 2 == 1)

    land = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    totals: dict = {}

    # Run 1: only the first half of the feed exists.
    half_a.repartition(2).write.mode("overwrite").parquet(land)
    _run_stream(spark, land, ckpt, totals)
    partial = dict(totals)
    assert partial, "first run produced no state"

    # More files land; restart from the SAME checkpoint.
    half_b.repartition(2).write.mode("append").parquet(land)
    _run_stream(spark, land, ckpt, totals)

    # Exactly-once: restored state + only-new-files processing must equal
    # the one-shot batch aggregation over the full feed.
    expect = {
        r.user_id: (r.n_events, r.cents)
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("value").cast("decimal(12,2)") * 100).cast("long")).alias(
                "cents"
            ),
        )
        .collect()
    }
    assert totals == expect
    # And the restart genuinely continued: some user's count grew.
    grew = [u for u in partial if u in totals and totals[u][0] > partial[u][0]]
    assert grew, "second run never extended first-run state"


def _cdc_apply_factory(base):
    """The stream_cdc_merge_snapshot merge step, made RESTARTABLE: the
    current-snapshot pointer is recovered from the persisted epoch dirs
    (newest state_e{N}) instead of in-process state, which is what a
    production consumer does via its table pointer/metastore. Same
    write-new-then-repoint discipline: never overwrite what you read."""
    import glob
    import os
    import re

    def newest_state():
        dirs = glob.glob(os.path.join(base, "state_e*"))
        if not dirs:
            return None
        return max(
            dirs,
            key=lambda p: int(re.search(r"_e(\d+)$", p).group(1)),
        )

    def apply_cdc(batch_df, epoch_id):
        key = F.struct("us", "event_id")
        latest = batch_df.groupBy("user_id").agg(
            F.max_by("last_type", key).alias("last_type"),
            F.max_by("last_cents", key).alias("last_cents"),
            F.max("us").alias("last_us"),
            F.max(key).alias("k"),
        )
        cur_path = newest_state()
        if cur_path is not None:
            cur = batch_df.sparkSession.read.parquet(cur_path)
            merged = (
                cur.unionByName(latest)
                .groupBy("user_id")
                .agg(
                    F.max_by("last_type", F.col("k")).alias("last_type"),
                    F.max_by("last_cents", F.col("k")).alias("last_cents"),
                    F.max_by("last_us", F.col("k")).alias("last_us"),
                    F.max("k").alias("k"),
                )
            )
        else:
            merged = latest
        merged.write.mode("overwrite").parquet(
            os.path.join(base, f"state_e{epoch_id}")
        )

    return newest_state, apply_cdc


def _run_cdc(spark, land, ckpt, base):
    newest_state, apply_cdc = _cdc_apply_factory(base)
    updates = (
        spark.readStream.schema(spark.read.parquet(land).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    q = (
        updates.writeStream.outputMode("append")
        .foreachBatch(apply_cdc)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return newest_state()


def test_cdc_merge_checkpoint_recovery(spark, sf_dir, tmp_path):
    """r6 verdict item 4: kill the CDC consumer mid-feed and restart
    from its checkpoint — the epoch-versioned snapshot must converge to
    the identical last-writer-wins result the one-shot batch window
    computes, without reprocessing the already-merged epochs."""
    import os

    from boltzmannclean_spark.functions.exact import dec
    from boltzmannclean_spark.sources.catalog import load_table

    updates = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("last_type"),
        (dec("value") * 100).cast("long").alias("last_cents"),
        F.unix_micros("ts").alias("us"),
        "event_id",
    )
    land = str(tmp_path / "cdc_landing")
    ckpt = str(tmp_path / "cdc_ckpt")
    base = str(tmp_path / "cdc_state")
    os.makedirs(base)

    # Run 1: first half of the CDC feed, then the consumer dies.
    updates.where(F.col("event_id") % 2 == 0).repartition(2).write.mode(
        "overwrite"
    ).parquet(land)
    snap1 = _run_cdc(spark, land, ckpt, base)
    assert snap1 is not None
    epochs_run1 = sorted(os.listdir(base))
    assert len(epochs_run1) >= 2, "feed did not span multiple epochs"

    # The rest of the feed lands; restart from the SAME checkpoint.
    updates.where(F.col("event_id") % 2 == 1).repartition(2).write.mode(
        "append"
    ).parquet(land)
    snap2 = _run_cdc(spark, land, ckpt, base)

    got = sorted(
        spark.read.parquet(snap2)
        .select("user_id", "last_type", "last_cents", "last_us")
        .collect()
    )
    w = F.struct("us", "event_id")
    expect = sorted(
        updates.groupBy("user_id")
        .agg(
            F.max_by("last_type", w).alias("last_type"),
            F.max_by("last_cents", w).alias("last_cents"),
            F.max("us").alias("last_us"),
        )
        .collect()
    )
    assert got == expect, "post-recovery snapshot diverged from batch"
    # Recovery continued the epoch sequence: run-1 snapshots are still
    # on disk untouched (time travel) and new epochs extended them.
    assert set(epochs_run1) <= set(os.listdir(base))
    assert len(os.listdir(base)) > len(epochs_run1)
