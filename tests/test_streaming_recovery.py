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
