"""Multimodal columns (SURVEY.md §2.B "multimodal"): image/audio/video
payloads as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched Pandas UDFs over ``mapInPandas``.

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_image`` raises ``NotImplementedError`` unless the deterministic
fake decoder is selected (``fake=True``), which synthesizes a stable
"pixel" tensor from the payload bytes. Everything around the stub — the
binary column construction, the metadata struct schema, the mapInPandas
batch iteration, the output schema, and partition-parallelism — is real
Spark plumbing and is tested.

Scale: mapInPandas streams Arrow batches per partition; no shuffle, no
driver collection — feature extraction is linear and embarrassingly
parallel, exactly how a 100 TB media crawl is processed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from boltzmannclean_spark.plans.registry import register
from boltzmannclean_spark.sources.catalog import load_table

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, "
    "mean_intensity double, feature array<double>"
)


def decode_image(payload: bytes, *, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an (h, w) uint8 array.

    STUB: real decoding needs an image codec (Pillow/libjpeg), which is
    not in this environment. With ``fake=True`` a deterministic 4×4
    tensor is synthesized from the payload bytes so the downstream
    plumbing is exercised end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True "
            "for the deterministic stub decoder"
        )
    arr = np.frombuffer(payload, dtype=np.uint8)
    reps = -(-16 // max(len(arr), 1))  # ceil-div, payload may be short
    return np.tile(arr, reps)[:16].reshape(4, 4)


def extract_image_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: decode (stub) + featurize each payload."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            img = decode_image(bytes(payload), fake=True)
            rows.append(
                {
                    "doc_id": doc_id,
                    "n_bytes": len(payload),
                    "width": img.shape[1],
                    "height": img.shape[0],
                    "mean_intensity": float(img.mean()),
                    "feature": img.astype(np.float64).ravel()[:4].tolist(),
                }
            )
        yield pd.DataFrame(rows)


def with_media_columns(docs: DataFrame) -> DataFrame:
    """Attach a synthetic binary payload + typed metadata struct to each
    document (stands in for a real image/audio blob column; md5-derived
    so it is deterministic and 16 bytes)."""
    payload = F.unhex(F.md5("text"))
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.col("lang").alias("source_lang"),
        ).alias("media_meta"),
    )


def image_features_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed feature rows (``feature array<double>``) — used by the
    pytest invariant checks. The *registered* query renders the array as
    a CSV string because the external harness canonicalizes results with
    a pandas sort over every output column, which cannot order
    list-valued cells (CORRECTNESS_r02: "unhashable type: 'list'")."""
    docs = load_table(spark, sf_dir, "documents")
    media = with_media_columns(docs)
    return media.select("doc_id", "payload").mapInPandas(
        extract_image_features, schema=FEATURE_SCHEMA
    )


@register(
    "multimodal_features",
    oracle=None,  # Pandas-UDF decode path; schema/invariants in pytest
    tags=("multimodal", "pandas_udf"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → mapInPandas (Arrow) stub-decode + feature
    extraction → feature rows (vector rendered as a sortable CSV string;
    see ``image_features_typed`` for the array-typed variant)."""
    feats = image_features_typed(spark, sf_dir)
    return feats.select(
        "doc_id",
        "n_bytes",
        "width",
        "height",
        "mean_intensity",
        F.concat_ws(",", F.transform("feature", lambda x: x.cast("string"))).alias(
            "feature_csv"
        ),
    ).orderBy("doc_id")


@register(
    "multimodal_doc_embedding",
    oracle="""
SELECT
  d.doc_id,
  d.lang,
  d.n_chars,
  e.label,
  list_reduce(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
              (s, x) -> s + x) AS sq_norm,
  CAST(LENGTH(md5(d.text)) // 2 AS BIGINT) AS payload_bytes
FROM documents d
JOIN embeddings e ON d.doc_id = e.vec_id
ORDER BY d.doc_id
""",
    tags=("multimodal", "join"),
)
def multimodal_doc_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal row assembly: text metadata ⋈ embedding vector ⋈
    binary payload size — the one-row-per-sample shape a multimodal
    training pipeline feeds to a loader."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    sq_norm = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    return (
        docs.join(emb, docs["doc_id"] == emb["vec_id"])
        .select(
            "doc_id",
            "lang",
            "n_chars",
            "label",
            sq_norm.alias("sq_norm"),
            (F.length(F.unhex(F.md5("text")))).cast("long").alias("payload_bytes"),
        )
        .orderBy("doc_id")
    )


FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_offset_bytes int, "
    "frame_hash string, n_frames_total int"
)


def sample_frames(
    payload: bytes, *, every_nth: int = 4, frame_bytes: int = 2, fake: bool = False
) -> list[tuple[int, int, bytes]]:
    """Sample every Nth "frame" from a video payload.

    STUB: real frame extraction needs a video codec (ffmpeg/pyav), not in
    this environment. With ``fake=True`` the payload is treated as a
    stream of fixed-size fake frames so the sampling arithmetic, batch
    shapes, and output schema are exercised for real.
    """
    if not fake:
        raise NotImplementedError(
            "video codecs unavailable in this environment; pass fake=True "
            "for the deterministic stub sampler"
        )
    frames = [
        (i, off, payload[off : off + frame_bytes])
        for i, off in enumerate(range(0, len(payload), frame_bytes))
    ]
    return frames[::every_nth]


def extract_sampled_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one row per sampled frame (row expansion
    happens executor-side — the driver never sees per-frame data)."""
    import hashlib

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            n_total = -(-len(payload) // 2)
            for idx, off, frame in sample_frames(payload, fake=True):
                rows.append(
                    {
                        "doc_id": doc_id,
                        "frame_idx": idx,
                        "frame_offset_bytes": off,
                        "frame_hash": hashlib.md5(frame).hexdigest(),
                        "n_frames_total": n_total,
                    }
                )
        yield pd.DataFrame(rows)


@register(
    "multimodal_frame_sample",
    oracle=None,  # stubbed codec path; schema/invariants in pytest
    tags=("multimodal", "video", "pandas_udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-as-binary → mapInPandas frame sampling (every 4th fake
    frame) → one typed row per sampled frame. The row-expansion shape
    (1 blob in, k frames out) is the real pattern for frame-level
    training-data extraction at scale."""
    docs = load_table(spark, sf_dir, "documents")
    media = with_media_columns(docs)
    frames = media.select("doc_id", "payload").mapInPandas(
        extract_sampled_frames, schema=FRAME_SCHEMA
    )
    return frames.orderBy("doc_id", "frame_idx")


CHUNK_SCHEMA = (
    "doc_id bigint, chunk_idx int, n_samples int, "
    "rms_energy double, peak_amplitude int"
)


def decode_audio(payload: bytes, *, fake: bool = False) -> np.ndarray:
    """Decode an audio payload to a 1-D int8 sample array.

    STUB: real decoding needs an audio codec (soundfile/ffmpeg), not in
    this environment. With ``fake=True`` the raw payload bytes are
    reinterpreted as signed 8-bit PCM so chunking/feature arithmetic,
    batch shapes, and the output schema are exercised for real.
    """
    if not fake:
        raise NotImplementedError(
            "audio codecs unavailable in this environment; pass fake=True "
            "for the deterministic stub decoder"
        )
    return np.frombuffer(payload, dtype=np.int8)


def extract_audio_chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: fixed-size chunking + per-chunk energy
    features (RMS, peak) — the waveform-to-training-segments shape.
    Expansion is executor-side; the driver never sees samples."""
    chunk = 4
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = decode_audio(bytes(payload), fake=True)
            for idx in range(0, len(samples), chunk):
                seg = samples[idx : idx + chunk].astype(np.float64)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "chunk_idx": idx // chunk,
                        "n_samples": len(seg),
                        "rms_energy": float(np.sqrt((seg * seg).mean())),
                        "peak_amplitude": int(np.abs(seg).max()),
                    }
                )
        yield pd.DataFrame(rows)


@register(
    "multimodal_audio_chunks",
    oracle=None,  # stubbed codec path; schema/invariants in pytest
    tags=("multimodal", "audio", "pandas_udf"),
)
def multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-as-binary → mapInPandas chunking (4-sample fake PCM
    segments) → one typed feature row per chunk (RMS energy, peak).
    Completes the image/audio/video modality set; same no-shuffle
    streaming plan as the other media extractors."""
    docs = load_table(spark, sf_dir, "documents")
    media = with_media_columns(docs)
    chunks = media.select("doc_id", "payload").mapInPandas(
        extract_audio_chunks, schema=CHUNK_SCHEMA
    )
    return chunks.orderBy("doc_id", "chunk_idx")


SHARD_BYTES = 64 * 1024  # target shard payload size


@register(
    "multimodal_shard_manifest",
    oracle=f"""
WITH blobs AS (
  SELECT vec_id, CAST(16 + 4 * LEN(embedding) AS BIGINT) AS n_bytes
  FROM embeddings
),
c AS (
  SELECT *, SUM(n_bytes) OVER (ORDER BY vec_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM blobs
)
SELECT CAST((cum - n_bytes) // {SHARD_BYTES} AS BIGINT) AS shard_id,
       COUNT(*) AS n_items,
       CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
       MIN(vec_id) AS first_id, MAX(vec_id) AS last_id
FROM c
GROUP BY (cum - n_bytes) // {SHARD_BYTES}
ORDER BY shard_id
""",
    tags=("multimodal", "shard", "manifest"),
)
def multimodal_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard manifest: binary samples (here the
    embedding payloads: 16-byte header + 4 bytes/dim) are packed into
    ~64 KiB shards by cumulative size in stable id order — the layout
    step before training loaders stream tar shards. Same deterministic
    cumsum-fill as token packing, so shard membership is identical on
    any engine/partitioning; loaders get (shard, first/last id, bytes)
    without touching payloads."""
    emb = load_table(spark, sf_dir, "embeddings")
    blobs = emb.select(
        "vec_id",
        (F.lit(16) + 4 * F.size("embedding")).cast("long").alias("n_bytes"),
    )
    w = Window.orderBy("vec_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = blobs.withColumn("cum", F.sum("n_bytes").over(w))
    return (
        c.withColumn("shard_id", F.expr(f"(cum - n_bytes) div {SHARD_BYTES}"))
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("shard_bytes"),
            F.min("vec_id").alias("first_id"),
            F.max("vec_id").alias("last_id"),
        )
        .orderBy("shard_id")
    )


PHASH_BANDS = 4  # 4 bands x 16 bits over the 64-bit perceptual hash


def _hamming_sql(ha: str, hb: str, *, duck: bool) -> str:
    """64-bit hamming distance between two 16-hex-digit hashes as a
    fixed sum of 16 per-digit xor-popcounts — pure integer arithmetic,
    identical in both engines (Spark: ^ is xor; DuckDB: ^ is power, so
    its xor() function is used)."""
    digits = "0123456789abcdef"
    pos = "strpos" if duck else "instr"
    terms = []
    for i in range(1, 17):
        da = f"({pos}('{digits}', substring({ha}, {i}, 1)) - 1)"
        db = f"({pos}('{digits}', substring({hb}, {i}, 1)) - 1)"
        x = f"xor({da}, {db})" if duck else f"({da} ^ {db})"
        terms.append(f"bit_count({x})")
    return " + ".join(terms)


@register(
    "multimodal_phash_dedup",
    oracle=f"""
WITH h AS (SELECT doc_id, md5(text) AS ph FROM documents),
bands AS (
  SELECT doc_id, ph, b, substring(ph, 1 + 4 * b, 4) AS band_key
  FROM h, UNNEST(range(0, {PHASH_BANDS})) t(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.ph AS ph_a, b.ph AS ph_b
  FROM bands a JOIN bands b ON a.b = b.b AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST({_hamming_sql("ph_a", "ph_b", duck=True)} AS BIGINT) AS hamming
FROM cand
ORDER BY doc_a, doc_b
""",
    tags=("multimodal", "phash", "dedup", "hamming"),
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup detection over BINARY media payloads —
    the image-dedup pipeline shape (pHash/PDQ): each payload reduces to
    a 64-bit fingerprint, near-duplicates are pairs within a small
    hamming radius, and the scale trick is banding the 64 bits into
    {PHASH_BANDS}x16-bit keys so candidates come from band-key
    equi-joins (pairs agreeing on >= 16 consecutive bits) instead of an
    all-pairs scan — the bitwise twin of MinHash-LSH banding. The
    verify step computes the exact 64-bit hamming distance as 16
    per-hex-digit xor-popcounts, pure integer arithmetic in both
    engines. Here the fingerprint is the payload's md5 (the stub codec
    — a REAL pHash drops in at the same column with no plan change),
    every candidate's distance is emitted, and a production run would
    keep hamming <= 8-16. One shuffle per join side on the band key;
    candidate count is sum of C(bucket, 2) over 2^16 buckets/band —
    corpus-linear under any realistic spread."""
    docs = load_table(spark, sf_dir, "documents")
    # with_media_columns derives payload = unhex(md5(text)); the hex
    # fingerprint below is therefore hex(payload) — md5(text) directly.
    h = docs.select("doc_id", F.md5("text").alias("ph"))
    bands = h.select(
        "doc_id",
        "ph",
        F.explode(
            F.expr(
                f"transform(sequence(0, {PHASH_BANDS - 1}), "
                f"b -> struct(b AS b, substring(ph, 1 + 4 * b, 4) AS band_key))"
            )
        ).alias("g"),
    ).select("doc_id", "ph", F.col("g.b").alias("b"), F.col("g.band_key").alias("band_key"))
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("ph").alias("ph_a"), "b", "band_key"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("ph").alias("ph_b"), "b", "band_key"
    )
    cand = (
        a.join(b, ["b", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ph_a", "ph_b")
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.expr(_hamming_sql("ph_a", "ph_b", duck=False)).cast("long").alias(
            "hamming"
        ),
    ).orderBy("doc_a", "doc_b")
