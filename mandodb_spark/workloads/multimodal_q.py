"""Declared query for the multimodal plumbing: binary payloads through an
Arrow-batched mapInPandas feature extractor, oracle-checked because the
stubbed decode is deterministic (md5-derived)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import multimodal
from .common import load


def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    payloads = multimodal.with_binary_payload(d, "text")
    return multimodal.extract_features(payloads, "doc_id", "payload")


# ascii(hex[i]) in SQL: documents text is ASCII so octet_length == length;
# md5 of the utf-8 bytes == md5 of the string in both engines.
MM_BINARY_FEATURES_SQL = """
WITH h AS (
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS byte_len,
           md5(text) AS content_md5
    FROM documents
)
SELECT doc_id, byte_len, content_md5,
       CAST((ascii(substr(content_md5, 1, 1)) * 7 + ascii(substr(content_md5, 2, 1))) % 640 AS INTEGER) AS fake_width,
       CAST((ascii(substr(content_md5, 3, 1)) * 7 + ascii(substr(content_md5, 4, 1))) % 480 AS INTEGER) AS fake_height
FROM h
"""

def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (one-to-many mapInPandas fan-out) over the binary
    payloads, rolled up per document."""
    from pyspark.sql import functions as F

    d = load(spark, sf_dir, "documents")
    payloads = multimodal.with_binary_payload(d, "text")
    frames = multimodal.sample_frames(payloads, "doc_id", "payload")
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.min("frame_md5").alias("min_frame_md5"),
    )


MM_FRAME_SAMPLE_SQL = f"""
WITH src AS (
    SELECT doc_id, md5(text) AS ph,
           least(CAST(strlen(text) AS BIGINT) // 100 + 1, {multimodal.MAX_FRAMES}) AS nf
    FROM documents
),
frames AS (
    SELECT doc_id, md5(ph || ':' || CAST(t.f AS VARCHAR)) AS frame_md5
    FROM src, unnest(range(0, nf)) AS t(f)
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames, min(frame_md5) AS min_frame_md5
FROM frames GROUP BY doc_id
"""

def mm_resize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize metadata over the decoded (stub) dims —
    pure column arithmetic on top of the feature extractor, grouped into a
    size histogram."""
    from pyspark.sql import functions as F

    t = multimodal.RESIZE_TARGET
    feats = mm_binary_features(spark, sf_dir)
    long_edge = F.greatest("fake_width", "fake_height", F.lit(1))
    scale = F.when(long_edge <= t, F.lit(1.0)).otherwise(F.lit(float(t)) / long_edge)
    new_w = F.greatest(F.floor(F.col("fake_width") * scale), F.lit(1)).cast("int")
    new_h = F.greatest(F.floor(F.col("fake_height") * scale), F.lit(1)).cast("int")
    return (
        feats.select(new_w.alias("out_w"), new_h.alias("out_h"))
        .groupBy("out_w", "out_h")
        .agg(F.count(F.lit(1)).alias("n_images"))
    )


MM_RESIZE_DIMS_SQL = f"""
WITH feats AS ({MM_BINARY_FEATURES_SQL}),
scaled AS (
    -- the clamp-to-1 applies in BOTH branches (a 0-valued fake dim must
    -- come out as 1 exactly like the Spark side's unconditional greatest)
    SELECT CASE WHEN greatest(fake_width, fake_height, 1) <= {multimodal.RESIZE_TARGET}
                THEN greatest(fake_width, 1)
                ELSE greatest(CAST(floor(fake_width * ({multimodal.RESIZE_TARGET}.0 / greatest(fake_width, fake_height, 1))) AS INTEGER), 1)
           END AS out_w,
           CASE WHEN greatest(fake_width, fake_height, 1) <= {multimodal.RESIZE_TARGET}
                THEN greatest(fake_height, 1)
                ELSE greatest(CAST(floor(fake_height * ({multimodal.RESIZE_TARGET}.0 / greatest(fake_width, fake_height, 1))) AS INTEGER), 1)
           END AS out_h
    FROM feats
)
SELECT out_w, out_h, CAST(count(*) AS BIGINT) AS n_images
FROM scaled GROUP BY out_w, out_h
"""

QUERIES = {
    "mm_binary_features": mm_binary_features,
    "mm_frame_sample": mm_frame_sample,
    "mm_resize_dims": mm_resize_dims,
}
ORACLES = {
    "mm_binary_features": MM_BINARY_FEATURES_SQL,
    "mm_frame_sample": MM_FRAME_SAMPLE_SQL,
    "mm_resize_dims": MM_RESIZE_DIMS_SQL,
}


CHUNK_BYTES = 256
CHUNK_OVERLAP = 64


def mm_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping byte-range chunk plan over the binary payloads (the
    pre-decode fan-out of a transcription/OCR pipeline) — map-side narrow
    explode, shuffle-free."""
    d = load(spark, sf_dir, "documents")
    payloads = multimodal.with_binary_payload(d, "text")
    return multimodal.chunk_plan(
        payloads, "doc_id", "payload", chunk_bytes=CHUNK_BYTES, overlap=CHUNK_OVERLAP
    )


_STEP = CHUNK_BYTES - CHUNK_OVERLAP

MM_CHUNK_PLAN_SQL = f"""
WITH src AS (
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len FROM documents
),
idx AS (
    SELECT doc_id, byte_len,
           unnest(range(0, CAST(floor(greatest(byte_len - {CHUNK_OVERLAP + 1}, 0) / {_STEP}.0) AS BIGINT) + 1)) AS chunk_idx
    FROM src
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(chunk_idx * {_STEP} AS BIGINT) AS chunk_start,
       CAST(least({CHUNK_BYTES}, byte_len - chunk_idx * {_STEP}) AS BIGINT) AS chunk_len
FROM idx
"""

QUERIES["mm_chunk_plan"] = mm_chunk_plan
ORACLES["mm_chunk_plan"] = MM_CHUNK_PLAN_SQL


AUDIO_RATE = 8000


def mm_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction through the REAL stdlib WAV decode path:
    synthesize an 8-bit mono PCM WAV per document (frames = the text's
    UTF-8 bytes), then run the production ``audio_stats`` stage — RIFF
    header walk, unsigned-midpoint-128 sample read (the ADVICE-r4 fix),
    vectorized RMS.  Oracle-exact because sample *i* == byte *i*: RMS ==
    sqrt(avg((ascii−128)²)) over the characters, and every intermediate
    (integer squares summed in float64 ≪ 2^53, correctly-rounded ÷ and
    sqrt) is bit-identical across engines."""
    from pyspark.sql import functions as F

    d = load(spark, sf_dir, "documents")
    wavs = multimodal.with_wav_payload(d, "doc_id", "text", sample_rate=AUDIO_RATE)
    stats = multimodal.audio_stats(wavs, "doc_id", "payload")
    return stats.select(
        "doc_id", "n_channels", "sample_rate", "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
    )


MM_AUDIO_RMS_SQL = f"""
WITH chars AS (
    SELECT doc_id, ascii(c.ch) - 128 AS v
    FROM documents, unnest(regexp_split_to_array(text, '')) AS c(ch)
),
agg AS (
    SELECT doc_id, sum(CAST(v * v AS BIGINT)) AS ssq, count(*) AS n
    FROM chars GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(1 AS INTEGER) AS n_channels,
       CAST({AUDIO_RATE} AS INTEGER) AS sample_rate,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n_samples,
       round(CAST(coalesce(a.n, 0) AS DOUBLE) / {AUDIO_RATE}, 6) AS duration_s,
       round(coalesce(sqrt(CAST(a.ssq AS DOUBLE) / a.n), 0.0), 6) AS rms
FROM documents d LEFT JOIN agg a USING (doc_id)
"""

QUERIES["mm_audio_rms"] = mm_audio_rms
ORACLES["mm_audio_rms"] = MM_AUDIO_RMS_SQL
