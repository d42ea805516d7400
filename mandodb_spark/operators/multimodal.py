"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload travels as a
``binary`` column, metadata as typed columns, and decode/feature-extract
runs as Arrow-batched ``mapInPandas`` — executor-parallel, zero driver
involvement, batch-columnar transfer.

The real decoders (PIL/ffmpeg/soundfile) are not in this container, so the
decode step is STUBBED: :func:`fake_decode_meta` derives deterministic
"decoded" properties from the bytes' md5 (engine-agnostic, oracle-checkable),
and :func:`decode_image` raises ``NotImplementedError`` at the exact seam
where a real decoder plugs in.  Everything Spark-side — schema, batching,
partitioning, UDF signature — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the feature-extraction stage.
FEATURE_SCHEMA = (
    "doc_id long, byte_len long, content_md5 string, fake_width int, fake_height int"
)


def decode_image(payload: bytes) -> object:
    """The real-decoder seam.  Swap in PIL/libvips here in production."""
    raise NotImplementedError(
        "image decoding requires PIL/libvips, not available in this container; "
        "use fake_decode_meta for the deterministic test path"
    )


def fake_decode_meta(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for decode: (md5 hex, width, height) derived
    from the payload bytes.  Mirrors the SQL oracle exactly:
    width = (ascii(hex[0])*7 + ascii(hex[1])) % 640,
    height = (ascii(hex[2])*7 + ascii(hex[3])) % 480."""
    h = hashlib.md5(payload).hexdigest()
    width = (ord(h[0]) * 7 + ord(h[1])) % 640
    height = (ord(h[2]) * 7 + ord(h[3])) % 480
    return h, width, height


def extract_features(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Arrow-batched feature extraction over a binary column via mapInPandas.

    Partition-parallel: each Arrow batch is processed in one Python call
    (no per-row overhead); output is a fresh typed DataFrame.  This is the
    canonical shape for decode/resize/frame-sample stages.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [fake_decode_meta(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": pdf[payload_col].map(len).astype("int64"),
                    "content_md5": [m[0] for m in metas],
                    "fake_width": [m[1] for m in metas],
                    "fake_height": [m[2] for m in metas],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, FEATURE_SCHEMA)


def with_binary_payload(df: DataFrame, text_col: str) -> DataFrame:
    """Testdata adapter: treat the UTF-8 bytes of a text column as the
    opaque payload (the container has no real image/audio fixtures)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))
