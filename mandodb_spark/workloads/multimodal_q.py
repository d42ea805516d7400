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

QUERIES = {"mm_binary_features": mm_binary_features}
ORACLES = {"mm_binary_features": MM_BINARY_FEATURES_SQL}
