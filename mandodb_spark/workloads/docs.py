"""Declared queries over the ``documents`` table: text analysis + dedup.

Spark side routes through the operator library
(``operators.text`` / ``operators.dedup``); oracles are exact SQL mirrors
(md5-based hashing makes every stage engine-agnostic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, text
from .common import load

#: Jaccard threshold for the near-dup pipeline.
JACCARD_T = 0.4


def docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) + mean token length."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        text.token_count(t).alias("n_tokens"),
        text.distinct_token_count(t).alias("n_uniq"),
        F.round(text.avg_token_len(t), 4).alias("avg_tok_len"),
    )


DOCS_TOKEN_STATS_SQL = """
SELECT doc_id,
       CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(lower(text), ' '))) AS BIGINT) AS n_uniq,
       round(CAST(length(text) - (len(string_split(lower(text), ' ')) - 1) AS DOUBLE)
             / len(string_split(lower(text), ' ')), 4) AS avg_tok_len
FROM documents
"""


def docs_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, lexical diversity, composite score."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars"),
        F.round(text.stopword_ratio(t), 4).alias("stop_ratio"),
        F.round(text.uniq_ratio(t), 4).alias("uniq_ratio"),
        text.quality_score(t).alias("quality"),
    )


_STOPS = ", ".join(f"'{s}'" for s in text.STOPWORDS)
DOCS_QUALITY_SQL = f"""
WITH t AS (
    SELECT doc_id, length(text) AS n_chars, string_split(lower(text), ' ') AS toks
    FROM documents
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       round(CAST(len(list_filter(toks, x -> x IN ({_STOPS}))) AS DOUBLE) / len(toks), 4) AS stop_ratio,
       round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS uniq_ratio,
       round(0.6 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
           + 0.4 * (1.0 - CAST(len(list_filter(toks, x -> x IN ({_STOPS}))) AS DOUBLE) / len(toks)), 4) AS quality
FROM t
"""


def docs_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-based language-ID vote vs the labeled lang column."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        text.lang_guess(F.col("text")).alias("lang_guess"),
        (text.lang_guess(F.col("text")) == F.col("lang")).alias("is_match"),
    )


_MARKER_CASE = "CASE " + " ".join(
    f"WHEN lower(text) LIKE '{marker}' THEN '{lang}'" for lang, marker in text.LANG_MARKERS
) + " ELSE 'en' END"
DOCS_LANGID_SQL = f"""
SELECT doc_id, lang,
       {_MARKER_CASE} AS lang_guess,
       ({_MARKER_CASE}) = lang AS is_match
FROM documents
"""


def docs_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words fingerprint dedup groups (exact dedup via hash-groupBy)."""
    d = load(spark, sf_dir, "documents")
    return dedup.exact_dedup_groups(d, "doc_id", text.bow_fingerprint(F.col("text")))


DOCS_FINGERPRINT_DEDUP_SQL = """
SELECT md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fp,
       CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY 1
"""


def docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprint per document."""
    d = load(spark, sf_dir, "documents")
    return text.simhash16(d, "doc_id", "text")


DOCS_SIMHASH_SQL = text.simhash16_sql("documents", "doc_id", "text")


def docs_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash→LSH→Jaccard near-dup pairs (the full scale pipeline)."""
    d = load(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(d, "doc_id", "text", JACCARD_T)


def _minhash_sql() -> str:
    n, bands = dedup.N_HASHES, dedup.N_BANDS
    rpb = n // bands
    mins = ",\n           ".join(f"min(md5('{i}:' || sh)) AS h{i}" for i in range(n))
    band_selects = "\n    UNION ALL\n".join(
        "    SELECT doc_id, {b} AS band, md5({concat}) AS bh FROM sig".format(
            b=b, concat=" || '|' || ".join(f"h{b * rpb + r}" for r in range(rpb))
        )
        for b in range(bands)
    )
    return f"""
WITH sh AS (
    SELECT DISTINCT doc_id,
           substr(lower(text), CAST(p.range AS INTEGER), {dedup.SHINGLE_LEN}) AS sh
    FROM documents,
         unnest(range(1, greatest(length(text) - {dedup.SHINGLE_LEN - 1}, 1) + 1, {dedup.SHINGLE_STRIDE})) AS p(range)
), sizes AS (
    SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), sig AS (
    SELECT doc_id,
           {mins}
    FROM sh GROUP BY doc_id
), bands AS (
{band_selects}
), cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
), inter AS (
    SELECT c.id_a, c.id_b, count(*) AS n_inter
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.id_a
    JOIN sh sb ON sb.doc_id = c.id_b AND sb.sh = sa.sh
    GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       round(CAST(n_inter AS DOUBLE) / (na.n + nb.n - n_inter), 4) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.id_a
JOIN sizes nb ON nb.doc_id = i.id_b
WHERE round(CAST(n_inter AS DOUBLE) / (na.n + nb.n - n_inter), 4) >= {JACCARD_T}
"""


DOCS_MINHASH_PAIRS_SQL = _minhash_sql()

QUERIES = {
    "docs_token_stats": docs_token_stats,
    "docs_quality": docs_quality,
    "docs_langid": docs_langid,
    "docs_fingerprint_dedup": docs_fingerprint_dedup,
    "docs_simhash": docs_simhash,
    "docs_minhash_pairs": docs_minhash_pairs,
}

ORACLES = {
    "docs_token_stats": DOCS_TOKEN_STATS_SQL,
    "docs_quality": DOCS_QUALITY_SQL,
    "docs_langid": DOCS_LANGID_SQL,
    "docs_fingerprint_dedup": DOCS_FINGERPRINT_DEDUP_SQL,
    "docs_simhash": DOCS_SIMHASH_SQL,
    "docs_minhash_pairs": DOCS_MINHASH_PAIRS_SQL,
}
