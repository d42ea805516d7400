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
        F.round(text.punct_ratio(t), 4).alias("punct_ratio"),
        F.round(text.uniq_ratio(t), 4).alias("uniq_ratio"),
        text.quality_score(t).alias("quality"),
    )


_STOPS = ", ".join(f"'{s}'" for s in text.STOPWORDS)
DOCS_QUALITY_SQL = f"""
WITH t AS (
    SELECT doc_id, text AS raw, length(text) AS n_chars, string_split(lower(text), ' ') AS toks
    FROM documents
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       round(CAST(len(list_filter(toks, x -> x IN ({_STOPS}))) AS DOUBLE) / len(toks), 4) AS stop_ratio,
       round(CAST(length(regexp_replace(lower(raw), '[a-z0-9 ]', '', 'g')) AS DOUBLE) / length(raw), 4) AS punct_ratio,
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
    """16-bit SimHash fingerprint per document (Arrow-batched scale path;
    bit-identical to the expression form — see test_simhash_arrow_parity)."""
    d = load(spark, sf_dir, "documents")
    return text.simhash_arrow(d, "doc_id", "text", 16)


DOCS_SIMHASH_SQL = text.simhash16_sql("documents", "doc_id", "text")


def docs_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash→LSH→Jaccard near-dup pairs (the full scale pipeline)."""
    d = load(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(d, "doc_id", "text", JACCARD_T)


def _minhash_sql(source: str = "documents") -> str:
    n, bands = dedup.N_HASHES, dedup.N_BANDS
    rpb = n // bands
    # numeric 32-bit minhash slices (mirrors _minhash_cols: 8-hex-digit
    # window (i mod 4) of md5((i div 4) || ':' || sh) as BIGINT — numeric
    # to keep Spark's stage a HashAggregate, sliced so one md5 serves four
    # hash functions)
    mins = ",\n           ".join(
        f"min(CAST(concat('0x', substr(md5('{i // 4}:' || sh), {8 * (i % 4) + 1}, 8)) AS BIGINT)) AS h{i}"
        for i in range(n)
    )
    band_selects = "\n    UNION ALL\n".join(
        "    SELECT doc_id, {b} AS band, md5({concat}) AS bh FROM sig".format(
            b=b,
            concat=" || '|' || ".join(f"CAST(h{b * rpb + r} AS VARCHAR)" for r in range(rpb)),
        )
        for b in range(bands)
    )
    return f"""
WITH sh AS (
    SELECT DISTINCT doc_id,
           substr(lower(text), CAST(p.range AS INTEGER), {dedup.SHINGLE_LEN}) AS sh
    FROM {source},
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

def docs_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit simhash → 4×16-bit band LSH →
    Hamming ≤ 3 (Manku et al., WWW'07 parameterization).

    Lossless by pigeonhole (d ≤ bands-1 ⇒ ≥1 band equal) — the cheap
    complement to the MinHash pipeline: one fingerprint per doc instead of
    a shingle set, so the candidate join is over a 1-row-per-doc-per-band
    relation.  16-bit bands keep the random-collision floor at 4·2⁻¹⁶ ≈
    6e-5 (the round-2 32-bit/8-bit form floored at 1.6%, making candidates
    Θ(n²/256) regardless of true near-dup density — VERDICT r2)."""
    d = load(spark, sf_dir, "documents")
    sim = text.simhash_arrow(d, "doc_id", "text", 64)
    return dedup.simhash_band_pairs(sim, "doc_id", n_bits=64)


# Band extraction (simhash >> (b*16)) & 65535 is signed-safe in DuckDB too:
# arithmetic shift sign-extension is cut off by the mask (verified against
# Python's unsigned interpretation), and bit_count/xor operate on the raw
# two's-complement bits.
DOCS_SIMHASH_NEARDUP_SQL = f"""
WITH sim AS ({text.simhash16_sql("documents", "doc_id", "text", n_bits=64)}),
bands AS (
    SELECT doc_id, simhash, t.b AS band, (simhash >> (t.b * 16)) & 65535 AS bv
    FROM sim, unnest([0, 1, 2, 3]) AS t(b)
),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           a.simhash AS ha, b.simhash AS hb
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 3
"""

#: Quality gate for the corpus-prep pipeline.
PREP_MIN_QUALITY = 0.5


def docs_prep_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus prep: quality gate → exact dedup
    (keep lowest doc_id per bag-of-words fingerprint) → per-source corpus
    stats.  The composition every pretraining pipeline runs: filter is a
    pushed-down scan predicate, dedup is one hash-groupBy + semi-join,
    stats one final agg — three shuffles total regardless of corpus size."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    scored = d.select(
        "doc_id",
        "source",
        text.quality_score(t).alias("q"),
        text.token_count(t).alias("n_tokens"),
        text.bow_fingerprint(t).alias("fp"),
    ).filter(F.col("q") >= PREP_MIN_QUALITY)
    keepers = scored.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    kept = scored.join(keepers, ["fp", "doc_id"], "left_semi")
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.sum(F.col("q").cast("decimal(14,4)")).cast("double") / F.count(F.lit(1)), 4).alias("avg_quality"),
    )


_Q_EXPR = (
    "round(0.6 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))"
    f" + 0.4 * (1.0 - CAST(len(list_filter(toks, x -> x IN ({_STOPS}))) AS DOUBLE) / len(toks)), 4)"
)
DOCS_PREP_CORPUS_SQL = f"""
WITH scored AS (
    SELECT doc_id, source,
           {_Q_EXPR} AS q,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
    FROM (SELECT doc_id, source, string_split(lower(text), ' ') AS toks FROM documents)
    WHERE {_Q_EXPR} >= {PREP_MIN_QUALITY}
),
keepers AS (SELECT fp, min(doc_id) AS doc_id FROM scored GROUP BY fp)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(sum(CAST(q AS DECIMAL(14,4))) AS DOUBLE) / count(*), 4) AS avg_quality
FROM scored SEMI JOIN keepers USING (fp, doc_id)
GROUP BY source
"""


def docs_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 token bigrams — n-gram frequency analysis.

    Explode-first: positions explode narrowly and each bigram is a scalar
    ``element_at`` expression in whole-stage codegen (a ``transform``
    lambda is interpreted per element — same trade as
    ``repetition_stats``); the count agg has map-side partials and the
    top-k is TakeOrderedAndProject.  Ties break lexicographically."""
    d = load(spark, sf_dir, "documents")
    toks = text.tokens(F.col("text"))
    positions = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)
    ).otherwise(F.array().cast("array<int>"))
    return (
        d.select(toks.alias("__t"), F.explode(positions).alias("__p"))
        .select(
            F.expr("concat_ws(' ', element_at(__t, __p), element_at(__t, __p + 1))").alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(20)
    )


DOCS_TOP_BIGRAMS_SQL = """
WITH toks AS (SELECT string_split(lower(text), ' ') AS t FROM documents),
b AS (
    SELECT unnest(list_transform(range(1, len(t)),
                  i -> t[CAST(i AS INTEGER)] || ' ' || t[CAST(i AS INTEGER) + 1])) AS bigram
    FROM toks
)
SELECT bigram, CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 20
"""


def docs_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex tokenization (letters / digits / punct split) — the
    pre-tokenizer count every BPE vocab assumes; whole-stage codegen."""
    d = load(spark, sf_dir, "documents")
    toks = text.bpe_tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq_bpe"),
    )


DOCS_BPE_TOKEN_STATS_SQL = rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '{text.BPE_PATTERN}')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(list_distinct(regexp_extract_all(lower(text), '{text.BPE_PATTERN}'))) AS BIGINT) AS n_uniq_bpe
FROM documents
"""


def docs_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed rolling-hash fingerprints (MOSS scheme) — per-doc stats of
    the fingerprint set, Arrow-batched (one md5 per char position is the
    interpreted-lambda worst case; see winnow_fingerprint_stats)."""
    d = load(spark, sf_dir, "documents")
    return text.winnow_fingerprint_stats(d, "doc_id", "text")


DOCS_WINNOW_SQL = f"""
WITH t AS (SELECT doc_id, lower(text) AS lt FROM documents),
h AS (
    SELECT doc_id,
           list_transform(range(1, greatest(length(lt) - {text.WINNOW_K - 1}, 1) + 1),
               p -> CAST(concat('0x', substr(md5(substr(lt, CAST(p AS INTEGER), {text.WINNOW_K})), 1, 15)) AS BIGINT)) AS hs
    FROM t
),
m AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, greatest(len(hs) - {text.WINNOW_W - 1}, 1) + 1),
               i -> list_min(hs[CAST(i AS INTEGER):CAST(i + {text.WINNOW_W - 1} AS INTEGER)]))) AS fps
    FROM h
)
SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps,
       list_min(fps) AS min_fp, list_max(fps) AS max_fp
FROM m
"""


def docs_cms_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch frequency estimates vs exact counts for the top-10
    tokens.  The sketch compresses the whole token stream into d·w cells
    (mergeable by summation — the distributed/streaming frequency
    structure); estimates are provable upper bounds, asserted per row."""
    from ..operators import sketch

    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(text.tokens(F.col("text"))).alias("tok"))
    exact_top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), F.col("tok"))
        .limit(10)
    )
    cms = sketch.cms_build(toks, "tok")
    est = sketch.cms_estimate(cms, exact_top.select("tok"), "tok")
    return exact_top.join(est, "tok").select(
        "tok",
        "n_exact",
        F.col("est_count").cast("long").alias("est_count"),
        (F.col("est_count") >= F.col("n_exact")).alias("is_upper_bound"),
    )


def _cms_sql() -> str:
    from ..operators.sketch import CMS_DEPTH, CMS_WIDTH

    rows = ", ".join(str(r) for r in range(CMS_DEPTH))
    bucket = (
        "CAST(CAST(concat('0x', substr(md5(CAST({r} AS VARCHAR) || ':' || {k}), 1, 8)) AS BIGINT) "
        f"% {CMS_WIDTH} AS BIGINT)"
    )
    return f"""
WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
exact_top AS (
    SELECT tok, CAST(count(*) AS BIGINT) AS n_exact
    FROM toks GROUP BY tok ORDER BY n_exact DESC, tok LIMIT 10
),
cells AS (
    SELECT r.r AS row, {bucket.format(r="r.r", k="tok")} AS bucket, count(*) AS n
    FROM toks CROSS JOIN unnest([{rows}]) r(r)
    GROUP BY 1, 2
),
est AS (
    SELECT t.tok, min(coalesce(c.n, 0)) AS est_count
    FROM exact_top t
    CROSS JOIN unnest([{rows}]) r(r)
    LEFT JOIN cells c ON c.row = r.r AND c.bucket = {bucket.format(r="r.r", k="t.tok")}
    GROUP BY t.tok
)
SELECT t.tok, t.n_exact, CAST(e.est_count AS BIGINT) AS est_count,
       e.est_count >= t.n_exact AS is_upper_bound
FROM exact_top t JOIN est e ON e.tok = t.tok
"""


DOCS_CMS_SQL = _cms_sql()


#: Stratified-sampling rates: the classic pretraining-mix rebalance —
#: downsample the dominant language, keep the rest.
SAMPLE_RATES = {"en": 0.3, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 0.8}


def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-stratified corpus sample by language (the
    training-data mix operator) — map-side predicate, zero shuffle, and
    exactly reproducible so the DuckDB oracle verifies the sample row-set
    itself (impossible for rand()-based sampling)."""
    from ..operators import sampling

    d = load(spark, sf_dir, "documents")
    return sampling.stratified_sample(d, "doc_id", "lang", SAMPLE_RATES).select(
        "doc_id", "lang", "source"
    )


def _stratified_sql() -> str:
    from ..operators.sampling import hash_unit_sql

    rate = "CASE " + " ".join(
        f"WHEN lang = '{v}' THEN {r}" for v, r in sorted(SAMPLE_RATES.items())
    ) + " ELSE 0.0 END"
    return f"""
SELECT doc_id, lang, source
FROM documents
WHERE {hash_unit_sql('doc_id')} < {rate}
"""


DOCS_STRATIFIED_SAMPLE_SQL = _stratified_sql()


def docs_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (keyword extraction over the
    corpus): one tf shuffle, broadcast vocabulary dim, bounded window."""
    d = load(spark, sf_dir, "documents")
    return text.tfidf_top_terms(d, "doc_id", "text", k=3)


DOCS_TFIDF_SQL = text.tfidf_top_terms_sql("documents", "doc_id", "text", k=3)


def docs_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document (dup-word
    fraction, top-bigram fraction)."""
    d = load(spark, sf_dir, "documents")
    return text.repetition_stats(d, "doc_id", "text")


DOCS_REPETITION_SQL = text.repetition_stats_sql("documents", "doc_id", "text")


#: Benchmark set for the contamination check: a bounded held-out slice.
CONTAM_BENCH_MAX_ID = 50
CONTAM_N = 5
CONTAM_T = 0.2


def docs_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test n-gram overlap: fraction of each training doc's distinct
    5-grams that appear in the benchmark slice (doc_id < 50) — broadcast
    benchmark set, one per-doc regroup shuffle."""
    from ..operators import dedup as _dedup

    d = load(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") < CONTAM_BENCH_MAX_ID)
    ev = d.filter(F.col("doc_id") >= CONTAM_BENCH_MAX_ID)
    return _dedup.ngram_contamination(ev, bench, "doc_id", "text", n=CONTAM_N, threshold=CONTAM_T)


DOCS_CONTAMINATION_SQL = f"""
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
grams AS (
    SELECT doc_id,
           list_distinct(CASE WHEN len(toks) >= {CONTAM_N}
                THEN list_transform(range(1, len(toks) - {CONTAM_N} + 2),
                                    i -> array_to_string(list_slice(toks, i, i + {CONTAM_N} - 1), ' '))
                ELSE [] END) AS ngs
    FROM t
),
bench AS (SELECT DISTINCT unnest(ngs) AS ng FROM grams WHERE doc_id < {CONTAM_BENCH_MAX_ID}),
ev AS (SELECT doc_id, unnest(ngs) AS ng FROM grams WHERE doc_id >= {CONTAM_BENCH_MAX_ID}),
hits AS (
    SELECT ev.doc_id,
           count(*) AS n_ngrams,
           sum(CASE WHEN bench.ng IS NOT NULL THEN 1 ELSE 0 END) AS n_matched
    FROM ev LEFT JOIN bench ON ev.ng = bench.ng
    GROUP BY ev.doc_id
)
SELECT doc_id, CAST(n_ngrams AS BIGINT) AS n_ngrams, CAST(n_matched AS BIGINT) AS n_matched,
       round(CAST(n_matched AS DOUBLE) / n_ngrams, 4) AS contamination_frac,
       (CAST(n_matched AS DOUBLE) / n_ngrams >= {CONTAM_T}) AS contaminated
FROM hits
"""


#: Curation-pipeline gates (docs_curation_pipeline).
CURATE_MIN_QUALITY = 0.5
CURATE_MAX_TOP_BIGRAM = 0.20
CURATE_RATES = {"en": 0.5, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 1.0}


def docs_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-curation composition a pretraining pipeline runs:
    quality gate → repetition gate (top-bigram fraction) → exact dedup
    (bag-of-words, keep lowest id) → language-stratified deterministic
    downsample → per-(lang, source) corpus stats.

    Scale shape: gates are scan-side predicates (quality) plus one
    (doc, bigram) shuffle (repetition); dedup one hash-groupBy + semi-join;
    the sample is a pure hash predicate (zero shuffle, reproducible —
    operators/sampling.py); stats one final agg.  Four well-keyed shuffles
    end-to-end regardless of corpus size.
    """
    from ..operators import sampling

    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        text.quality_score(t).alias("q"),
        text.token_count(t).alias("n_tokens"),
        text.bow_fingerprint(t).alias("fp"),
    ).filter(F.col("q") >= CURATE_MIN_QUALITY)
    rep = text.repetition_stats(d, "doc_id", "text").select("doc_id", "top_bigram_frac")
    gated = scored.join(rep, "doc_id").filter(F.col("top_bigram_frac") <= CURATE_MAX_TOP_BIGRAM)
    keepers = gated.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    kept = gated.join(keepers, ["fp", "doc_id"], "left_semi")
    sampled = sampling.stratified_sample(kept, "doc_id", "lang", CURATE_RATES)
    return sampled.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.sum(F.col("q").cast("decimal(14,4)")).cast("double") / F.count(F.lit(1)), 4).alias("avg_quality"),
    )


def _curation_sql() -> str:
    from ..operators.sampling import hash_unit_sql

    rep_sql = text.repetition_stats_sql("documents", "doc_id", "text")
    rate = "CASE " + " ".join(
        f"WHEN lang = '{v}' THEN {r}" for v, r in sorted(CURATE_RATES.items())
    ) + " ELSE 0.0 END"
    return f"""
WITH rep AS ({rep_sql}),
scored AS (
    SELECT doc_id, lang, source,
           {_Q_EXPR} AS q,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
    FROM (SELECT doc_id, lang, source, string_split(lower(text), ' ') AS toks FROM documents)
    WHERE {_Q_EXPR} >= {CURATE_MIN_QUALITY}
),
gated AS (
    SELECT s.* FROM scored s JOIN rep r USING (doc_id)
    WHERE r.top_bigram_frac <= {CURATE_MAX_TOP_BIGRAM}
),
keepers AS (SELECT fp, min(doc_id) AS doc_id FROM gated GROUP BY fp),
kept AS (SELECT * FROM gated SEMI JOIN keepers USING (fp, doc_id)),
sampled AS (SELECT * FROM kept WHERE {hash_unit_sql('doc_id')} < {rate})
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(sum(CAST(q AS DECIMAL(14,4))) AS DOUBLE) / count(*), 4) AS avg_quality
FROM sampled
GROUP BY lang, source
"""


DOCS_CURATION_SQL = _curation_sql()


QUERIES = {
    "docs_token_stats": docs_token_stats,
    "docs_top_bigrams": docs_top_bigrams,
    "docs_bpe_token_stats": docs_bpe_token_stats,
    "docs_winnow_fingerprints": docs_winnow_fingerprints,
    "docs_cms_token_freq": docs_cms_token_freq,
    "docs_quality": docs_quality,
    "docs_langid": docs_langid,
    "docs_fingerprint_dedup": docs_fingerprint_dedup,
    "docs_simhash": docs_simhash,
    "docs_minhash_pairs": docs_minhash_pairs,
    "docs_simhash_neardup": docs_simhash_neardup,
    "docs_prep_corpus": docs_prep_corpus,
    "docs_stratified_sample": docs_stratified_sample,
    "docs_tfidf_top_terms": docs_tfidf_top_terms,
    "docs_repetition": docs_repetition,
    "docs_contamination": docs_contamination,
    "docs_curation_pipeline": docs_curation_pipeline,
}

ORACLES = {
    "docs_curation_pipeline": DOCS_CURATION_SQL,
    "docs_stratified_sample": DOCS_STRATIFIED_SAMPLE_SQL,
    "docs_tfidf_top_terms": DOCS_TFIDF_SQL,
    "docs_repetition": DOCS_REPETITION_SQL,
    "docs_contamination": DOCS_CONTAMINATION_SQL,
    "docs_simhash_neardup": DOCS_SIMHASH_NEARDUP_SQL,
    "docs_prep_corpus": DOCS_PREP_CORPUS_SQL,
    "docs_top_bigrams": DOCS_TOP_BIGRAMS_SQL,
    "docs_bpe_token_stats": DOCS_BPE_TOKEN_STATS_SQL,
    "docs_winnow_fingerprints": DOCS_WINNOW_SQL,
    "docs_cms_token_freq": DOCS_CMS_SQL,
    "docs_token_stats": DOCS_TOKEN_STATS_SQL,
    "docs_quality": DOCS_QUALITY_SQL,
    "docs_langid": DOCS_LANGID_SQL,
    "docs_fingerprint_dedup": DOCS_FINGERPRINT_DEDUP_SQL,
    "docs_simhash": DOCS_SIMHASH_SQL,
    "docs_minhash_pairs": DOCS_MINHASH_PAIRS_SQL,
}


def docs_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution — the cheap
    perplexity proxy for curation filtering (low = boilerplate)."""
    d = load(spark, sf_dir, "documents")
    return text.token_entropy(d, "doc_id", "text")


DOCS_TOKEN_ENTROPY_SQL = text.token_entropy_sql("documents", "doc_id", "text")

QUERIES["docs_token_entropy"] = docs_token_entropy
ORACLES["docs_token_entropy"] = DOCS_TOKEN_ENTROPY_SQL


def docs_unigram_ce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram-LM cross-entropy per document — the perplexity
    quality gate (CCNet-style), reduced to its SQL-oracle-checkable
    unigram core (see operators.text.unigram_cross_entropy for the
    three-shuffle scale shape)."""
    return text.unigram_cross_entropy(load(spark, sf_dir, "documents"), "doc_id", "text")


DOCS_UNIGRAM_CE_SQL = text.unigram_cross_entropy_sql("documents", "doc_id", "text")

QUERIES["docs_unigram_ce"] = docs_unigram_ce
ORACLES["docs_unigram_ce"] = DOCS_UNIGRAM_CE_SQL

#: Vocabulary size for the tokenizer-vocab query.
VOCAB_SIZE = 200


def docs_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary: top-VOCAB_SIZE corpus tokens with contiguous
    frequency-ranked ids (the table BPE merge training seeds from); plans
    as one count shuffle + TakeOrderedAndProject, never a global sort."""
    return text.vocab_table(load(spark, sf_dir, "documents"), "doc_id", "text", VOCAB_SIZE)


DOCS_VOCAB_SQL = text.vocab_table_sql("documents", "text", VOCAB_SIZE)

QUERIES["docs_vocab"] = docs_vocab
ORACLES["docs_vocab"] = DOCS_VOCAB_SQL


def docs_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters over the MinHash pair list: one row
    per cluster with the kept doc (min id) and member count — the
    keep/drop table a dedup pipeline actually applies (A~B plus B~C must
    collapse to one kept doc even when A~C was never a candidate).

    :func:`operators.dedup.connected_components` checkpoints the edge
    table internally (so the shingle→minhash→verify lineage runs exactly
    once, not once per convergence round) — no scratch materialization
    needed here."""
    pairs = dedup.minhash_lsh_pairs(load(spark, sf_dir, "documents"), "doc_id", "text", JACCARD_T)
    return dedup.neardup_clusters(pairs)


DOCS_NEARDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS ({_minhash_sql()}),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION
    SELECT id_b AS src, id_a AS dst FROM pairs
),
reach AS (
    SELECT src, src AS dst FROM (SELECT DISTINCT src FROM edges)
    UNION
    SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
cc AS (SELECT src AS id, min(dst) AS cluster_id FROM reach GROUP BY src)
SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(min(id) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_docs
FROM cc GROUP BY cluster_id
"""

QUERIES["docs_neardup_clusters"] = docs_neardup_clusters
ORACLES["docs_neardup_clusters"] = DOCS_NEARDUP_CLUSTERS_SQL


def docs_curation_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline WITH the near-dup stage — the complete
    pretraining-data composition: quality gate → repetition gate → exact
    dedup → MinHash near-dup CLUSTER drop (transitive: only each
    cluster's min-id doc survives) → language-stratified deterministic
    sample → per-(lang, source) stats.

    Near-dup pairs are computed over the exact-dedup survivors only (the
    gates prune before the expensive stage — pipeline ordering is the
    optimization) and collapsed with
    :func:`operators.dedup.connected_components`, which checkpoints the
    edge table internally.

    The gated-survivor table ``kept`` is localCheckpointed: it is
    referenced by BOTH the near-dup branch (via the kept_docs semi-join,
    which the CC edge checkpoint materializes eagerly) and the final
    anti-join/sample branch, and without truncation each branch re-runs
    the full quality+repetition+dedup gate chain — measured 28% of the
    query at sf0.1.  Like CC's label table, it is one small per-doc row
    per call and follows the same retained-materialization pattern."""
    from ..operators import sampling

    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        text.quality_score(t).alias("q"),
        text.token_count(t).alias("n_tokens"),
        text.bow_fingerprint(t).alias("fp"),
    ).filter(F.col("q") >= CURATE_MIN_QUALITY)
    rep = text.repetition_stats(d, "doc_id", "text").select("doc_id", "top_bigram_frac")
    gated = scored.join(rep, "doc_id").filter(F.col("top_bigram_frac") <= CURATE_MAX_TOP_BIGRAM)
    keepers = gated.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    kept = gated.join(keepers, ["fp", "doc_id"], "left_semi").localCheckpoint()

    kept_docs = d.select("doc_id", "text").join(kept.select("doc_id"), "doc_id", "left_semi")
    pairs = dedup.minhash_lsh_pairs(kept_docs, "doc_id", "text", JACCARD_T)
    cc = dedup.connected_components(pairs)
    drop = cc.filter(F.col("id") != F.col("cluster_id")).select(F.col("id").alias("doc_id"))
    final = kept.join(drop, "doc_id", "left_anti")

    sampled = sampling.stratified_sample(final, "doc_id", "lang", CURATE_RATES)
    return sampled.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.sum(F.col("q").cast("decimal(14,4)")).cast("double") / F.count(F.lit(1)), 4).alias("avg_quality"),
    )


def _curation_full_sql() -> str:
    from ..operators.sampling import hash_unit_sql

    rep_sql = text.repetition_stats_sql("documents", "doc_id", "text")
    rate = "CASE " + " ".join(
        f"WHEN lang = '{v}' THEN {r}" for v, r in sorted(CURATE_RATES.items())
    ) + " ELSE 0.0 END"
    return f"""
WITH RECURSIVE rep AS ({rep_sql}),
scored AS (
    SELECT doc_id, lang, source,
           {_Q_EXPR} AS q,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
    FROM (SELECT doc_id, lang, source, string_split(lower(text), ' ') AS toks FROM documents)
    WHERE {_Q_EXPR} >= {CURATE_MIN_QUALITY}
),
gated AS (
    SELECT s.* FROM scored s JOIN rep r USING (doc_id)
    WHERE r.top_bigram_frac <= {CURATE_MAX_TOP_BIGRAM}
),
keepers AS (SELECT fp, min(doc_id) AS doc_id FROM gated GROUP BY fp),
kept AS (SELECT * FROM gated SEMI JOIN keepers USING (fp, doc_id)),
kept_docs AS (SELECT d.doc_id, d.text FROM documents d SEMI JOIN kept USING (doc_id)),
nd_pairs AS ({_minhash_sql("kept_docs")}),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM nd_pairs
    UNION
    SELECT id_b AS src, id_a AS dst FROM nd_pairs
),
reach AS (
    SELECT src, src AS dst FROM (SELECT DISTINCT src FROM edges)
    UNION
    SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
cc AS (SELECT src AS id, min(dst) AS cluster_id FROM reach GROUP BY src),
nd_drop AS (SELECT id AS doc_id FROM cc WHERE id <> cluster_id),
final AS (SELECT * FROM kept ANTI JOIN nd_drop USING (doc_id)),
sampled AS (SELECT * FROM final WHERE {hash_unit_sql('doc_id')} < {rate})
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(sum(CAST(q AS DECIMAL(14,4))) AS DOUBLE) / count(*), 4) AS avg_quality
FROM sampled
GROUP BY lang, source
"""


DOCS_CURATION_FULL_SQL = _curation_full_sql()

QUERIES["docs_curation_full"] = docs_curation_full
ORACLES["docs_curation_full"] = DOCS_CURATION_FULL_SQL


# ---------------------------------------------------------------------------
# Sequence packing (round 5): concat-and-chunk packing plan for training.
# ---------------------------------------------------------------------------

#: Training-sequence length (tokens) and shard count for the packing plan.
PACK_SEQ_LEN = 1024
PACK_GROUPS = 8


def docs_pack_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence-packing plan: every document gets a
    deterministic (shard, sequence, offset) slot for ``PACK_SEQ_LEN``-token
    training sequences.  One hash-partition shuffle + per-shard sort —
    the shard split is what keeps this parallel at 100 TB (no global
    ordering anywhere; see operators/packing.py)."""
    from ..operators import packing

    d = load(spark, sf_dir, "documents")
    docs = d.select("doc_id", text.token_count(F.col("text")).alias("n_tokens"))
    return packing.pack_plan(docs, "doc_id", "n_tokens", PACK_SEQ_LEN, PACK_GROUPS)


def _pack_plan_sql() -> str:
    from ..operators.packing import pack_plan_sql

    return pack_plan_sql(
        "(SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tokens FROM documents)",
        "doc_id",
        "n_tokens",
        PACK_SEQ_LEN,
        PACK_GROUPS,
    )


DOCS_PACK_PLAN_SQL = _pack_plan_sql()

QUERIES["docs_pack_plan"] = docs_pack_plan
ORACLES["docs_pack_plan"] = DOCS_PACK_PLAN_SQL


# ---------------------------------------------------------------------------
# Token-budget mixture plan (round 5): DoReMi-style domain reweighting.
# ---------------------------------------------------------------------------

#: Mixture weights: upweight two "high-quality domains", everything else 1.
MIX_WEIGHTS = {"src0": 4.0, "src1": 2.0, "src2": 2.0}
MIX_DEFAULT_W = 1.0
#: Token budget as a fraction of the observed corpus (scale-invariant).
MIX_BUDGET_FRAC = 0.5


def docs_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture plan + realized sample: per source, the computed
    keep rate against a 50%-of-corpus token budget (DoReMi-style weight
    shares), plus the documents/tokens the deterministic hash sample
    actually kept.  One tiny strata aggregate, a broadcast rates join,
    and a scan-side keep predicate — the corpus itself never shuffles."""
    from ..operators import sampling

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", text.token_count(F.col("text")).alias("n_tokens")
    )
    rates = sampling.mixture_rates(
        d, "source", "n_tokens", MIX_WEIGHTS, MIX_DEFAULT_W,
        budget_frac=MIX_BUDGET_FRAC,
    )
    # The rates frame is O(strata) rows but its subtree is a full corpus
    # aggregate; it is referenced twice below (rates output + keep filter),
    # and plan-identical subtrees don't reliably hit exchange reuse.  An
    # eager localCheckpoint pins the 20-row result so the corpus is
    # scanned exactly twice end-to-end (totals pass + keep pass) instead
    # of three times.
    rates = rates.localCheckpoint(eager=True)
    kept = (
        sampling.mixture_sample(
            d, "doc_id", "source", "n_tokens", MIX_WEIGHTS, MIX_DEFAULT_W,
            rates=rates,
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("n_tokens").alias("kept_tokens"),
        )
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "tok_total",
            F.round("rate", 6).alias("rate"),
            F.coalesce("kept_docs", F.lit(0)).alias("kept_docs"),
            F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
        )
    )


def _mixture_plan_sql() -> str:
    from ..operators.sampling import hash_unit_sql, mixture_rates_sql

    rates = mixture_rates_sql(
        "(SELECT doc_id, source, len(string_split(lower(text), ' ')) AS n_tokens"
        " FROM documents)",
        "source",
        "n_tokens",
        MIX_WEIGHTS,
        MIX_DEFAULT_W,
        budget_frac=MIX_BUDGET_FRAC,
    )
    return f"""
WITH d AS (SELECT doc_id, source,
                  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
           FROM documents),
rates AS ({rates}),
kept AS (
    SELECT d.source, CAST(count(*) AS BIGINT) AS kept_docs,
           CAST(sum(d.n_tokens) AS BIGINT) AS kept_tokens
    FROM d JOIN rates r ON d.source = r.source
    WHERE {hash_unit_sql('d.doc_id', 'mix')} < r.rate
    GROUP BY d.source
)
SELECT r.source, r.tok_total, round(r.rate, 6) AS rate,
       CAST(coalesce(k.kept_docs, 0) AS BIGINT) AS kept_docs,
       CAST(coalesce(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
FROM rates r LEFT JOIN kept k ON r.source = k.source
"""


DOCS_MIXTURE_PLAN_SQL = _mixture_plan_sql()

QUERIES["docs_mixture_plan"] = docs_mixture_plan
ORACLES["docs_mixture_plan"] = DOCS_MIXTURE_PLAN_SQL


# ---------------------------------------------------------------------------
# Flagship training-shards composition (round 5): the corpus → trainer path.
# ---------------------------------------------------------------------------


def docs_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus→training-shards composition: quality gate →
    exact dedup (keep lowest id per bag-of-words fingerprint) →
    token-budget mixture sample (DoReMi-style source weights, 50%-of-corpus
    budget) → sequence-packing plan → per-shard summary (docs, tokens,
    sequences, boundary-straddlers, fill fraction).

    This is the full "curated corpus to data-loader shards" path a
    pretraining pipeline runs nightly.  Scale shape: gate is scan-side;
    dedup one hash-groupBy + semi-join; mixture one tiny agg + broadcast
    rates + scan-side keep; packing one hash-partition shuffle + per-shard
    sort; summary one 8-key agg — every shuffle is well-keyed and none is
    corpus². 
    """
    from ..operators import packing, sampling

    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    scored = d.select(
        "doc_id",
        "source",
        text.quality_score(t).alias("q"),
        text.token_count(t).alias("n_tokens"),
        text.bow_fingerprint(t).alias("fp"),
    ).filter(F.col("q") >= CURATE_MIN_QUALITY)
    keepers = scored.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    kept = scored.join(keepers, ["fp", "doc_id"], "left_semi")
    rates = sampling.mixture_rates(
        kept, "source", "n_tokens", MIX_WEIGHTS, MIX_DEFAULT_W,
        budget_frac=MIX_BUDGET_FRAC,
    ).localCheckpoint(eager=True)  # tiny; pins the totals pass (see docs_mixture_plan)
    sampled = sampling.mixture_sample(
        kept, "doc_id", "source", "n_tokens", MIX_WEIGHTS, MIX_DEFAULT_W,
        rates=rates,
    )
    plan = packing.pack_plan(
        sampled.select("doc_id", "n_tokens"), "doc_id", "n_tokens",
        PACK_SEQ_LEN, PACK_GROUPS,
    )
    # n_seqs must count the sequences the shard's full token stream fills
    # (ceil of the sum), NOT max(seq)+1 — a last document straddling the
    # final boundary starts in an earlier sequence but spills into more,
    # and max(seq)+1 would undercount them (fill_frac could exceed 1).
    n_seqs = F.expr(f"(sum(n_tokens) + {PACK_SEQ_LEN - 1}) DIV {PACK_SEQ_LEN}")
    return plan.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        n_seqs.alias("n_seqs"),
        F.sum(F.col("crosses").cast("long")).alias("n_straddlers"),
        F.round(
            F.sum("n_tokens").cast("double")
            / (n_seqs * PACK_SEQ_LEN).cast("double"),
            4,
        ).alias("fill_frac"),
    )


def _training_shards_sql() -> str:
    from ..operators.packing import pack_plan_sql
    from ..operators.sampling import hash_unit_sql, mixture_rates_sql

    rates = mixture_rates_sql(
        "kept", "source", "n_tokens", MIX_WEIGHTS, MIX_DEFAULT_W,
        budget_frac=MIX_BUDGET_FRAC,
    )
    pack = pack_plan_sql("sampled", "doc_id", "n_tokens", PACK_SEQ_LEN, PACK_GROUPS)
    return f"""
WITH scored AS (
    SELECT doc_id, source,
           {_Q_EXPR} AS q,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
    FROM (SELECT doc_id, source, string_split(lower(text), ' ') AS toks FROM documents)
    WHERE {_Q_EXPR} >= {CURATE_MIN_QUALITY}
),
keepers AS (SELECT fp, min(doc_id) AS doc_id FROM scored GROUP BY fp),
kept AS (SELECT * FROM scored SEMI JOIN keepers USING (fp, doc_id)),
rates AS ({rates}),
sampled AS (
    SELECT k.doc_id, k.n_tokens
    FROM kept k JOIN rates r ON k.source = r.source
    WHERE {hash_unit_sql('k.doc_id', 'mix')} < r.rate
),
plan AS ({pack})
SELECT grp, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST((sum(n_tokens) + {PACK_SEQ_LEN - 1}) // {PACK_SEQ_LEN} AS BIGINT) AS n_seqs,
       CAST(sum(CAST(crosses AS BIGINT)) AS BIGINT) AS n_straddlers,
       round(CAST(sum(n_tokens) AS DOUBLE)
             / CAST(((sum(n_tokens) + {PACK_SEQ_LEN - 1}) // {PACK_SEQ_LEN}) * {PACK_SEQ_LEN} AS DOUBLE), 4) AS fill_frac
FROM plan
GROUP BY grp
"""


DOCS_TRAINING_SHARDS_SQL = _training_shards_sql()

QUERIES["docs_training_shards"] = docs_training_shards
ORACLES["docs_training_shards"] = DOCS_TRAINING_SHARDS_SQL


def docs_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 64-token chunks (16-token overlap) per document — the
    RAG/embedding-index splitting step; shuffle-free narrow explode."""
    d = load(spark, sf_dir, "documents")
    return text.chunk_spans(d, "doc_id", "text", 64, 16)


DOCS_CHUNK_PLAN_SQL = text.chunk_spans_sql("documents", "doc_id", "text", 64, 16)

QUERIES["docs_chunk_plan"] = docs_chunk_plan
ORACLES["docs_chunk_plan"] = DOCS_CHUNK_PLAN_SQL


def docs_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsampling mixture: a full-corpus-sized budget redistributed by the
    mixture weights pushes upweighted sources past rate 1 — their docs
    repeat for multiple epochs (floor(rate) full passes + a deterministic
    fractional subset).  Per source: uncapped rate, emitted doc-instances,
    emitted tokens.  Replication is a narrow explode — no extra shuffle."""
    from ..operators import sampling

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", text.token_count(F.col("text")).alias("n_tokens")
    )
    rates = sampling.mixture_rates(
        d, "source", "n_tokens", MIX_WEIGHTS, MIX_DEFAULT_W,
        budget_frac=1.0, cap=False,
    ).localCheckpoint(eager=True)  # one totals pass, shared by emit + report
    emitted = sampling.mixture_epochs(
        d, "doc_id", "source", "n_tokens", MIX_WEIGHTS, MIX_DEFAULT_W,
        rates=rates,
    )
    agg = emitted.groupBy("source").agg(
        F.count(F.lit(1)).alias("emitted_docs"),
        F.sum("n_tokens").alias("emitted_tokens"),
    )
    return rates.join(agg, "source", "left").select(
        "source",
        F.round("rate", 6).alias("rate"),
        F.coalesce("emitted_docs", F.lit(0)).alias("emitted_docs"),
        F.coalesce("emitted_tokens", F.lit(0)).alias("emitted_tokens"),
    )


def _mixture_epochs_sql() -> str:
    from ..operators.sampling import hash_unit_sql, mixture_rates_sql

    rates = mixture_rates_sql(
        "(SELECT doc_id, source, len(string_split(lower(text), ' ')) AS n_tokens"
        " FROM documents)",
        "source",
        "n_tokens",
        MIX_WEIGHTS,
        MIX_DEFAULT_W,
        budget_frac=1.0,
        cap=False,
    )
    h = hash_unit_sql("d.doc_id", "mix.epoch")
    return f"""
WITH d AS (SELECT doc_id, source,
                  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
           FROM documents),
rates AS ({rates}),
copies AS (
    SELECT d.source, d.n_tokens,
           CAST(floor(r.rate) AS BIGINT)
             + CASE WHEN {h} < r.rate - floor(r.rate) THEN 1 ELSE 0 END AS n_copies
    FROM d JOIN rates r ON d.source = r.source
),
agg AS (
    SELECT source, CAST(sum(n_copies) AS BIGINT) AS emitted_docs,
           CAST(sum(n_copies * n_tokens) AS BIGINT) AS emitted_tokens
    FROM copies GROUP BY source
)
SELECT r.source, round(r.rate, 6) AS rate,
       CAST(coalesce(a.emitted_docs, 0) AS BIGINT) AS emitted_docs,
       CAST(coalesce(a.emitted_tokens, 0) AS BIGINT) AS emitted_tokens
FROM rates r LEFT JOIN agg a ON r.source = a.source
"""


DOCS_MIXTURE_EPOCHS_SQL = _mixture_epochs_sql()

QUERIES["docs_mixture_epochs"] = docs_mixture_epochs
ORACLES["docs_mixture_epochs"] = DOCS_MIXTURE_EPOCHS_SQL


#: MAD multiplier for the robust outlier gate (≈3σ under normality:
#: 3 / 1.4826 ≈ 2.0235; kept as a plain literal both engines share).
MAD_K = 3.0


def docs_quality_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-source outlier flags on document quality: median/MAD
    (median absolute deviation) instead of mean/stddev, so a burst of
    junk documents can't drag the gate's own center (the failure mode of
    z-score gates on contaminated corpora).  Two tiny per-source
    aggregates (exact percentile over each source group) + a broadcast
    join back — the corpus shuffles once per median pass.
    """
    d = load(spark, sf_dir, "documents")
    scored = d.select("doc_id", "source", text.quality_score(F.col("text")).alias("q"))
    med = scored.groupBy("source").agg(
        F.expr("percentile(q, 0.5)").alias("med")
    )
    dev = (
        scored.join(F.broadcast(med), "source")
        .withColumn("adev", F.abs(F.col("q") - F.col("med")))
    )
    mad = dev.groupBy("source").agg(
        F.expr("percentile(adev, 0.5)").alias("mad"),
        F.any_value("med").alias("med"),
    )
    return (
        scored.join(F.broadcast(mad), "source")
        .select(
            "doc_id",
            "source",
            "q",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            (F.abs(F.col("q") - F.col("med")) > MAD_K * F.col("mad")).alias("is_outlier"),
        )
    )


DOCS_QUALITY_OUTLIERS_SQL = f"""
WITH scored AS (
    SELECT doc_id, source, {_Q_EXPR} AS q
    FROM (SELECT doc_id, source, text AS raw, length(text) AS n_chars,
                 string_split(lower(text), ' ') AS toks FROM documents)
),
med AS (
    SELECT source, quantile_cont(q, 0.5) AS med FROM scored GROUP BY source
),
mad AS (
    SELECT s.source, quantile_cont(abs(s.q - m.med), 0.5) AS mad, any_value(m.med) AS med
    FROM scored s JOIN med m USING (source)
    GROUP BY s.source
)
SELECT s.doc_id, s.source, s.q,
       round(m.med, 4) AS med, round(m.mad, 4) AS mad,
       abs(s.q - m.med) > {MAD_K} * m.mad AS is_outlier
FROM scored s JOIN mad m USING (source)
"""

QUERIES["docs_quality_outliers"] = docs_quality_outliers
ORACLES["docs_quality_outliers"] = DOCS_QUALITY_OUTLIERS_SQL


#: Fraction of the corpus (by id order) that plays "today's batch".
INCR_NEW_FRAC = 0.2


def docs_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup: the daily-batch shape — only pairs touching a
    NEW document reach the Jaccard verify stage; old-old pairs were found
    when those docs were indexed.  The batch is the top 20% of doc ids,
    computed from the data so the shape holds at every scale factor
    (a fixed id cutoff was 92% of the corpus at sf0.1 — round-5 review)."""
    d = load(spark, sf_dir, "documents")
    cut = d.agg(
        F.floor((F.max("doc_id") + 1) * (1 - INCR_NEW_FRAC)).alias("__cut")
    )
    new = (
        d.select("doc_id")
        .crossJoin(F.broadcast(cut))
        .filter(F.col("doc_id") >= F.col("__cut"))
        .select("doc_id")
    )
    return dedup.minhash_lsh_pairs(d, "doc_id", "text", JACCARD_T, new_ids=new)


DOCS_INCREMENTAL_NEARDUP_SQL = f"""
SELECT * FROM ({_minhash_sql()})
WHERE id_a >= (SELECT CAST(floor((max(doc_id) + 1) * {1 - INCR_NEW_FRAC}) AS BIGINT) FROM documents)
   OR id_b >= (SELECT CAST(floor((max(doc_id) + 1) * {1 - INCR_NEW_FRAC}) AS BIGINT) FROM documents)
"""

QUERIES["docs_incremental_neardup"] = docs_incremental_neardup
ORACLES["docs_incremental_neardup"] = DOCS_INCREMENTAL_NEARDUP_SQL


def docs_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit: per-document hit counts for email/phone/IPv4
    shapes plus the redacted text's fingerprint (proving the replacement
    itself, not just the counts) — chained JVM regexp_replace, scan-side."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    counts = text.pii_counts(t)
    return d.select(
        "doc_id",
        counts["email"].cast("long").alias("n_email"),
        counts["phone"].cast("long").alias("n_phone"),
        counts["ipv4"].cast("long").alias("n_ipv4"),
        F.md5(text.redact_pii(t)).alias("redacted_md5"),
    )


def _pii_sql() -> str:
    from ..operators.text import PII_PATTERNS

    email, phone, ipv4 = (PII_PATTERNS[k] for k in ("email", "phone", "ipv4"))
    redacted = "text"
    for name, pat in PII_PATTERNS.items():
        redacted = f"regexp_replace({redacted}, '{pat}', '<{name.upper()}>', 'g')"
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, '{phone}')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(text, '{ipv4}')) AS BIGINT) AS n_ipv4,
       md5({redacted}) AS redacted_md5
FROM documents
"""


DOCS_PII_SCRUB_SQL = _pii_sql()

QUERIES["docs_pii_scrub"] = docs_pii_scrub
ORACLES["docs_pii_scrub"] = DOCS_PII_SCRUB_SQL


def docs_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix (labeled lang × guessed lang, with
    accuracy-relevant counts) — the monitoring view over the lang-ID
    heuristic."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select("lang", text.lang_guess(F.col("text")).alias("guess"))
        .groupBy("lang", "guess")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_MARKER = "CASE " + " ".join(
    f"WHEN lower(text) LIKE '{marker}' THEN '{lang}'" for lang, marker in text.LANG_MARKERS
) + " ELSE 'en' END"

DOCS_LANG_CONFUSION_SQL = f"""
SELECT lang, {_MARKER} AS guess, CAST(count(*) AS BIGINT) AS n
FROM documents
GROUP BY lang, guess
"""

QUERIES["docs_lang_confusion"] = docs_lang_confusion
ORACLES["docs_lang_confusion"] = DOCS_LANG_CONFUSION_SQL


def docs_pack_nosplit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit NO-SPLIT packing plan: documents never straddle sequence
    boundaries (trading fill fraction for intact docs) — the companion
    mode to docs_pack_plan's concat-and-chunk.  Per-shard sequential
    first-fit inside one applyInPandas; recursive-CTE oracle."""
    from ..operators import packing

    d = load(spark, sf_dir, "documents")
    docs = d.select("doc_id", text.token_count(F.col("text")).alias("n_tokens"))
    return packing.pack_plan_nosplit(docs, "doc_id", "n_tokens", PACK_SEQ_LEN, PACK_GROUPS)


def _pack_nosplit_sql() -> str:
    from ..operators.packing import pack_plan_nosplit_sql

    return pack_plan_nosplit_sql(
        "(SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tokens FROM documents)",
        "doc_id",
        "n_tokens",
        PACK_SEQ_LEN,
        PACK_GROUPS,
    )


DOCS_PACK_NOSPLIT_SQL = _pack_nosplit_sql()

QUERIES["docs_pack_nosplit"] = docs_pack_nosplit
ORACLES["docs_pack_nosplit"] = DOCS_PACK_NOSPLIT_SQL


#: Bounded subset for the LSH recall evaluation (n²/2 ≤ 19,900 exact pairs).
LSH_EVAL_N = 200


def docs_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the MinHash-LSH index: exact all-pairs Jaccard
    over a BOUNDED doc subset (the ground truth a production pipeline
    samples periodically) vs the LSH pipeline's verified pairs on the same
    subset.  The exact side is a deliberate bounded self-join (≤ n²/2 =
    4950 pairs — an evaluation harness, not a corpus operator); the LSH
    side is the real pipeline.  One summary row: true pairs, found pairs,
    recall (LSH verification keeps only true pairs, so found ⊆ true and
    precision is 1 by construction)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < LSH_EVAL_N)
    sh = F.array_distinct(dedup.char_shingles(F.lower(F.col("text"))))
    docs = d.select(F.col("doc_id"), sh.alias("sh"))
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sa"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    jac = F.round(inter.cast("double") / (F.size("sa") + F.size("sb") - inter), 4)
    exact = pairs.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= JACCARD_T
    )
    lsh = dedup.minhash_lsh_pairs(d, "doc_id", "text", JACCARD_T)
    found = exact.join(lsh.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi")
    return (
        exact.agg(F.count(F.lit(1)).alias("n_true"))
        .crossJoin(found.agg(F.count(F.lit(1)).alias("n_found")))
        .select(
            "n_true",
            "n_found",
            # NULL when the sample holds no true pairs (possible at large
            # sf where dups spread thin) — an honest "no ground truth in
            # sample", not a crash
            F.round(F.try_divide(F.col("n_found"), F.col("n_true")), 4).alias("recall"),
        )
    )


def _lsh_recall_sql() -> str:
    sub = f"(SELECT * FROM documents WHERE doc_id < {LSH_EVAL_N})"
    lsh = _minhash_sql(sub)
    return f"""
WITH sh AS (
    SELECT DISTINCT doc_id,
           substr(lower(text), CAST(p.range AS INTEGER), {dedup.SHINGLE_LEN}) AS s
    FROM {sub},
         unnest(range(1, greatest(length(text) - {dedup.SHINGLE_LEN - 1}, 1) + 1, {dedup.SHINGLE_STRIDE})) AS p(range)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
    FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
exact AS (
    SELECT i.id_a, i.id_b
    FROM inter i JOIN sizes na ON na.doc_id = i.id_a
                 JOIN sizes nb ON nb.doc_id = i.id_b
    WHERE round(CAST(ni AS DOUBLE) / (na.n + nb.n - ni), 4) >= {JACCARD_T}
),
lsh AS ({lsh}),
found AS (SELECT e.* FROM exact e SEMI JOIN lsh l ON e.id_a = l.id_a AND e.id_b = l.id_b)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_true,
       (SELECT CAST(count(*) AS BIGINT) FROM found) AS n_found,
       CASE WHEN (SELECT count(*) FROM exact) = 0 THEN NULL
            ELSE round((SELECT count(*) FROM found) * 1.0
                       / (SELECT count(*) FROM exact), 4) END AS recall
"""


DOCS_LSH_RECALL_SQL = _lsh_recall_sql()

QUERIES["docs_lsh_recall"] = docs_lsh_recall
ORACLES["docs_lsh_recall"] = DOCS_LSH_RECALL_SQL


def docs_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication monitoring: docs, distinct content
    fingerprints, and the duplicate fraction — the corpus-health number a
    curation pipeline tracks per ingestion source."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select("source", text.bow_fingerprint(F.col("text")).alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("fp").alias("n_unique"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            F.round(
                (F.col("n_docs") - F.col("n_unique")).cast("double") / F.col("n_docs"), 4
            ).alias("dup_frac"),
        )
    )


DOCS_DUP_STATS_SQL = """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' '))) AS BIGINT) AS n_unique,
       round(CAST(count(*) - count(DISTINCT md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' '))) AS DOUBLE) / count(*), 4) AS dup_frac
FROM documents
GROUP BY source
"""

QUERIES["docs_dup_stats"] = docs_dup_stats
ORACLES["docs_dup_stats"] = DOCS_DUP_STATS_SQL


# --------------------------------------------------------------------------
# Bloom-filter membership gate (round 5): dedup a new batch against the
# historical corpus without joining (or even re-reading) the corpus.


#: DuckDB text of the bag-of-words fingerprint (mirrors text.bow_fingerprint).
_FP_SQL = (
    "md5(array_to_string(list_sort(list_distinct("
    "string_split(lower(text), ' '))), ' '))"
)

#: Bloom geometry for the gate query: 2^17 bits holds the fp floor under
#: 1e-3 for both test SFs (~1.1k set bits at sf0.01, ~12k at sf0.1) while
#: the word table stays a 4096-row broadcast.  Production sizing is
#: ~10 bits per expected key (membership.py docstring).
BLOOM_M = 1 << 17


def docs_bloom_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom membership gate: flag new-batch docs (doc_id % 5 = 0) whose
    bag-of-words fingerprint may already exist in the historical corpus
    (doc_id % 5 ≠ 0), next to the exact answer.

    The filter is BUILT distributively (operators/membership.py: one
    shuffle into a ≤4096-row word table) and PROBED with broadcast joins
    only — the new batch never shuffles, the corpus is read once at build.
    ``true_dup → might_dup`` always (no false negatives); the exact column
    is included so the oracle checks the fp floor too."""
    from ..operators import membership

    d = load(spark, sf_dir, "documents")
    fp = text.bow_fingerprint(F.col("text"))
    hist = d.filter(F.col("doc_id") % 5 != 0).select(fp.alias("key"))
    new = d.filter(F.col("doc_id") % 5 == 0).select("doc_id", fp.alias("key"))
    bloom = membership.bloom_build(hist, F.col("key"), m_bits=BLOOM_M)
    flagged = membership.bloom_flag(
        new, F.col("key"), bloom, m_bits=BLOOM_M, flag_col="__might"
    )
    truth = hist.distinct().withColumn("__true", F.lit(1))
    return (
        flagged.join(truth, "key", "left")
        .select(
            "doc_id",
            F.col("__might").cast("long").alias("might_dup"),
            F.coalesce(F.col("__true"), F.lit(0)).cast("long").alias("true_dup"),
        )
        .orderBy("doc_id")
    )


def _bloom_gate_sql() -> str:
    from ..operators.membership import bloom_oracle_sql, bloom_probe_oracle_pred

    hist_sql = f"SELECT {_FP_SQL} AS key FROM documents WHERE doc_id % 5 <> 0"
    return f"""WITH {bloom_oracle_sql(hist_sql, m_bits=BLOOM_M)},
newb AS (
    SELECT doc_id, {_FP_SQL} AS key FROM documents WHERE doc_id % 5 = 0
)
SELECT n.doc_id,
       CAST(CASE WHEN {bloom_probe_oracle_pred('n.key', m_bits=BLOOM_M)} THEN 1 ELSE 0 END AS BIGINT) AS might_dup,
       CAST(CASE WHEN n.key IN (SELECT DISTINCT key FROM hist) THEN 1 ELSE 0 END AS BIGINT) AS true_dup
FROM newb n
ORDER BY doc_id
"""


DOCS_BLOOM_GATE_SQL = _bloom_gate_sql()

QUERIES["docs_bloom_gate"] = docs_bloom_gate
ORACLES["docs_bloom_gate"] = DOCS_BLOOM_GATE_SQL


# --------------------------------------------------------------------------
# Deterministic training-order shuffle (round 5): reproducible global
# permutation without a global sort.


def docs_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible training order for the corpus: every doc lands in a
    hash shard with an intra-shard pseudo-random position — the loader's
    "shard list + per-shard order" contract — via ONE shuffle and a
    per-shard sort (never a global ORDER BY random())."""
    from ..operators.sampling import shuffle_plan

    d = load(spark, sf_dir, "documents").select("doc_id")
    return shuffle_plan(d, "doc_id", n_shards=8, seed="r5").orderBy(
        "shard", "pos"
    )


def _shuffle_plan_sql() -> str:
    from ..operators.sampling import shuffle_plan_sql

    return shuffle_plan_sql("documents", "doc_id", n_shards=8, seed="r5")


DOCS_SHUFFLE_PLAN_SQL = _shuffle_plan_sql()

QUERIES["docs_shuffle_plan"] = docs_shuffle_plan
ORACLES["docs_shuffle_plan"] = DOCS_SHUFFLE_PLAN_SQL


# --------------------------------------------------------------------------
# Per-source hard cap (round 5): no single source dominates the corpus.


def docs_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every source at 60 documents, chosen reproducibly (md5-ranked
    within source — one window shuffle, identical survivors on re-run):
    the anti-domination guard every web-scale corpus applies per domain."""
    from ..operators.sampling import group_cap

    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    capped = group_cap(d, "doc_id", "source", cap=60, salt="r5cap")
    return (
        capped.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.sum("doc_id").alias("id_sum"))
        .orderBy("source")
    )


def _source_cap_sql() -> str:
    from ..operators.sampling import group_cap_sql

    inner = group_cap_sql(
        "(SELECT doc_id, source FROM documents)", "doc_id", "source", 60, salt="r5cap"
    )
    return f"""
SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM ({inner})
GROUP BY source ORDER BY source
"""


DOCS_SOURCE_CAP_SQL = _source_cap_sql()

QUERIES["docs_source_cap"] = docs_source_cap
ORACLES["docs_source_cap"] = DOCS_SOURCE_CAP_SQL


# --------------------------------------------------------------------------
# Gopher rule gate (round 5): the published per-document rule set as
# individually-reported flags.


def docs_gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher rule flags (Rae et al. 2021 table A1): word
    count, mean word length, symbol ratio, alphabetic-word fraction,
    stopword presence, and the conjunction.  Pure column expressions —
    ONE corpus scan, ZERO shuffles; per-rule flags (not just the verdict)
    because curation debugging needs to know WHICH rule fired.  The
    corpus-relative repetition rules compose via repetition_stats exactly
    as docs_curation_full does."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", *text.gopher_flags(F.col("text"))).orderBy("doc_id")


DOCS_GOPHER_GATE_SQL = f"""
SELECT doc_id,
       {text.gopher_flags_sql('text')}
FROM documents
ORDER BY doc_id
"""

QUERIES["docs_gopher_gate"] = docs_gopher_gate
ORACLES["docs_gopher_gate"] = DOCS_GOPHER_GATE_SQL


# --------------------------------------------------------------------------
# C4-style global span dedup (round 5): remove every repeated
# 5-token span corpus-wide, first occurrence wins, documents rebuilt
# from their surviving spans.


def docs_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide span-level dedup (operators/dedup.py::span_dedup —
    the C4 three-sentence-span rule on token text).  The winner-per-span
    aggregation is a min(struct) groupBy, partial-aggregatable so
    mega-duplicated spans collapse map-side; the reconstructed text is
    compared verbatim against the oracle, so order-of-reassembly bugs
    can't hide behind counts."""
    from ..operators.dedup import span_dedup

    d = load(spark, sf_dir, "documents")
    return span_dedup(d, "doc_id", "text", span_tokens=5)


DOCS_SPAN_DEDUP_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
spans AS (
  SELECT doc_id, CAST(t.i AS INTEGER) AS span_idx,
         array_to_string(list_slice(tk, t.i*5+1, t.i*5+5), ' ') AS span
  FROM toks, unnest(range(0, CAST(ceil(len(tk)/5.0) AS BIGINT))) AS t(i)
),
winners AS (
  SELECT span, min(struct_pack(d := doc_id, i := span_idx)) AS w
  FROM spans GROUP BY span
),
kept AS (
  SELECT (w).d AS doc_id, CAST(count(*) AS BIGINT) AS kept_spans,
         string_agg(span, ' ' ORDER BY (w).i) AS new_text
  FROM winners GROUP BY (w).d
),
totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans FROM spans GROUP BY doc_id)
SELECT t.doc_id, t.n_spans,
       CAST(coalesce(k.kept_spans, 0) AS BIGINT) AS kept_spans,
       coalesce(k.new_text, '') AS new_text
FROM totals t LEFT JOIN kept k USING (doc_id)
"""

QUERIES["docs_span_dedup"] = docs_span_dedup
ORACLES["docs_span_dedup"] = DOCS_SPAN_DEDUP_SQL
