"""Text-analysis operators for training-data pipelines.

Beyond-reference surface (the reference has no scalar function library at
all — SURVEY.md §2.7): language-ID heuristic, quality scoring, token
counting, and document fingerprinting, each as pure column expressions /
DataFrame transforms.  Everything stays JVM-side in whole-stage codegen —
no Python UDFs — so these run at full scan speed on a 100 TB documents
table; the only shuffles are the explicit groupBys.

Determinism contract: every function here has an exact ANSI-SQL equivalent
(used by the DuckDB oracles in mandodb_spark.workloads.docs), which pins
down semantics precisely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Stopword list used by the quality heuristic (tiny by design — the point
#: is the operator shape, not the lexicon).
STOPWORDS = ("the", "a", "of", "and")

#: (language, marker-substring) pairs for the n-gram-style language-ID vote.
LANG_MARKERS = (
    ("de", "%der %"),
    ("fr", "%le %"),
    ("es", "%el %"),
    ("zh", "%shi %"),
)


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(text), " ")


def token_count(text: Column) -> Column:
    """Token count as BIGINT (whitespace tokenizer)."""
    return F.size(tokens(text)).cast("long")


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("long")


def avg_token_len(text: Column) -> Column:
    """Mean token length; exact identity for single-space-joined text:
    (len(text) - (n-1)) / n."""
    n = token_count(text)
    return (F.length(text) - (n - F.lit(1))).cast("double") / n.cast("double")


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return stop.cast("double") / F.size(toks).cast("double")


def punct_ratio(text: Column) -> Column:
    """Share of characters that are not alphanumeric/space — the
    punctuation-saturation signal of a quality filter."""
    lowered = F.lower(text)
    stripped = F.regexp_replace(lowered, "[a-z0-9 ]", "")
    return F.length(stripped).cast("double") / F.length(lowered).cast("double")


def uniq_ratio(text: Column) -> Column:
    toks = tokens(text)
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: lexical diversity up, stopword
    saturation down — the shape of a pretraining quality filter."""
    return F.round(F.lit(0.6) * uniq_ratio(text) + F.lit(0.4) * (F.lit(1.0) - stopword_ratio(text)), 4)


def lang_guess(text: Column) -> Column:
    """Marker-based language vote (first matching marker wins, else 'en').

    A deliberately simple, SQL-mirrorable n-gram heuristic; a production
    engine would swap in fastText behind the same column contract.
    """
    expr = F.lit("en")
    for lang, marker in reversed(LANG_MARKERS):
        expr = F.when(F.lower(text).like(marker), F.lit(lang)).otherwise(expr)
    return expr


def bow_fingerprint(text: Column) -> Column:
    """Bag-of-words fingerprint: md5 over the sorted distinct token set.

    Word-order-insensitive content identity — the document analogue of the
    reference's canonical-sorted-labels hash (label.go:235-251).
    """
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text)))))


#: GPT-2-style pre-tokenization classes: letter runs, digit runs, single
#: punctuation marks.  Shared by Spark (Java regex) and DuckDB (RE2) — the
#: pattern stays inside the dialect-common subset.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def bpe_tokens(text: Column) -> Column:
    """BPE-ish regex tokenization (letters / digits / punctuation split),
    the pre-tokenizer every BPE vocabulary assumes.  Pure column expression
    (regexp_extract_all) — codegen'd, no UDF."""
    return F.regexp_extract_all(F.lower(text), F.lit(BPE_PATTERN), 0)


#: Winnowing parameters: k-gram length and window size (Schleimer et al.,
#: SIGMOD'03 — the MOSS fingerprinting scheme).
WINNOW_K = 8
WINNOW_W = 4


def winnow_fingerprints(text: Column, k: int = WINNOW_K, w: int = WINNOW_W) -> Column:
    """Winnowed rolling-hash fingerprint set of a document (column form).

    k-gram hashes (60-bit numeric md5 prefix — same construction as the
    minhash stage) → min over each window of w consecutive hashes →
    distinct mins.  Guarantees every match of length ≥ k+w-1 shares a
    fingerprint, with density 2/(w+1) — the standard near-copy detection
    fingerprint (Schleimer et al., winnowing/MOSS).

    PERF WARNING: higher-order array expressions are interpreted per
    element — one md5 per character position makes this ~35× slower than
    :func:`winnow_fingerprint_stats` (Arrow-batched hashlib).  Use this
    form only for composition inside other column expressions on short
    strings; use the mapInPandas form for corpus-scale fingerprinting.
    """
    lowered = F.lower(text)
    positions = F.sequence(F.lit(1), F.greatest(F.length(lowered) - F.lit(k - 1), F.lit(1)))
    hashes = F.transform(
        positions,
        lambda p: F.conv(F.substring(F.md5(lowered.substr(p, F.lit(k))), 1, 15), 16, 10).cast("long"),
    )
    n_windows = F.greatest(F.size(hashes) - F.lit(w - 1), F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n_windows), lambda i: F.array_min(F.slice(hashes, i, w))
    )
    return F.array_distinct(mins)


def winnow_fingerprint_stats(df: DataFrame, id_col: str, text_col: str,
                             k: int = WINNOW_K, w: int = WINNOW_W) -> DataFrame:
    """Winnowed rolling-hash fingerprints, Arrow-batched (the scale path).

    Same scheme and EXACT same values as :func:`winnow_fingerprints`
    (md5-prefix k-gram hashes, window mins, distinct) but computed in
    Python's C md5 via mapInPandas: one md5 per character position is
    exactly the workload where interpreted Catalyst lambdas lose 35× to an
    Arrow batch (measured; see SCALE.md).  Embarrassingly parallel — no
    shuffle, output one stats row per document.
    """
    import hashlib as _hl

    def batches(it):
        import pandas as _pd

        for pdf in it:
            ids, nfps, mins, maxs = [], [], [], []
            for doc_id, txt in zip(pdf[id_col], pdf[text_col]):
                lt = str(txt).lower()
                n = max(len(lt) - k + 1, 1)
                hs = [
                    int(_hl.md5(lt[p : p + k].encode()).hexdigest()[:15], 16)
                    for p in range(n)
                ]
                nw = max(len(hs) - w + 1, 1)
                fps = {min(hs[i : i + w]) for i in range(nw)}
                ids.append(int(doc_id))
                nfps.append(len(fps))
                mins.append(min(fps))
                maxs.append(max(fps))
            yield _pd.DataFrame(
                {id_col: ids, "n_fps": nfps, "min_fp": mins, "max_fp": maxs}
            )

    return df.select(id_col, text_col).mapInPandas(
        batches, f"{id_col} long, n_fps long, min_fp long, max_fp long"
    )


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document — the relevance/keyword operator of
    a corpus-curation pipeline.

    tf from one explode+groupBy (single shuffle on (doc, term), map-side
    partial counts); document frequency derived FROM the tf table (no
    second scan of the corpus); idf = ln((N+1)/(df+1)) + 1 (smoothed,
    sklearn-style).  The df dimension is vocabulary-sized → broadcast to
    the tf side; the per-doc top-k is a window row_number bounded at k with
    a total order (tfidf desc, term) so results are deterministic
    cross-engine.  At 100 TB the only large shuffle is the tf aggregation.
    """
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(docfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1), 6
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", F.col("rank").cast("long").alias("rank"))
    )


def tfidf_top_terms_sql(table: str, id_col: str, text_col: str, k: int = 3) -> str:
    """DuckDB mirror of :func:`tfidf_top_terms` (oracle generator)."""
    return f"""
WITH toks AS (
    SELECT {id_col}, unnest(string_split(lower({text_col}), ' ')) AS term FROM {table}
),
tf AS (SELECT {id_col}, term, count(*) AS tf FROM toks GROUP BY 1, 2),
docfreq AS (SELECT term, count(DISTINCT {id_col}) AS df FROM tf GROUP BY 1),
n AS (SELECT count(DISTINCT {id_col}) AS n_docs FROM {table}),
scored AS (
    SELECT tf.{id_col}, tf.term, tf.tf, docfreq.df,
           round(tf.tf * (ln(CAST(n.n_docs + 1 AS DOUBLE) / (docfreq.df + 1)) + 1), 6) AS tfidf
    FROM tf JOIN docfreq USING (term) CROSS JOIN n
)
SELECT {id_col}, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, tfidf,
       CAST(rank AS BIGINT) AS rank
FROM (
    SELECT *, row_number() OVER (PARTITION BY {id_col} ORDER BY tfidf DESC, term) AS rank
    FROM scored
)
WHERE rank <= {k}
"""


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: duplicate-word
    fraction and most-frequent-bigram fraction (the repetition filters of a
    pretraining-data pipeline).

    Word-level stats are pure array expressions (no shuffle); the bigram
    mode needs per-(doc, bigram) counts — one explode + groupBy shuffle on
    (doc, bigram), then a per-doc regroup.  Both aggregations are map-side
    partial, and the explode is narrow: at 100 TB this is two well-keyed
    shuffles, no window over the raw corpus.  Bigrams are built
    explode-first with scalar ``element_at`` expressions (codegen) rather
    than a per-element ``transform`` lambda (interpreted; measured ~20%
    end-to-end at sf0.1 — same trade as ``shingle_sets``).
    """
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("__t"))
    words = base.select(
        F.col(id_col),
        F.size("__t").cast("long").alias("n_words"),
        F.size(F.array_distinct("__t")).cast("long").alias("n_distinct_words"),
    )
    positions = F.when(
        F.size("__t") >= 2, F.sequence(F.lit(1), F.size("__t") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bg_counts = (
        base.select(F.col(id_col), F.col("__t"), F.explode(positions).alias("__p"))
        .select(
            F.col(id_col),
            F.expr("concat_ws(' ', element_at(__t, __p), element_at(__t, __p + 1))").alias("bg"),
        )
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bg_stats = bg_counts.groupBy(id_col).agg(
        F.max("c").alias("top_bigram_count"), F.sum("c").alias("n_bigrams")
    )
    return (
        words.join(bg_stats, id_col, "left")
        .select(
            F.col(id_col),
            "n_words",
            "n_distinct_words",
            F.round(
                F.lit(1.0) - F.col("n_distinct_words") / F.greatest(F.col("n_words"), F.lit(1)), 4
            ).alias("dup_word_frac"),
            F.coalesce(F.col("top_bigram_count"), F.lit(0)).cast("long").alias("top_bigram_count"),
            F.round(
                F.coalesce(F.col("top_bigram_count"), F.lit(0))
                / F.greatest(F.coalesce(F.col("n_bigrams"), F.lit(0)), F.lit(1)),
                4,
            ).alias("top_bigram_frac"),
        )
    )


def repetition_stats_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB mirror of :func:`repetition_stats` (oracle generator)."""
    return f"""
WITH t AS (SELECT {id_col}, string_split(lower({text_col}), ' ') AS toks FROM {table}),
words AS (
    SELECT {id_col}, len(toks) AS n_words, len(list_distinct(toks)) AS n_distinct_words FROM t
),
bg AS (
    SELECT {id_col},
           unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS bg
    FROM t WHERE len(toks) >= 2
),
bgc AS (SELECT {id_col}, bg, count(*) AS c FROM bg GROUP BY 1, 2),
bgs AS (SELECT {id_col}, max(c) AS top_bigram_count, sum(c) AS n_bigrams FROM bgc GROUP BY 1)
SELECT w.{id_col},
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_distinct_words AS BIGINT) AS n_distinct_words,
       round(1.0 - CAST(n_distinct_words AS DOUBLE) / greatest(n_words, 1), 4) AS dup_word_frac,
       CAST(coalesce(top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
       round(CAST(coalesce(top_bigram_count, 0) AS DOUBLE) / greatest(coalesce(n_bigrams, 0), 1), 4)
           AS top_bigram_frac
FROM words w LEFT JOIN bgs USING ({id_col})
"""


def simhash_bits(df: DataFrame, id_col: str, text_col: str, n_bits: int = 16) -> DataFrame:
    """n-bit SimHash per document (n_bits ≤ 64 — one hex digit per bit).

    Each token votes ±1 on each bit; bit j's vote is derived from the j-th
    hex digit of the token's hash string (≥'8' → +1).  Digits 0-31 come
    from md5(token); digits 32-63 from md5('1:' || token) — 64 production
    bits (Manku et al., WWW'07 uses 64-bit fingerprints) from two codegen'd
    md5 calls.  Computed entirely row-wise over the token array — NO
    explode, NO shuffle: at 100 TB the naive explode→groupBy version
    shuffles the whole tokenized corpus, this version shuffles nothing.

    Bit 63 packs as the two's-complement sign contribution (shiftleft wraps
    to LongType.MinValue), so the 64-bit fingerprint lands in a plain
    signed BIGINT on both engines.
    """
    assert 1 <= n_bits <= 64
    hexhigh = list("89abcdef")
    hash_of = (
        (lambda t: F.md5(t))
        if n_bits <= 32
        else (lambda t: F.concat(F.md5(t), F.md5(F.concat(F.lit("1:"), t))))
    )
    # Two-step projection: hashes materialized once (CollapseProject keeps
    # the boundary because the inner expression is non-cheap), bits read it.
    with_h = df.select(
        F.col(id_col), F.transform(tokens(F.col(text_col)), hash_of).alias("hs")
    )
    n = F.size(F.col("hs"))
    fp = F.lit(0).cast("long")
    for j in range(n_bits):
        # sum of ±1 votes = 2 * |high-digit tokens| - n ; bit set iff > 0.
        hi = F.size(F.filter(F.col("hs"), lambda h: F.substring(h, j + 1, 1).isin(*hexhigh)))
        fp = fp + F.when(
            hi * 2 > n, F.shiftleft(F.lit(1).cast("long"), j)
        ).otherwise(F.lit(0).cast("long"))
    return with_h.select(F.col(id_col), fp.cast("long").alias("simhash"))


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash per document (see :func:`simhash_bits`)."""
    return simhash_bits(df, id_col, text_col, 16)


def simhash_arrow(df: DataFrame, id_col: str, text_col: str, n_bits: int = 16) -> DataFrame:
    """SimHash, Arrow-batched (the corpus-scale path).

    EXACT same values as :func:`simhash_bits` (hex-digit votes over the
    whitespace token stream; two chained md5s per token above 32 bits) but
    computed in C md5 via mapInPandas with a per-batch token→vote cache —
    the n interpreted array passes of the expression form are the measured
    hot spot of docs_simhash (VERDICT r1), and this is the same Arrow trade
    that won 35× for winnowing.  Embarrassingly parallel: no explode, no
    shuffle, one row out per doc.

    Drop-in replacement for :func:`simhash_bits`: ids pass through with
    their incoming type, and null/NaN text yields fingerprint 0 — the same
    value the expression form produces (its NULL vote conditions all fall
    to the otherwise(0) branch).
    """
    assert 1 <= n_bits <= 64
    import hashlib as _hl

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [df.schema[id_col], StructField("simhash", LongType())]
    )

    def batches(it):
        import numpy as _np
        import pandas as _pd

        cache: dict[str, _np.ndarray] = {}
        # hex digit j (0-based, left to right) of the hash string is "high"
        # iff its top bit is set; in v = int(hx[:n_bits], 16) that digit's
        # top bit sits at position 4*(n_bits-1-j)+3.
        shifts = [4 * (n_bits - 1 - j) + 3 for j in range(n_bits)]

        def votes_of(tok: str) -> _np.ndarray:
            m = cache.get(tok)
            if m is None:
                hx = _hl.md5(tok.encode()).hexdigest()
                if n_bits > 32:
                    hx += _hl.md5(("1:" + tok).encode()).hexdigest()
                # v is a plain Python int (beyond int64 at 64 bits) —
                # shift per bit, then vectorize the array.
                v = int(hx[:n_bits], 16)
                m = _np.array([(v >> s) & 1 for s in shifts], dtype=_np.int64)
                cache[tok] = m
            return m

        from collections import Counter

        for pdf in it:
            fps = []
            for txt in pdf[text_col]:
                if txt is None or (isinstance(txt, float) and txt != txt):
                    fps.append(0)
                    continue
                toks = str(txt).lower().split(" ")
                n = len(toks)
                acc = _np.zeros(n_bits, dtype=_np.int64)
                for tok, c in Counter(toks).items():
                    acc += c * votes_of(tok)
                fp = 0
                for j in range(n_bits):
                    if 2 * int(acc[j]) > n:
                        fp |= 1 << j
                if fp >= 1 << 63:  # two's-complement wrap into signed int64
                    fp -= 1 << 64
                fps.append(fp)
            yield _pd.DataFrame(
                {id_col: pdf[id_col], "simhash": _pd.Series(fps, dtype="int64")}
            )

    return df.select(id_col, text_col).mapInPandas(batches, out_schema)


def simhash16_sql(table: str, id_col: str, text_col: str, n_bits: int = 16) -> str:
    """The exact ANSI-SQL mirror of :func:`simhash_bits` (oracle generator).

    Above 32 bits the per-token hash string is md5(tok) || md5('1:'||tok),
    and bit 63's contribution is the signed-BIGINT minimum (two's
    complement) so the packed value never overflows BIGINT.
    """
    assert 1 <= n_bits <= 64
    h_expr = "md5(t.tok)" if n_bits <= 32 else "md5(t.tok) || md5('1:' || t.tok)"
    bit_sums = ",\n           ".join(
        f"sum(CASE WHEN substr(h, {j + 1}, 1) IN ('8','9','a','b','c','d','e','f') "
        f"THEN 1 ELSE -1 END) AS b{j}"
        for j in range(n_bits)
    )
    packed = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN CAST({-(1 << 63) if j == 63 else (1 << j)} AS BIGINT) ELSE 0 END)"
        for j in range(n_bits)
    )
    return f"""
WITH tok AS (
    SELECT {id_col}, {h_expr} AS h
    FROM {table}, unnest(string_split(lower({text_col}), ' ')) AS t(tok)
), bits AS (
    SELECT {id_col},
           {bit_sums}
    FROM tok GROUP BY {id_col}
)
SELECT {id_col}, CAST({packed} AS BIGINT) AS simhash FROM bits
"""


def token_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Shannon entropy (bits) of each document's token distribution — the
    standard cheap perplexity proxy for corpus curation: near-zero for
    boilerplate/repetition, high for diverse text.

    H = log2(n) − (Σ c·log2 c)/n over per-token counts c, so the plan is
    explode → ONE (id, token) count shuffle → a tiny per-doc regroup with
    map-side partials.  At 100 TB the first shuffle is the corpus token
    relation — same scale class as every other token-level signal here
    (tf-idf, CMS); nothing is quadratic and no UDF is involved.
    """
    toks = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__t"))
        .groupBy(id_col, "__t")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    c = F.col("__c").cast("double")
    return (
        toks.groupBy(id_col)
        .agg(
            F.sum("__c").alias("__n"),
            F.sum(c * F.log2(c)).alias("__clogc"),
        )
        .select(
            F.col(id_col),
            F.col("__n").cast("long").alias("n_tokens"),
            F.round(
                F.log2(F.col("__n").cast("double")) - F.col("__clogc") / F.col("__n"), 4
            ).alias("token_entropy"),
        )
    )


def token_entropy_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB mirror of :func:`token_entropy` (oracle generator)."""
    return f"""
WITH tok AS (
    SELECT {id_col}, t.tok, count(*) AS c
    FROM {table}, unnest(string_split(lower({text_col}), ' ')) AS t(tok)
    GROUP BY 1, 2
)
SELECT {id_col},
       CAST(sum(c) AS BIGINT) AS n_tokens,
       round(log2(CAST(sum(c) AS DOUBLE)) - sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) / sum(c), 4)
           AS token_entropy
FROM tok GROUP BY {id_col}
"""


def unigram_cross_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-LM perplexity filtering (the CCNet / Wenzek et al. quality
    gate, reduced to its unigram core): train a unigram LM on the corpus
    itself, then score every document by its cross-entropy under that LM
    — mean −log2 p(token), with p = corpus_freq/corpus_total.  Boilerplate
    made of ultra-common tokens scores LOW, rare-token noise scores HIGH;
    curation keeps the middle band.

    Scale shape: explode once → corpus token counts (ONE shuffle, map-side
    partial) → join the token relation back on token (second shuffle; the
    LM is vocabulary-sized — far smaller than the corpus, and AQE
    broadcasts it when it fits) → per-doc agg (third shuffle on doc id).
    The corpus-total scalar rides a 1-row broadcast cross join, the same
    deliberate pattern as the IVF codebook probe.  Nothing quadratic, no
    UDFs, no driver-side state.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__t"))
    corpus = toks.groupBy("__t").agg(F.count(F.lit(1)).alias("__cf"))
    total = corpus.agg(F.sum("__cf").cast("double").alias("__total"))
    per_doc = (
        toks.join(corpus, "__t")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.log2(F.col("__cf").cast("double"))).alias("__slog"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        F.col(id_col),
        F.col("__n").cast("long").alias("n_tokens"),
        F.round(
            F.log2(F.col("__total")) - F.col("__slog") / F.col("__n"), 4
        ).alias("unigram_ce"),
    )


def unigram_cross_entropy_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB mirror of :func:`unigram_cross_entropy` (oracle generator)."""
    return f"""
WITH tok AS (
    SELECT {id_col}, t.tok
    FROM {table}, unnest(string_split(lower({text_col}), ' ')) AS t(tok)
), lm AS (
    SELECT tok, count(*) AS cf FROM tok GROUP BY tok
), total AS (
    SELECT CAST(sum(cf) AS DOUBLE) AS n FROM lm
)
SELECT tok.{id_col},
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(log2(total.n) - sum(log2(CAST(lm.cf AS DOUBLE))) / count(*), 4) AS unigram_ce
FROM tok JOIN lm USING (tok), total
GROUP BY tok.{id_col}, total.n
"""


def vocab_table(df: DataFrame, id_col: str, text_col: str, size: int) -> DataFrame:
    """Tokenizer-vocabulary construction: the ``size`` most frequent
    corpus tokens with contiguous ids 0..size-1 ordered by (freq desc,
    token asc) — the frequency-vocab stage every tokenizer training run
    starts from (BPE seeds its merges from exactly this table).

    Scale shape: ONE corpus count shuffle, then ``orderBy().limit(size)``
    — which Catalyst plans as TakeOrderedAndProject, a per-partition
    partial top-k merged on one reducer, never a global sort of the
    vocabulary.  Id assignment is a window over the ALREADY-REDUCED
    ``size`` rows (vocab-sized, driver-bounded by construction — the
    single-partition window is over ≤ size rows, not the corpus).
    """
    from pyspark.sql import Window

    freq = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = freq.orderBy(F.desc("freq"), F.asc("token")).limit(size)
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return top.select(
        "token", "freq", (F.row_number().over(w) - 1).cast("long").alias("token_id")
    )


def vocab_table_sql(table: str, text_col: str, size: int) -> str:
    """DuckDB mirror of :func:`vocab_table` (oracle generator)."""
    return f"""
WITH freq AS (
    SELECT t.tok AS token, CAST(count(*) AS BIGINT) AS freq
    FROM {table}, unnest(string_split(lower({text_col}), ' ')) AS t(tok)
    GROUP BY 1
)
SELECT token, freq,
       CAST(row_number() OVER (ORDER BY freq DESC, token) - 1 AS BIGINT) AS token_id
FROM freq
ORDER BY freq DESC, token
LIMIT {size}
"""


def chunk_spans(df: DataFrame, id_col: str, text_col: str,
                chunk_tokens: int = 64, overlap: int = 16) -> DataFrame:
    """Overlapping token-window chunks per document — the long-document
    splitting primitive every RAG/embedding-indexing pipeline runs
    (windows of ``chunk_tokens`` advancing by ``chunk_tokens - overlap``).

    Pure column expressions: tokenize once, explode a bounded ``sequence``
    of window indexes, slice the token array per window, and re-join the
    chunk text.  Map-side with a narrow explode — scan-parallel and
    shuffle-free at any corpus size (the byte-level analogue for opaque
    media payloads is ``multimodal.chunk_plan``).

    Output: id, chunk_idx, n_chunk_tokens, chunk_text.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    last_idx = F.floor(
        F.greatest((n - F.lit(overlap + 1)).cast("long"), F.lit(0)) / F.lit(step)
    ).cast("long")
    exploded = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.explode(F.sequence(F.lit(0).cast("long"), last_idx)).alias("chunk_idx"),
    )
    chunk = F.slice(F.col("__toks"), F.col("chunk_idx").cast("int") * step + 1, chunk_tokens)
    return exploded.select(
        id_col,
        "chunk_idx",
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def chunk_spans_sql(table: str, id_expr: str, text_expr: str,
                    chunk_tokens: int = 64, overlap: int = 16) -> str:
    """DuckDB mirror of :func:`chunk_spans`."""
    step = chunk_tokens - overlap
    return f"""
WITH t AS (
    SELECT {id_expr} AS id, string_split(lower({text_expr}), ' ') AS toks
    FROM {table}
),
idx AS (
    SELECT id, toks,
           unnest(range(0, CAST(floor(CAST(greatest(len(toks) - {overlap + 1}, 0) AS DOUBLE) / {step}) AS BIGINT) + 1)) AS chunk_idx
    FROM t
)
SELECT id AS {id_expr}, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(len(list_slice(toks, chunk_idx * {step} + 1, chunk_idx * {step} + {chunk_tokens})) AS BIGINT) AS n_chunk_tokens,
       array_to_string(list_slice(toks, chunk_idx * {step} + 1, chunk_idx * {step} + {chunk_tokens}), ' ') AS chunk_text
FROM idx
"""


#: PII patterns for the scrubbing pass — deliberately simple, engine-
#: portable regexes (no lookarounds: DuckDB RE2 doesn't support them).
PII_PATTERNS = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    # two phone shapes, both requiring structure a bare number list lacks:
    # an international +-prefixed run, or the NANP 3-3-4 grouping — a
    # naive [0-9()\-\s]{7,} class chains across spaces/newlines and
    # redacts legitimate numeric text like "50 000 000 tokens"
    "phone": r"(\+[0-9][0-9 \-()]{6,14}[0-9]|\(?[0-9]{3}\)?[ \-][0-9]{3}[ \-][0-9]{4})",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def redact_pii(text: Column) -> Column:
    """Replace email / phone / IPv4 shapes with ``<TYPE>`` tokens —
    the standard pre-training scrubbing pass, as chained JVM-side
    ``regexp_replace`` (no UDF, stays in codegen)."""
    out = text
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-type PII hit counts (``regexp_count``) for scrub auditing."""
    return {name: F.regexp_count(text, F.lit(pat)) for name, pat in PII_PATTERNS.items()}


# -- Gopher-style rule gate ---------------------------------------------------

#: Gopher document-filtering thresholds (Rae et al. 2021, table A1 — the
#: published pretraining rule set; word-count floor lowered to 20 for the
#: short synthetic corpus, everything else as published).
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_AVG_WORD_LEN = 3.0
GOPHER_MAX_AVG_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_DISTINCT_STOPWORDS = 2


def gopher_flags(text: Column) -> list[Column]:
    """Per-rule pass flags (1/0 BIGINTs) for the scalar Gopher rules.

    All pure column expressions — composable into any gate without a
    shuffle.  The corpus-relative rules (duplicate-line fraction,
    top-bigram fraction) are aggregations, not scalars: compose with
    :func:`repetition_stats` the way ``docs_curation_full`` does.
    Returns columns aliased ``ok_word_count / ok_word_len / ok_symbols /
    ok_alpha_words / ok_stopwords / gopher_pass``."""
    toks = tokens(text)
    n = F.size(toks)
    avg_len = avg_token_len(text)
    # symbol ratio: hash and ellipsis occurrences per word (Gopher counts
    # '#' and '...'; both regexes sit in the Java∩RE2 dialect subset)
    n_sym = (
        F.size(F.split(text, "#", -1)) - 1
        + F.size(F.split(text, r"\.\.\.", -1)) - 1
    )
    ok_wc = n.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    ok_wl = avg_len.between(GOPHER_MIN_AVG_WORD_LEN, GOPHER_MAX_AVG_WORD_LEN)
    ok_sym = (n_sym.cast("double") / n) <= GOPHER_MAX_SYMBOL_RATIO
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
    ok_alpha = (alpha_words.cast("double") / n) >= GOPHER_MIN_ALPHA_WORD_FRAC
    distinct_stops = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(s) for s in STOPWORDS])
        )
    )
    ok_stop = distinct_stops >= GOPHER_MIN_DISTINCT_STOPWORDS
    flags = {
        "ok_word_count": ok_wc,
        "ok_word_len": ok_wl,
        "ok_symbols": ok_sym,
        "ok_alpha_words": ok_alpha,
        "ok_stopwords": ok_stop,
    }
    out = [v.cast("long").alias(k) for k, v in flags.items()]
    allpass = None
    for v in flags.values():
        allpass = v if allpass is None else (allpass & v)
    out.append(allpass.cast("long").alias("gopher_pass"))
    return out


def gopher_flags_sql(text_expr: str) -> str:
    """DuckDB SELECT-fragment mirroring :func:`gopher_flags`."""
    toks = f"string_split(lower({text_expr}), ' ')"
    n = f"len({toks})"
    avg_len = (
        f"(CAST(length({text_expr}) - ({n} - 1) AS DOUBLE) / {n})"
    )
    n_sym = (
        f"(len(string_split({text_expr}, '#')) - 1"
        f" + len(str_split_regex({text_expr}, '\\.\\.\\.')) - 1)"
    )
    alpha = (
        f"len(list_filter({toks}, t -> regexp_matches(t, '[a-zA-Z]')))"
    )
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    dstops = f"len(list_intersect(list_distinct({toks}), [{stops}]))"
    rules = {
        "ok_word_count": f"{n} BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}",
        "ok_word_len": f"{avg_len} BETWEEN {GOPHER_MIN_AVG_WORD_LEN} AND {GOPHER_MAX_AVG_WORD_LEN}",
        "ok_symbols": f"(CAST({n_sym} AS DOUBLE) / {n}) <= {GOPHER_MAX_SYMBOL_RATIO}",
        "ok_alpha_words": f"(CAST({alpha} AS DOUBLE) / {n}) >= {GOPHER_MIN_ALPHA_WORD_FRAC}",
        "ok_stopwords": f"{dstops} >= {GOPHER_MIN_DISTINCT_STOPWORDS}",
    }
    cols = [f"CAST({expr} AS BIGINT) AS {name}" for name, expr in rules.items()]
    cols.append(
        "CAST(" + " AND ".join(f"({e})" for e in rules.values()) + " AS BIGINT) AS gopher_pass"
    )
    return ",\n       ".join(cols)

def bm25_topk(df: DataFrame, id_col: str, text_col: str,
              query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Distributed BM25 retrieval: the ``k`` highest-scoring documents
    for a bag-of-terms query (Robertson BM25 with the Lucene idf form
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` — always positive, so a term
    in >half the corpus degrades gracefully instead of flipping sign).
    The keyword-search complement to the embedding ANN operators — a
    curation pipeline uses it for targeted corpus audits ("every
    document scoring high for these probe terms") where cosine recall
    is the wrong tool.

    Scale shape: the term filter (``term IN (...)`` on the exploded
    scan) runs BEFORE any shuffle, so the tf aggregate sees only rows
    matching the query's terms — O(matching postings), not O(corpus
    tokens).  Per-term document frequencies derive from that tf table
    (|query| rows → broadcast back), corpus N/avgdl is a broadcast
    1-row aggregate, and per-doc length joins tf on the id.  The final
    top-k is a k-bounded sort with a total order (score desc, id) —
    deterministic cross-engine.

    Output: ``(id, score, rank)``, score rounded to 6dp.
    """
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    stats = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(token_count(F.col(text_col))).alias("avgdl"),
    )
    dl = df.select(F.col(id_col), token_count(F.col(text_col)).alias("dl"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    scored = (
        tf.join(F.broadcast(docfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("term_score", idf * F.col("tf") * (k1 + 1) / denom)
    )
    from pyspark.sql import Window

    top = (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("term_score"), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    # the rank window sees ONLY the k-limited rows — the unpartitioned
    # window is bounded by construction, never corpus-sized
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def bm25_topk_sql(table: str, id_col: str, text_col: str,
                  query_terms: list[str], k: int = 10,
                  k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB mirror of :func:`bm25_topk` (oracle generator)."""
    term_set = sorted({t.lower() for t in query_terms})
    if not term_set:
        raise ValueError("bm25_topk_sql: query_terms must be non-empty")
    terms = ", ".join(f"'{t}'" for t in term_set)
    return f"""
WITH toks AS (
    SELECT {id_col}, unnest(string_split(lower({text_col}), ' ')) AS term FROM {table}
),
tf AS (
    SELECT {id_col}, term, count(*) AS tf FROM toks
    WHERE term IN ({terms}) GROUP BY 1, 2
),
docfreq AS (SELECT term, count(DISTINCT {id_col}) AS df FROM tf GROUP BY 1),
stats AS (
    SELECT count(*) AS n_docs,
           avg(len(string_split(lower({text_col}), ' '))) AS avgdl
    FROM {table}
),
dl AS (SELECT {id_col}, len(string_split(lower({text_col}), ' ')) AS dl FROM {table}),
scored AS (
    SELECT tf.{id_col},
           ln(1.0 + (stats.n_docs - docfreq.df + 0.5) / (docfreq.df + 0.5))
             * tf.tf * ({k1} + 1)
             / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / stats.avgdl)) AS term_score
    FROM tf JOIN docfreq USING (term) JOIN dl USING ({id_col}) CROSS JOIN stats
),
top AS (
    SELECT {id_col}, round(sum(term_score), 6) AS score
    FROM scored GROUP BY {id_col}
    ORDER BY score DESC, {id_col} LIMIT {k}
)
SELECT {id_col}, score,
       CAST(row_number() OVER (ORDER BY score DESC, {id_col}) AS BIGINT) AS rank
FROM top
"""

def ce_buckets(df: DataFrame, id_col: str, text_col: str,
               n_buckets: int = 3) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): assign
    every document to a quantile band of the corpus cross-entropy
    distribution — with the classic ``n_buckets=3``, bucket 0 is the
    fluent *head* (lowest CE), 1 the *middle*, 2 the noisy *tail*.  CCNet
    trains the mixture on head+middle and drops or down-weights the tail;
    the bucket column is exactly the stratum key
    :func:`~mandodb_spark.operators.sampling.stratified` consumes.

    The band edges are one ``approxQuantile`` over the scored relation
    (driver gets ``n_buckets - 1`` numbers — bounded metadata); the
    assignment is the same sum-of-comparisons rank as the Z-order
    bucketing, pure codegen.  Output: ``(id, n_tokens, unigram_ce,
    bucket)``.
    """
    ce = unigram_cross_entropy(df, id_col, text_col)
    edges = ce.approxQuantile(
        "unigram_ce", [i / n_buckets for i in range(1, n_buckets)], 0.001
    )
    bucket: Column = F.lit(0)
    for e in edges:
        bucket = bucket + (F.col("unigram_ce") > F.lit(e)).cast("int")
    return ce.withColumn("bucket", bucket.cast("long"))


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    chunk_size: int, overlap: int = 0) -> DataFrame:
    """Split every document into fixed-size token-window chunks — the
    sequence-preparation step in front of embedding models (RAG indexing)
    and context-window-bounded training corpora.  Beyond-reference surface
    (the reference stores points, not text).

    Windowing rule (pinned by the SQL mirror): tokens are the
    case-preserving single-space split; ``stride = chunk_size - overlap``;
    chunk *i* covers tokens ``[i*stride, i*stride + chunk_size)``; the
    number of chunks is ``1`` when ``n <= chunk_size`` else
    ``ceil((n - chunk_size) / stride) + 1`` — the final chunk may be short
    but always reaches the last token, and no start index ever points past
    the end (so no empty trailing chunks).  NULL text produces no chunks.

    Scale shape: one projection + ``posexplode`` — pure map-side fan-out,
    zero shuffles, parallel over input splits; output rows carry a stable
    ``chunk_id = '<doc>#<idx>'`` so downstream dedup/embedding stages can
    key on chunks without re-deriving offsets.  Fan-out is ~n/stride rows
    per doc, bounded by the same data volume as the input text (each token
    appears in at most ``ceil(chunk_size/stride)`` chunks).
    """
    if chunk_size <= 0 or not (0 <= overlap < chunk_size):
        raise ValueError("need chunk_size > 0 and 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks).cast("long")
    n_chunks = F.when(n <= chunk_size, F.lit(1)).otherwise(
        F.floor((n - chunk_size + stride - 1) / stride) + 1
    )
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), toks.alias("__toks"), n_chunks.alias("__nc")
    )
    piece = F.slice(
        F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_size
    )
    return (
        base.select(
            F.col(id_col),
            F.posexplode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias(
                "chunk_idx", "__i"
            ),
            F.col("__toks"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.concat(F.col(id_col).cast("string"), F.lit("#"),
                     F.col("chunk_idx").cast("string")).alias("chunk_id"),
            F.size(piece).cast("long").alias("n_tokens"),
            F.array_join(piece, " ").alias("chunk_text"),
        )
    )


def chunk_documents_sql(table: str, id_col: str, text_col: str,
                        chunk_size: int, overlap: int = 0) -> str:
    """DuckDB mirror of :func:`chunk_documents` (oracle generator)."""
    st = chunk_size - overlap
    return f"""
WITH base AS (
    SELECT {id_col},
           string_split({text_col}, ' ') AS toks,
           len(string_split({text_col}, ' ')) AS n
    FROM {table}
    WHERE {text_col} IS NOT NULL
), c AS (
    SELECT {id_col}, toks,
           CASE WHEN n <= {chunk_size} THEN 1
                ELSE (n - {chunk_size} + {st} - 1) // {st} + 1 END AS n_chunks
    FROM base
), e AS (
    SELECT {id_col}, toks, unnest(range(0, n_chunks)) AS i FROM c
)
SELECT {id_col},
       CAST(i AS BIGINT) AS chunk_idx,
       {id_col} || '#' || i AS chunk_id,
       CAST(len(list_slice(toks, i * {st} + 1, i * {st} + {chunk_size})) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(toks, i * {st} + 1, i * {st} + {chunk_size}), ' ') AS chunk_text
FROM e
"""


#: Entity decode table applied AFTER tag stripping, in order; ``&amp;``
#: must come last so "&amp;lt;" decodes to the literal "&lt;", not "<".
_MARKUP_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def strip_markup(text: Column) -> Column:
    """Web-pipeline markup stripping (trafilatura/CCNet-lite): drop
    ``<script>``/``<style>`` blocks and HTML comments, remove tags,
    decode the common entities, collapse whitespace.

    Pure ``regexp_replace`` chain — JVM-side whole-stage codegen, no
    UDF — so it runs at scan speed over a 100 TB crawl.  Patterns are
    restricted to the Java∩RE2 common dialect (no backreferences) so
    :func:`strip_markup_sql` is an exact DuckDB mirror.
    """
    c = F.regexp_replace(text, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, rep in _MARKUP_ENTITIES:
        c = F.regexp_replace(c, ent, rep)
    return F.trim(F.regexp_replace(c, r"[ \t\r\n]+", " "))


def strip_markup_sql(text_expr: str) -> str:
    """DuckDB mirror of :func:`strip_markup` (oracle generator).

    DuckDB's ``regexp_replace`` replaces only the FIRST match unless the
    ``'g'`` flag is passed — every step here passes it explicitly (Spark
    is global by default; this asymmetry is the one dialect trap)."""
    c = f"regexp_replace({text_expr}, '(?s)<!--.*?-->', ' ', 'g')"
    c = f"regexp_replace({c}, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    c = f"regexp_replace({c}, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    c = f"regexp_replace({c}, '<[^>]+>', ' ', 'g')"
    for ent, rep in _MARKUP_ENTITIES:
        lit = rep.replace("'", "''")
        c = f"replace({c}, '{ent}', '{lit}')"
    return f"trim(regexp_replace({c}, '[ \\t\\r\\n]+', ' ', 'g'))"


def reassemble_chunks(chunks: DataFrame, id_col: str, overlap: int = 0) -> DataFrame:
    """Inverse of :func:`chunk_documents`: stitch ``(id, chunk_idx,
    chunk_text)`` rows back into one document per id, dropping each
    non-first chunk's leading ``overlap`` tokens (they duplicate the
    previous chunk's tail under the windowing rule).

    Roundtrip contract (property-tested):
    ``reassemble_chunks(chunk_documents(df, c, o), o)`` reproduces the
    original text byte-for-byte for single-space-tokenized input.  The
    rebuild is one groupBy with ``array_agg`` of (idx, trimmed-tokens)
    structs + an in-row sort — order never relies on shuffle order, so
    the operator is deterministic under any partitioning.
    """
    if overlap < 0:
        raise ValueError("overlap must be >= 0")
    toks = F.split(F.col("chunk_text"), " ")
    kept = F.when(F.col("chunk_idx") == 0, toks).otherwise(
        F.slice(toks, overlap + 1, 2**30)
    )
    packed = F.struct(F.col("chunk_idx").alias("i"), kept.alias("t"))
    return (
        chunks.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(packed)).alias("__ps"))
        .select(
            F.col(id_col),
            F.array_join(F.flatten(F.col("__ps.t")), " ").alias("text"),
        )
    )


def skipgram_pairs(df: DataFrame, id_col: str, text_col: str,
                   window: int = 2) -> DataFrame:
    """(center, context) training-pair generation — the word2vec/skip-gram
    data prep: for every token, every neighbor within ``window`` positions
    becomes one pair, direction preserved via the position delta.

    Pure generator pipeline (posexplode the token array, explode the
    ±window slice around each position) — whole-stage codegen, zero
    shuffles, fan-out ≤ 2·window rows per token; the aggregation a trainer
    wants next (pair counts, negatives) is the caller's groupBy.  Exact
    DuckDB mirror (:func:`skipgram_pairs_sql`) pins the windowing rule.

    Output: ``(id, pos, center, context, delta)`` with delta = context
    position − center position (≠ 0, |delta| ≤ window).
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    toks = tokens(F.col(text_col))
    pos = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), toks.alias("__t"),
    ).select("id", "__t", F.posexplode("__t").alias("pos", "center"))
    # token array rides along through both generators — no join back
    return pos.select(
        "id", "__t", "pos", "center",
        F.explode(F.sequence(F.lit(-window), F.lit(window))).alias("delta"),
    ).filter(
        (F.col("delta") != 0)
        & (F.col("pos") + F.col("delta") >= 0)
        & (F.col("pos") + F.col("delta") < F.size("__t"))
    ).select(
        "id",
        F.col("pos").cast("long").alias("pos"),
        "center",
        F.element_at(F.col("__t"), (F.col("pos") + F.col("delta") + 1).cast("int"))
        .alias("context"),
        F.col("delta").cast("long").alias("delta"),
    )


def skipgram_pairs_sql(table: str, id_col: str, text_col: str,
                       window: int = 2) -> str:
    """DuckDB mirror of :func:`skipgram_pairs` (oracle generator)."""
    return f"""
WITH t AS (
    SELECT {id_col} AS id, string_split(lower({text_col}), ' ') AS toks
    FROM {table} WHERE {text_col} IS NOT NULL
), p AS (
    SELECT id, toks, unnest(range(0, len(toks))) AS pos FROM t
), d AS (
    SELECT p.*, unnest(range(-{window}, {window} + 1)) AS delta FROM p
)
SELECT id, CAST(pos AS BIGINT) AS pos,
       toks[CAST(pos AS INTEGER) + 1] AS center,
       toks[CAST(pos + delta AS INTEGER) + 1] AS context,
       CAST(delta AS BIGINT) AS delta
FROM d
WHERE delta <> 0 AND pos + delta >= 0 AND pos + delta < len(toks)
"""


def subsample_frequent(df: DataFrame, id_col: str, text_col: str,
                       t: float = 1e-3, salt: str = "w2v") -> DataFrame:
    """word2vec frequent-token subsampling: drop each occurrence of token
    w with probability 1 − p_keep(w), p_keep = min(1, √(t/f) + t/f) with
    f = corpus frequency of w — the discard rule from the word2vec code
    (stop-words thin out, rare words always survive).

    The draw is the repo's deterministic hash-unit over (doc, position,
    token) — same corpus in, same corpus out, across runs AND engines, so
    the DuckDB mirror is exact.  Plan: one token-count aggregate (the
    vocab is broadcast back), one explode + filter, one per-doc regroup —
    two shuffles total.  Output: ``(id, text)`` with surviving tokens
    rejoined in order; docs whose every token was dropped keep an empty
    string (the row survives — dropping it is the caller's gate call).
    """
    toks = tokens(F.col(text_col))
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.posexplode(toks).alias("pos", "tok"))
    vocab = base.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = base.groupBy().agg(F.count(F.lit(1)).alias("total"))
    from .sampling import hash_unit  # deterministic uniform-[0,1)

    f = F.col("cnt").cast("double") / F.col("total").cast("double")
    p_keep = F.least(F.lit(1.0), F.sqrt(F.lit(t) / f) + F.lit(t) / f)
    kept = (
        base.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .filter(
            hash_unit(F.concat_ws(":", F.col("id"), F.col("pos"), F.col("tok")),
                      salt) < p_keep
        )
    )
    return (
        kept.groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "tok"))).alias("__ps"))
        .select(F.col("id").alias(id_col),
                F.array_join(F.col("__ps.tok"), " ").alias(text_col))
    )


def subsample_frequent_sql(table: str, id_col: str, text_col: str,
                           t: float = 1e-3, salt: str = "w2v") -> str:
    """DuckDB mirror of :func:`subsample_frequent` (oracle generator)."""
    from .sampling import hash_unit_sql

    unit = hash_unit_sql(f"id || ':' || pos || ':' || tok", salt)
    return f"""
WITH t0 AS (
    SELECT {id_col} AS id, string_split(lower({text_col}), ' ') AS toks
    FROM {table} WHERE {text_col} IS NOT NULL
), base AS (
    SELECT id, x.i - 1 AS pos, toks[x.i] AS tok
    FROM t0, LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) x
), vocab AS (SELECT tok, count(*) AS cnt FROM base GROUP BY tok),
tot AS (SELECT count(*) AS total FROM base),
kept AS (
    SELECT b.id, b.pos, b.tok FROM base b JOIN vocab USING (tok), tot
    WHERE {unit} < least(1.0, sqrt({t!r} / (CAST(cnt AS DOUBLE) / total))
                              + {t!r} / (CAST(cnt AS DOUBLE) / total))
)
SELECT id AS {id_col}, array_to_string(list(tok ORDER BY pos), ' ') AS {text_col}
FROM kept GROUP BY id
"""
