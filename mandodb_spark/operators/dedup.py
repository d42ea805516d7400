"""Deduplication operators for training-data pipelines.

Beyond-reference surface: exact dedup, MinHash+LSH candidate generation,
and n-gram Jaccard verification — the standard near-dup stack for corpus
curation, built to hold at 100 TB:

- No pairwise O(n²) stage ever materializes: candidates come from the LSH
  band join (equi-join on (band, hash) — a shuffle hash join on a
  high-selectivity key), and only candidates get exact Jaccard.
- Hash functions are md5 (identical across engines) so every stage has an
  exact DuckDB oracle; lexicographic min over hex digests is the MinHash
  order (no platform-dependent integer hashing).
- All stages are DataFrame-native: explode → groupBy → join.  No UDFs,
  no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Defaults: 8 minhashes in 2 bands of 4 → P(candidate) = 1-(1-s⁴)²,
#: steep around s≈0.7 — tuned for "near-duplicate", not "vaguely similar".
N_HASHES = 8
N_BANDS = 2
SHINGLE_LEN = 8
SHINGLE_STRIDE = 4


def char_shingles(text: Column, length: int = SHINGLE_LEN, stride: int = SHINGLE_STRIDE) -> Column:
    """Character shingles of `length` starting every `stride` chars."""
    positions = F.sequence(F.lit(1), F.greatest(F.length(text) - F.lit(length - 1), F.lit(1)), F.lit(stride))
    return F.transform(positions, lambda p: text.substr(p, F.lit(length)))


def exact_dedup_groups(df: DataFrame, id_col: str, key: Column) -> DataFrame:
    """Exact duplicate groups by an arbitrary content key (hash-groupBy).

    Returns one row per distinct key: the kept id (min), the duplicate
    count.  For byte-exact dedup pass ``F.md5(col)``; for bag-of-words
    dedup pass :func:`mandodb_spark.operators.text.bow_fingerprint`.
    """
    return (
        df.select(F.col(id_col), key.alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def shingle_sets(df: DataFrame, id_col: str, text_col: str,
                 length: int = SHINGLE_LEN, stride: int = SHINGLE_STRIDE) -> DataFrame:
    """Distinct (id, shingle) pairs — the set representation used by both
    MinHash signatures and exact Jaccard verification.

    Positions are exploded first and the substring runs as a plain scalar
    expression (whole-stage codegen); the higher-order ``transform`` form
    is ~4× slower because lambda functions are interpreted per element.
    The explode is narrow — only the final (id, shingle) projection
    shuffles, for the distinct.
    """
    lowered = df.select(F.col(id_col), F.lower(F.col(text_col)).alias("__lt"))
    positions = F.sequence(
        F.lit(1), F.greatest(F.length("__lt") - F.lit(length - 1), F.lit(1)), F.lit(stride)
    )
    return (
        lowered.select(F.col(id_col), F.col("__lt"), F.explode(positions).alias("__p"))
        .select(F.col(id_col), F.expr(f"substring(__lt, __p, {length})").alias("sh"))
        .distinct()
    )


def minhash_signatures(shingles: DataFrame, id_col: str, n_hashes: int = N_HASHES) -> DataFrame:
    """MinHash signature per id: h_i = min over shingles of the numeric
    value of md5(i || ':' || shingle)'s first 15 hex digits (60-bit hash).

    One groupBy produces all n_hashes signature components as columns
    (single shuffle, map-side partial min).  The hash is NUMERIC, not the
    hex string: ``min(string)`` has a variable-width agg buffer, which
    disqualifies HashAggregate and silently degrades the whole signature
    stage to Sort+SortAggregate — a per-partition sort of the full shingle
    relation at 100 TB.  ``min(long)`` keeps it a codegen'd HashAggregate.
    (Found via .explain; the 60-bit truncation is engine-agnostic:
    DuckDB mirrors it as CAST(concat('0x', substr(md5(..),1,15)) AS BIGINT).)
    """
    mins = [
        F.min(
            F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh"))), 1, 15), 16, 10).cast(
                "long"
            )
        ).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return shingles.groupBy(id_col).agg(*mins)


def lsh_candidate_pairs(signatures: DataFrame, id_col: str,
                        n_hashes: int = N_HASHES, n_bands: int = N_BANDS) -> DataFrame:
    """LSH banding: equal band-hash in any band → candidate pair (a < b).

    The band join is an equi-join on (band index, band hash) — Spark plans
    a shuffle hash join keyed on the band hash, so the cost is proportional
    to true collisions, never to n².
    """
    rows_per_band = n_hashes // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"h{b * rows_per_band + r}").cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bh"),
            )
            for b in range(n_bands)
        ]
    )
    # Deliberately NOT persisted: measured 3× slower with .persist() at
    # sf0.01 (cache materialization + broken codegen pipelines cost more
    # than the recompute), and un-cleaned caches accumulate in a long-lived
    # session (ADVICE r1).  At cluster scale the signature table would be a
    # checkpointed/bucketed intermediate table instead of an in-memory cache.
    exploded = (
        signatures.select(F.col(id_col), F.explode(bands).alias("e"))
        .select(F.col(id_col), F.col("e.band").alias("band"), F.col("e.bh").alias("bh"))
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_verify(candidates: DataFrame, shingles: DataFrame, id_col: str,
                   threshold: float) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs; keep >= threshold.

    intersection via double equi-join on the shingle value; set sizes from
    a per-id count.  Cost is bounded by candidate count × shingle overlap.
    """
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sh_a = shingles.select(F.col(id_col).alias("id_a"), F.col("sh"))
    sh_b = shingles.select(F.col(id_col).alias("id_b"), F.col("sh"))
    inter = (
        candidates.join(sh_a, "id_a").join(sh_b, ["id_b", "sh"]).groupBy("id_a", "id_b").agg(
            F.count(F.lit(1)).alias("n_inter")
        )
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


def simhash_band_pairs(hashes: DataFrame, id_col: str, hash_col: str = "simhash",
                       n_bits: int = 16, n_bands: int = 4, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: band-LSH candidates + exact Hamming verify.

    Pigeonhole guarantee: two hashes within Hamming distance d < n_bands
    must agree on at least one band, so the band equi-join is a *lossless*
    candidate generator for ``max_hamming <= n_bands - 1`` — no recall loss,
    and never an O(n²) cross product.  The verify is a single JVM-side
    ``bit_count(a XOR b)`` on candidates only.  Same shuffle shape as
    :func:`lsh_candidate_pairs`: explode n_bands rows per doc, shuffle hash
    join on (band, band-value) — at 100 TB the join key has ~2^bits_per_band
    × n_bands distinct values per skew domain, so salting is not needed
    unless one band value degenerates (e.g. all-zero hashes).
    """
    bits_per_band = n_bits // n_bands
    mask = (1 << bits_per_band) - 1
    h = F.col(hash_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(h, b * bits_per_band).bitwiseAND(F.lit(mask)).alias("bv"),
            )
            for b in range(n_bands)
        ]
    )
    # Not persisted — same measured trade as lsh_candidate_pairs.
    exploded = (
        hashes.select(F.col(id_col), h.alias("__h"), F.explode(bands).alias("e"))
        .select(F.col(id_col), F.col("__h"), F.col("e.band").alias("band"), F.col("e.bv").alias("bv"))
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bv") == F.col("b.bv")))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.__h").alias("__ha"),
            F.col("b.__h").alias("__hb"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb"))).cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def token_ngrams(text: Column, n: int) -> Column:
    """Distinct word n-grams of lowercased whitespace-tokenized text."""
    toks = F.split(F.lower(text), " ")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(toks, i, F.lit(n)), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def ngram_contamination(eval_df: DataFrame, bench_df: DataFrame, id_col: str,
                        text_col: str, n: int = 5, threshold: float = 0.2) -> DataFrame:
    """Benchmark decontamination: per eval document, the fraction of its
    distinct token n-grams that occur anywhere in the benchmark corpus
    (the train/test-overlap check every pretraining pipeline runs).

    The benchmark n-gram set is the SMALL side by construction (eval = the
    100 TB corpus, benchmark = a bounded eval suite), so it is broadcast
    and the probe is a broadcast LEFT join at scan parallelism — the only
    shuffle is the per-doc regroup.  Gopher/GPT-3 use 8–13-gram overlap;
    ``n`` and ``threshold`` are the same knobs.
    """
    bench_ngrams = (
        bench_df.select(F.explode(token_ngrams(F.col(text_col), n)).alias("ng"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    ev = eval_df.select(
        F.col(id_col), F.explode(token_ngrams(F.col(text_col), n)).alias("ng")
    )
    return (
        ev.join(F.broadcast(bench_ngrams), "ng", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_matched"),
        )
        .select(
            F.col(id_col),
            F.col("n_ngrams").cast("long"),
            F.col("n_matched").cast("long"),
            F.round(F.col("n_matched") / F.col("n_ngrams"), 4).alias("contamination_frac"),
            (F.col("n_matched") / F.col("n_ngrams") >= F.lit(threshold)).alias("contaminated"),
        )
    )


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      threshold: float = 0.5,
                      n_hashes: int = N_HASHES, n_bands: int = N_BANDS) -> DataFrame:
    """End-to-end near-dup pipeline: shingle → minhash → LSH → verified
    Jaccard pairs (id_a < id_b, jaccard >= threshold).

    The shingle set feeds both the signature stage and the verify stage.
    It is deliberately not .persist()ed: measured 3× faster without (the
    cache materialization costs more than recomputing the narrow explode
    from the scan) and nothing is left in executor storage memory after
    the query (ADVICE r1).  At cluster scale the shingle/signature tables
    would be checkpointed intermediate tables, not in-memory caches.
    """
    sh = shingle_sets(df, id_col, text_col)
    sigs = minhash_signatures(sh, id_col, n_hashes)
    cands = lsh_candidate_pairs(sigs, id_col, n_hashes, n_bands)
    return jaccard_verify(cands, sh, id_col, threshold)
