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

from pyspark.sql import Column, DataFrame, Window
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


def exact_dedup_best(df: DataFrame, id_col: str, key: Column,
                     order: Column) -> DataFrame:
    """Exact duplicate groups keeping the BEST duplicate per content key —
    argmax of a numeric ``order`` (quality score, length, recency) with
    min-id tiebreak — instead of :func:`exact_dedup_groups`' min-id rule.
    The curation default is "keep the highest-quality copy", not "keep
    the first-seen copy".

    ONE single-shuffle aggregate: the winner is ``min(struct(-order,
    id))`` — struct ordering makes (max order, then min id) a plain
    ``min`` with a fixed-width 16-byte buffer, so it still combines
    map-side (partial min before the exchange) like the min-id variant.
    Caveat, eyes open: a struct-typed min falls off HashAggregate onto
    SortAggregate (same trap as min(string) in the minhash pipeline,
    fixed there by min(long)); the alternative that stays hash-based —
    max(order) per key, join back, min(id) — costs a SECOND shuffle plus
    a join, which loses at scale.  One sorted pass beats two hashed
    passes; the span-dedup winner selection (further down this file)
    made the same call.  No window, no per-group sort of *all* rows.
    Output: ``(fp, keep_id, best_order, n_docs)``.
    """
    return (
        df.select(F.col(id_col), key.alias("fp"), order.alias("__o"))
        .groupBy("fp")
        .agg(
            F.min(F.struct((-F.col("__o")).alias("no"),
                           F.col(id_col).alias("i"))).alias("__w"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .select(
            "fp",
            F.col("__w.i").alias("keep_id"),
            (-F.col("__w.no")).alias("best_order"),
            "n_docs",
        )
    )


def shingle_sets(df: DataFrame, id_col: str, text_col: str,
                 length: int = SHINGLE_LEN, stride: int = SHINGLE_STRIDE) -> DataFrame:
    """Distinct (id, shingle) pairs — the set representation used by both
    MinHash signatures and exact Jaccard verification.

    Positions are exploded first and the substring runs as a plain scalar
    expression (whole-stage codegen); the higher-order ``transform`` form
    is ~4× slower because lambda functions are interpreted per element.

    Parallelism (r13): the document table is byte-light (one file split
    at bench scale), so the explode → substring chain otherwise runs at
    SCAN parallelism — serial — while fanning each doc out ~250×.  The
    input is round-robin spread to :func:`_pinned_parallelism` first (a
    doc-count-sized exchange buys a corpus-×250-sized map stage all its
    cores), and the dedup's exchange is pinned on the grouping keys so
    its reduce side isn't AQE-coalesced back to 1–2 partitions.  The pin
    trades map-side partial dedup for reduce parallelism — in-doc
    stride-4 shingle repeats are rare, so the partials removed little;
    measured min-of-4 at sf0.1 the pinned form wins 3.54 → 2.93 s on
    jaccard_join end-to-end.  Output partitioning: hash(id, sh) at
    pinned parallelism.
    """
    n_par = _pinned_parallelism(df.sparkSession)
    lowered = df.select(
        F.col(id_col), F.lower(F.col(text_col)).alias("__lt")
    ).repartition(n_par)
    positions = F.sequence(
        F.lit(1), F.greatest(F.length("__lt") - F.lit(length - 1), F.lit(1)), F.lit(stride)
    )
    return (
        lowered.select(F.col(id_col), F.col("__lt"), F.explode(positions).alias("__p"))
        .select(F.col(id_col), F.expr(f"substring(__lt, __p, {length})").alias("sh"))
        .repartition(n_par, F.col(id_col), F.col("sh"))
        .dropDuplicates()
    )


def _minhash_cols(n_hashes: int) -> list[Column]:
    """n_hashes 32-bit hash columns per shingle row, derived from
    ceil(n/4) md5 digests sliced into disjoint 8-hex-digit windows.

    One md5 serves FOUR hash functions: computing n separate salted md5s
    per row made the digest the pipeline's hot loop (measured ~2.2s of a
    3.8s query at sf0.1); slicing cuts digest work 4×.  The slices are
    disjoint bits of independent digests — exactly the md5's output bits,
    so each h_i is still uniform; 32 bits is ample for min-ordering
    (P[tie within a doc] ≈ s²/2³³ at s shingles/doc).
    """
    cols = []
    for i in range(n_hashes):
        salt, window = divmod(i, 4)
        digest = F.md5(F.concat(F.lit(f"{salt}:"), F.col("sh")))
        cols.append(
            F.conv(F.substring(digest, 8 * window + 1, 8), 16, 10).cast("long").alias(f"h{i}")
        )
    return cols


def minhash_signatures(shingles: DataFrame, id_col: str, n_hashes: int = N_HASHES) -> DataFrame:
    """MinHash signature per id: h_i = min over shingles of a 32-bit slice
    of md5((i div 4) || ':' || shingle) (see :func:`_minhash_cols`).

    The per-row hashes are PROJECTED before the aggregation so each md5 is
    computed exactly once per shingle row, then one groupBy produces all
    n_hashes signature components (single shuffle, map-side partial min).
    The hash is NUMERIC, not the hex string: ``min(string)`` has a
    variable-width agg buffer, which disqualifies HashAggregate and
    silently degrades the whole signature stage to Sort+SortAggregate — a
    per-partition sort of the full shingle relation at 100 TB.
    ``min(long)`` keeps it a codegen'd HashAggregate.  (Found via
    .explain; DuckDB mirrors the slice as
    CAST(concat('0x', substr(md5(..), 8*w+1, 8)) AS BIGINT).)
    """
    hashed = shingles.select(F.col(id_col), *_minhash_cols(n_hashes))
    return hashed.groupBy(id_col).agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(n_hashes)]
    )


def _band_array(n_hashes: int, n_bands: int) -> Column:
    """array<struct<band,bh>> of per-band hashes from h0..h{n-1} columns."""
    rows_per_band = n_hashes // n_bands
    return F.array(
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


#: Defensive bound on bucket-grouped pair expansion: a bucket's member
#: array (and its O(k²) pair expansion) must fit one task comfortably.
#: MinHash band buckets are true-near-dup clusters (measured max 4 members
#: at sf0.1), so this never binds at test scale — it exists for degenerate
#: corpora (e.g. millions of byte-identical docs) where the correct answer
#: to "every pair in a 10⁶-dup cluster" is a cap + representative, not a
#: 10¹² pair list.  Members are sorted before slicing → deterministic.
MAX_BUCKET_MEMBERS = 4096


def _bucket_pairs(buckets: DataFrame, cap: int = MAX_BUCKET_MEMBERS) -> DataFrame:
    """All i<j member pairs from each bucket's ``ids`` array as (id_a,
    id_b) rows, deduplicated across buckets.

    Two chained JVM generators (posexplode the sorted member array, then
    explode the tail slice past each position) — pair expansion stays in
    whole-stage codegen.  The previous higher-order ``transform×transform``
    lambda built the full pair array per bucket in the *interpreted*
    expression evaluator, the measured hot spot of docs_minhash_pairs'
    round-2 regression (VERDICT r2).  Members sort before slicing →
    deterministic pair set; ``cap`` bounds degenerate buckets (see
    :data:`MAX_BUCKET_MEMBERS`).
    """
    return (
        buckets.select(F.slice(F.array_sort("ids"), 1, cap).alias("ids"))
        .select(F.posexplode("ids").alias("__i", "id_a"), F.col("ids"))
        .select("id_a", F.expr("explode(slice(ids, __i + 2, size(ids)))").alias("id_b"))
        .distinct()
    )


def lsh_candidate_pairs(signatures: DataFrame, id_col: str,
                        n_hashes: int = N_HASHES, n_bands: int = N_BANDS) -> DataFrame:
    """LSH banding: equal band-hash in any band → candidate pair (a < b).

    Buckets are formed by ONE shuffle on (band, band-hash) with the member
    list collected per bucket, and pairs expand from the (sorted) member
    array — the signature subplan is computed exactly once.  The previous
    self-join shape computed the whole shingle→signature pipeline once PER
    SIDE (Spark's ReuseExchange does not fire once AQE broadcasts a side,
    and an un-unpersisted .persist() leaks cache in long sessions —
    ADVICE r1).  Pair count is still ∝ true collisions, never n²; the
    per-bucket expansion is O(k²) on LSH-bounded bucket sizes (a
    degenerate band value concentrates in one task either way — that risk
    is inherent to LSH banding, not to this shape).
    """
    exploded = (
        signatures.select(F.col(id_col), F.explode(_band_array(n_hashes, n_bands)).alias("e"))
        .select(F.col(id_col), F.col("e.band").alias("band"), F.col("e.bh").alias("bh"))
    )
    buckets = (
        exploded.groupBy("band", "bh")
        .agg(F.collect_list(F.col(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    return _bucket_pairs(buckets)


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
                       n_bits: int = 64, n_bands: int = 4, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup pairs: band-LSH candidates + exact Hamming verify.

    Pigeonhole guarantee: two hashes within Hamming distance d < n_bands
    must agree on at least one band, so the band equi-join is a *lossless*
    candidate generator for ``max_hamming <= n_bands - 1`` — no recall loss,
    and never an O(n²) cross product.  The verify is a single JVM-side
    ``bit_count(a XOR b)`` on candidates only.  Same shuffle shape as
    :func:`lsh_candidate_pairs`: explode n_bands rows per doc, shuffle hash
    join on (band, band-value).

    Band width is the scale parameter (VERDICT r2): two *random* docs share
    a band value with probability ≈ n_bands·2^-bits_per_band, and that floor
    multiplies n² in expected candidate volume.  The production default is
    Manku et al.'s 64-bit fingerprint in 4×16-bit bands — collision floor
    4·2⁻¹⁶ ≈ 6e-5, so candidates track true near-dups; the old 32-bit/8-bit
    parameterization's 1.6% floor made candidates Θ(n²/256) at any scale.
    Shift-and-mask band extraction is sign-safe: arithmetic shiftright's
    sign-extension is cut off by the mask, so bit 63 (the BIGINT sign bit)
    is just another fingerprint bit on both engines.

    Shape: bucket-grouped pair expansion, the same as minhash's
    :func:`lsh_candidate_pairs` — ONE shuffle on (band, band-value), sorted
    member structs per bucket, i<j expansion through two chained JVM
    generators, ``MAX_BUCKET_MEMBERS`` capping degenerate buckets.  This
    SINGLE-LINEAGE form replaced the earlier self-equi-join: the join
    aliased the fingerprint subplan twice, and because MapInPandas nodes do
    not canonicalize equal, neither ReuseExchange nor AQE stage reuse fired
    (verified empirically) — the Arrow fingerprint pass over the whole
    corpus ran once per join side.  Bucket-grouping references the
    fingerprints exactly once, with no persisted state.  (The r2-era
    objection to bucket-grouping — one 8-bit band value holding 3.2k of 5k
    docs — died with the 8-bit bands; at 16 bits, collisions are true
    near-dups and buckets stay small by construction, with the cap as the
    degenerate-corpus guard, same semantics as minhash.)
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
    exploded = (
        hashes.select(F.col(id_col), h.alias("__h"), F.explode(bands).alias("e"))
        .select(F.col(id_col), F.col("__h"), F.col("e.band").alias("band"), F.col("e.bv").alias("bv"))
    )
    buckets = (
        exploded.groupBy("band", "bv")
        .agg(F.slice(F.sort_array(F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("__h").alias("h")))), 1, MAX_BUCKET_MEMBERS).alias("ms"))
        .filter(F.size("ms") >= 2)
    )
    return (
        buckets.select(F.posexplode("ms").alias("__i", "a"), F.col("ms"))
        .select("a", F.expr("explode(slice(ms, __i + 2, size(ms)))").alias("b"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.h").alias("__ha"),
            F.col("b.h").alias("__hb"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb"))).cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def token_ngrams(text: Column, n: int) -> Column:
    """Distinct word n-grams of lowercased whitespace-tokenized text
    (COLUMN form, for composition inside other expressions on short
    strings — the per-element ``transform`` lambda is interpreted, so
    corpus-scale paths use the explode-first scalar construction inside
    :func:`ngram_contamination` instead; measured 2.7× at sf0.1)."""
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
    and the probe is a broadcast LEFT join at scan parallelism.  Gopher/
    GPT-3 use 8–13-gram overlap; ``n`` and ``threshold`` are the knobs.

    N-grams are built explode-first (positions explode, gram = scalar
    ``array_join(slice(...))`` — whole-stage codegen) rather than with a
    per-element ``transform`` lambda (interpreted; measured 2.7× slower
    end-to-end at sf0.1).  The per-doc dedup becomes a (doc, gram)
    ``distinct`` shuffle — the same relation tf-idf/token-entropy already
    shuffle, traded for getting the gram construction out of the
    interpreted evaluator (the same explode-vs-transform call
    :func:`shingle_sets` documents).
    """
    def grams(df: DataFrame, keep_id: bool):
        ids = [F.col(id_col)] if keep_id else []
        toks = df.select(*ids, F.split(F.lower(F.col(text_col)), " ").alias("__toks"))
        # empty position array for docs shorter than n tokens (an unguarded
        # sequence(1, size-n+1) runs DESCENDING when size < n)
        positions = F.when(
            F.size("__toks") >= n,
            F.sequence(F.lit(1), F.size("__toks") - F.lit(n - 1)),
        ).otherwise(F.array().cast("array<int>"))
        exploded = toks.select(*ids, F.col("__toks"), F.explode(positions).alias("__p"))
        return exploded.select(
            *ids, F.expr(f"array_join(slice(__toks, __p, {n}), ' ')").alias("ng")
        )

    bench_ngrams = grams(bench_df, False).distinct().withColumn("__hit", F.lit(1))
    ev = grams(eval_df, True).distinct()
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
                      n_hashes: int = N_HASHES, n_bands: int = N_BANDS,
                      new_ids: DataFrame | None = None) -> DataFrame:
    """End-to-end near-dup pipeline: shingle → minhash → LSH → verified
    Jaccard pairs (id_a < id_b, jaccard >= threshold).

    Fused for ONE corpus-wide shuffle (nothing is ever left persisted —
    ADVICE r1):

    - signatures aggregate the RAW exploded shingles — no ``distinct``
      first, because min over a multiset equals min over its set, so the
      dedup shuffle of the full shingle relation is simply dropped;
    - candidates come from bucket grouping (collect_list per (band, hash),
      JVM-generator pair expansion — :func:`_bucket_pairs`), so the
      shingle→signature subplan is computed exactly once — never
      self-joined;
    - Jaccard verification first SEMI-JOINS the corpus to the candidate id
      set (broadcast — candidates are LSH-bounded, tiny), so the per-doc
      shingle ARRAYS are built for candidate documents only, then
      intersects them row-wise (``array_intersect`` is hash-based,
      O(|a|+|b|)).  Round 2 built the arrays for the whole corpus on both
      join roles — two extra full-corpus shingle passes that the bench
      caught as a 71% regression (VERDICT r2);
    - every expensive subplan is SINGLE-REFERENCE (round-5 profile): the
      candidate id set comes from ``explode(array(id_a, id_b))`` (one
      reference to the candidate subplan, where the old two-branch union
      re-executed it), and the verify joins the candidate-doc arrays ONCE
      — pairs explode into (role, id) rows, join the arrays on id, and a
      groupBy (id_a, id_b) folds the two roles back into one row.  That
      replaced a per-role double join which re-scanned the corpus and
      re-ran the signature pipeline once per role: executed plan went
      from 7 parquet scans / 15 exchanges to 3 scans / 7 exchanges, with
      the new cost being one candidate-bounded shuffle of shingle arrays
      (pairs ≪ corpus by LSH construction, so that trade wins at scale).

    At 100 TB: ONE signature-pipeline execution (the candidate pair set
    is materialized once — see the localCheckpoint below), 1 corpus scan
    for candidate arrays, verify ∝ candidates.  The LSH collision set,
    never n², bounds the verify cost.  Remaining local-mode cost is
    per-stage scheduling, not compute — see SCALE.md's minhash profile.

    EAGER + RETAINED (r12/r13, ADVICE r12): constructing the result runs
    the candidate-generation jobs immediately (two ``localCheckpoint``
    materializations) and retains up to 2 RDDs per call until
    :func:`release_minhash_checkpoints` — call it once the result is
    consumed.  localCheckpoint output is not recoverable on executor
    loss; multi-executor clusters should swap in a reliable checkpoint
    dir (same caveat as :func:`connected_components`).
    """
    # Round-robin spread before the explode (r13): the corpus scan is
    # byte-light (single split at bench scale), so the ~250×/doc shingle
    # explode and the 8 md5s per shingle row — this pipeline's documented
    # hot loop — otherwise run at scan parallelism, i.e. serial.  One
    # doc-count-sized exchange buys the whole signature map stage its
    # cores (same fix as shingle_sets / fuzzy_join's window pins;
    # measured min-of-4 at sf0.1: 5.03 → 4.18 s on docs_minhash_pairs,
    # bit-identical pairs).
    lowered = df.select(
        F.col(id_col), F.lower(F.col(text_col)).alias("__lt")
    ).repartition(_pinned_parallelism(df.sparkSession))
    positions = F.sequence(
        F.lit(1), F.greatest(F.length("__lt") - F.lit(SHINGLE_LEN - 1), F.lit(1)), F.lit(SHINGLE_STRIDE)
    )
    sh_raw = lowered.select(F.col(id_col), F.col("__lt"), F.explode(positions).alias("__p")).select(
        F.col(id_col), F.expr(f"substring(__lt, __p, {SHINGLE_LEN})").alias("sh")
    )
    sigs = minhash_signatures(sh_raw, id_col, n_hashes)
    exploded = sigs.select(
        F.col(id_col), F.explode(_band_array(n_hashes, n_bands)).alias("e")
    ).select(F.col(id_col), F.col("e.band").alias("band"), F.col("e.bh").alias("bh"))
    buckets = (
        exploded.groupBy("band", "bh")
        .agg(F.collect_list(F.col(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    cands = _bucket_pairs(buckets)
    if new_ids is not None:
        # Incremental mode (the daily-batch dedup shape): only pairs
        # touching a NEW document reach the verify stage — old-old pairs
        # were found when those docs were indexed.  Two broadcast flag
        # joins + one filter keep the candidate subplan single-reference
        # (a per-side semi-join UNION would re-execute it — the measured
        # exchange-reuse trap).  At true scale the old corpus's bands live
        # as a persisted index and old docs skip the signature stage too;
        # this inline form models the candidate/verify restriction, which
        # is the dominant saving (verify ∝ pairs, and old-old pairs
        # dominate a mature index's collisions).
        na = F.broadcast(new_ids.select(F.col(id_col).alias("id_a"), F.lit(True).alias("__na")))
        nb = F.broadcast(new_ids.select(F.col(id_col).alias("id_b"), F.lit(True).alias("__nb")))
        cands = (
            cands.join(na, "id_a", "left")
            .join(nb, "id_b", "left")
            .filter(F.col("__na").isNotNull() | F.col("__nb").isNotNull())
            .select("id_a", "id_b")
        )
    # The candidate PAIR SET feeds two consumers — the broadcast id set
    # and the verify join — and each reference re-executes the whole
    # shingle→signature→bucket subplan (building a broadcast is its own
    # job, so even perfect exchange reuse cannot bridge the two).  The
    # pair set is LSH-bounded (∝ true collisions, tiny next to the
    # corpus), so _verify_candidates materializes it ONCE with
    # localCheckpoint — the same retained-materialization contract as
    # connected_components' edge table (r12: one signature-pipeline
    # execution instead of the documented two; measured 5.32 → 3.16 s on
    # docs_minhash_pairs at sf0.1, canary-flat, and every minhash caller
    # inherits the saving: neardup_gate 4.93 → 2.96, incremental
    # 4.87 → 3.37).  On a multi-executor cluster swap for a reliable
    # checkpoint dir, as CC's docstring already prescribes.
    return _verify_candidates(df, id_col, cands,
                              F.array_distinct(char_shingles(
                                  F.lower(F.col(text_col)))),
                              threshold)


#: RDD ids retained by :func:`_verify_candidates`'s and
#: :func:`jaccard_join`'s localCheckpoints in this session, released via
#: :func:`release_minhash_checkpoints`.
_RETAINED_CKPT_IDS: list[int] = []

#: Estimated per-shingle broadcast bytes (8-char UTF8 string + array
#: element overhead) used by the automatic broadcast/shuffle switch.
_SHINGLE_BCAST_BYTES = 48

_SIZE_SUFFIXES = {"b": 1, "k": 1024, "kb": 1024, "m": 1024**2,
                  "mb": 1024**2, "g": 1024**3, "gb": 1024**3}


def _conf_bytes(spark, key: str, default: int) -> int:
    """A Spark byte-size conf ("64MB", "10485760b", "-1") as int bytes;
    non-positive (broadcast disabled) and unparseable both → ``default``
    treated conservatively: disabled means never broadcast."""
    try:
        raw = str(spark.conf.get(key)).strip().lower()
        for suf in sorted(_SIZE_SUFFIXES, key=len, reverse=True):
            if raw.endswith(suf):
                return int(float(raw[:-len(suf)]) * _SIZE_SUFFIXES[suf])
        return int(raw)
    except Exception:
        return default


def _pinned_parallelism(spark) -> int:
    """Partition count for the dedup operators' pinned (user-specified,
    AQE-coalesce-exempt) exchanges: never below the cluster's core count,
    never below the configured shuffle parallelism.  AQE's size-based
    coalesce squeezes these byte-light, CPU-dense stages (window ranking,
    broadcast-join verify chains over short shingle strings) to 1–2
    partitions locally; at cluster scale ``defaultParallelism`` tracks
    total cores and ``shuffle.partitions`` the deployment's sizing, so
    the pin never SHRINKS a large exchange either."""
    try:
        sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        sp = 0
    return max(spark.sparkContext.defaultParallelism, sp)


def release_minhash_checkpoints(spark) -> int:
    """Unpersist every RDD retained by :func:`minhash_lsh_pairs` and
    :func:`jaccard_join` calls in this session (ADVICE r12: the
    localCheckpoints per call outlive the returned DataFrame until GC).
    Call after the result has been consumed — the returned DataFrame is
    NOT recomputable afterwards (localCheckpoint truncates lineage).
    Returns the number released.
    Mirrors ``connected_components``' per-round release pattern, but
    deferred to the caller because the checkpointed tables back the
    function's RESULT rather than an internal round."""
    registry = spark.sparkContext._jsc.getPersistentRDDs()
    released = 0
    for rid in list(_RETAINED_CKPT_IDS):
        ref = registry.get(rid)
        if ref is not None:
            ref.unpersist(False)
            released += 1
        _RETAINED_CKPT_IDS.remove(rid)
    return released


def _ckpt_tracked(df: DataFrame) -> DataFrame:
    """localCheckpoint + record the persisted RDD ids it created so
    :func:`release_minhash_checkpoints` can free them."""
    spark = df.sparkSession
    registry = spark.sparkContext._jsc.getPersistentRDDs()
    before = {rid for rid in registry.keySet().toArray()}
    out = df.localCheckpoint()
    registry = spark.sparkContext._jsc.getPersistentRDDs()
    _RETAINED_CKPT_IDS.extend(
        rid for rid in registry.keySet().toArray() if rid not in before)
    return out


def _verify_candidates(df: DataFrame, id_col: str, cands: DataFrame,
                       shingle_arr: Column, threshold: float) -> DataFrame:
    """Exact Jaccard verify over a BOUNDED candidate pair set (the
    :func:`minhash_lsh_pairs` verify stage; ``jaccard_join`` deliberately
    keeps its token-join verify — see its call-site note).

    EAGER: the two localCheckpoints below run Spark jobs at
    DataFrame-construction time and retain their materialized RDDs until
    :func:`release_minhash_checkpoints` (or session GC) — the documented
    retained-materialization contract (ADVICE r12).  The pair set is
    checkpointed because it feeds the id set AND the verify join
    (un-materialized, the whole candidate-generation subplan would
    execute once per reference); shingle ARRAYS are built for candidate
    documents only behind a broadcast semi-join.  Cost ∝ candidates,
    never the corpus."""
    cands = _ckpt_tracked(cands)
    # No distinct: duplicate ids in a broadcast semi-join's build set are
    # free, and dropping it removes a whole shuffle stage.  explode(array)
    # references the (now materialized) candidate table ONCE per consumer.
    cand_ids = cands.select(F.explode(F.array("id_a", "id_b")).alias(id_col))
    # materialize the candidate-doc ARRAYS too (one semi-joined corpus
    # scan), then attach them to pairs via two joins — BROADCAST while
    # the estimated build size fits, shuffle joins beyond that.  Each
    # doc's array crosses once per executor instead of once per pair
    # occurrence; the earlier per-pair form (explode to (role, id),
    # shuffle-join the arrays, fold back with a grouped first()) shipped
    # every pair's two arrays through an exchange — at jaccard_join's
    # candidate volumes (85k pairs for 256 true matches at sf0.1) that
    # was ~100 MB of array traffic and an ObjectHashAggregate.
    cand_docs = _ckpt_tracked(
        df.join(F.broadcast(cand_ids), id_col, "left_semi").select(
            F.col(id_col).alias("__cid"), shingle_arr.alias("__sh")))
    # Automatic broadcast/shuffle switch (ADVICE r12: a forced broadcast
    # hint bypasses autoBroadcastJoinThreshold, and candidate-doc count ×
    # multi-KB shingle arrays is unbounded by any config on a degenerate
    # high-collision corpus).  The stats job is a cheap scan of the
    # already-materialized checkpoint; the size model is deliberately
    # generous per shingle so the switch errs toward the safe shuffle.
    n_docs, n_shingles = cand_docs.agg(
        F.count(F.lit(1)), F.sum(F.size("__sh"))).first()
    est_bytes = (n_docs or 0) * 32 + (n_shingles or 0) * _SHINGLE_BCAST_BYTES
    bcast_cap = _conf_bytes(
        df.sparkSession, "spark.sql.autoBroadcastJoinThreshold",
        64 * 1024 * 1024)
    hint = F.broadcast if est_bytes <= bcast_cap else (lambda x: x)
    a = cand_docs.select(F.col("__cid").alias("id_a"), F.col("__sh").alias("__sha"))
    b = cand_docs.select(F.col("__cid").alias("id_b"), F.col("__sh").alias("__shb"))
    per_pair = cands.join(hint(a), "id_a").join(hint(b), "id_b")
    n_inter = F.size(F.array_intersect(F.col("__sha"), F.col("__shb")))
    n_union = F.size("__sha") + F.size("__shb") - n_inter
    return (
        per_pair.withColumn("jaccard", F.round(n_inter.cast("double") / n_union, 4))
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


def connected_components(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                         max_iter: int = 25, stats: dict | None = None) -> DataFrame:
    """Transitive near-dup clusters from a pair list: (id, cluster_id)
    with cluster_id = the minimum id reachable through the pair graph —
    the stage after pair generation in every dedup pipeline (A~B and B~C
    must collapse to ONE kept document even when A~C was never a
    candidate pair).

    Min-label propagation: each round every node takes the minimum of its
    own label and its neighbors' labels (one join + one map-side-partial
    min agg per round); converges in graph-diameter rounds.  Near-dup
    graphs are LSH-cluster unions — diameter is small by construction —
    and the loop is DRIVER CONTROL ONLY (a convergence count per round;
    no row data ever reaches the driver).

    Lineage is TRUNCATED per round with ``localCheckpoint``: the edge
    table is materialized once (so the expensive upstream pair generation
    — minhash/simhash — runs exactly once, not once per round), and each
    round's label table is materialized before the convergence count, so
    round N's executed plan is one join + one agg over two cached tables
    — constant depth and shuffle count, instead of re-executing all prior
    rounds from scratch (O(rounds²)).  GraphFrames' CC uses the identical
    checkpoint-per-round structure.  On a multi-executor cluster, swap
    ``localCheckpoint`` for a reliable ``checkpoint`` dir to survive
    executor loss.

    Storage hygiene (ADVICE r1, same registry pattern as
    ``sources.memory_store``): every intermediate checkpoint — the
    directed pairs, the edge table, each superseded round's labels — is
    unpersisted as soon as the next one materializes.  Exactly ONE
    persisted RDD outlives the call: the converged label table that backs
    the returned (lazy) DataFrame.  It is O(nodes-with-an-edge) — tiny
    next to the corpus — and a long-lived session accumulates one such
    table per CC invocation, not one per round.

    Raises after ``max_iter`` rounds without convergence (a pathological
    graph should be loud, not silently half-merged).

    ``stats``: optional dict populated with ``rounds`` (join+agg rounds
    executed, including the final no-change round) and per-round wall
    seconds — the cost-floor instrumentation behind SCALE.md's CC section.
    """
    import time as _time

    spark = pairs.sparkSession

    def _ckpt(df: DataFrame) -> tuple[DataFrame, list[int]]:
        """Eager localCheckpoint + the persisted RDD ids it created
        (``Dataset.unpersist`` can't free a localCheckpoint — release
        goes through the context registry, as in memory_store)."""
        from ..plans import note_iteration

        registry = spark.sparkContext._jsc.getPersistentRDDs()
        before = {rid for rid in registry.keySet().toArray()}
        out = note_iteration(df, "connected_components:iter").localCheckpoint(eager=True)
        registry = spark.sparkContext._jsc.getPersistentRDDs()
        return out, [rid for rid in registry.keySet().toArray() if rid not in before]

    def _release(rdd_ids: list[int]) -> None:
        registry = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in rdd_ids:
            rdd = registry.get(rid)
            if rdd is not None:
                rdd.unpersist(False)

    # Checkpoint the directed pair list FIRST: the symmetrization union
    # below references the pairs plan twice, and without truncation each
    # branch would re-execute the entire upstream pair-generation pipeline
    # (minhash/simhash — the expensive part) once.
    directed, directed_ids = _ckpt(pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")))
    edges, edge_ids = _ckpt(
        directed.union(directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    )
    _release(directed_ids)
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "cluster_id", F.col("id")
    )
    held: list[int] = []
    round_secs: list[float] = []
    try:
        for _ in range(max_iter):
            _t0 = _time.monotonic()
            neighbor_min = (
                edges.join(labels, edges.dst == labels.id)
                .groupBy("src")
                .agg(F.min("cluster_id").alias("nmin"))
            )
            updated, round_ids = _ckpt(
                labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
                .select(
                    "id",
                    F.least(
                        F.col("cluster_id"), F.coalesce(F.col("nmin"), F.col("cluster_id"))
                    ).alias("cluster_id"),
                    (F.col("nmin") < F.col("cluster_id")).alias("__changed"),
                )
            )
            changed = updated.filter(F.col("__changed")).limit(1).count()
            _release(held)
            held = round_ids
            labels = updated.drop("__changed")
            round_secs.append(_time.monotonic() - _t0)
            if stats is not None:
                stats["rounds"] = len(round_secs)
                stats["round_secs"] = round_secs
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds the bound — raise max_iter)"
        )
    finally:
        _release(edge_ids)


def neardup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Cluster summary over :func:`connected_components`: one row per
    transitive near-dup cluster with the kept id (min) and member count —
    the keep/drop decision table of the dedup pipeline."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.groupBy("cluster_id").agg(
        F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("n_docs")
    ).select(F.col("cluster_id"), "keep_id", "n_docs")


def span_dedup(df: DataFrame, id_col: str, text_col: str,
               span_tokens: int = 5) -> DataFrame:
    """C4-style global span-level dedup: split each document into
    non-overlapping ``span_tokens``-token spans, keep only the FIRST
    occurrence of every distinct span corpus-wide (first = lexicographic
    min of (doc_id, span_idx) — deterministic across engines/retries),
    and reconstruct each document from its surviving spans in order.
    The unit mirrors C4's three-sentence-span rule (Raffel et al. 2020)
    on whitespace-token text.

    Scale shape: the winner per span is a ``min(struct(id, idx))``
    groupBy — partial-aggregatable, so a span duplicated a billion times
    collapses map-side instead of hot-spotting one reducer (a
    row_number() window over partitionBy(span) would ship every copy to
    one partition).  The winner rows ARE the kept set — no join back to
    the span table.  Three shuffles total (span winners, per-doc
    reassembly, per-doc totals), the last two co-partitioned on the id.

    Output: ``(id, n_spans, kept_spans, new_text)`` — documents whose
    every span was seen earlier elsewhere survive with ``new_text = ''``.
    """
    tokens = F.split(F.col(text_col), " ")
    n_spans = F.ceil(F.size(tokens) / F.lit(span_tokens)).cast("int")
    spans = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_spans - 1),
                lambda i: F.array_join(
                    F.slice(tokens, i * span_tokens + 1, span_tokens), " "
                ),
            )
        ).alias("span_idx", "span"),
    )
    winners = (
        spans.groupBy("span")
        .agg(F.min(F.struct(F.col(id_col), F.col("span_idx"))).alias("w"))
        .select(F.col(f"w.{id_col}").alias(id_col),
                F.col("w.span_idx").alias("span_idx"), "span")
    )
    kept = winners.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("kept_spans"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("span_idx", "span"))),
                lambda s: s["span"],
            ),
            " ",
        ).alias("new_text"),
    )
    totals = spans.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_spans"))
    return totals.join(kept, id_col, "left").select(
        id_col,
        "n_spans",
        F.coalesce("kept_spans", F.lit(0)).alias("kept_spans"),
        F.coalesce("new_text", F.lit("")).alias("new_text"),
    )


def line_dedup(df: DataFrame, id_col: str, text_col: str,
               min_dup_docs: int = 2, sep: str = "\n") -> DataFrame:
    """CCNet/RefinedWeb-style line-level boilerplate removal: any line
    whose normalized form (trimmed) occurs in at least ``min_dup_docs``
    DISTINCT documents is dropped from EVERY document (nav menus, cookie
    banners, share buttons — content that repeats across pages is
    boilerplate, content unique to few pages is signal).  Surviving lines
    are reassembled in original order.

    Complements :func:`span_dedup` (which keeps the FIRST occurrence of a
    duplicated span; here repeated lines are removed everywhere — the
    CCNet §3.1 rule) and :func:`exact_dedup_groups` (whole-document).

    Scale shape: the duplicated-line table is ``count(distinct doc) >=
    min_dup_docs`` over the line key — a two-phase hash aggregate (the
    per-(key, doc) pre-distinct collapses a line repeated within one
    document map-side).  The drop is a LEFT ANTI equi-join of the
    exploded lines against that DISTINCT key table: anti joins never
    fan out, so a banner line repeated across a billion documents costs
    one hash-table probe per occurrence, not a multiplied join.  The
    per-doc reassembly is the same ``array_sort(collect_list(struct))``
    grouped pass as span_dedup, co-partitioned with the totals join on
    the id.

    Output: ``(id, n_lines, kept_lines, new_text)`` — a document whose
    every line is boilerplate survives with ``new_text = ''``.
    """
    import re as _re

    # F.split takes a Java regex — quote the separator so "." or "|"
    # callers get literal-character semantics
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep), -1)).alias(
            "line_idx", "line"
        ),
    ).withColumn("line_key", F.md5(F.trim(F.col("line"))))
    dup_keys = (
        lines.groupBy("line_key")
        .agg(F.countDistinct(F.col(id_col)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_dup_docs)
        .select("line_key")
    )
    survivors = lines.join(dup_keys, "line_key", "left_anti")
    kept = survivors.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("kept_lines"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("new_text"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    return totals.join(kept, id_col, "left").select(
        id_col,
        "n_lines",
        F.coalesce("kept_lines", F.lit(0)).alias("kept_lines"),
        F.coalesce("new_text", F.lit("")).alias("new_text"),
    )


def line_dedup_sql(table: str, id_col: str, text_col: str,
                   min_dup_docs: int = 2) -> str:
    """DuckDB oracle for :func:`line_dedup` (newline separator)."""
    return f"""
WITH ls AS (SELECT {id_col}, string_split({text_col}, chr(10)) AS l FROM {table}),
lines AS (
  SELECT {id_col}, CAST(t.i AS INTEGER) AS line_idx, l[t.i + 1] AS line,
         md5(trim(l[t.i + 1])) AS line_key
  FROM ls, unnest(range(0, len(l))) AS t(i)
),
dup AS (
  SELECT line_key FROM lines GROUP BY line_key
  HAVING count(DISTINCT {id_col}) >= {min_dup_docs}
),
survivors AS (
  SELECT * FROM lines WHERE line_key NOT IN (SELECT line_key FROM dup)
),
kept AS (
  SELECT {id_col}, CAST(count(*) AS BIGINT) AS kept_lines,
         string_agg(line, chr(10) ORDER BY line_idx) AS new_text
  FROM survivors GROUP BY {id_col}
),
totals AS (SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_lines FROM lines GROUP BY {id_col})
SELECT t.{id_col}, t.n_lines,
       CAST(coalesce(k.kept_lines, 0) AS BIGINT) AS kept_lines,
       coalesce(k.new_text, '') AS new_text
FROM totals t LEFT JOIN kept k USING ({id_col})
"""


def strip_lines(df: DataFrame, id_col: str, text_col: str,
                drop_keys: DataFrame, sep: str = "\n") -> DataFrame:
    """Remove every line whose trimmed-md5 key appears in ``drop_keys``
    (one column ``line_key``) — the apply half of line-level dedup when
    the boilerplate set comes from OUTSIDE the batch (an incremental
    dictionary, a curated blocklist).  Same anti-join + in-order
    reassembly shape as :func:`line_dedup`; same output columns."""
    import re as _re

    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep), -1)).alias(
            "line_idx", "line"
        ),
    ).withColumn("line_key", F.md5(F.trim(F.col("line"))))
    survivors = lines.join(drop_keys.select("line_key"), "line_key", "left_anti")
    kept = survivors.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("kept_lines"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("new_text"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    return totals.join(kept, id_col, "left").select(
        id_col,
        "n_lines",
        F.coalesce("kept_lines", F.lit(0)).alias("kept_lines"),
        F.coalesce("new_text", F.lit("")).alias("new_text"),
    )


def jaccard_join(df: DataFrame, id_col: str, text_col: str,
                 threshold: float,
                 length: int = SHINGLE_LEN, stride: int = SHINGLE_STRIDE) -> DataFrame:
    """EXACT Jaccard-threshold similarity self-join via prefix filtering
    (the PPJoin family, Xiao et al. WWW'08) — every pair with shingle-set
    Jaccard >= threshold, no LSH recall loss.

    The complement to :func:`minhash_lsh_pairs`: LSH is probabilistic (its
    band parameters trade recall for cost); prefix filtering is exact.  A
    curation pipeline uses LSH for the steady-state sweep and this join
    when a guarantee is required (legal takedowns, eval-set isolation).

    Scale shape (the reason this isn't a cross join): order each doc's
    shingles by GLOBAL rarity (document frequency asc); a doc with s
    shingles keeps only its ``s - ceil(t*s) + 1`` rarest as its *prefix*.
    Two sets with J >= t must share a prefix token (pigeonhole: x∩y has
    >= ceil(t*|x|) elements but x's suffix holds only ceil(t*|x|) - 1 of
    x's), so the candidate generator is an equi-join on prefix shingles
    only.  Hub shingles (shared by everything) are by construction the
    LAST to enter a prefix, so candidate fan-out stays near-linear where a
    naive token join is O(n²) through its hottest token.  Stages: shingle
    distinct (1 shuffle), df-count join (1), per-doc rank window (1),
    prefix self-join (1), then the shared :func:`jaccard_verify`.  The
    candidate join also applies the length filter (J >= t forces
    ``min(|x|,|y|) >= t·max(|x|,|y|)``) — sound at any threshold, and at
    t=0.4 it cuts ~17% of candidates before the verify joins.  All
    JVM-side; no caps, no sampling — exactness is the contract, pinned by
    brute-force DuckDB parity at two scales and a randomized property test.

    EAGER + RETAINED (r13): the distinct shingle table is the plan's
    most-referenced subtree — the prefix self-join's two branches, the
    verify's two token joins and the two set-size aggregates each hold
    their own copy, and because every small side becomes a
    BroadcastExchange, neither ReuseExchange nor AQE stage reuse ever
    fires: the executed sf0.1 plan ran the scan→explode→distinct pipeline
    SEVEN times (see plans/r13/x_docs_jaccard_join_before.txt).  ``sh``
    is therefore localCheckpoint-ed ONCE, round-robin repartitioned to
    :func:`_pinned_parallelism` first so the materialized table (and the
    broadcast-hash-join verify chain that pipelines map-side over it)
    runs at cluster parallelism instead of the 1–2 byte-sized partitions
    AQE's size-based coalesce leaves for this CPU-dense, byte-light
    relation.  The rank-window input is pinned the same way (its
    ENSURE_REQUIREMENTS exchange carries ~MBs but two window passes of
    real CPU).  Measured sf0.1 min-of-4: 6.76 → 3.76 s, exact-parity.
    Like :func:`minhash_lsh_pairs`, construction runs Spark jobs eagerly
    and retains one RDD per call until
    :func:`release_minhash_checkpoints`; the materialization is one
    (id, shingle) row per distinct shingle — the same relation the plan
    previously computed seven times per run, so at any scale the
    checkpoint is strictly cheaper than what it replaces.

    Cost note: prefix selectivity is ``1 - t`` of each set, so the filter
    bites hard at near-dup thresholds (t >= 0.6, prefixes <= 40%) and
    degrades toward the full inverted-index join as t → 0 — at t=0.4/sf0.1
    the candidate set is ~3.3M pairs and the join takes ~60 s on local[32].
    For low-threshold sweeps use :func:`minhash_lsh_pairs`; reserve the
    exact join for the guarantee cases, which are high-threshold.
    """
    from pyspark.sql import Window

    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    n_par = _pinned_parallelism(df.sparkSession)
    # shingle_sets already emits at pinned parallelism (hash(id, sh)),
    # so the checkpoint materializes wide with no further exchange
    sh = _ckpt_tracked(shingle_sets(df, id_col, text_col, length, stride))
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy(id_col).orderBy(F.col("__df").asc(), F.col("sh").asc())
    ranked = (
        sh.join(freq, "sh")
        .repartition(n_par, F.col(id_col))
        .withColumn("__pos", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    )
    prefix_len = F.col("__n") - F.ceil(F.col("__n") * F.lit(float(threshold))) + 1
    prefix = ranked.filter(F.col("__pos") <= prefix_len).select(id_col, "sh", "__pos", "__n")
    t = F.lit(float(threshold))
    matches = (
        prefix.select(
            F.col(id_col).alias("id_a"), "sh",
            F.col("__pos").alias("__pa"), F.col("__n").alias("__na"),
        )
        .join(
            prefix.select(
                F.col(id_col).alias("id_b"), "sh",
                F.col("__pos").alias("__pb"), F.col("__n").alias("__nb"),
            ),
            "sh",
        )
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.least("__na", "__nb").cast("double") >= t * F.greatest("__na", "__nb"))
        )
    )
    # Positional + prefix-occurrence filter (PPJoin/PPJoin+ family): both
    # docs' positions follow ONE global order, so every shared token
    # sorting before the globally-LAST shared prefix token is itself a
    # shared-prefix token.  With k shared prefix tokens whose last
    # occurrence sits at (max_pa, max_pb) — the same token on both sides —
    # every further shared token lies strictly after both, giving
    #   overlap <= k + min(na - max_pa, nb - max_pb)
    # This dominates the classic single-token positional bound
    # 1 + min(na - min_pa, nb - min_pb): positions are distinct integers,
    # so max_pa >= min_pa + (k-1) makes the k-token bound <= the 1-token
    # bound always, and strictly tighter whenever a pair shares several
    # prefix tokens that sit deep (the mid-threshold regime the r9 verdict
    # flagged — the suffix room is counted once, not re-granted per shared
    # token).  J >= t still needs overlap >= t/(1+t)·(na+nb).  Same single
    # hash aggregate as before — the extra occurrence count is free.
    cand = (
        matches.groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("__k"),
            F.max("__pa").alias("__pa"), F.max("__pb").alias("__pb"),
            F.first("__na").alias("__na"), F.first("__nb").alias("__nb"),
        )
        .filter(
            (F.col("__k")
             + F.least(F.col("__na") - F.col("__pa"),
                       F.col("__nb") - F.col("__pb"))).cast("double")
            >= t / (F.lit(1.0) + t) * (F.col("__na") + F.col("__nb"))
        )
        .select("id_a", "id_b")
    )
    # Verify stays on jaccard_verify's token equi-joins, NOT the
    # candidate-bounded array path minhash uses: measured r12, at this
    # operator's candidate volume (85k pairs for 256 true matches at
    # t=0.7/sf0.1) the per-pair ``array_intersect`` is an O(|a|·|b|)
    # string-compare loop (~3 s) that loses to the token join (~3.4 s
    # but fully pipelined with candidate generation), and the extra `sh`
    # references are AQE exchange-reused.  The array form wins only when
    # candidates ≈ true matches (minhash's regime).
    return jaccard_verify(cand, sh, id_col, threshold)


def jaccard_join_sql(table: str, id_col: str, text_col: str, threshold: float,
                     length: int = SHINGLE_LEN, stride: int = SHINGLE_STRIDE) -> str:
    """DuckDB oracle for :func:`jaccard_join`: brute-force exact Jaccard
    through the full inverted shingle index (NO prefix filter — a different
    algorithm, so agreement proves the filter is lossless).  Pairs sharing
    zero shingles have Jaccard 0 < threshold, so the token join loses
    nothing."""
    return f"""
WITH sh AS (
    SELECT DISTINCT {id_col} AS id,
           substr(lower({text_col}), CAST(p.range AS INTEGER), {length}) AS sh
    FROM {table},
         unnest(range(1, greatest(length({text_col}) - {length - 1}, 1) + 1, {stride})) AS p(range)
), sizes AS (
    SELECT id, count(*) AS n FROM sh GROUP BY id
), inter AS (
    SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
    FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
    GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       round(CAST(n_inter AS DOUBLE) / (na.n + nb.n - n_inter), 4) AS jaccard
FROM inter i
JOIN sizes na ON na.id = i.id_a
JOIN sizes nb ON nb.id = i.id_b
WHERE round(CAST(n_inter AS DOUBLE) / (na.n + nb.n - n_inter), 4) >= {threshold}
"""


def duplicate_spans(df: DataFrame, id_col: str, text_col: str,
                    k: int = 8, min_docs: int = 2) -> DataFrame:
    """Maximal cross-document duplicated token spans — the distributed
    answer to suffix-array substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): any
    token window of length ``k`` appearing in ≥ ``min_docs`` distinct
    documents is duplicated; overlapping/adjacent duplicated windows
    merge into maximal spans per document.  Complements
    :func:`span_dedup` (sentence-aligned C4 spans) with arbitrary-offset
    token granularity — boilerplate does not respect sentence
    boundaries.

    Equivalence to the suffix-array formulation: a maximal repeated
    substring of ≥ k tokens is exactly a maximal run of repeated
    k-windows, so the output spans coincide (modulo md5 collisions,
    ~2⁻¹²⁸); cost is the same O(total tokens) the suffix array pays,
    but as three shuffle-shaped stages instead of a global sort:

    1. window fan-out (narrow: ``posexplode`` over positions, one row
       per token — the same data volume as the corpus itself);
    2. duplicated-window set = groupBy(window md5) with a two-level
       distinct-doc count (partial-aggregated), then a semi-join back —
       never a self-join of windows against windows;
    3. per-doc gaps-and-islands over hit positions (window ordered by
       position, partitioned by doc — bounded by tokens-per-doc).

    Output: ``(id, span_start, span_end, n_tokens)`` — 1-based inclusive
    token positions, ``n_tokens = span_end − span_start + 1 ≥ k``.
    """
    if k < 1 or min_docs < 2:
        raise ValueError("need k >= 1 and min_docs >= 2")
    toks = F.split(F.col(text_col), " ")
    base = df.select(F.col(id_col), toks.alias("__t")).filter(
        F.size("__t") >= k
    )
    win = base.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(1), F.size("__t") - (k - 1))).alias(
            "__i", "pos"
        ),
        F.col("__t"),
    ).select(
        F.col(id_col),
        F.col("pos"),
        F.md5(F.array_join(F.slice(F.col("__t"), F.col("pos"), k), " ")).alias("h"),
    )
    dup = (
        win.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    hits = win.join(dup, "h", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    isl = hits.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(w) > 1, 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        isl.groupBy(id_col, "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + (k - 1)).cast("long").alias("span_end"),
        )
        .select(
            id_col, "span_start", "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("n_tokens"),
        )
    )


def duplicate_spans_sql(table: str, id_col: str, text_col: str,
                        k: int = 8, min_docs: int = 2) -> str:
    """DuckDB mirror of :func:`duplicate_spans` (oracle generator)."""
    return f"""
WITH base AS (
    SELECT {id_col}, string_split({text_col}, ' ') AS t
    FROM {table}
    WHERE len(string_split({text_col}, ' ')) >= {k}
), win AS (
    SELECT {id_col}, CAST(i AS INTEGER) AS pos,
           md5(array_to_string(list_slice(t, i, i + {k} - 1), ' ')) AS h
    FROM (SELECT {id_col}, t, unnest(range(1, len(t) - {k} + 2)) AS i FROM base)
), dup AS (
    SELECT h FROM win GROUP BY h HAVING count(DISTINCT {id_col}) >= {min_docs}
), hits AS (
    SELECT w.* FROM win w SEMI JOIN dup d ON w.h = d.h
), isl AS (
    SELECT *, sum(brk) OVER (PARTITION BY {id_col} ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS island
    FROM (
        SELECT *, CASE WHEN pos - lag(pos) OVER (PARTITION BY {id_col}
                                                 ORDER BY pos) > 1
                       THEN 1 ELSE 0 END AS brk
        FROM hits
    )
)
SELECT {id_col},
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + {k} - 1 AS BIGINT) AS span_end,
       CAST(max(pos) + {k} - 1 - min(pos) + 1 AS BIGINT) AS n_tokens
FROM isl
GROUP BY {id_col}, island
"""


def cut_spans(df: DataFrame, spans: DataFrame, id_col: str,
              text_col: str, out_col: str | None = None) -> DataFrame:
    """Apply step for :func:`duplicate_spans` (or any (id, span_start,
    span_end) relation): rewrite each document's text with the listed
    1-based-inclusive token spans REMOVED — dedup policy "keep one copy"
    composes as ``duplicate_spans`` minus an anti-join of the kept
    winner's spans, then ``cut_spans``.

    Shape: spans collapse to one array per doc (tiny: O(spans/doc)),
    ONE equi-join on the id, then a pure JVM higher-order expression
    (position-tag tokens → filter against the span array → re-join) —
    no Python, no second shuffle; docs without spans pass through
    byte-identical via the empty-array coalesce.
    """
    out_col = out_col or text_col
    sp = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e"))
        ).alias("__sp")
    )
    # typed empty-array fallback: a bare array() is array<void> and won't
    # coalesce against array<struct>; exists() over NULL yields NULL and
    # would silently drop every token of span-free docs
    empty = F.array().cast("array<struct<s:long,e:long>>")
    joined = df.join(sp, id_col, "left").withColumn(
        "__sp",
        F.coalesce(
            F.col("__sp").cast("array<struct<s:long,e:long>>"), empty
        ),
    )
    toks = F.split(F.col(text_col), " ")
    indexed = F.transform(toks, lambda x, i: F.struct(x.alias("tok"),
                                                     (i + 1).alias("p")))
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            F.col("__sp"), lambda r: (s["p"] >= r["s"]) & (s["p"] <= r["e"])
        ),
    )
    rebuilt = F.array_join(F.transform(kept, lambda s: s["tok"]), " ")
    if out_col == text_col:
        return joined.select(
            *[c for c in df.columns if c != text_col],
            rebuilt.alias(text_col),
        )
    return joined.select(*df.columns, rebuilt.alias(out_col))
