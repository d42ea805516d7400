"""Bloom-filter membership gate: dedup a new batch against a huge
historical corpus WITHOUT joining the corpus.

Beyond-reference surface (the reference's posting lists, index.go:170-186,
answer "which segments hold series X" — this answers "has the corpus seen
content X" at ingest time).  The standard anti-join dedup shuffles the
historical side on every batch; at 100 TB that is the whole corpus through
the network per increment.  The Bloom gate replaces it with a one-time
distributed build — an occupied-WORD table of at most ``m_bits/32`` rows,
millions of times smaller than the corpus — and a probe that broadcasts
that table: the new batch never shuffles and the corpus is never re-read.
False-positive rate for n keys: ``(1 - exp(-k*n/m))^k`` — size ``m_bits``
≈ 10 bits/key for ~1% at k=3.  Spark's own BloomFilter aggregate
(``bloom_filter_agg``) is not registered in the public function registry,
and a deterministic md5 construction is oracle-mirrorable in DuckDB
bit-for-bit, so the filter is built from plain relational ops:

    positions: p_i(key) = md5("i:"+key)[:15 hex] mod m   (i = 0..k-1)
    build:     word table  (p DIV 32, bit_or(1 << p%32))  — one shuffle,
               ≤ m/32 rows
    probe:     the word table folds into a ONE-ROW map<word,bits>
               (map_from_entries) broadcast once; all k bit tests are
               element_at lookups — ZERO probe-side shuffle, ONE build
               execution (the k-broadcast-join form replicated the build
               subplan once per hash), one tiny BroadcastNestedLoopJoin
               of the single map row.  The broadcast payload is the same
               word table either way, so the form holds wherever the
               filter itself is broadcastable — the design envelope of
               any broadcast Bloom gate

Storage is 32 bits per BIGINT word: every shifted mask stays positive, so
the words, shifts, and ``bit_or`` evaluate identically in Spark and DuckDB
(no sign/overflow edge at bit 63).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Number of hash functions.
BLOOM_K = 3

#: Bits stored per BIGINT word (32, not 64: keeps every mask positive).
WORD_BITS = 32

#: Reserved word id carrying the filter geometry (never probed: real word
#: ids are ``p DIV 32 >= 0``).  bits = (m_bits << 8) | k.
GEOMETRY_WORD = -1


def _geometry_bits(m_bits: int, k: int) -> int:
    return (m_bits << 8) | k


def _position_sql(key_sql: str, i: int, m_bits: int) -> str:
    """SQL text for hash-``i``'s bit position of ``key_sql`` (Spark dialect).

    60-bit md5 slice mod m — the same engine-agnostic hash family the
    minhash/winnowing/CMS oracles use; DuckDB mirrors it with
    ``CAST(concat('0x', substr(md5(..),1,15)) AS BIGINT) % m``."""
    return (
        f"CAST(conv(substring(md5(concat('{i}:', {key_sql})), 1, 15), 16, 10) "
        f"AS BIGINT) % {m_bits}"
    )


def bloom_build(
    df: DataFrame, key: Column, m_bits: int = 1 << 14, k: int = BLOOM_K
) -> DataFrame:
    """Distributed Bloom build → occupied-word table (word, bits).

    One narrow ×k position explode + ONE shuffle (groupBy word, map-side
    partial ``bit_or``).  Output is ≤ ``m_bits/32`` rows regardless of
    corpus size — the broadcastable index the probe side ships with its
    tasks.

    NULL keys are excluded (a NULL occupies no bits, and the probe side
    defines might_contain(NULL) = false) — this also keeps the DuckDB
    mirror exact, whose ``concat`` would otherwise skip the NULL and hash
    the bare salt.

    The output carries one reserved ``GEOMETRY_WORD`` row encoding
    ``(m_bits, k)`` (ADVICE r5): the geometry travels WITH the filter, so
    a probe called with mismatched parameters fails loudly instead of
    silently producing false negatives — the one failure mode a Bloom
    gate must never have.  Real word ids are non-negative, so the row can
    never satisfy a probe join."""
    keyed = df.select(key.cast("string").alias("__key")).filter(
        F.col("__key").isNotNull()
    )
    pos = ", ".join(_position_sql("__key", i, m_bits) for i in range(k))
    words = (
        keyed.selectExpr(f"explode(array({pos})) AS p")
        .groupBy(F.expr(f"p DIV {WORD_BITS}").alias("word"))
        .agg(
            F.expr(
                f"bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % {WORD_BITS} AS INT)))"
            ).alias("bits")
        )
    )
    geometry = df.sparkSession.createDataFrame(
        [(GEOMETRY_WORD, _geometry_bits(m_bits, k))], "word long, bits long"
    )
    return words.unionByName(geometry)


def bloom_flag(
    df: DataFrame,
    key: Column,
    bloom: DataFrame,
    m_bits: int = 1 << 14,
    k: int = BLOOM_K,
    flag_col: str = "might_contain",
) -> DataFrame:
    """Probe: append ``flag_col`` (true ⟺ every hash's bit is set).

    The word table is folded into ONE row holding ``map<word, bits>``
    (``map_from_entries`` over a collect_list — bounded by the filter
    geometry, never the corpus) and broadcast once; the k bit tests are
    ``element_at`` lookups, so the probe relation never shuffles and the
    build pipeline executes exactly once (the previous k-join form
    replicated the whole build subplan under every broadcast).  A
    missing word key means the bit is unset (NULL lookup → false); a
    NULL key flags false (its positions are NULL — matching the build
    side's NULL exclusion).  No false negatives by construction; false
    positives at the (1-exp(-kn/m))^k floor.

    Geometry validation (ADVICE r5): if ``bloom`` carries the
    ``GEOMETRY_WORD`` entry :func:`bloom_build` writes, the probe's
    ``(m_bits, k)`` must match it — a mismatch raises AT EXECUTION via an
    in-plan ``raise_error`` (zero extra jobs) instead of silently hashing
    into the wrong positions (false negatives).  A filter without the
    entry (externally built) probes unvalidated."""
    expected = _geometry_bits(m_bits, k)
    wordmap = bloom.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("word"), F.col("bits")))
        ).alias("__wm")
    )
    out = df.withColumn("__key", key.cast("string")).join(
        F.broadcast(wordmap), F.lit(True), "left"
    )
    # try_element_at throughout: NULL for a missing word / NULL position
    # under ANSI mode (plain element_at would throw on an unset word)
    geo = F.expr(f"try_element_at(__wm, CAST({GEOMETRY_WORD} AS LONG))")
    geometry_ok = F.when(
        geo.isNotNull() & (geo != F.lit(expected)),
        F.raise_error(
            F.format_string(
                "bloom geometry mismatch: filter built with m_bits=%d, k=%d; "
                f"probe called with m_bits={m_bits}, k={k} — a mismatched "
                "probe silently false-negatives, refusing",
                F.shiftright(geo, 8),
                geo % 256,
            )
        ).cast("boolean"),
    ).otherwise(F.lit(True))
    flag = geometry_ok
    for i in range(k):
        p_sql = _position_sql("__key", i, m_bits)
        flag = flag & F.expr(
            f"COALESCE((shiftright(try_element_at(__wm, ({p_sql}) DIV "
            f"{WORD_BITS}), CAST(({p_sql}) % {WORD_BITS} AS INT)) & 1) = 1, "
            "false)"
        )
    return out.withColumn(flag_col, flag).drop("__key", "__wm")


def bloom_oracle_sql(
    hist_sql: str, m_bits: int = 1 << 14, k: int = BLOOM_K
) -> str:
    """DuckDB CTE text mirroring :func:`bloom_build` bit-for-bit.

    ``hist_sql`` must select one column named ``key``; the returned
    fragment defines ``bloom_words(word, bits)``."""
    pos_union = "\nUNION ALL\n".join(
        f"SELECT CAST(concat('0x', substr(md5(concat('{i}:', key)), 1, 15)) "
        f"AS BIGINT) % {m_bits} AS p FROM hist WHERE key IS NOT NULL"
        for i in range(k)
    )
    return f"""hist AS ({hist_sql}),
pos AS ({pos_union}),
bloom_words AS (
    SELECT p // {WORD_BITS} AS word,
           bit_or(CAST(1 AS BIGINT) << CAST(p % {WORD_BITS} AS INT)) AS bits
    FROM pos GROUP BY 1
)"""


def bloom_probe_oracle_pred(key_sql: str, m_bits: int = 1 << 14, k: int = BLOOM_K) -> str:
    """DuckDB boolean expression mirroring :func:`bloom_flag` for one key.

    Correlated scalar subqueries against ``bloom_words`` — fine for
    oracle-sized data; the Spark side is the scale path.  The NULL-key
    guard mirrors bloom_flag's false-on-NULL (DuckDB's ``concat`` skips
    NULL arguments, so without it a NULL key would hash the bare salt)."""
    tests = [f"{key_sql} IS NOT NULL"]
    for i in range(k):
        p = (
            f"(CAST(concat('0x', substr(md5(concat('{i}:', {key_sql})), 1, 15)) "
            f"AS BIGINT) % {m_bits})"
        )
        tests.append(
            f"COALESCE((SELECT (bits >> CAST({p} % {WORD_BITS} AS INT)) & 1 "
            f"FROM bloom_words WHERE word = {p} // {WORD_BITS}), 0) = 1"
        )
    return "(" + " AND ".join(tests) + ")"
