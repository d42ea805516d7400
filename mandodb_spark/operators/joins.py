"""Join-strategy helpers: the skew rescue the planner can't always make.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin``) handles the
common case at runtime; this module covers the two places it can't:

- a sort-merge/shuffle-hash join whose hot key exceeds the split
  threshold on BOTH sides (AQE only splits one side),
- deterministic plan shapes for tests/benchmarks where runtime re-plans
  would make ``.explain`` assertions flaky.

Complements ``profile.skew_report`` (the diagnostic that tells you WHICH
keys are hot) — ``salted_join`` is the corresponding treatment.  Same
design family as the salted ``query_range`` variant
(``tsdb_ops.query_range(salt_partitions=...)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, on: list[str] | str,
                n_salts: int = 8, how: str = "inner",
                salt_cols: list[str] | None = None,
                seed: int = 42) -> DataFrame:
    """Equi-join with the LEFT side's hot keys spread over ``n_salts``
    shuffle partitions: left rows get a per-row salt, the right side is
    replicated ``n_salts``× via a sequence fan-out, and the join runs
    on ``(keys..., salt)``.  Result ≡ ``left.join(right, on, how)`` for
    ``inner``/``left`` joins (pinned by an equivalence test).

    Salt derivation: pass ``salt_cols`` — columns that VARY within a hot
    key (an event id, a timestamp) — for a fully deterministic
    ``pmod(xxhash64(salt_cols), n)`` assignment (bit-stable across runs
    and task retries, the repo's preference); without them the salt is
    ``floor(rand(seed)·n)``, which is still retry-safe (rand is
    re-derived per input split) but not stable across different
    partitionings of the input.

    Cost model: right-side replication costs ``n_salts × |right|`` rows
    of shuffle — worth it exactly when the hot key's row count divided by
    ``n_salts`` still dominates |right|; use ``profile.skew_report`` to
    pick targets, and keep the smaller relation on the RIGHT.  ``right``
    must have unique join keys or any multiplicity it has is preserved —
    identical to the plain join's semantics either way.

    ``how``: ``inner`` or ``left`` (salting the left side cannot express
    right/full outer joins — unmatched RIGHT rows would appear once per
    salt; use the plain join or swap sides for those).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left' only")
    keys = [on] if isinstance(on, str) else list(on)
    if salt_cols:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]),
                      F.lit(n_salts)).cast("int")
    else:
        salt = F.floor(F.rand(seed) * n_salts).cast("int")
    l_s = left.withColumn("__salt", salt)
    r_s = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = l_s.join(r_s, keys + ["__salt"], how)
    return out.drop("__salt")


def fuzzy_join(left: DataFrame, right: DataFrame,
               left_id: str, left_key: str,
               right_id: str, right_key: str,
               max_distance: int, q: int = 2) -> DataFrame:
    """EXACT edit-distance join (entity resolution / record linkage):
    every (left, right) pair with ``levenshtein(left_key, right_key) <=
    max_distance`` — the dirty-data matcher of a curation pipeline
    (vendor names, titles, near-identical URLs), built on the Ed-Join
    family's q-gram prefix filtering (Xiao et al., VLDB'08) so it is
    never a cross join.

    Scale shape (the same rarity-prefix machinery as
    ``dedup.jaccard_join``): one edit operation destroys at most ``q``
    q-grams, so strings within distance ``d`` share at least
    ``max(|Ga|,|Gb|) - d*q`` grams; by the prefix-filter pigeonhole each
    side only needs its ``d*q + 1`` GLOBALLY-RAREST grams as join keys.
    Hub grams (shared by everything) enter prefixes last, so candidate
    fan-out stays near-linear.  Stages: gram explode + document-frequency
    count (the one corpus-wide shuffle), per-row rank window, prefix
    equi-join, then the exact JVM-side ``levenshtein`` verify with the
    ``|len_a - len_b| <= d`` length filter.

    Exactness corner: a pair can share ZERO grams only when BOTH gram
    sets are smaller than ``d*q`` (keys shorter than ``d*q + q - 1``
    chars).  That short stratum is handled separately via a broadcast
    length-filtered join — sound because evading pairs must be short on
    BOTH sides, and the distinct short-key universe is bounded by the
    alphabet, not the corpus.

    Output: ``(left_id, right_id, distance)``.  NULL keys never match.
    The DuckDB brute-force mirror (:func:`fuzzy_join_sql`) runs a
    different algorithm entirely, so parity proves the blocking lossless.
    """
    from pyspark.sql import Window

    d = int(max_distance)
    if d < 0:
        raise ValueError("max_distance must be >= 0")
    k_prefix = d * q + 1
    short_len = d * q + q - 1  # below this, gram sets can be too small

    a = left.filter(F.col(left_key).isNotNull()).select(
        F.col(left_id).alias("__lid"), F.col(left_key).alias("__lk"))
    b = right.filter(F.col(right_key).isNotNull()).select(
        F.col(right_id).alias("__rid"), F.col(right_key).alias("__rk"))

    def grams(df, key, side):
        return df.select(
            "*",
            F.explode(F.array_distinct(F.expr(
                f"transform(sequence(1, greatest(length({key}) - {q - 1}, 1)),"
                f" i -> substr({key}, i, {q}))"
            ))).alias("__g"),
        ).withColumn("__side", F.lit(side))

    ga = grams(a, "__lk", 0)
    gb = grams(b, "__rk", 1)
    # one global rarity order across BOTH sides (the prefix lemma needs a
    # single total order)
    allg = ga.select("__g").unionAll(gb.select("__g"))
    freq = allg.groupBy("__g").agg(F.count(F.lit(1)).alias("__df"))

    # The rank-window input is pinned at cluster parallelism (a
    # user-specified repartition on the window's own key replaces the
    # ENSURE_REQUIREMENTS exchange, so it costs no extra shuffle): this
    # exchange carries only ~MBs of (id, gram, df) rows, so AQE's
    # size-based coalesce left it at 1-2 partitions — and the candidate
    # broadcast join plus every per-candidate levenshtein downstream
    # pipelines map-side over the window output, i.e. the whole verify
    # ran near-serial.  Measured sf0.1 min-of-4 (same-session interleaved
    # A/B): 4.66 -> 1.67 s, bit-identical output.  Same fix as
    # jaccard_join's window pin (guide §2.6 idle capacity).
    from .dedup import _pinned_parallelism

    n_par = _pinned_parallelism(left.sparkSession)

    def prefix(g, id_col):
        w = Window.partitionBy(id_col).orderBy(F.col("__df").asc(), F.col("__g").asc())
        return (
            g.join(freq, "__g")
            .repartition(n_par, F.col(id_col))
            .withColumn("__pos", F.row_number().over(w))
            .filter(F.col("__pos") <= k_prefix)
        )

    pa = prefix(ga, "__lid").select("__lid", "__lk", "__g")
    pb = prefix(gb, "__rid").select("__rid", "__rk", "__g")
    # Verify BEFORE deduplicating: the length gate and the exact
    # levenshtein run per candidate OCCURRENCE (a map-side codegen'd
    # expression over the join output), so the only corpus-scale shuffle
    # this stage ever had — the distinct over the raw candidate fan-out —
    # now sees matches only.  On gram-poor corpora (few distinct grams,
    # e.g. near-uniform record ids) the candidate fan-out is orders of
    # magnitude larger than the match set, and shuffling it just to
    # deduplicate before an O(len²) JVM expression was the dominant cost
    # (measured sf0.1 x_customer_fuzzy_match: 1.55M candidate rows,
    # 1.41M-row distinct, ~750 matches — guide §2.3 "aggregate less, and
    # never shuffle what a map-side filter can drop").  Duplicate
    # occurrences of a pair (≤ k_prefix² of them) re-run levenshtein;
    # that re-computation is map-side-local and beats the shuffle.
    # THRESHOLDED levenshtein (Spark 3.5+, SPARK-44125): banded DP over
    # the 2d+1 diagonal with early exit, returning -1 above the bound —
    # exact distances for every kept pair, ~2× cheaper per candidate than
    # the full O(len²) matrix (guide §1.2 "per-task work": the verify is
    # this operator's measured hot spot, 1.5M evaluations at sf0.1).
    dist = F.levenshtein(F.col("__lk"), F.col("__rk"), d)
    gram_matches = (
        pa.join(pb, "__g")
        .filter(F.abs(F.length("__lk") - F.length("__rk")) <= d)
        .withColumn("distance", dist.cast("int"))
        .filter(F.col("distance") >= 0)
        .select("__lid", "__rid", "distance")
    )

    # short stratum: pairs that can evade the gram join (both keys short).
    # Broadcast the DISTINCT short-key universe — bounded by the alphabet
    # (≤ |Σ|^short_len values), NOT by the corpus — never short ROWS: a
    # corpus with billions of rows carrying "Li"-style keys would make a
    # row broadcast unbounded.  The nested-loop length+distance pairing
    # runs key-vs-key; ids re-enter through equi-joins afterwards.
    sa = a.filter(F.length("__lk") <= short_len)
    sb = b.filter(F.length("__rk") <= short_len)
    key_pairs = sa.select("__lk").distinct().join(
        F.broadcast(sb.select("__rk").distinct()),
        (F.abs(F.length("__lk") - F.length("__rk")) <= d)
        & (F.levenshtein(F.col("__lk"), F.col("__rk"), d) >= 0),
    )
    short_matches = (
        sa.join(F.broadcast(key_pairs), "__lk")
        .join(sb, "__rk")
        .withColumn("distance", dist.cast("int"))
        .select("__lid", "__rid", "distance")
    )

    # distinct over MATCHES (gram-path duplicates per shared prefix gram,
    # plus gram∩short overlap), not over candidates
    return (
        gram_matches.unionByName(short_matches)
        .distinct()
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            "distance",
        )
    )


def fuzzy_join_sql(left_sql: str, right_sql: str,
                   left_id: str, left_key: str,
                   right_id: str, right_key: str,
                   max_distance: int) -> str:
    """DuckDB oracle for :func:`fuzzy_join`: brute-force levenshtein over
    the length-filtered cross product — no blocking at all, so agreement
    proves the q-gram prefix filter lossless."""
    d = int(max_distance)
    return f"""
WITH L AS ({left_sql}), R AS ({right_sql})
SELECT l.{left_id} AS {left_id}, r.{right_id} AS {right_id},
       CAST(levenshtein(l.{left_key}, r.{right_key}) AS INTEGER) AS distance
FROM L l, R r
WHERE l.{left_key} IS NOT NULL AND r.{right_key} IS NOT NULL
  AND abs(length(l.{left_key}) - length(r.{right_key})) <= {d}
  AND levenshtein(l.{left_key}, r.{right_key}) <= {d}
"""
