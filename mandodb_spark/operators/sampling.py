"""Deterministic sampling operators for training-data pipelines.

Beyond-reference surface: corpus mixing/rebalancing for pretraining-data
curation.  Sampling is HASH-based, not RNG-based, which buys three
properties RNG sampling can't give at 100 TB:

- deterministic: the same row is always in or out, across reruns, engines,
  partitionings, and retries (a speculative task re-execution can't change
  the sample);
- map-side only: a pure column predicate — no shuffle, no state, composes
  with partition pruning and pushdown;
- oracle-checkable: md5 is identical in DuckDB, so the driver's
  correctness gate covers the sample exactly (rows+schema+hash), which no
  rand()-based sample could pass.

The unit interval is the first 8 md5 hex digits of ``salt:key`` scaled by
2^-32 — uniform to ~2e-10, far below any sampling-rate granularity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_unit(key: Column, salt: str = "sample") -> Column:
    """Deterministic uniform-[0,1) value for a key (32-bit md5 prefix)."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string"))), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(1 << 32))
    )


def hash_sample(df: DataFrame, key_col: str, rate: float, salt: str = "sample") -> DataFrame:
    """Uniform deterministic sample: keep rows with hash_unit < rate."""
    return df.filter(hash_unit(F.col(key_col), salt) < F.lit(rate))


def stratified_sample(df: DataFrame, key_col: str, strata_col: str,
                      rates: dict[str, float], default_rate: float = 0.0,
                      salt: str = "sample") -> DataFrame:
    """Per-stratum deterministic sampling — the training-data mix operator
    (e.g. downsample web text, keep all code/books).

    ``rates`` maps stratum value → keep probability.  The rate lookup is a
    literal CASE chain (strata are a curated handful by definition); the
    whole operator stays a scan-side predicate — at 100 TB the sample never
    shuffles and never materializes the rejected rows.
    """
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(rate)
    return df.filter(hash_unit(F.col(key_col), salt) < rate)


def hash_unit_sql(key_expr: str, salt: str = "sample") -> str:
    """DuckDB mirror of :func:`hash_unit` (oracle generator)."""
    return (
        f"(CAST(CAST(concat('0x', substr(md5(concat('{salt}:', CAST({key_expr} AS VARCHAR)))"
        f", 1, 8)) AS BIGINT) AS DOUBLE) / {float(1 << 32)})"
    )


# ---------------------------------------------------------------------------
# Token-budget mixture planning (round 5).
# ---------------------------------------------------------------------------

def mixture_rates(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    weights: dict[str, float],
    default_weight: float,
    budget_tokens: int | None = None,
    budget_frac: float | None = None,
    cap: bool = True,
) -> DataFrame:
    """Per-stratum sampling rates hitting a corpus-level token budget.

    The budget is either absolute (``budget_tokens``) or a fraction of the
    observed corpus token mass (``budget_frac`` — scale-invariant, so one
    query definition holds at every sf / corpus size).

    The domain-reweighting step of a pretraining mix (DoReMi-style targets,
    deterministic execution): stratum ``s`` with mixture weight ``w_s``
    gets a ``w_s / Σw`` share of ``budget_tokens``, converted to a keep
    probability against its observed token mass and capped at 1 (a stratum
    smaller than its target share is kept whole — the classic "keep all
    code/books, downsample web" shape).

    Returns one row per observed stratum: ``(strata, tok_total, rate)``.
    Cost at 100 TB: one map-side-combined aggregate over (strata) — tiny
    result (strata are a curated handful by definition) — plus a window
    over that tiny frame for Σw; the rates table is then broadcast back.
    The arithmetic is plain IEEE double ops in a fixed order so the DuckDB
    oracle reproduces each rate bit-for-bit.
    """
    w = F.lit(float(default_weight))
    for value, r in sorted(weights.items()):
        w = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(w)
    totals = (
        df.groupBy(strata_col)
        .agg(F.sum(F.col(token_col).cast("long")).alias("tok_total"))
        .withColumn("w", w)
    )
    wsum = Window.partitionBy()
    if budget_tokens is not None:
        budget = F.lit(float(budget_tokens))
    else:
        if budget_frac is None:
            raise ValueError("pass budget_tokens or budget_frac")
        budget = (
            F.lit(float(budget_frac))
            * F.sum("tok_total").over(wsum).cast("double")
        )
    rate = (
        budget
        * (F.col("w") / F.sum("w").over(wsum))
        / F.col("tok_total").cast("double")
    )
    if cap:
        rate = F.least(F.lit(1.0), rate)
    return totals.select(strata_col, "tok_total", rate.alias("rate"))


def mixture_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    token_col: str,
    weights: dict[str, float],
    default_weight: float,
    budget_tokens: int | None = None,
    budget_frac: float | None = None,
    salt: str = "mix",
    rates: DataFrame | None = None,
) -> DataFrame:
    """Deterministic hash sample realizing :func:`mixture_rates`.

    The rates frame is broadcast (O(strata) rows) and the keep decision is
    the usual ``hash_unit(key) < rate`` scan-side predicate — the corpus
    never shuffles and rejected rows are never materialized.  Pass a
    precomputed (e.g. checkpointed) ``rates`` frame to avoid re-running
    the totals aggregate when the caller also reports the rates.
    """
    from pyspark.sql.functions import broadcast

    if rates is None:
        rates = mixture_rates(
            df, strata_col, token_col, weights, default_weight,
            budget_tokens, budget_frac,
        )
    return (
        df.join(broadcast(rates.select(strata_col, "rate")), strata_col)
        .filter(hash_unit(F.col(key_col), salt) < F.col("rate"))
    )


def mixture_rates_sql(
    table: str,
    strata_expr: str,
    token_expr: str,
    weights: dict[str, float],
    default_weight: float,
    budget_tokens: int | None = None,
    budget_frac: float | None = None,
    cap: bool = True,
) -> str:
    """DuckDB mirror of :func:`mixture_rates` (same op order, same doubles)."""
    w_case = "CASE " + " ".join(
        f"WHEN {strata_expr} = '{v}' THEN {float(r)}" for v, r in sorted(weights.items())
    ) + f" ELSE {float(default_weight)} END"
    if budget_tokens is not None:
        budget = str(float(budget_tokens))
    else:
        budget = f"({float(budget_frac)} * CAST(sum(tok_total) OVER () AS DOUBLE))"
    cap_open = "least(1.0, " if cap else "("
    return f"""
SELECT {strata_expr}, tok_total,
       {cap_open}{budget} * (w / sum(w) OVER ())
                  / CAST(tok_total AS DOUBLE)) AS rate
FROM (
    SELECT {strata_expr},
           CAST(sum(CAST({token_expr} AS BIGINT)) AS BIGINT) AS tok_total,
           {w_case} AS w
    FROM {table}
    GROUP BY {strata_expr}
)
"""


def mixture_epochs(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    token_col: str,
    weights: dict[str, float],
    default_weight: float,
    budget_tokens: int | None = None,
    budget_frac: float | None = None,
    salt: str = "mix.epoch",
    rates: DataFrame | None = None,
) -> DataFrame:
    """Mixture realization WITH upsampling: rates above 1 replicate rows.

    Real pretraining mixes run high-quality domains for multiple epochs —
    a rate of 2.4 means two full passes plus a deterministic 40% subset on
    the third.  Each input row is emitted ``floor(rate) + (hash < frac)``
    times with an ``epoch`` column (1-based), so downstream packing sees
    distinct (row, epoch) units.  Still fully deterministic and
    oracle-checkable; the replication is a narrow ``explode(sequence)`` —
    map-side, no shuffle beyond the tiny rates aggregate.

    A caller-supplied ``rates`` frame MUST be built with ``cap=False``:
    capped rates (the :func:`mixture_sample` default) clamp every rate to
    1, silently degenerating epoch replication to a plain downsample.
    """
    if rates is None:
        rates = mixture_rates(
            df, strata_col, token_col, weights, default_weight,
            budget_tokens, budget_frac, cap=False,
        )
    from pyspark.sql.functions import broadcast

    rate = F.col("rate")
    n_copies = (
        F.floor(rate).cast("long")
        + (hash_unit(F.col(key_col), salt) < (rate - F.floor(rate))).cast("long")
    )
    return (
        df.join(broadcast(rates.select(strata_col, "rate")), strata_col)
        .withColumn("__n_copies", n_copies)
        .filter(F.col("__n_copies") >= 1)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1).cast("long"), F.col("__n_copies"))))
        .drop("__n_copies", "rate")
    )


def shuffle_plan(
    df: DataFrame, id_col: str, n_shards: int, seed: str = "shuffle"
) -> DataFrame:
    """Deterministic global shuffle for training order: (id, shard, pos).

    A trainer needs the corpus in a reproducible pseudo-random order, but a
    global ``ORDER BY random()`` is a total sort — a single range-partition
    wave over 100 TB, and non-reproducible across retries.  This plans the
    same permutation as hash-sharded state: every row gets a pseudo-random
    64-bit key = md5(seed:id) (deterministic across engines, retries, and
    cluster sizes), its shard = key mod ``n_shards``, and its position =
    rank of the key within the shard.  ONE shuffle (by shard) and a
    per-shard sort — shards are read in any order and each is internally
    shuffled, which is exactly the "shard + intra-shard shuffle" recipe
    training loaders use.  The key doubles as the tiebreak so the plan is
    total even for id collisions.
    """
    key = F.expr(
        f"CAST(conv(substring(md5(concat('{seed}:', CAST({id_col} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    w = Window.partitionBy("shard").orderBy("__key", id_col)
    return (
        df.select(F.col(id_col), key.alias("__key"))
        .withColumn("shard", F.col("__key") % n_shards)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("__key")
    )


def shuffle_plan_sql(
    table: str, id_col: str, n_shards: int, seed: str = "shuffle"
) -> str:
    """DuckDB mirror of :func:`shuffle_plan`."""
    key = (
        f"CAST(concat('0x', substr(md5(concat('{seed}:', CAST({id_col} AS VARCHAR))), 1, 15)) AS BIGINT)"
    )
    return f"""
WITH keyed AS (
    SELECT {id_col}, {key} AS k, {key} % {n_shards} AS shard FROM {table}
)
SELECT {id_col}, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY k, {id_col}) AS BIGINT) AS pos
FROM keyed
"""


def group_cap(
    df: DataFrame,
    id_col: str,
    group_col: str,
    cap: int,
    salt: str = "cap",
) -> DataFrame:
    """Deterministic per-group hard cap: keep at most ``cap`` rows per
    group, chosen pseudo-randomly but reproducibly.

    The standard curation guard against a single domain/source dominating
    a corpus ("cap every domain at N documents").  Rate-based sampling
    (:func:`hash_sample`) cannot express a hard ceiling; this ranks each
    group's rows by the md5 unit hash (engine/retry/cluster-size
    deterministic, same family as :func:`shuffle_plan`) and keeps ranks
    ≤ cap — so the survivors of a group are a uniform random ``cap``-subset
    and IDENTICAL on every re-run.  ONE shuffle (window by group); skew
    from a pathologically hot group is the window's partition — at scale,
    pre-filter obvious floods first or let AQE split the skewed partition.
    """
    key = F.expr(
        f"CAST(conv(substring(md5(concat('{salt}:', CAST({id_col} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    w = Window.partitionBy(group_col).orderBy("__key", id_col)
    return (
        df.withColumn("__key", key)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__key", "__rk")
    )


def group_cap_sql(
    table: str, id_col: str, group_col: str, cap: int, salt: str = "cap"
) -> str:
    """DuckDB mirror of :func:`group_cap` (returns all of ``table``'s
    columns for the kept rows)."""
    key = (
        f"CAST(concat('0x', substr(md5(concat('{salt}:', CAST({id_col} AS VARCHAR))), 1, 15)) AS BIGINT)"
    )
    return f"""
SELECT * EXCLUDE (__rk) FROM (
    SELECT *, row_number() OVER (PARTITION BY {group_col} ORDER BY {key}, {id_col}) AS __rk
    FROM {table}
) WHERE __rk <= {cap}
"""


def weighted_sample(df: DataFrame, key_col: str, weight_col: str, k: int,
                    salt: str = "wsample",
                    by: list[str] | None = None) -> DataFrame:
    """Weight-proportional sample WITHOUT replacement, k rows, deterministic
    (Efraimidis–Spirakis A-Res): rank every row by ``u^(1/w)`` where ``u``
    is the row's :func:`hash_unit` uniform and ``w`` its weight, keep the
    top k.  The standard quality-weighted selection operator (sample docs
    proportional to a quality score / length / dedup cluster mass) — same
    distribution as sequential A-Res, but order-independent and replayable
    because the uniforms come from the key hash, not an RNG.

    Rows with NULL or non-positive weight are excluded (zero weight = zero
    inclusion probability; A-Res keys are undefined there).

    Scale shape: ranking uses ``ln(u)/w`` — monotone in ``u^(1/w)`` but
    immune to ``pow`` underflow when weights are huge — and the plan is
    TakeOrderedAndProject: each partition keeps its local top-k and only
    k·n_partitions rows reach the driver-side merge.  No global sort, no
    shuffle of the rejected mass.  Ties broken by key for cross-engine
    determinism.

    ``by=[cols]`` switches to per-group mode: k rows weighted-sampled
    within EVERY group (per-source balanced selection — the weighted
    cousin of :func:`group_cap`).  That path is a rank window per group —
    one shuffle on the group key, no global ordering.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u = hash_unit(F.col(key_col), salt)
    score = F.log(u) / F.col(weight_col).cast("double")
    positive = df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
    if by:
        w = Window.partitionBy(*by).orderBy(F.col("__ws").desc(), F.col(key_col))
        return (
            positive.withColumn("__ws", score)
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= k)
            .drop("__ws", "__rk")
        )
    return (
        positive.withColumn("__ws", score)
        .orderBy(F.col("__ws").desc(), F.col(key_col))
        .limit(k)
        .drop("__ws")
    )


def weighted_sample_sql(table: str, key_col: str, weight_col: str, k: int,
                        salt: str = "wsample",
                        by: list[str] | None = None) -> str:
    """DuckDB mirror of :func:`weighted_sample` (oracle)."""
    u = hash_unit_sql(key_col, salt)
    if by:
        part = ", ".join(by)
        return f"""
SELECT * EXCLUDE (__ws, __rk) FROM (
    SELECT *, ln({u}) / CAST({weight_col} AS DOUBLE) AS __ws,
           row_number() OVER (PARTITION BY {part}
               ORDER BY ln({u}) / CAST({weight_col} AS DOUBLE) DESC, {key_col}) AS __rk
    FROM {table}
    WHERE {weight_col} IS NOT NULL AND {weight_col} > 0
) WHERE __rk <= {k}
"""
    return f"""
SELECT * EXCLUDE (__ws) FROM (
    SELECT *, ln({u}) / CAST({weight_col} AS DOUBLE) AS __ws
    FROM {table}
    WHERE {weight_col} IS NOT NULL AND {weight_col} > 0
    ORDER BY __ws DESC, {key_col} LIMIT {k}
)
"""


def temperature_rates(df: DataFrame, group_col: str, alpha: float,
                      budget_rows: int) -> DataFrame:
    """Temperature-scaled mixture plan (the mT5/XLM-R multilingual rule):
    sample group i with probability proportional to ``n_i^alpha`` —
    ``alpha=1`` is natural proportions, ``alpha→0`` is uniform across
    groups, the standard ``alpha≈0.3-0.7`` range upweights low-resource
    groups without drowning the head.

    Returns one row per group: ``(group, n_rows, target_rows, rate)`` with
    ``target_i = budget·n_i^α / Σ n_j^α`` and ``rate_i = target_i / n_i``
    (rates may exceed 1 — that group must be upsampled; feed the plan to
    :func:`mixture_epochs` for replication or cap with ``least(rate, 1)``
    for sampling-only).  Complements :func:`mixture_rates` (explicit
    per-group budgets) — this derives the budgets from one scalar knob.

    Scale shape: one count aggregate + a 1-row broadcast of the
    normalizer; the plan table is O(groups).
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(
        F.sum(F.pow(F.col("n_rows").cast("double"), float(alpha))).alias("__z")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            group_col,
            "n_rows",
            F.round(
                F.lit(float(budget_rows))
                * F.pow(F.col("n_rows").cast("double"), float(alpha))
                / F.col("__z"),
                6,
            ).alias("target_rows"),
        )
        .withColumn("rate", F.round(F.col("target_rows") / F.col("n_rows"), 6))
    )


def temperature_rates_sql(table: str, group_col: str, alpha: float,
                          budget_rows: int) -> str:
    """DuckDB mirror of :func:`temperature_rates` (oracle)."""
    return f"""
WITH c AS (
    SELECT {group_col}, count(*) AS n_rows FROM {table} GROUP BY 1
), z AS (
    SELECT sum(pow(CAST(n_rows AS DOUBLE), {float(alpha)})) AS z FROM c
)
SELECT {group_col}, n_rows,
       round({float(budget_rows)} * pow(CAST(n_rows AS DOUBLE), {float(alpha)}) / z.z, 6) AS target_rows,
       round({float(budget_rows)} * pow(CAST(n_rows AS DOUBLE), {float(alpha)}) / z.z / n_rows, 6) AS rate
FROM c, z
"""


def hash_split(df: DataFrame, key_col: str, fracs: dict[str, float],
               salt: str = "split", split_col: str = "split") -> DataFrame:
    """Deterministic dataset split (train/val/test): assign each row a
    split label by its key hash — reproducible across engines, reruns,
    partitionings, and retries, and STABLE UNDER GROWTH (a new row never
    moves an old row's split, unlike randomSplit or modulo-on-rank).

    Leakage control is the caller's key choice: split on ``doc_id`` for
    row-wise splits, or on a CONTENT key (``bow_fingerprint``, a near-dup
    cluster id) so every duplicate of a document lands in the same split —
    the eval-contamination guard (Lee et al.: train/test dup leakage
    inflates benchmarks).  Fractions must sum to 1 (±1e-9); labels are
    assigned over cumulative thresholds in sorted-label order.  Pure
    scan-side expression — no shuffle at any scale.
    """
    total = sum(fracs.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(v < 0 for v in fracs.values()):
        raise ValueError("fractions must be non-negative")
    u = hash_unit(F.col(key_col), salt)
    names = sorted(fracs)
    expr = F.lit(names[-1])  # remainder catches float residue
    cum = 0.0
    conds = []
    for name in names[:-1]:
        cum += fracs[name]
        conds.append((name, cum))
    for name, edge in reversed(conds):
        expr = F.when(u < F.lit(edge), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def hash_split_sql(key_expr: str, fracs: dict[str, float],
                   salt: str = "split") -> str:
    """DuckDB mirror of :func:`hash_split`'s label expression (oracle)."""
    u = hash_unit_sql(key_expr, salt)
    names = sorted(fracs)
    cases, cum = [], 0.0
    for name in names[:-1]:
        cum += fracs[name]
        cases.append(f"WHEN {u} < {cum!r} THEN '{name}'")
    return "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS'23)

def _dsir_grams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exploded hashed-ngram feature rows ``(id, gram)``: unigrams plus
    adjacent bigrams of the whitespace tokenization — the standard DSIR
    feature space (hashed n-grams, not embeddings, so the whole selector
    stays in integer-count land and scans linearly)."""
    # Tokenize ONCE into its own projection and build bigrams off the
    # materialized array column: the previous inline form re-evaluated
    # ``split(lower(text))`` for BOTH operands of every bigram concat
    # inside the transform lambda — O(doc_len × n_tokens) per row, the
    # measured hot spot of the whole DSIR path (sf0.1: the gram explode
    # alone cost 3.6 s of dsir_weights' 5.0 s; guide §1.2 "per-task
    # work").  CollapseProject keeps the split un-inlined because
    # ``__toks`` is referenced more than once (SPARK-36718), so the text
    # is lowered and split exactly once per row.
    toks_df = df.select(
        F.col(id_col),
        F.split(F.lower(F.col(text_col)), " ").alias("__toks"),
    )
    bigrams = F.when(
        F.size("__toks") >= 2,
        F.expr(
            "transform(sequence(1, size(__toks) - 1),"
            " i -> concat(__toks[i - 1], ' ', __toks[i]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks_df.select(
        F.col(id_col),
        F.explode(F.concat(F.col("__toks"), bigrams)).alias("__gram"),
    )


def _dsir_bucket(gram: Column, n_buckets: int) -> Column:
    """Feature-hash bucket: 32-bit md5 prefix of ``dsir:gram`` mod B —
    identical in DuckDB (the module's cross-engine hash discipline)."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit("dsir:"), gram)), 1, 8),
               16, 10).cast("long"),
        F.lit(int(n_buckets)),
    )


def dsir_weights(raw: DataFrame, target: DataFrame, id_col: str,
                 text_col: str, n_buckets: int = 1024,
                 smoothing: float = 1.0) -> DataFrame:
    """Per-document DSIR importance log-weight: how much more likely the
    document is under the TARGET corpus's hashed-ngram unigram model than
    under the RAW corpus's — ``logw = Σ_b c_b · (log p̂_tgt[b] − log
    p̂_raw[b])`` with add-``smoothing`` estimates over ``n_buckets``
    feature-hash buckets.  The domain-targeted data selector: score a
    100 TB crawl against a few GB of wiki/books/code exemplar text, then
    keep the top slice (:func:`dsir_select`).

    Scale shape: ONE explode+count shuffle per corpus builds integer
    bucket counts; the bucket log-ratio table is ``n_buckets`` rows —
    broadcast back onto the per-doc bucket counts, so no corpus-side
    second shuffle and nothing global beyond two B-row aggregates.  The
    target corpus is by definition the small side (an exemplar sample);
    its cost is one scan of it.

    Output: ``(id_col, logw double)`` — one row per raw doc (docs with
    no features score 0).  Weights are doubles; cross-engine parity holds
    to summation noise (~1e-15 relative); rank-boundary determinism
    comes from :func:`dsir_select`'s 9-dp rounding + id tie-break.
    """
    B, s = int(n_buckets), float(smoothing)

    def bucket_counts(df):
        g = _dsir_grams(df, id_col, text_col)
        return g.groupBy(
            F.col(id_col), _dsir_bucket(F.col("__gram"), B).alias("__b")
        ).agg(F.count(F.lit(1)).alias("__c"))

    raw_doc = bucket_counts(raw)
    raw_tot = raw_doc.groupBy("__b").agg(F.sum("__c").alias("__r"))
    tgt_tot = (
        _dsir_grams(target, id_col, text_col)
        .groupBy(_dsir_bucket(F.col("__gram"), B).alias("__b"))
        .agg(F.count(F.lit(1)).alias("__t"))
    )
    # B-row log-ratio table; totals ride a 1-row broadcast each
    rsum = raw_tot.agg(F.sum("__r").alias("__rtot"))
    tsum = tgt_tot.agg(F.sum("__t").alias("__ttot"))
    ratio = (
        raw_tot.join(tgt_tot, "__b", "full_outer")
        .na.fill({"__r": 0, "__t": 0})
        .crossJoin(F.broadcast(rsum)).crossJoin(F.broadcast(tsum))
        .select(
            "__b",
            (
                F.log((F.col("__t") + s) / (F.col("__ttot") + s * B))
                - F.log((F.col("__r") + s) / (F.col("__rtot") + s * B))
            ).alias("__lr"),
        )
    )
    w = (
        raw_doc.join(F.broadcast(ratio), "__b")
        .groupBy(id_col)
        .agg(F.sum(F.col("__c") * F.col("__lr")).alias("logw"))
    )
    return (
        raw.select(id_col).join(w, id_col, "left")
        .select(id_col, F.coalesce("logw", F.lit(0.0)).alias("logw"))
    )


def dsir_select(raw: DataFrame, target: DataFrame, id_col: str,
                text_col: str, k: int, n_buckets: int = 1024,
                smoothing: float = 1.0) -> DataFrame:
    """Top-``k`` raw documents by DSIR importance weight — the selection
    step (deterministic variant: rank by weight, no Gumbel noise; the
    hash-bucket model already provides the smoothing the paper's noise
    step exists for at selection-boundary scale).

    Ranking key is ``(round(logw, 9) DESC, id ASC)``: the rounding
    absorbs cross-engine double-summation noise at the k boundary and
    the id breaks exact ties (duplicate texts score identically), so the
    selected SET is engine-stable.  Plan: TakeOrderedAndProject over the
    weight relation — no global sort materialization.
    """
    w = dsir_weights(raw, target, id_col, text_col, n_buckets, smoothing)
    return (
        w.select(id_col, F.round("logw", 9).alias("logw"))
        .orderBy(F.col("logw").desc(), F.col(id_col).asc())
        .limit(int(k))
    )


def _dsir_sql_parts(raw_sql: str, target_sql: str, id_col: str,
                    text_col: str, n_buckets: int, smoothing: float) -> str:
    """Shared WITH-clause body for the DuckDB mirrors."""
    B, s = int(n_buckets), float(smoothing)
    toks = f"string_split(lower({text_col}), ' ')"
    # the 32-bit md5 prefix is non-negative, so plain % == pmod here
    bucket = ("(CAST(concat('0x', substr(md5(concat('dsir:', gram)), 1, 8)) "
              "AS BIGINT) % {B})").format(B=B)
    return f"""
rawd AS ({raw_sql}), tgtd AS ({target_sql}),
rawg AS (
    SELECT {id_col}, unnest({toks}) AS gram FROM rawd
    UNION ALL
    SELECT {id_col}, t1 || ' ' || t2 AS gram FROM (
        SELECT {id_col}, {toks}[i] AS t1, {toks}[i + 1] AS t2
        FROM rawd, LATERAL (SELECT unnest(range(1, len({toks}))) AS i) ix
    )
),
tgtg AS (
    SELECT {id_col}, unnest({toks}) AS gram FROM tgtd
    UNION ALL
    SELECT {id_col}, t1 || ' ' || t2 AS gram FROM (
        SELECT {id_col}, {toks}[i] AS t1, {toks}[i + 1] AS t2
        FROM tgtd, LATERAL (SELECT unnest(range(1, len({toks}))) AS i) ix
    )
),
raw_doc AS (SELECT {id_col}, {bucket} AS b, count(*) AS c FROM rawg GROUP BY 1, 2),
raw_tot AS (SELECT b, sum(c) AS r FROM raw_doc GROUP BY 1),
tgt_tot AS (SELECT {bucket} AS b, count(*) AS t FROM tgtg GROUP BY 1),
ratio AS (
    SELECT coalesce(raw_tot.b, tgt_tot.b) AS b,
           ln((coalesce(t, 0) + {s}) / ((SELECT sum(t) FROM tgt_tot) + {s} * {B}))
         - ln((coalesce(r, 0) + {s}) / ((SELECT sum(r) FROM raw_tot) + {s} * {B})) AS lr
    FROM raw_tot FULL OUTER JOIN tgt_tot ON raw_tot.b = tgt_tot.b
),
w AS (
    SELECT rd.{id_col}, sum(rd.c * ratio.lr) AS logw
    FROM raw_doc rd JOIN ratio ON rd.b = ratio.b
    GROUP BY 1
)"""


def dsir_weights_sql(raw_sql: str, target_sql: str, id_col: str,
                     text_col: str, n_buckets: int = 1024,
                     smoothing: float = 1.0) -> str:
    """DuckDB mirror of :func:`dsir_weights` (oracle generator)."""
    body = _dsir_sql_parts(raw_sql, target_sql, id_col, text_col,
                           n_buckets, smoothing)
    return f"""WITH {body}
SELECT rawd.{id_col}, coalesce(w.logw, 0.0) AS logw
FROM rawd LEFT JOIN w ON rawd.{id_col} = w.{id_col}
"""


def dsir_select_sql(raw_sql: str, target_sql: str, id_col: str,
                    text_col: str, k: int, n_buckets: int = 1024,
                    smoothing: float = 1.0) -> str:
    """DuckDB mirror of :func:`dsir_select`."""
    body = _dsir_sql_parts(raw_sql, target_sql, id_col, text_col,
                           n_buckets, smoothing)
    return f"""WITH {body}
SELECT rawd.{id_col}, round(coalesce(w.logw, 0.0), 9) AS logw
FROM rawd LEFT JOIN w ON rawd.{id_col} = w.{id_col}
ORDER BY logw DESC, rawd.{id_col} ASC
LIMIT {int(k)}
"""
