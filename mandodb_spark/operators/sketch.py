"""Frequency sketches: Count-Min over a key column.

Beyond-reference surface (the reference has no sketches at all; Spark
ships HLL++ and t-digest but no CMS).  The sketch is built as a plain
DataFrame — (row, bucket, count) with d·w cells — so it merges across
partitions/batches by summation (map-side partial agg), exactly the
property that makes CMS the streaming/distributed frequency structure.

Hashing is md5-derived (engine-agnostic, like the minhash/winnowing
stages) so estimates are bit-identical across Spark and the DuckDB
oracle: row i's bucket for key k = int(md5('i:'+k)[:8], 16) mod width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default geometry: 4 rows × 1024 buckets → ε ≈ 2e/w, δ ≈ e^-4.
CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_bucket(key: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Row ``row``'s bucket for ``key`` (32-bit md5 prefix mod width)."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{row}:"), key)), 1, 8), 16, 10).cast("long"),
        F.lit(width),
    )


def cms_build(keys: DataFrame, key_col: str,
              depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Build the sketch table (row, bucket, n) from a relation of keys.

    One explode (×depth) + one hash aggregation; the result has at most
    d·w rows regardless of input size — THE reduction that lets a 100 TB
    key stream summarize into kilobytes.  Sketches built on different
    data slices union+re-aggregate into the combined sketch.
    """
    rows = F.array(
        *[
            F.struct(F.lit(r).alias("row"), cms_bucket(F.col(key_col), r, width).alias("bucket"))
            for r in range(depth)
        ]
    )
    return (
        keys.select(F.explode(rows).alias("rb"))
        .select(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(sketch: DataFrame, queries: DataFrame, key_col: str,
                 depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Point-estimate each query key's frequency: min over rows of its
    bucket count (the CMS upper-bound estimate, never an undercount).

    ``queries`` is expected small (broadcast side); the sketch join is an
    equi-join on (row, bucket).
    """
    probes = queries.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), cms_bucket(F.col(key_col), r, width).alias("bucket")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    # LEFT join from the probes: a (row, bucket) cell with no sketch row has
    # count 0, and the CMS estimate is min over ALL d cells — an inner join
    # would drop empty cells from the min, inflating estimates for unseen
    # keys (violating est <= true + eps*N) and losing keys entirely when all
    # d cells are empty.
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est_count"))
    )


# ---------------------------------------------------------------------------
# Mergeable HLL cardinality rollup (DataSketches via Spark built-ins).

def series_cardinality_sketch(rel: DataFrame) -> DataFrame:
    """Per-segment HLL sketch of the series identity — the mergeable
    "active series over time" health metric.  One partial-aggregated
    shuffle; the sketch column is a DataSketches HLL binary, so
    any time range's cardinality is a UNION of its segments' sketches
    (never a rescan), the property exact distinct counts lack."""
    return rel.groupBy("seg").agg(
        F.hll_sketch_agg("series_key").alias("sketch"),
        F.count(F.lit(1)).alias("n_points"),
    )


def cardinality_materialize(spark, rel: DataFrame, dest: str,
                            incremental: bool = False,
                            since_seg: int | None = None) -> None:
    """Seg-partitioned write of :func:`series_cardinality_sketch` with the
    same watermark/dynamic-overwrite protocol as the histogram rollup
    (operators/histogram.py::materialize): ``incremental=True`` rebuilds
    only partitions at/after the max materialized seg; ``since_seg``
    overrides for late backfill.  Safe by construction: sketches are
    keyed by seg itself, so no sketch straddles a partition."""
    use_dynamic = False
    if incremental or since_seg is not None:
        w = since_seg
        if w is None:
            from pathlib import Path as _Path

            if _Path(dest).exists():
                w = spark.read.parquet(dest).agg(F.max("seg")).first()[0]
        if w is not None:
            rel = rel.filter(F.col("seg") >= w)
            use_dynamic = True
    sk = series_cardinality_sketch(rel)
    # per-WRITE overwrite mode (ADVICE r5): scoped to this job, no
    # session-conf mutation a concurrent writer could inherit
    (
        sk.repartition(F.col("seg"))
        .write.option("compression", "zstd")
        .option("partitionOverwriteMode", "dynamic" if use_dynamic else "static")
        .partitionBy("seg").mode("overwrite").parquet(dest)
    )


def cardinality_estimate(spark, dest: str, start_seg: int, end_seg: int) -> DataFrame:
    """Distinct-series estimate over ``[start_seg, end_seg]``: prune the
    seg partitions, UNION the surviving sketches, estimate — O(segments
    in range) sketch rows touched, zero point rows.  Returns a 1-row
    DataFrame ``(n_segs, n_points, est_series)``."""
    sk = spark.read.parquet(dest).filter(F.col("seg").between(start_seg, end_seg))
    return sk.agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum("n_points").alias("n_points"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_series"),
    )


# ---------------------------------------------------------------------------
# Mergeable relative-error quantile sketch (DDSketch, logarithmic buckets).
#
# Reference parity note: the reference TSDB (chenjiandongx/mandodb) answers
# quantile questions only by scanning raw points; at 100 TB a "p99 latency
# over last 30 days" query cannot afford that.  DDSketch (Masson et al.,
# VLDB'19) collapses any value stream into O(log(range)/alpha) log-spaced
# buckets with a GUARANTEED relative error alpha on every quantile, and —
# the property that matters on a cluster — sketches merge by bucket-wise
# count addition, so per-segment sketches roll up to any time range without
# rescanning points (same contract as the HLL cardinality rollup above).
#
# Representation: plain DataFrame rows (group..., sgn, bucket, n) where
#   sgn    = -1 / 0 / +1 (sign of the value; 0-values get their own cell)
#   bucket = ceil(ln|v| / ln(gamma)),  gamma = (1+alpha)/(1-alpha)
# Value order is (sgn ASC, sgn*bucket ASC), so quantile lookup is one
# cumulative-sum walk.  All arithmetic is Spark built-ins — JVM-side,
# partial-aggregatable (the groupBy count combines map-side).

import math as _math

DDS_ALPHA = 0.01


def dds_gamma(alpha: float = DDS_ALPHA) -> float:
    """Bucket base for relative error ``alpha``: (1+a)/(1-a)."""
    return (1.0 + alpha) / (1.0 - alpha)


def dds_cells(value: Column, alpha: float = DDS_ALPHA) -> tuple[Column, Column]:
    """(sgn, bucket) cell coordinates for one value column.

    NULL values propagate NULL sgn (callers drop them); zero maps to the
    dedicated (0, 0) cell so the log never sees 0.
    """
    lg = _math.log(dds_gamma(alpha))
    sgn = F.when(value.isNull(), F.lit(None).cast("int")).otherwise(
        F.signum(value).cast("int")
    )
    bucket = F.when(sgn == 0, F.lit(0)).otherwise(
        F.ceil(F.log(F.abs(value)) / F.lit(lg)).cast("long")
    )
    return sgn, bucket


def dds_build(df: DataFrame, value_col: str, alpha: float = DDS_ALPHA,
              group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Build per-group sketches: (group..., sgn, bucket, n).

    One hash aggregation; output size is O(groups * log(range)/alpha)
    regardless of input rows.  Sketches over different slices merge by
    ``union -> groupBy(group, sgn, bucket).sum(n)`` — see dds_merge.
    """
    sgn, bucket = dds_cells(F.col(value_col), alpha)
    rows = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, sgn.alias("sgn"), bucket.alias("bucket")
    )
    return rows.groupBy(*group_cols, "sgn", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )


def dds_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same alpha: bucket-wise count sum."""
    it = iter(sketches)
    acc = next(it)
    for s in it:
        acc = acc.unionByName(s)
    keys = [c for c in acc.columns if c != "n"]
    return acc.groupBy(*keys).agg(F.sum("n").alias("n"))


def dds_quantiles(sketch: DataFrame, qs: list[float],
                  alpha: float = DDS_ALPHA,
                  group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Estimate quantiles from a sketch: (group..., q, est).

    Rank semantics: the estimate targets the value at 0-indexed rank
    floor(q*(N-1)) of the sorted stream (the "lower" discrete quantile),
    with |est - true| <= alpha * |true| for nonzero targets and est == 0
    exactly when the target is 0.  One window cumulative sum per group —
    the sketch is tiny, so the single-partition window per group is cheap
    by construction.
    """
    from pyspark.sql import Window

    g = dds_gamma(alpha)
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy(F.col("sgn").asc(), (F.col("sgn") * F.col("bucket")).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*[F.col(c) for c in group_cols])
    cum = sketch.select(
        *group_cols, "sgn", "bucket", "n",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(wn).alias("total"),
    )
    probes = cum.select(
        "*", F.explode(F.array(*[F.lit(q) for q in qs])).alias("q")
    ).withColumn(
        "target", (F.floor(F.col("q") * (F.col("total") - 1)) + 1).cast("long")
    )
    hit = probes.filter(
        (F.col("cum") - F.col("n") < F.col("target"))
        & (F.col("cum") >= F.col("target"))
    )
    est = F.when(F.col("sgn") == 0, F.lit(0.0)).otherwise(
        F.col("sgn")
        * (2.0 * F.pow(F.lit(g), F.col("bucket")) / F.lit(g + 1.0))
    )
    return hit.select(*group_cols, "q", est.alias("est"))


def quantile_materialize(spark, rel: DataFrame, dest: str,
                         alpha: float = DDS_ALPHA,
                         incremental: bool = False,
                         since_seg: int | None = None) -> None:
    """Seg-partitioned DDSketch rollup of the point values — same
    watermark/dynamic-overwrite protocol as cardinality_materialize.
    Each seg's sketch is self-contained, so incremental refresh rewrites
    only partitions at/after the watermark."""
    use_dynamic = False
    if incremental or since_seg is not None:
        w = since_seg
        if w is None:
            from pathlib import Path as _Path

            if _Path(dest).exists():
                w = spark.read.parquet(dest).agg(F.max("seg")).first()[0]
        if w is not None:
            rel = rel.filter(F.col("seg") >= w)
            use_dynamic = True
    sk = dds_build(rel, "value", alpha, group_cols=("seg",))
    (
        sk.repartition(F.col("seg"))
        .write.option("compression", "zstd")
        .option("partitionOverwriteMode", "dynamic" if use_dynamic else "static")
        .partitionBy("seg").mode("overwrite").parquet(dest)
    )


def quantile_estimate(spark, dest: str, start_seg: int, end_seg: int,
                      qs: list[float],
                      alpha: float = DDS_ALPHA) -> DataFrame:
    """Quantiles over ``[start_seg, end_seg]``: prune seg partitions,
    merge the surviving sketches bucket-wise, walk once — O(buckets)
    rows touched, zero point rows.  Returns (q, est) rows."""
    sk = spark.read.parquet(dest).filter(F.col("seg").between(start_seg, end_seg))
    merged = sk.groupBy("sgn", "bucket").agg(F.sum("n").alias("n"))
    return dds_quantiles(merged, qs, alpha)


def exact_quantiles_disc(df: DataFrame, value_col: str, qs: list[float],
                         n_buckets: int = 32) -> DataFrame:
    """EXACT lower discrete quantiles — the value at 1-based rank
    ``floor(q*(N-1)) + 1`` of the sorted non-null stream for each q —
    computed with the distributed two-phase rank, never a global window.

    This is the exact companion to the DDSketch estimate (same rank
    semantics as :func:`dds_quantiles`): the verification side of the
    sketch's alpha guarantee, and the one-off "true p99" tool when a
    job can afford a full pass.

    Scale shape (the round-6 verdict's fix for the corpus-wide
    ``row_number().over(Window.orderBy(...))`` anti-pattern):

    1. ONE aggregate computes N and ``n_buckets-1`` approx-quantile
       range boundaries (rank error ≤ N/10000 per Greenwald–Khanna) —
       a 1-row broadcast.
    2. Each row gets its range bucket by counting boundaries below it
       (a codegen'd HOF over ≤31 array elements — deterministic, unlike
       ``spark_partition_id`` after ``repartitionByRange``, whose
       sample-based boundaries can differ between plan branches).
    3. Per-bucket counts (one map-side-combining aggregate, ≤n_buckets
       rows) collapse into a single collect_list row; each row derives
       its bucket's global rank offset and size from that broadcast
       array — no window over the counts either.
    4. Buckets whose rank interval ``(offset, offset+size]`` contains no
       target rank are FILTERED OUT before the rank window runs, so the
       only windows executed are per-target-bucket ``row_number`` over
       ~N/n_buckets rows (≤ |qs| buckets survive).

    Output: ``(q, value)`` — one row per q (ties in ``value_col`` are
    rank-ambiguous but value-at-rank is not, so the result is
    deterministic).  Empty input yields no rows.
    """
    ranked = _rank_probes(
        df, value_col,
        lambda total: F.array_distinct(F.array(*[
            (F.floor(F.lit(float(q)) * (total - 1)) + 1).cast("long")
            for q in qs
        ])),
        n_buckets,
    )
    probes = ranked.select(
        "__v", "__rn", "__total",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    )
    return probes.filter(
        F.col("__rn") == F.floor(F.col("q") * (F.col("__total") - 1)) + 1
    ).select("q", F.col("__v").alias("value"))


def exact_quantiles_cont(df: DataFrame, value_col: str, qs: list[float],
                         n_buckets: int = 32) -> DataFrame:
    """EXACT continuous (interpolated) quantiles — Spark ``percentile()``
    / DuckDB ``quantile_cont`` semantics — from TWO rank probes per q
    instead of a ``percentile()`` corpus aggregate (which buffers all
    O(distinct-values) counts on one reducer) or a global window.

    Rank math mirrors Spark's ``Percentile.getPercentile`` exactly so
    the result is bit-identical to the built-in on the same doubles:
    ``pos = q*(N-1)``; ``lo = floor(pos)``, ``hi = ceil(pos)`` (0-based);
    ``result = (hi-pos)*v[lo] + (pos-lo)*v[hi]``, collapsing to
    ``v[lo]`` when ``pos`` is integral.  Both probes ride the same
    two-phase-rank engine as :func:`exact_quantiles_disc` — one
    percentile_approx range pass, per-bucket offset arithmetic from a
    broadcast count row, and a ``row_number`` only inside the ≤2·|qs|
    buckets that actually hold a probe rank.

    Output: ``(q, value)`` — one row per q; empty input yields no rows.
    """
    ranked = _rank_probes(
        df, value_col,
        lambda total: F.array_distinct(F.flatten(F.array(*[
            F.array(
                (F.floor(F.lit(float(q)) * (total - 1).cast("double")) + 1
                 ).cast("long"),
                (F.ceil(F.lit(float(q)) * (total - 1).cast("double")) + 1
                 ).cast("long"),
            )
            for q in qs
        ]))),
        n_buckets,
    )
    probes = ranked.select(
        "__v", "__rn", "__total",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    )
    pos = F.col("q") * (F.col("__total") - 1).cast("double")
    lo_rn = F.floor(pos) + 1
    hi_rn = F.ceil(pos) + 1
    picked = probes.filter(
        (F.col("__rn") == lo_rn) | (F.col("__rn") == hi_rn)
    ).groupBy("q").agg(
        F.max(F.when(F.col("__rn") == lo_rn, F.col("__v"))).alias("__vlo"),
        F.max(F.when(F.col("__rn") == hi_rn, F.col("__v"))).alias("__vhi"),
        F.first("__total").alias("__total"),
    )
    pos2 = F.col("q") * (F.col("__total") - 1).cast("double")
    value = F.when(
        F.ceil(pos2) == F.floor(pos2), F.col("__vlo")
    ).otherwise(
        (F.ceil(pos2).cast("double") - pos2) * F.col("__vlo")
        + (pos2 - F.floor(pos2).cast("double")) * F.col("__vhi")
    )
    return picked.select("q", value.alias("value"))


def exact_quantiles_disc_cont(df: DataFrame, value_col: str,
                              qs: list[float],
                              n_buckets: int = 32) -> DataFrame:
    """:func:`exact_quantiles_disc` and :func:`exact_quantiles_cont`
    from ONE two-phase-rank pass.

    The disc target rank ``floor(q*(N-1)) + 1`` is exactly the cont
    probe's lower rank, so a single :func:`_rank_probes` run with the
    floor+ceil target set serves both — callers that need both (the
    sketch-verification rollup) previously paid the whole engine twice:
    two percentile_approx range passes, two bucket-count aggregates, two
    probe windows over the same relation.  Values are identical to the
    two separate calls by construction (same ranks, same rows).

    Output: ``(q, disc_q, cont_q)`` — one row per q.
    """
    ranked = _rank_probes(
        df, value_col,
        lambda total: F.array_distinct(F.flatten(F.array(*[
            F.array(
                (F.floor(F.lit(float(q)) * (total - 1).cast("double")) + 1
                 ).cast("long"),
                (F.ceil(F.lit(float(q)) * (total - 1).cast("double")) + 1
                 ).cast("long"),
            )
            for q in qs
        ]))),
        n_buckets,
    )
    probes = ranked.select(
        "__v", "__rn", "__total",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    )
    pos = F.col("q") * (F.col("__total") - 1).cast("double")
    lo_rn = F.floor(pos) + 1
    hi_rn = F.ceil(pos) + 1
    picked = probes.filter(
        (F.col("__rn") == lo_rn) | (F.col("__rn") == hi_rn)
    ).groupBy("q").agg(
        F.max(F.when(F.col("__rn") == lo_rn, F.col("__v"))).alias("__vlo"),
        F.max(F.when(F.col("__rn") == hi_rn, F.col("__v"))).alias("__vhi"),
        F.first("__total").alias("__total"),
    )
    pos2 = F.col("q") * (F.col("__total") - 1).cast("double")
    cont = F.when(
        F.ceil(pos2) == F.floor(pos2), F.col("__vlo")
    ).otherwise(
        (F.ceil(pos2).cast("double") - pos2) * F.col("__vlo")
        + (pos2 - F.floor(pos2).cast("double")) * F.col("__vhi")
    )
    return picked.select(
        "q", F.col("__vlo").alias("disc_q"), cont.alias("cont_q")
    )


def _rank_probes(df: DataFrame, value_col: str, targets_fn,
                 n_buckets: int) -> DataFrame:
    """Shared two-phase-rank engine behind exact_quantiles_disc/cont:
    returns ``(__v, __rn, __total)`` rows carrying the global 1-based
    rank, materialized ONLY inside buckets whose rank interval contains
    a target rank.  ``targets_fn(total_col)`` builds the array of
    1-based target ranks from the total-count column, so callers choose
    floor-only (disc) or floor+ceil (cont) probes."""
    from pyspark.sql import Window

    vals = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("__v")
    )
    fracs = ", ".join(repr(i / n_buckets) for i in range(1, n_buckets))
    stats = vals.agg(
        F.expr(f"percentile_approx(__v, array({fracs}), 10000)").alias("__bounds"),
        F.count(F.lit(1)).alias("__total"),
    )
    bucketed = vals.crossJoin(F.broadcast(stats)).withColumn(
        "__bkt",
        F.aggregate(
            "__bounds",
            F.lit(0),
            lambda acc, bound: acc + F.when(F.col("__v") > bound, 1).otherwise(0),
        ),
    )
    counts = bucketed.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__cnt"))
    count_row = counts.agg(
        F.collect_list(F.struct("__bkt", "__cnt")).alias("__counts")
    )
    targets = targets_fn(F.col("__total"))
    enriched = (
        bucketed.crossJoin(F.broadcast(count_row))
        .withColumn(
            "__off",
            F.aggregate(
                F.filter("__counts", lambda s: s["__bkt"] < F.col("__bkt")),
                F.lit(0).cast("long"),
                lambda acc, s: acc + s["__cnt"],
            ),
        )
        .withColumn(
            "__sz",
            F.element_at(
                F.filter("__counts", lambda s: s["__bkt"] == F.col("__bkt")), 1
            )["__cnt"],
        )
        # prune: only buckets holding a target rank pay for a sort
        .filter(F.exists(
            targets,
            lambda t: (t > F.col("__off")) & (t <= F.col("__off") + F.col("__sz")),
        ))
    )
    return enriched.withColumn(
        "__rn",
        F.col("__off")
        + F.row_number().over(Window.partitionBy("__bkt").orderBy("__v")),
    )


def grouped_quantile_cont(df: DataFrame, key_cols: list[str],
                          value_col: str, q: float,
                          n_buckets: int = 32,
                          carry: tuple[str, ...] = (),
                          broadcast_stats: bool = True,
                          accuracy: int = 1000) -> DataFrame:
    """Per-GROUP exact interpolated quantile — the grouped generalization
    of :func:`exact_quantiles_cont`, for aggregations whose group size is
    unbounded at scale (PromQL ``quantile by/without``, where one group =
    the series cardinality of a retained-label subset: ``quantile(0.99,
    up)`` over 10M series is ONE group).  A per-group ``percentile()``
    buffers every group value on one reducer; this never materializes
    more than ~N_g/n_buckets rows in any single sort partition.

    Same rank math as :func:`exact_quantiles_cont` (bit-identical to
    Spark ``percentile`` / DuckDB ``quantile_cont``): ``pos = q*(N_g-1)``,
    interpolate between the group-local values at 0-based ranks
    ``floor(pos)`` / ``ceil(pos)``.  Engine per group: (1) one hash
    aggregate computes N_g and ``n_buckets-1`` approx range boundaries
    (QuantileSummaries — partial-aggregatable, bounded memory per key);
    (2) rows bucket by counting boundaries below them (codegen'd HOF);
    (3) per-(group, bucket) counts collapse to a per-group array (≤
    n_buckets structs) joined back for offset arithmetic; (4) only the
    ≤2 buckets per group whose rank interval holds a probe rank pay for
    a ``row_number`` over ``(key, bucket)`` — a window over ~N_g/32 rows,
    never the whole group.  All joins are equi-joins on the group key.

    ``key_cols`` must be non-null (join keys — use a canonical-JSON
    group key, not raw nullable label values).  ``carry`` columns must
    be functionally dependent on the key; they ride the stats aggregate
    via ``any_value``.  Output: ``key_cols + carry + (value)``, one row
    per group with ≥1 non-null value (groups of only nulls drop, as
    PromQL vectors carry no NULL samples).

    ``broadcast_stats`` (default True): the stats/counts sides are ONE
    row per group, so broadcasting them keeps the big side's
    partitioning — a shuffle join here would hash 10M rows onto the few
    reducers the group keys map to (measured 6× slower at 4M rows / 5
    groups).  This operator's scale driver is group SIZE (the unbounded
    dimension); with millions of TINY groups instead, pass False (or
    just use ``percentile`` — small groups are its sweet spot).
    ``accuracy`` tunes the range-bound pass only — bucket balance, never
    correctness (any bounds yield the same exact result).
    """
    from pyspark.sql import Window

    ks, cr = list(key_cols), list(carry)
    maybe_bcast = F.broadcast if broadcast_stats else (lambda d: d)
    vals = df.filter(F.col(value_col).isNotNull()).select(
        *ks, *cr, F.col(value_col).cast("double").alias("__v"))
    fracs = ", ".join(repr(i / n_buckets) for i in range(1, n_buckets))
    stats = maybe_bcast(vals.groupBy(*ks).agg(
        F.expr(f"percentile_approx(__v, array({fracs}), {int(accuracy)})"
               ).alias("__bounds"),
        F.count(F.lit(1)).alias("__total"),
        *[F.any_value(c).alias(c) for c in cr],
    ))
    bucketed = vals.drop(*cr).join(stats, ks).withColumn(
        "__bkt",
        F.aggregate(
            "__bounds",
            F.lit(0),
            lambda acc, bound: acc + F.when(F.col("__v") > bound, 1).otherwise(0),
        ),
    )
    counts = bucketed.groupBy(*ks, "__bkt").agg(F.count(F.lit(1)).alias("__cnt"))
    count_rows = maybe_bcast(counts.groupBy(*ks).agg(
        F.collect_list(F.struct("__bkt", "__cnt")).alias("__counts")))
    pos = F.lit(float(q)) * (F.col("__total") - 1).cast("double")
    lo_t = (F.floor(pos) + 1).cast("long")
    hi_t = (F.ceil(pos) + 1).cast("long")

    def _hit(t):
        return (t > F.col("__off")) & (t <= F.col("__off") + F.col("__sz"))

    enriched = (
        bucketed.join(count_rows, ks)
        .withColumn(
            "__off",
            F.aggregate(
                F.filter("__counts", lambda s: s["__bkt"] < F.col("__bkt")),
                F.lit(0).cast("long"),
                lambda acc, s: acc + s["__cnt"],
            ),
        )
        .withColumn(
            "__sz",
            F.element_at(
                F.filter("__counts", lambda s: s["__bkt"] == F.col("__bkt")), 1
            )["__cnt"],
        )
        # prune: only buckets holding a probe rank pay for a sort
        .filter(_hit(lo_t) | _hit(hi_t))
    )
    ranked = enriched.withColumn(
        "__rn",
        F.col("__off")
        + F.row_number().over(Window.partitionBy(*ks, "__bkt").orderBy("__v")),
    )
    picked = (
        ranked.filter((F.col("__rn") == lo_t) | (F.col("__rn") == hi_t))
        .groupBy(*ks)
        .agg(
            F.max(F.when(F.col("__rn") == lo_t, F.col("__v"))).alias("__vlo"),
            F.max(F.when(F.col("__rn") == hi_t, F.col("__v"))).alias("__vhi"),
            F.first("__total").alias("__total"),
            *[F.first(c).alias(c) for c in cr],
        )
    )
    pos2 = F.lit(float(q)) * (F.col("__total") - 1).cast("double")
    value = F.when(
        F.ceil(pos2) == F.floor(pos2), F.col("__vlo")
    ).otherwise(
        (F.ceil(pos2).cast("double") - pos2) * F.col("__vlo")
        + (pos2 - F.floor(pos2).cast("double")) * F.col("__vhi")
    )
    return picked.select(*ks, *cr, value.alias("value"))


def hll_overlap_estimate(a: DataFrame, b: DataFrame, key_col: str,
                         lg_k: int = 14) -> DataFrame:
    """Distinct-overlap estimate between two relations via mergeable HLL
    sketches and inclusion–exclusion: ``|A∩B| ≈ |A| + |B| − |A∪B|`` —
    the corpus-overlap / contamination-scale question ("how much does
    this new crawl share with what we have?") answered WITHOUT the exact
    distinct-join, whose shuffle is the thing that hurts at 100 TB.

    Each side is one map-side-combining sketch aggregate collapsing to a
    single row; the union is ``hll_union`` of two binaries — no shuffle
    of keys against keys, ever.  Inclusion–exclusion inherits ~3× the
    single-sketch error and can go negative on tiny overlaps (clamped to
    0); for |A∩B| ≫ error it's the standard cheap answer, and the same
    sketches roll up across corpus slices for free.

    Returns one row: ``(est_a, est_b, est_union, est_intersect,
    jaccard)`` (counts as BIGINT estimates, intersect/jaccard as
    doubles).  An empty side degrades cleanly: ``hll_sketch_agg`` over
    zero rows is the empty sketch, so its estimate is 0 (verified by the
    disjoint-clamp test), not NULL.
    """
    sa = a.agg(F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("ska"))
    sb = b.agg(F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("skb"))
    j = sa.crossJoin(F.broadcast(sb))
    est_a = F.hll_sketch_estimate("ska")
    est_b = F.hll_sketch_estimate("skb")
    est_u = F.hll_sketch_estimate(F.hll_union("ska", "skb"))
    est_i = F.greatest(F.lit(0.0), est_a + est_b - est_u)
    return j.select(
        est_a.alias("est_a"),
        est_b.alias("est_b"),
        est_u.alias("est_union"),
        est_i.alias("est_intersect"),
        F.round(est_i / est_u, 6).alias("jaccard"),
    )
