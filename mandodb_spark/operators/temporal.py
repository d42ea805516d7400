"""Temporal join operators: interval (range) join, scale-safe.

Spark has no native range-join optimization: a join whose only condition
is an inequality (``r.ts BETWEEN l.start AND l.end``) plans as
BroadcastNestedLoopJoin or CartesianProduct — O(|L|·|R|) work that dies at
cluster scale.  The standard fix is *bucketing*: overlap can only happen
inside a shared time bucket, so explode each interval onto the buckets it
spans, give each point its single bucket, equi-join on the bucket (a plain
shuffle hash join), then apply the exact predicate.  Cost becomes
O(|L|·spans + |R| + true_matches) and shuffles on a well-distributed key.

(The as-of join in workloads/events_q.py is the ordered cousin; this is
the containment form.)
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketed_interval_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` rows into every ``intervals`` row whose
    [start, end] contains their ``ts`` — via bucket equi-join.

    Each (interval, point) pair can meet in at most ONE bucket (the
    point's own), so the join produces no duplicates and needs no
    distinct.  ``bucket_width`` should be on the order of typical interval
    length: too small explodes intervals wide, too large degrades the
    equi-join's selectivity toward the nested loop it replaces.
    """
    buckets = F.sequence(
        F.floor(F.col(start_col) / bucket_width).cast("long"),
        F.floor(F.col(end_col) / bucket_width).cast("long"),
    )
    lhs = intervals.withColumn("__bucket", F.explode(buckets))
    rhs = points.withColumn("__bucket", F.floor(F.col(ts_col) / bucket_width).cast("long"))
    return (
        lhs.join(rhs, "__bucket", how)
        .filter(F.col(ts_col).between(F.col(start_col), F.col(end_col)))
        .drop("__bucket")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Optional[Sequence[str]] = None,
    direction: str = "backward",
    tolerance: Optional[int] = None,
    how: str = "left",
    matched_ts_col: Optional[str] = None,
) -> DataFrame:
    """Ordered as-of join: attach to every ``left`` row the single ``right``
    row for the same key that is nearest in time — at-or-before ``left_ts``
    (``direction='backward'``, the default) or at-or-after
    (``direction='forward'``).

    Scale shape: the naive formulation (``r.ts <= l.ts`` + a max-per-row
    subquery, or a range join) is O(|L|·|R|) per key and plans as a nested
    loop.  This implementation is the merge-ordered union: tag both inputs,
    union them, ONE shuffle on the join key, and a running
    ``last(payload, ignorenulls)`` window carries each right row forward
    (backward direction) to every later left row.  Cost is a single
    sort-within-partition of |L|+|R| — the same shape Pandas' merge_asof and
    kdb's aj use, but distributed.  Skewed keys behave like any window (one
    task per hot key); no retries, no duplicate matches by construction.

    ``tolerance`` (same unit as the ts columns) nulls out matches farther
    than the bound but keeps the left row under ``how='left'``;
    ``how='inner'`` drops unmatched (or out-of-tolerance) rows.
    ``right_cols`` defaults to every non-key, non-ts right column; output
    keeps all left columns plus those, plus ``matched_ts_col`` (the matched
    right timestamp) when requested.  Ties: right rows sharing
    (key, right_ts) are not deterministically ordered — pre-aggregate the
    right side to one row per (key, ts) when that matters.

    Reference anchor: the reference engine has no join surface at all
    (SURVEY §2.5); this is part of the free-surface extension, and the
    ordered cousin of ``bucketed_interval_join`` above.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    keys = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    right_cols = list(right_cols)
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")

    # NULL-ts rows can never match under SQL comparison semantics: a NULL
    # right ts is not "at or before" anything (drop the row), and a NULL
    # left ts satisfies no comparison (nulled below after the window).
    right = right.filter(F.col(right_ts).isNotNull())
    payload = F.struct(*[F.col(c) for c in right_cols])
    r_u = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__marker"),
        payload.alias("__payload"),
    )
    payload_type = r_u.schema["__payload"].dataType
    l_u = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__marker"),
        F.lit(None).cast(payload_type).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    r_u = r_u.withColumn("__lrow", F.lit(None).cast(l_u.schema["__lrow"].dataType))

    order = [F.col("__ts").asc(), F.col("__marker").asc()]
    if direction == "forward":
        order = [F.col("__ts").desc(), F.col("__marker").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        l_u.unionByName(r_u)
        .withColumn("__m_payload", F.last("__payload", ignorenulls=True).over(w))
        .withColumn(
            "__m_ts",
            F.last(
                F.when(F.col("__marker") == 0, F.col("__ts")), ignorenulls=True
            ).over(w),
        )
        .filter(F.col("__marker") == 1)
    )
    if tolerance is not None:
        gap = (
            F.col("__ts") - F.col("__m_ts")
            if direction == "backward"
            else F.col("__m_ts") - F.col("__ts")
        )
        in_tol = F.col("__m_ts").isNotNull() & (gap <= tolerance)
        merged = merged.withColumn(
            "__m_payload", F.when(in_tol, F.col("__m_payload"))
        ).withColumn("__m_ts", F.when(in_tol, F.col("__m_ts")))
    merged = merged.withColumn(
        "__m_payload", F.when(F.col("__ts").isNotNull(), F.col("__m_payload"))
    ).withColumn("__m_ts", F.when(F.col("__ts").isNotNull(), F.col("__m_ts")))
    if how == "inner":
        merged = merged.filter(F.col("__m_payload").isNotNull())

    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__m_payload.{c}").alias(c) for c in right_cols]
    if matched_ts_col is not None:
        out_cols.append(F.col("__m_ts").alias(matched_ts_col))
    return merged.select(*out_cols)


def seasonal_decompose(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    step: int,
    period: int,
    trend_buckets: int = 3,
) -> DataFrame:
    """Classical additive seasonal decomposition (STL-lite) per series:
    ``value = trend + seasonal + resid`` on a ``step``-bucketed grid with a
    ``period``-cyclic seasonal component — the capacity-planning /
    anomaly-baseline view of a metric (daily shape vs weekly growth).

    Method (moving-average decomposition, the textbook pre-STL form):
    bucket to ``step`` and average within the bucket; trend = centered
    rolling mean over ``2*trend_buckets+1`` OBSERVED buckets (rows, not
    time range, so sparse series degrade gracefully); seasonal = per-phase
    mean of the detrended series, re-centered to sum 0 per series so trend
    keeps the level; resid = the rest.  Output one row per (series,
    bucket): value/trend/seasonal/resid, rounded for cross-engine parity.

    Scale shape: one shuffle to (series) for the two windows + one
    (series, phase) aggregate joined back — all codegen; no iteration
    (real STL loess-iterates; the single-pass form is the standard
    monitoring approximation and is exactly SQL-expressible, so it gets a
    full value-level oracle instead of a bounds check).
    """
    keys = [F.col(k) for k in key_cols]

    # Every mean is an EXACT decimal sum, divided and HALF-UP rounded in
    # integer arithmetic.  Two separate cross-engine hazards, both hit on
    # real sweeps before this hardening: (1) a plain double avg depends on
    # summation ORDER (shuffle arrival / sliding-frame add-remove), and
    # (2) even over an identical exact sum, 6-dp inputs divided by small
    # counts produce TRUE decimal ties (…0415), where Spark's round
    # (shortest-decimal-repr, HALF_UP) and DuckDB's (binary value) differ.
    # So: sum in decimal (order-independent), scale to a 10^-8 BIGINT
    # (exact), and round half-up with integer math — floor over a double
    # division of exact <=2e14 integers is safe because the fractional
    # parts are multiples of 1/(2·100·n), far coarser than one ulp.
    def exact_avg(col, over=None):
        s = F.sum(col.cast("decimal(28,8)"))
        n = F.count(F.lit(1))
        if over is not None:
            s, n = s.over(over), n.over(over)
        s8 = (s * F.lit(100000000)).cast("long")
        n = n.cast("long")
        pos = F.floor((2 * s8 + n * 100) / (2 * n * 100))
        neg = -F.floor((-2 * s8 + n * 100) / (2 * n * 100))
        return F.when(s8 >= 0, pos).otherwise(neg).cast("double") / F.lit(1000000.0)

    bucket = (F.floor(F.col(ts_col) / step) * step).cast("long")
    g = (
        df.select(*keys, bucket.alias("bucket_ts"), F.col(value_col).alias("__v"))
        .groupBy(*key_cols, "bucket_ts")
        .agg(exact_avg(F.col("__v")).alias("value"))
    )
    wt = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket_ts")
        .rowsBetween(-trend_buckets, trend_buckets)
    )
    g = g.withColumn("trend", exact_avg(F.col("value"), wt))
    g = g.withColumn("phase", (F.col("bucket_ts") % period).cast("long"))
    wp = Window.partitionBy(*key_cols, "phase")
    ws = Window.partitionBy(*key_cols)
    g = g.withColumn(
        "__raw_seasonal", exact_avg(F.col("value") - F.col("trend"), wp)
    )
    # re-center so the seasonal component sums to ~0 over each series
    # (mean over rows, weighting phases by observation count — determinate)
    g = g.withColumn(
        "seasonal",
        F.round(F.col("__raw_seasonal") - exact_avg(F.col("__raw_seasonal"), ws), 6),
    )
    return g.select(
        *key_cols,
        "bucket_ts",
        F.col("value"),
        F.col("trend"),
        F.col("seasonal"),
        F.round(F.col("value") - F.col("trend") - F.col("seasonal"), 6).alias("resid"),
    )


def seasonal_decompose_sql(
    table: str,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    step: int,
    period: int,
    trend_buckets: int = 3,
) -> str:
    """DuckDB mirror of :func:`seasonal_decompose` (oracle) — the same
    exact-decimal-sum, integer-half-up means, see the operator's
    hardening comment."""
    keys = ", ".join(key_cols)

    def exact_avg(expr: str, over: str = "") -> str:
        s8 = f"CAST(sum(CAST({expr} AS DECIMAL(28,8))) {over} * 100000000 AS BIGINT)"
        n = f"count(*) {over}"
        return (
            f"(CASE WHEN {s8} >= 0"
            f" THEN floor((2*{s8} + {n}*100) / (2.0*{n}*100))"
            f" ELSE -floor((-2*{s8} + {n}*100) / (2.0*{n}*100)) END / 1000000.0)"
        )

    wt = (f"OVER (PARTITION BY {keys} ORDER BY bucket_ts ROWS BETWEEN "
          f"{trend_buckets} PRECEDING AND {trend_buckets} FOLLOWING)")
    wp = f"OVER (PARTITION BY {keys}, phase)"
    ws = f"OVER (PARTITION BY {keys})"
    return f"""
WITH g AS (
    SELECT {keys},
           CAST(floor({ts_col} / {step}) * {step} AS BIGINT) AS bucket_ts,
           {exact_avg(value_col)} AS value
    FROM {table}
    GROUP BY ALL
), t AS (
    SELECT *,
           {exact_avg("value", wt)} AS trend,
           CAST(bucket_ts % {period} AS BIGINT) AS phase
    FROM g
), s AS (
    SELECT *,
           {exact_avg("value - trend", wp)} AS raw_seasonal
    FROM t
), c AS (
    SELECT *,
           round(raw_seasonal - {exact_avg("raw_seasonal", ws)}, 6) AS seasonal
    FROM s
)
SELECT {keys}, bucket_ts, value, trend, seasonal,
       round(value - trend - seasonal, 6) AS resid
FROM c
"""


def cusum_changepoints(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    slack_sigmas: float = 0.5,
    threshold_sigmas: float = 4.0,
    target: float | None = None,
    sigma: float | None = None,
) -> DataFrame:
    """Two-sided CUSUM change-point detection per series (Page 1954): flag
    sustained mean shifts that per-point tests (rolling-z) miss because no
    single sample is extreme.  Standard parameterization: target = series
    mean, slack ``k = slack_sigmas·σ``, alarm at ``h = threshold_sigmas·σ``.

    The textbook recursion ``s_t = max(0, s_{t-1} + (x_t - μ - k))`` is not
    window-expressible, but it has a prefix-sum closed form:
    ``s_t = p_t - min(0, min_{j<=t} p_j)`` with ``p_t = Σ_{i<=t}(x_i-μ-k)``
    — a running sum and a running min, both plain unbounded-preceding
    windows (same trick as gaps-and-islands).  The lower side mirrors with
    the sign flipped.  So the whole detector is 2 analytic passes over one
    (series)-partitioned sort — codegen'd, no UDF, no iteration, and
    exactly SQL-expressible, hence a full value-level oracle.

    Requires unique ``(key, ts)`` rows (pre-aggregate duplicates) — window
    order must be total for cross-engine determinism.  ``σ`` is the
    population stddev; a flat series (σ=0) never alarms.

    By default target/σ are estimated from the WHOLE series — fine for
    monitoring dashboards, but a large shift contaminates its own
    baseline (the pre-shift regime then sits below the global mean and
    the DOWN side fires first).  Pass explicit ``target``/``sigma`` from
    a calibration window for detection-latency-sensitive use.
    """
    keys = [F.col(k) for k in key_cols]
    g = df.select(*keys, F.col(ts_col).alias("ts"), F.col(value_col).alias("value"))
    if target is not None and sigma is not None:
        g = g.withColumn("__mu", F.lit(float(target))).withColumn(
            "__sigma", F.lit(float(sigma))
        )
    elif target is not None or sigma is not None:
        raise ValueError("pass target and sigma together (or neither)")
    else:
        stats = df.groupBy(*key_cols).agg(
            F.avg(value_col).alias("__mu"),
            F.stddev_pop(value_col).alias("__sigma"),
        )
        g = g.join(stats, list(key_cols))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    k_ = F.col("__sigma") * slack_sigmas
    up_inc = F.col("value") - F.col("__mu") - k_
    dn_inc = -(F.col("value") - F.col("__mu")) - k_
    g = (
        g.withColumn("__pu", F.sum(up_inc).over(w))
        .withColumn("__pd", F.sum(dn_inc).over(w))
        .withColumn("cusum_up", F.col("__pu") - F.least(F.lit(0.0), F.min("__pu").over(w)))
        .withColumn("cusum_dn", F.col("__pd") - F.least(F.lit(0.0), F.min("__pd").over(w)))
    )
    h = F.col("__sigma") * threshold_sigmas
    return g.select(
        *key_cols,
        "ts",
        F.round("value", 6).alias("value"),
        F.round("cusum_up", 6).alias("cusum_up"),
        F.round("cusum_dn", 6).alias("cusum_dn"),
        ((F.col("cusum_up") > h) | (F.col("cusum_dn") > h)).alias("alarm"),
    )


def cusum_changepoints_sql(
    table: str,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    slack_sigmas: float = 0.5,
    threshold_sigmas: float = 4.0,
) -> str:
    """DuckDB mirror of :func:`cusum_changepoints` (oracle)."""
    keys = ", ".join(key_cols)
    return f"""
WITH base AS (
    SELECT {keys}, {ts_col} AS ts, {value_col} AS value,
           avg({value_col}) OVER (PARTITION BY {keys}) AS mu,
           stddev_pop({value_col}) OVER (PARTITION BY {keys}) AS sigma
    FROM {table}
), p AS (
    SELECT *,
           sum(value - mu - sigma * {slack_sigmas}) OVER
               (PARTITION BY {keys} ORDER BY ts ROWS UNBOUNDED PRECEDING) AS pu,
           sum(-(value - mu) - sigma * {slack_sigmas}) OVER
               (PARTITION BY {keys} ORDER BY ts ROWS UNBOUNDED PRECEDING) AS pd
    FROM base
), s AS (
    SELECT *,
           pu - least(0, min(pu) OVER (PARTITION BY {keys} ORDER BY ts
               ROWS UNBOUNDED PRECEDING)) AS cusum_up,
           pd - least(0, min(pd) OVER (PARTITION BY {keys} ORDER BY ts
               ROWS UNBOUNDED PRECEDING)) AS cusum_dn
    FROM p
)
SELECT {keys}, ts,
       round(value, 6) AS value,
       round(cusum_up, 6) AS cusum_up,
       round(cusum_dn, 6) AS cusum_dn,
       (cusum_up > sigma * {threshold_sigmas} OR cusum_dn > sigma * {threshold_sigmas}) AS alarm
FROM s
"""


def burn_rate_alert(df: DataFrame, ts_col: str, error_pred: Column,
                    short_window: int, long_window: int,
                    slo: float, threshold: float = 1.0) -> DataFrame:
    """Multiwindow SLO burn-rate evaluation (the SRE-workbook alert shape):
    per short-window bucket, the rate at which the error budget
    ``1 - slo`` is being consumed, paired with the same rate over the
    trailing ``long_window`` — an alert *fires* only when BOTH exceed
    ``threshold``, which is what kills the flappy single-window alert
    (short window alone = noise-sensitive, long window alone = slow to
    clear).

    ``ts_col`` is unix seconds (BIGINT); ``long_window`` must be a
    multiple of ``short_window``.  The long side is an analytic RANGE
    frame over bucket timestamps (value-based, so missing buckets —
    outage gaps — are handled exactly: the frame covers wall-clock time,
    not row count; an absent bucket simply contributes nothing).

    Scale shape: ONE map-side-combining aggregate over the event scan
    does all the data-volume work (count + conditional count per bucket);
    the window then runs over O(time-range / short_window) bucket rows —
    bounded metadata scale, deliberately unpartitioned (a year of 1-hour
    buckets is 8.8k rows).  Output: ``(bucket_ts, n_events, n_errors,
    long_events, long_errors, short_burn, long_burn, firing)``.
    """
    if long_window % short_window != 0 or long_window < short_window:
        raise ValueError("long_window must be a multiple of short_window")
    if not (0.0 < slo < 1.0):
        raise ValueError("slo must be in (0, 1)")
    budget = 1.0 - slo
    bucket = (F.floor(F.col(ts_col) / short_window) * short_window).cast("long")
    per = (
        df.select(bucket.alias("bucket_ts"), error_pred.cast("int").alias("__e"))
        .groupBy("bucket_ts")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("__e").cast("long").alias("n_errors"),
        )
    )
    win = (
        Window.orderBy("bucket_ts")
        .rangeBetween(-(long_window - short_window), 0)
    )
    per = per.withColumn("long_events", F.sum("n_events").over(win).cast("long"))
    per = per.withColumn("long_errors", F.sum("n_errors").over(win).cast("long"))
    short_burn = F.round(
        (F.col("n_errors") / F.col("n_events")) / F.lit(budget), 6
    )
    long_burn = F.round(
        (F.col("long_errors") / F.col("long_events")) / F.lit(budget), 6
    )
    return per.select(
        "bucket_ts", "n_events", "n_errors", "long_events", "long_errors",
        short_burn.alias("short_burn"),
        long_burn.alias("long_burn"),
        ((short_burn > threshold) & (long_burn > threshold)).alias("firing"),
    )


def burn_rate_alert_sql(table: str, epoch_expr: str, error_cond: str,
                        short_window: int, long_window: int,
                        slo: float, threshold: float = 1.0) -> str:
    """DuckDB mirror of :func:`burn_rate_alert` (oracle generator).

    ``epoch_expr`` must yield unix seconds as BIGINT; the budget literal
    is the repr of the SAME Python float the Spark side broadcasts, so
    both engines divide by the identical IEEE double.
    """
    budget = repr(1.0 - slo)
    thr = repr(float(threshold))
    return f"""
WITH per AS (
    SELECT CAST(floor({epoch_expr} / {short_window}) AS BIGINT) * {short_window} AS bucket_ts,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN {error_cond} THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
    FROM {table}
    GROUP BY 1
), w AS (
    SELECT *,
           CAST(sum(n_events) OVER win AS BIGINT) AS long_events,
           CAST(sum(n_errors) OVER win AS BIGINT) AS long_errors
    FROM per
    WINDOW win AS (ORDER BY bucket_ts
                   RANGE BETWEEN {long_window - short_window} PRECEDING
                         AND CURRENT ROW)
)
SELECT bucket_ts, n_events, n_errors, long_events, long_errors,
       round((CAST(n_errors AS DOUBLE) / n_events) / {budget}, 6) AS short_burn,
       round((CAST(long_errors AS DOUBLE) / long_events) / {budget}, 6) AS long_burn,
       (round((CAST(n_errors AS DOUBLE) / n_events) / {budget}, 6) > {thr}
        AND round((CAST(long_errors AS DOUBLE) / long_events) / {budget}, 6) > {thr}) AS firing
FROM w
"""


def funnel(df: DataFrame, user_col: str, ts_col: str, step_col: str,
           steps: Sequence[str], max_span: int | None = None) -> DataFrame:
    """Ordered funnel analysis: how many users completed step 1, then
    step 2 strictly after their earliest step-1 time, and so on — the
    conversion query behind signup/activation dashboards.

    Generalizes the registry's fixed-shape ``events_funnel``
    (workloads/events_q.py: 3 hardcoded steps, no time bound, window-
    minima implementation): arbitrary step lists, a ``max_span``
    conversion deadline, per-step time-to-convert, and a join-chain
    execution shape that never windows the full relation.

    Semantics (pinned by the SQL mirror): a user reaches step *i* at the
    MINIMUM timestamp of a step-*i* event strictly after their step-(i−1)
    reach time; with ``max_span``, every reach time must also lie within
    ``max_span`` seconds of the step-1 time (a "converted within 7 days"
    funnel).  Earliest-completion semantics — alternate interleavings
    can't inflate conversion.

    Scale shape: a chain of per-user conditional aggregates — each step
    is one filtered scan aggregated by user (map-side combining) joined
    to the previous step's reach times on the user key.  k steps = k
    aggregates + (k−1) equi-joins on progressively SHRINKING user sets
    (funnel monotonicity), never a per-user sort or a collect_list of
    event history; at 100 TB each filtered scan prunes on the step
    predicate first.  Output: one row per step — ``(step_idx, step,
    n_users, avg_hours_from_start)`` (hours from step-1 reach, 3dp).
    """
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    ev = df.select(F.col(user_col).alias("u"), F.col(ts_col).alias("t"),
                   F.col(step_col).alias("s"))
    reach = (
        ev.filter(F.col("s") == steps[0])
        .groupBy("u").agg(F.min("t").alias("t1"))
        .withColumn("t_prev", F.col("t1"))
    )
    out_rows = [reach.select(
        F.lit(0).cast("long").alias("step_idx"),
        F.lit(steps[0]).alias("step"),
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.avg(F.lit(0.0)), 3).alias("avg_hours_from_start"),
    )]
    for i, st in enumerate(steps[1:], start=1):
        nxt = (
            ev.filter(F.col("s") == st)
            .join(reach.select("u", "t1", "t_prev"), "u")
            .filter(F.col("t") > F.col("t_prev"))
        )
        if max_span is not None:
            nxt = nxt.filter(F.col("t") <= F.col("t1") + max_span)
        reach = nxt.groupBy("u").agg(
            F.min("t").alias("t_i"), F.first("t1").alias("t1")
        ).select("u", "t1", F.col("t_i").alias("t_prev"))
        out_rows.append(reach.select(
            F.lit(i).cast("long").alias("step_idx"),
            F.lit(st).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg((F.col("t_prev") - F.col("t1")) / 3600.0), 3)
            .alias("avg_hours_from_start"),
        ))
    res = out_rows[0]
    for r in out_rows[1:]:
        res = res.unionByName(r)
    return res


def funnel_sql(table: str, user_col: str, epoch_expr: str, step_col: str,
               steps: Sequence[str], max_span: int | None = None) -> str:
    """DuckDB mirror of :func:`funnel` (oracle generator)."""
    ctes = [
        f"s0 AS (SELECT {user_col} AS u, min({epoch_expr}) AS t1, "
        f"min({epoch_expr}) AS t_prev FROM {table} "
        f"WHERE {step_col} = '{steps[0]}' GROUP BY 1)"
    ]
    for i, st in enumerate(steps[1:], start=1):
        span = (
            f" AND {epoch_expr} <= p.t1 + {max_span}" if max_span is not None else ""
        )
        ctes.append(
            f"s{i} AS (SELECT e.{user_col} AS u, any_value(p.t1) AS t1, "
            f"min({epoch_expr}) AS t_prev "
            f"FROM {table} e JOIN s{i-1} p ON e.{user_col} = p.u "
            f"WHERE e.{step_col} = '{st}' AND {epoch_expr} > p.t_prev{span} "
            f"GROUP BY 1)"
        )
    selects = []
    for i, st in enumerate(steps):
        # avg(0.0), not the literal 0.0: both engines then agree on NULL
        # for an empty step-0 cohort
        expr = "avg(0.0)" if i == 0 else "avg((t_prev - t1) / 3600.0)"
        selects.append(
            f"SELECT CAST({i} AS BIGINT) AS step_idx, '{st}' AS step, "
            f"CAST(count(*) AS BIGINT) AS n_users, "
            f"round({expr}, 3) AS avg_hours_from_start FROM s{i}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def cohort_retention(df: DataFrame, user_col: str, ts_col: str,
                     bucket: int = 7 * 86400) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity period
    (the cohort), counted in every later period they return — the
    standard "week-N retention" analysis.  Generalizes the registry's
    ``events_retention_cohorts`` (workloads/events_q.py: weekly-only raw
    counts): arbitrary period width plus the per-cohort retention
    FRACTION, and cohort assignment via aggregate+join rather than a
    per-user window.

    ``ts_col`` is unix seconds; periods are ``bucket``-second wide,
    epoch-aligned.  Output per ``(cohort_ts, period_k)``: distinct
    returning users and the retention fraction against the cohort's own
    size (``period_k = 0`` row is the cohort size itself, fraction 1).

    Scale shape: one per-user min aggregate (cohort assignment), one
    distinct over (user, period) — both map-side combining — an
    equi-join on the user key, then an O(cohorts × periods) aggregate;
    the final fraction join touches only cohort-sized rows.  No windows,
    no sorts; everything shuffles on user or on the tiny (cohort, k) key.
    """
    act = (
        df.select(F.col(user_col).alias("u"),
                  F.floor(F.col(ts_col) / bucket).cast("long").alias("p"))
        .distinct()
    )
    first = act.groupBy("u").agg(F.min("p").alias("c"))
    tri = (
        act.join(first, "u")
        .groupBy("c", (F.col("p") - F.col("c")).alias("period_k"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    base = tri.filter(F.col("period_k") == 0).select(
        "c", F.col("n_users").alias("__base")
    )
    return (
        tri.join(base, "c")
        .select(
            (F.col("c") * bucket).cast("long").alias("cohort_ts"),
            F.col("period_k").cast("long").alias("period_k"),
            "n_users",
            F.round(F.col("n_users") / F.col("__base"), 6).alias("retention"),
        )
    )


def cohort_retention_sql(table: str, user_col: str, epoch_expr: str,
                         bucket: int = 7 * 86400) -> str:
    """DuckDB mirror of :func:`cohort_retention` (oracle generator)."""
    return f"""
WITH act AS (
    SELECT DISTINCT {user_col} AS u,
           CAST(floor({epoch_expr} / {bucket}) AS BIGINT) AS p
    FROM {table}
), first AS (
    SELECT u, min(p) AS c FROM act GROUP BY 1
), tri AS (
    SELECT c, p - c AS period_k, CAST(count(*) AS BIGINT) AS n_users
    FROM act JOIN first USING (u)
    GROUP BY 1, 2
)
SELECT CAST(t.c * {bucket} AS BIGINT) AS cohort_ts,
       CAST(t.period_k AS BIGINT) AS period_k,
       t.n_users,
       round(CAST(t.n_users AS DOUBLE) / b.n_users, 6) AS retention
FROM tri t JOIN (SELECT c, n_users FROM tri WHERE period_k = 0) b ON t.c = b.c
"""


def lttb_downsample(df: DataFrame, key_cols: Sequence[str], ts_col: str,
                    value_col: str, bucket_width: int) -> DataFrame:
    """Largest-Triangle-Three-Buckets visual downsampling, parallel
    variant: per time bucket keep the single point that subtends the
    largest triangle against the neighboring buckets — the downsample
    that preserves spikes, dips and shape for plotting, where plain
    avg/min/max rollups flatten them (Steinarsson 2013).

    Classic LTTB anchors the triangle's left vertex on the *previously
    selected* point, which is inherently sequential.  This variant
    anchors BOTH vertices on the neighboring buckets' mean points — the
    same approximation the original algorithm already makes for its
    right vertex, applied symmetrically — removing the sequential
    dependency entirely, so every bucket selects independently.  First/
    last bucket of each series keep their first/last point (the classic
    endpoint rule, per series).

    Determinism + oracle exactness: anchor means are computed as EXACT
    sums (long for ts, decimal(28,8) for value) divided once in double —
    order-independent, so both engines derive bit-identical anchors and
    therefore identical argmax winners; ties break on (ts, value).

    Scale shape: one map-side-combining aggregate (bucket means), one
    tiny window over O(buckets) mean rows for lag/lead anchors, one
    equi-join of points to their own bucket's anchor row, one
    min(struct) winner aggregate — no per-series sort of raw points, no
    windows over the full relation.  Output: ``(keys…, bucket_ts, ts,
    value)``, ≤ one row per (series, bucket).
    """
    keys = list(key_cols)
    b = F.floor(F.col(ts_col) / bucket_width).cast("long")
    pts = df.select(*keys, b.alias("__b"), F.col(ts_col).alias("__t"),
                    F.col(value_col).alias("__v"))
    means = pts.groupBy(*keys, "__b").agg(
        (F.sum("__t").cast("double") / F.count(F.lit(1))).alias("mt"),
        (F.sum(F.col("__v").cast("decimal(28,8)")).cast("double")
         / F.count(F.lit(1))).alias("mv"),
    )
    w = Window.partitionBy(*keys).orderBy("__b")
    anchors = (
        means.withColumn("pmt", F.lag("mt").over(w))
        .withColumn("pmv", F.lag("mv").over(w))
        .withColumn("nmt", F.lead("mt").over(w))
        .withColumn("nmv", F.lead("mv").over(w))
        .select(*keys, "__b", "pmt", "pmv", "nmt", "nmv")
    )
    j = pts.join(anchors, keys + ["__b"])
    interior = F.col("pmt").isNotNull() & F.col("nmt").isNotNull()
    area2 = F.abs(
        (F.col("pmt") - F.col("nmt")) * (F.col("__v") - F.col("pmv"))
        - (F.col("pmt") - F.col("__t")) * (F.col("nmv") - F.col("pmv"))
    )
    k1 = F.when(interior, -area2).otherwise(F.lit(0.0))
    k2 = F.when(
        F.col("pmt").isNotNull() & F.col("nmt").isNull(), -F.col("__t")
    ).otherwise(F.col("__t"))
    winner = F.min(F.struct(k1.alias("k1"), k2.alias("k2"),
                            F.col("__t").alias("t"), F.col("__v").alias("v")))
    return (
        j.groupBy(*keys, "__b")
        .agg(winner.alias("__w"))
        .select(
            *keys,
            (F.col("__b") * bucket_width).cast("long").alias("bucket_ts"),
            F.col("__w.t").alias(ts_col),
            F.col("__w.v").alias(value_col),
        )
    )


def lttb_downsample_sql(table: str, key_cols: Sequence[str], ts_expr: str,
                        value_col: str, bucket_width: int,
                        ts_out: str = "ts") -> str:
    """DuckDB mirror of :func:`lttb_downsample` (oracle generator).
    ``ts_expr`` must yield unix seconds as BIGINT."""
    keys = ", ".join(key_cols)
    return f"""
WITH pts AS (
    SELECT {keys}, CAST(floor({ts_expr} / {bucket_width}) AS BIGINT) AS b,
           {ts_expr} AS t, {value_col} AS v
    FROM {table}
), m AS (
    SELECT {keys}, b,
           CAST(sum(t) AS DOUBLE) / count(*) AS mt,
           CAST(sum(CAST(v AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS mv
    FROM pts GROUP BY ALL
), a AS (
    SELECT {keys}, b,
           lag(mt) OVER w AS pmt, lag(mv) OVER w AS pmv,
           lead(mt) OVER w AS nmt, lead(mv) OVER w AS nmv
    FROM m WINDOW w AS (PARTITION BY {keys} ORDER BY b)
), s AS (
    SELECT p.*, a.pmt, a.pmv, a.nmt, a.nmv,
           CASE WHEN a.pmt IS NOT NULL AND a.nmt IS NOT NULL
                THEN -abs((a.pmt - a.nmt) * (p.v - a.pmv)
                          - (a.pmt - p.t) * (a.nmv - a.pmv))
                ELSE 0.0 END AS k1,
           CASE WHEN a.pmt IS NOT NULL AND a.nmt IS NULL THEN -p.t
                ELSE p.t END AS k2
    FROM pts p JOIN a USING ({keys}, b)
)
SELECT {keys}, CAST(b * {bucket_width} AS BIGINT) AS bucket_ts,
       t AS {ts_out}, v AS {value_col}
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY {keys}, b ORDER BY k1, k2, t, v
    ) AS rn FROM s
) WHERE rn = 1
"""


def acf(df: DataFrame, group_cols: Sequence[str], order_col: str,
        value_col: str, max_lag: int = 6) -> DataFrame:
    """Exact sample autocorrelation per group at lags 1..``max_lag`` —
    the seasonality/periodicity detector (a daily-periodic metric shows
    an ACF spike at lag 24 on hourly buckets).

    Estimator: r(ℓ) = Σ_{t}(x_t − m)(x_{t+ℓ} − m) / Σ_t(x_t − m)², with
    the global per-group mean m — the standard large-lag form.  For
    INTEGER series both sums are computed exactly by clearing
    denominators (multiply through by n²): (n·x_t − S) is a BIGINT, so
    every product and sum is exact and the single final double division
    is IEEE-deterministic — no order-dependent float accumulation, per
    the repo's cross-engine rounding rule.  Overflow bound: |n·x−S| ≤
    n·max|x|, so the sum needs n·(n·max|x|)² ≤ 2⁶³ — fine for any
    per-group series that fits a driver-ordered window, and the operator
    stays partition-parallel across groups regardless.

    Plan: one groupBy for (n, S, den) + broadcast back, ONE window pass
    producing all ``max_lag`` lead columns, one final groupBy — two
    shuffles total, independent of max_lag.
    """
    gc = list(group_cols)
    x = F.col(value_col).cast("long")
    stats = df.groupBy(*gc).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(x).alias("__s"),
    )
    w = Window.partitionBy(*gc).orderBy(order_col)
    leads = df.select(
        *gc, x.alias("__x"),
        *[F.lead(x, lag).over(w).alias(f"__x{lag}") for lag in range(1, max_lag + 1)],
    )
    j = leads.join(F.broadcast(stats), gc)
    dev = F.col("__n") * F.col("__x") - F.col("__s")
    aggs = [F.sum(dev * dev).alias("__den")]
    for lag in range(1, max_lag + 1):
        devl = F.col("__n") * F.col(f"__x{lag}") - F.col("__s")
        aggs.append(F.sum(dev * devl).alias(f"__num{lag}"))
    g = j.groupBy(*gc).agg(*aggs)
    pairs = F.array(*[
        F.struct(F.lit(lag).alias("lag"),
                 F.when(F.col("__den") > 0,
                        F.col(f"__num{lag}").cast("double")
                        / F.col("__den").cast("double")).alias("r"))
        for lag in range(1, max_lag + 1)
    ])
    e = g.select(*gc, F.explode(pairs).alias("__p"))
    return e.select(*gc, F.col("__p.lag").cast("long").alias("lag"),
                    F.col("__p.r").alias("acf"))


def acf_sql(table: str, group_cols: Sequence[str], order_col: str,
            value_col: str, max_lag: int = 6) -> str:
    """DuckDB mirror of :func:`acf` (oracle generator)."""
    gc = ", ".join(group_cols)
    lead_cols = ",\n           ".join(
        f"lead(CAST({value_col} AS BIGINT), {lag}) OVER "
        f"(PARTITION BY {gc} ORDER BY {order_col}) AS x{lag}"
        for lag in range(1, max_lag + 1))
    nums = ",\n           ".join(
        f"CAST(sum((n * x - s) * (n * x{lag} - s)) AS BIGINT) AS num{lag}"
        for lag in range(1, max_lag + 1))
    sel = " UNION ALL ".join(
        f"SELECT {gc}, CAST({lag} AS BIGINT) AS lag, "
        f"CASE WHEN den > 0 THEN CAST(num{lag} AS DOUBLE) / CAST(den AS DOUBLE) END AS acf "
        f"FROM g"
        for lag in range(1, max_lag + 1))
    return f"""
WITH stats AS (
    SELECT {gc}, CAST(count(*) AS BIGINT) AS n, CAST(sum(CAST({value_col} AS BIGINT)) AS BIGINT) AS s
    FROM {table} GROUP BY {gc}
), leads AS (
    SELECT {gc}, CAST({value_col} AS BIGINT) AS x,
           {lead_cols}
    FROM {table}
), g AS (
    SELECT {gc}, CAST(sum((n * x - s) * (n * x - s)) AS BIGINT) AS den,
           {nums}
    FROM leads JOIN stats USING ({gc})
    GROUP BY {gc}, n, s
)
{sel}
"""
