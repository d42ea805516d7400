"""Declared queries for the PromQL-style function layer over events-as-TSDB.

Samples are first deduplicated to one row per (series, ts) — Prometheus'
sample model, and what makes window ``lag`` ordering fully deterministic
(the reference enforces the same invariant at TSZ-append level,
series.go:24-27).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import promql
from .common import EV_END, EV_START, TSDB_SQL_REL, events_relation, flatten_labels

LOOKBACK = 86_400
STEP = 86_400

_DEDUP = f"""
WITH rel AS ({TSDB_SQL_REL}),
d AS (
    SELECT metric, user, k, ts, max(value) AS value
    FROM rel
    WHERE ts BETWEEN {EV_START} AND {EV_END}
    GROUP BY metric, user, k, ts
)
"""

_INC_CTE = """
s AS (
    SELECT metric, user, k, ts, value,
           lag(value) OVER (PARTITION BY metric, user, k ORDER BY ts) AS prev
    FROM d
),
inc AS (
    SELECT metric, user, k,
           sum(CASE WHEN prev IS NULL THEN 0
                    WHEN value >= prev THEN value - prev
                    ELSE value END) AS total,
           max(ts) - min(ts) AS span,
           count(*) AS n
    FROM s GROUP BY metric, user, k
)
"""


def _dedup_rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    rel = events_relation(spark, sf_dir, EV_START, EV_END).filter(
        F.col("ts").between(EV_START, EV_END)
    )
    return (
        rel.groupBy("series_key", "ts")
        .agg(F.any_value("labels").alias("labels"), F.max("value").alias("value"))
        .select("labels", "ts", "value", "series_key")
    )


def promql_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = promql.increase(_dedup_rel(spark, sf_dir), EV_START, EV_END)
    return flatten_labels(
        out.select(F.col("labels"), F.round("value", 4).alias("value"))
    )


PROMQL_INCREASE_SQL = f"""{_DEDUP}, {_INC_CTE}
SELECT metric, user, k, round(CAST(total AS DOUBLE), 4) AS value
FROM inc WHERE n >= 2
"""


def promql_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = promql.rate(_dedup_rel(spark, sf_dir), EV_START, EV_END)
    return flatten_labels(
        out.select(F.col("labels"), F.round("value", 8).alias("value"))
    )


PROMQL_RATE_SQL = f"""{_DEDUP}, {_INC_CTE}
SELECT metric, user, k, round(CAST(total / span AS DOUBLE), 8) AS value
FROM inc WHERE n >= 2 AND span > 0
"""


def promql_avg_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = promql.over_time(_dedup_rel(spark, sf_dir), "avg", EV_START, EV_END, STEP)
    return flatten_labels(
        out.select(F.col("labels"), F.col("window_start"), F.round("value", 4).alias("value"))
    )


PROMQL_AVG_OVER_TIME_SQL = f"""{_DEDUP}
SELECT metric, user, k,
       CAST(floor((ts - {EV_START}) / {STEP}.0) AS BIGINT) * {STEP} + {EV_START} AS window_start,
       round(CAST(avg(value) AS DOUBLE), 4) AS value
FROM d
GROUP BY metric, user, k, 4
"""


def promql_sum_by_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum by (__name__) of the instant vector at EV_END (1d lookback)."""
    vec = promql.instant(_dedup_rel(spark, sf_dir), EV_END, LOOKBACK)
    out = promql.agg_by(vec, "sum", ["__name__"])
    return out.select(
        F.col("labels").getItem("__name__").alias("metric"),
        F.round("value", 2).alias("value"),
    )


PROMQL_SUM_BY_METRIC_SQL = f"""{_DEDUP},
latest AS (
    SELECT metric, user, k, value,
           row_number() OVER (PARTITION BY metric, user, k ORDER BY ts DESC) AS rn
    FROM d
    WHERE ts BETWEEN {EV_END - LOOKBACK} AND {EV_END}
)
SELECT metric, round(CAST(sum(value) AS DOUBLE), 2) AS value
FROM latest WHERE rn = 1
GROUP BY metric
"""

def promql_quantile_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p90_over_time per series per 1d window (exact percentile)."""
    out = promql.quantile_over_time(_dedup_rel(spark, sf_dir), 0.9, EV_START, EV_END, STEP)
    return flatten_labels(
        out.select(F.col("labels"), F.col("window_start"), F.round("value", 4).alias("value"))
    )


PROMQL_QUANTILE_OVER_TIME_SQL = f"""{_DEDUP}
SELECT metric, user, k,
       CAST(floor((ts - {EV_START}) / {STEP}.0) AS BIGINT) * {STEP} + {EV_START} AS window_start,
       round(CAST(quantile_cont(value, 0.9) AS DOUBLE), 4) AS value
FROM d
GROUP BY metric, user, k, 4
"""


def promql_resets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter resets per series over the full range."""
    out = promql.resets(_dedup_rel(spark, sf_dir), EV_START, EV_END)
    return flatten_labels(out.select(F.col("labels"), F.col("value")))


PROMQL_RESETS_SQL = f"""{_DEDUP},
s AS (
    SELECT metric, user, k, value,
           lag(value) OVER (PARTITION BY metric, user, k ORDER BY ts) AS prev
    FROM d
)
SELECT metric, user, k,
       CAST(sum(CASE WHEN prev IS NOT NULL AND value < prev THEN 1 ELSE 0 END) AS BIGINT) AS value
FROM s GROUP BY metric, user, k
HAVING count(*) >= 2
"""


def promql_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topk(10) of the instant vector at EV_END (1d lookback).

    Same TakeOrderedAndProject plan as ``promql.topk`` but tie-breaking on
    the flattened label triple instead of the engine-internal series_key:
    xxhash64 is opaque cross-system (SURVEY.md §7.3) so the oracle cannot
    reproduce its order; the label triple is the same total order because
    series_key is a function of the labels.  Ordered on the ROUNDED value
    on both engines so the cut at k is identical.
    """
    vec = flatten_labels(promql.instant(_dedup_rel(spark, sf_dir), EV_END, LOOKBACK))
    return (
        vec.withColumn("value", F.round("value", 4))
        .orderBy(F.col("value").desc(), "metric", "user", "k")
        .limit(10)
        .select("metric", "user", "k", "value")
    )

PROMQL_TOPK_SQL = f"""{_DEDUP},
latest AS (
    SELECT metric, user, k, value,
           row_number() OVER (PARTITION BY metric, user, k ORDER BY ts DESC) AS rn
    FROM d
    WHERE ts BETWEEN {EV_END - LOOKBACK} AND {EV_END}
)
SELECT metric, user, k, round(CAST(value AS DOUBLE), 4) AS value
FROM latest WHERE rn = 1
ORDER BY value DESC, metric, user, k
LIMIT 10
"""


HORIZON = 86_400


def promql_deriv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-second linear-regression derivative per series (PromQL deriv)."""
    out = promql.deriv(_dedup_rel(spark, sf_dir), EV_START, EV_END)
    return flatten_labels(out.select(F.col("labels"), F.round("value", 8).alias("value")))


PROMQL_DERIV_SQL = f"""{_DEDUP}
SELECT metric, user, k,
       round(CAST(regr_slope(value, CAST(ts - {EV_START} AS DOUBLE)) AS DOUBLE), 8) AS value
FROM d
GROUP BY metric, user, k
HAVING count(*) >= 2 AND regr_slope(value, CAST(ts - {EV_START} AS DOUBLE)) IS NOT NULL
"""


def promql_predict_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares extrapolation 1d past the range (PromQL predict_linear)."""
    out = promql.predict_linear(_dedup_rel(spark, sf_dir), EV_START, EV_END, HORIZON)
    return flatten_labels(out.select(F.col("labels"), F.round("value", 4).alias("value")))


PROMQL_PREDICT_LINEAR_SQL = f"""{_DEDUP}
SELECT metric, user, k,
       round(CAST(regr_intercept(value, CAST(ts - {EV_START} AS DOUBLE))
             + regr_slope(value, CAST(ts - {EV_START} AS DOUBLE)) * {float(EV_END - EV_START + HORIZON)}
             AS DOUBLE), 4) AS value
FROM d
GROUP BY metric, user, k
HAVING count(*) >= 2 AND regr_slope(value, CAST(ts - {EV_START} AS DOUBLE)) IS NOT NULL
"""


def promql_irate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instantaneous rate from each series' last two samples."""
    out = promql.irate(_dedup_rel(spark, sf_dir), EV_START, EV_END)
    return flatten_labels(out.select(F.col("labels"), F.round("value", 8).alias("value")))


PROMQL_IRATE_SQL = f"""{_DEDUP},
s AS (
    SELECT metric, user, k, ts, value,
           lag(value) OVER w AS pv, lag(ts) OVER w AS pts
    FROM d
    WINDOW w AS (PARTITION BY metric, user, k ORDER BY ts)
)
SELECT metric, user, k,
       round(CAST(max_by((CASE WHEN value >= pv THEN value - pv ELSE value END) / (ts - pts), ts)
             AS DOUBLE), 8) AS value
FROM s WHERE pts IS NOT NULL
GROUP BY metric, user, k
"""


def promql_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Number of value changes between consecutive samples per series."""
    out = promql.changes(_dedup_rel(spark, sf_dir), EV_START, EV_END)
    return flatten_labels(out.select(F.col("labels"), F.col("value")))


# No HAVING n >= 2: PromQL's changes() returns 0 for a single-sample series
# (a one-sample window has no transitions), and the engine now matches.
PROMQL_CHANGES_SQL = f"""{_DEDUP},
s AS (
    SELECT metric, user, k, value,
           lag(value) OVER (PARTITION BY metric, user, k ORDER BY ts) AS prev
    FROM d
)
SELECT metric, user, k,
       CAST(sum(CASE WHEN prev IS NOT NULL AND value <> prev THEN 1 ELSE 0 END) AS BIGINT) AS value
FROM s GROUP BY metric, user, k
"""


def promql_stddev_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stddev per series per 1d window (PromQL stddev_over_time)."""
    out = promql.over_time(_dedup_rel(spark, sf_dir), "stddev", EV_START, EV_END, STEP)
    return flatten_labels(
        out.select(F.col("labels"), F.col("window_start"), F.round("value", 4).alias("value"))
    )


PROMQL_STDDEV_OVER_TIME_SQL = f"""{_DEDUP}
SELECT metric, user, k,
       CAST(floor((ts - {EV_START}) / {STEP}.0) AS BIGINT) * {STEP} + {EV_START} AS window_start,
       round(CAST(stddev_pop(value) AS DOUBLE), 4) AS value
FROM d
GROUP BY metric, user, k, 4
"""


def promql_last_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newest sample per series per 1d window (PromQL last_over_time)."""
    out = promql.over_time(_dedup_rel(spark, sf_dir), "last", EV_START, EV_END, STEP)
    return flatten_labels(
        out.select(F.col("labels"), F.col("window_start"), F.round("value", 4).alias("value"))
    )


PROMQL_LAST_OVER_TIME_SQL = f"""{_DEDUP}
SELECT metric, user, k,
       CAST(floor((ts - {EV_START}) / {STEP}.0) AS BIGINT) * {STEP} + {EV_START} AS window_start,
       round(CAST(max_by(value, ts) AS DOUBLE), 4) AS value
FROM d
GROUP BY metric, user, k, 4
"""


def promql_count_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_values over the instant vector at EV_END (1d lookback): how
    many series carry each distinct value.  Grouped on the double value
    (not PromQL's stringified label) so the oracle hash is repr-independent
    — double→string formatting differs across engines."""
    vec = promql.instant(_dedup_rel(spark, sf_dir), EV_END, LOOKBACK)
    return (
        vec.groupBy(F.col("value"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_series"))
        .select(F.round("value", 4).alias("value"), "n_series")
    )


PROMQL_COUNT_VALUES_SQL = f"""{_DEDUP},
latest AS (
    SELECT metric, user, k, value,
           row_number() OVER (PARTITION BY metric, user, k ORDER BY ts DESC) AS rn
    FROM d
    WHERE ts BETWEEN {EV_END - LOOKBACK} AND {EV_END}
)
SELECT round(CAST(value AS DOUBLE), 4) AS value, CAST(count(*) AS BIGINT) AS n_series
FROM latest WHERE rn = 1
GROUP BY 1
"""


#: Cumulative-histogram bucket bounds for promql_histogram_quantile
#: (events value spans 0.01–490, median ≈ 35).
HIST_LE = [10.0, 25.0, 50.0, 100.0, 250.0]
HIST_Q = 0.9


def promql_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_quantile(0.9) per metric over cumulative le-buckets built
    from the deduped samples (le = +Inf carries the total, as Prometheus
    requires)."""
    d = _dedup_rel(spark, sf_dir)
    les = F.array(*[F.lit(v) for v in HIST_LE + [float("inf")]])
    buckets = (
        d.select(
            F.col("labels").getItem("__name__").alias("metric"),
            F.col("value"),
            F.explode(les).alias("le"),
        )
        .groupBy("metric", "le")
        .agg(F.sum(F.when(F.col("value") <= F.col("le"), 1).otherwise(0)).cast("double").alias("cum"))
    )
    out = promql.histogram_quantile(buckets, HIST_Q, ["metric"])
    return out.select("metric", F.round("value", 6).alias("value"))


_LE_VALUES = ", ".join(f"({v})" for v in HIST_LE) + ", ('infinity'::DOUBLE)"

PROMQL_HISTOGRAM_QUANTILE_SQL = f"""{_DEDUP},
buckets AS (
    SELECT d.metric, le.le,
           CAST(sum(CASE WHEN d.value <= le.le THEN 1 ELSE 0 END) AS DOUBLE) AS cum
    FROM d CROSS JOIN (VALUES {_LE_VALUES}) AS le(le)
    GROUP BY 1, 2
),
b AS (
    SELECT *,
           lag(le) OVER w AS prev_le,
           coalesce(lag(cum) OVER w, 0.0) AS prev_cum,
           max(cum) OVER (PARTITION BY metric) AS total,
           max(CASE WHEN le <> 'infinity'::DOUBLE THEN le END) OVER (PARTITION BY metric) AS max_finite
    FROM buckets
    WINDOW w AS (PARTITION BY metric ORDER BY le)
),
hit AS (
    SELECT *, row_number() OVER (PARTITION BY metric ORDER BY le) AS rn
    FROM b WHERE cum >= {HIST_Q} * total
)
SELECT metric,
       round(CASE WHEN le = 'infinity'::DOUBLE THEN max_finite
             ELSE coalesce(prev_le, 0.0)
                  + (le - coalesce(prev_le, 0.0)) * ({HIST_Q} * total - prev_cum) / (cum - prev_cum)
             END, 6) AS value
FROM hit WHERE rn = 1
"""


def promql_binop_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sum by (k) (sum_over_time(click[range])) / on(k)
    sum by (k) (sum_over_time(view[range]))`` — one-to-one vector
    matching: per-k click volume divided by view volume.  Result labels
    are exactly the ``on`` subset ({k})."""
    d = _dedup_rel(spark, sf_dir)
    name = F.col("labels").getItem("__name__")
    span = EV_END - EV_START + 1
    clicks = promql.agg_by(
        promql.over_time(d.filter(name == "click"), "sum", EV_START, EV_END, span),
        "sum", ["k"],
    )
    views = promql.agg_by(
        promql.over_time(d.filter(name == "view"), "sum", EV_START, EV_END, span),
        "sum", ["k"],
    )
    out = promql.binop(clicks, views, "/", on=["k"])
    return out.select(
        F.col("labels").getItem("k").alias("k"),
        F.round("value", 8).alias("value"),
    )


PROMQL_BINOP_ON_SQL = f"""{_DEDUP},
per_k AS (
    SELECT metric, k, sum(value) AS total
    FROM d GROUP BY metric, k
)
SELECT a.k, round(CAST(a.total / b.total AS DOUBLE), 8) AS value
FROM per_k a JOIN per_k b ON a.k = b.k
WHERE a.metric = 'click' AND b.metric = 'view'
"""


def promql_binop_group_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``click / on(user) group_left sum by (user) (...)`` at EV_END —
    many-to-one matching: each click series' share of its user's total
    across all metrics.  The many side keeps its labels (minus __name__)."""
    d = _dedup_rel(spark, sf_dir)
    vec = promql.instant(d, EV_END, LOOKBACK)
    clicks = vec.filter(F.col("labels").getItem("__name__") == "click")
    totals = promql.agg_by(vec, "sum", ["user"])
    out = promql.binop(clicks, totals, "/", on=["user"], group="left")
    return out.select(
        F.col("labels").getItem("user").alias("user"),
        F.col("labels").getItem("k").alias("k"),
        F.round("value", 8).alias("value"),
    )


PROMQL_BINOP_GROUP_LEFT_SQL = f"""{_DEDUP},
latest AS (
    SELECT metric, user, k, value,
           row_number() OVER (PARTITION BY metric, user, k ORDER BY ts DESC) AS rn
    FROM d
    WHERE ts BETWEEN {EV_END - LOOKBACK} AND {EV_END}
),
v AS (SELECT metric, user, k, value FROM latest WHERE rn = 1),
totals AS (SELECT user, sum(value) AS total FROM v GROUP BY user)
SELECT a.user, a.k, round(CAST(a.value / t.total AS DOUBLE), 8) AS value
FROM v a JOIN totals t ON a.user = t.user
WHERE a.metric = 'click'
"""


def promql_vector_unless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``click unless on(user) error`` at EV_END — logical set matching:
    click series for users with NO error sample in the lookback window.
    Labels and values pass through untouched (PromQL set-op semantics)."""
    d = _dedup_rel(spark, sf_dir)
    vec = promql.instant(d, EV_END, LOOKBACK)
    name = F.col("labels").getItem("__name__")
    out = promql.set_binop(
        vec.filter(name == "click"), vec.filter(name == "error"), "unless", on=["user"]
    )
    return out.select(
        F.col("labels").getItem("user").alias("user"),
        F.col("labels").getItem("k").alias("k"),
        F.round("value", 4).alias("value"),
    )


PROMQL_VECTOR_UNLESS_SQL = f"""{_DEDUP},
latest AS (
    SELECT metric, user, k, value,
           row_number() OVER (PARTITION BY metric, user, k ORDER BY ts DESC) AS rn
    FROM d
    WHERE ts BETWEEN {EV_END - LOOKBACK} AND {EV_END}
),
v AS (SELECT metric, user, k, value FROM latest WHERE rn = 1)
SELECT a.user, a.k, round(CAST(a.value AS DOUBLE), 4) AS value
FROM v a
WHERE a.metric = 'click'
  AND NOT EXISTS (SELECT 1 FROM v b WHERE b.metric = 'error' AND b.user = a.user)
"""


SUBQ_WINDOW = 2 * 86_400
SUBQ_STEP = 86_400


def promql_subquery_max_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``max_over_time(rate(x[2d])[range:1d])`` — the PromQL subquery
    shape: per-series peak 2d-window rate sampled daily.  Sliding windows
    via a bounded covering-grid explode (fan-out window/step = 2), one
    window pass per (series, grid point), tiny outer regroup."""
    out = promql.subquery_over_time(
        _dedup_rel(spark, sf_dir), "max", EV_START, EV_END, SUBQ_WINDOW, SUBQ_STEP
    )
    return flatten_labels(out.select(F.col("labels"), F.round("value", 8).alias("value")))


PROMQL_SUBQUERY_MAX_RATE_SQL = f"""{_DEDUP},
grid AS (
    SELECT metric, user, k, g.range AS ws
    FROM (SELECT DISTINCT metric, user, k FROM d) s,
         range({(EV_START // SUBQ_STEP) * SUBQ_STEP}, {EV_END + 1}, {SUBQ_STEP}) g
),
covered AS (
    SELECT g.metric, g.user, g.k, g.ws, d.ts, d.value
    FROM grid g
    JOIN d ON d.metric = g.metric AND d.user = g.user AND d.k = g.k
          AND d.ts >= g.ws AND d.ts < g.ws + {SUBQ_WINDOW}
),
s AS (
    SELECT metric, user, k, ws, ts, value,
           lag(value) OVER (PARTITION BY metric, user, k, ws ORDER BY ts) AS prev
    FROM covered
),
rates AS (
    SELECT metric, user, k, ws,
           sum(CASE WHEN prev IS NULL THEN 0
                    WHEN value >= prev THEN value - prev
                    ELSE value END) AS total,
           max(ts) - min(ts) AS span,
           count(*) AS n
    FROM s GROUP BY metric, user, k, ws
)
SELECT metric, user, k, round(CAST(max(total / span) AS DOUBLE), 8) AS value
FROM rates WHERE n >= 2 AND span > 0
GROUP BY metric, user, k
"""


QUERIES = {
    "promql_increase": promql_increase,
    "promql_rate": promql_rate,
    "promql_avg_over_time": promql_avg_over_time,
    "promql_sum_by_metric": promql_sum_by_metric,
    "promql_quantile_over_time": promql_quantile_over_time,
    "promql_resets": promql_resets,
    "promql_topk": promql_topk,
    "promql_deriv": promql_deriv,
    "promql_predict_linear": promql_predict_linear,
    "promql_irate": promql_irate,
    "promql_changes": promql_changes,
    "promql_stddev_over_time": promql_stddev_over_time,
    "promql_last_over_time": promql_last_over_time,
    "promql_count_values": promql_count_values,
    "promql_histogram_quantile": promql_histogram_quantile,
    "promql_binop_on": promql_binop_on,
    "promql_binop_group_left": promql_binop_group_left,
    "promql_vector_unless": promql_vector_unless,
    "promql_subquery_max_rate": promql_subquery_max_rate,
}

ORACLES = {
    "promql_subquery_max_rate": PROMQL_SUBQUERY_MAX_RATE_SQL,
    "promql_binop_on": PROMQL_BINOP_ON_SQL,
    "promql_binop_group_left": PROMQL_BINOP_GROUP_LEFT_SQL,
    "promql_vector_unless": PROMQL_VECTOR_UNLESS_SQL,
    "promql_deriv": PROMQL_DERIV_SQL,
    "promql_predict_linear": PROMQL_PREDICT_LINEAR_SQL,
    "promql_irate": PROMQL_IRATE_SQL,
    "promql_changes": PROMQL_CHANGES_SQL,
    "promql_stddev_over_time": PROMQL_STDDEV_OVER_TIME_SQL,
    "promql_last_over_time": PROMQL_LAST_OVER_TIME_SQL,
    "promql_count_values": PROMQL_COUNT_VALUES_SQL,
    "promql_histogram_quantile": PROMQL_HISTOGRAM_QUANTILE_SQL,
    "promql_quantile_over_time": PROMQL_QUANTILE_OVER_TIME_SQL,
    "promql_resets": PROMQL_RESETS_SQL,
    "promql_topk": PROMQL_TOPK_SQL,
    "promql_increase": PROMQL_INCREASE_SQL,
    "promql_rate": PROMQL_RATE_SQL,
    "promql_avg_over_time": PROMQL_AVG_OVER_TIME_SQL,
    "promql_sum_by_metric": PROMQL_SUM_BY_METRIC_SQL,
}


#: Smoothing / trend factors for the holt_winters query.
HW_SF = 0.5
HW_TF = 0.3


def promql_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """holt_winters(range, 0.5, 0.3) per series — the sequential
    double-exponential-smoothing recurrence as a JVM array fold
    (functions/promql.py); the oracle replays the identical recurrence
    with a recursive CTE."""
    out = promql.holt_winters(_dedup_rel(spark, sf_dir), EV_START, EV_END, HW_SF, HW_TF)
    return flatten_labels(out.select(F.col("labels"), F.round("value", 4).alias("value")))


PROMQL_HOLT_WINTERS_SQL = f"""{_DEDUP.replace("WITH rel", "WITH RECURSIVE rel", 1)},
pts AS (
    SELECT metric, user, k, CAST(value AS DOUBLE) AS value,
           row_number() OVER (PARTITION BY metric, user, k ORDER BY ts) AS rn,
           count(*) OVER (PARTITION BY metric, user, k) AS n
    FROM d
),
hw AS (
    SELECT p1.metric, p1.user, p1.k, p1.n,
           p1.value AS sp, p1.value AS s,
           p2.value - p1.value AS b, 1 AS i
    FROM pts p1
    JOIN pts p2 ON p2.metric = p1.metric AND p2.user = p1.user
               AND p2.k = p1.k AND p1.rn = 1 AND p2.rn = 2
    UNION ALL
    SELECT hw.metric, hw.user, hw.k, hw.n,
           hw.s AS sp,
           {HW_SF} * p.value + (1 - {HW_SF}) * (hw.s +
               CASE WHEN hw.i = 1 THEN hw.b
                    ELSE {HW_TF} * (hw.s - hw.sp) + (1 - {HW_TF}) * hw.b END) AS s,
           CASE WHEN hw.i = 1 THEN hw.b
                ELSE {HW_TF} * (hw.s - hw.sp) + (1 - {HW_TF}) * hw.b END AS b,
           hw.i + 1 AS i
    FROM hw
    JOIN pts p ON p.metric = hw.metric AND p.user = hw.user AND p.k = hw.k
              AND p.rn = hw.i + 1
    WHERE hw.i < hw.n
)
SELECT metric, user, k, round(s, 4) AS value FROM hw WHERE i = n
"""

QUERIES["promql_holt_winters"] = promql_holt_winters
ORACLES["promql_holt_winters"] = PROMQL_HOLT_WINTERS_SQL


def promql_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """absent(selector) for a metric that matches nothing in range —
    emits the single {absent="true"} 1.0 sample; the empty-vector case is
    one tiny global count, no driver branching."""
    rel = _dedup_rel(spark, sf_dir).filter(
        F.col("labels").getItem("__name__") == "no_such_metric"
    )
    out = promql.absent(rel)
    return out.select(
        F.col("labels").getItem("absent").alias("absent"),
        F.col("value"),
    )


PROMQL_ABSENT_SQL = f"""{_DEDUP}
SELECT 'true' AS absent, 1.0 AS value
FROM (SELECT count(*) AS n FROM d WHERE metric = 'no_such_metric')
WHERE n = 0
"""

QUERIES["promql_absent"] = promql_absent
ORACLES["promql_absent"] = PROMQL_ABSENT_SQL


def promql_label_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition of the label/scalar manipulation functions on an
    instant vector: label_replace (region ← first digit of user),
    label_join (uk ← user-k), scalar_map sqrt, clamp [1, 20] — all pure
    map expressions, zero additional shuffles over the instant lookup."""
    vec = promql.instant(_dedup_rel(spark, sf_dir), EV_END, LOOKBACK)
    vec = promql.label_replace(vec, "region", "r$1", "user", "(\\d)\\d*")
    vec = promql.label_join(vec, "uk", "-", ["user", "k"])
    vec = promql.scalar_map(vec, "sqrt")
    vec = promql.clamp(vec, 1.0, 20.0)
    return vec.select(
        F.col("labels").getItem("__name__").alias("metric"),
        F.col("labels").getItem("user").alias("user"),
        F.col("labels").getItem("k").alias("k"),
        F.col("labels").getItem("region").alias("region"),
        F.col("labels").getItem("uk").alias("uk"),
        F.round("value", 4).alias("value"),
    )


PROMQL_LABEL_MATH_SQL = f"""{_DEDUP},
latest AS (
    SELECT metric, user, k, value,
           row_number() OVER (PARTITION BY metric, user, k ORDER BY ts DESC) AS rn
    FROM d
    WHERE ts BETWEEN {EV_END - LOOKBACK} AND {EV_END}
)
SELECT metric, user, k,
       'r' || substr(user, 1, 1) AS region,
       user || '-' || k AS uk,
       round(least(greatest(sqrt(CAST(value AS DOUBLE)), 1.0), 20.0), 4) AS value
FROM latest WHERE rn = 1
"""

QUERIES["promql_label_math"] = promql_label_math
ORACLES["promql_label_math"] = PROMQL_LABEL_MATH_SQL


#: Offset modifier for the delta query (seconds).
DELTA_OFFSET = 2 * 86_400


def promql_delta_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """delta(gauge[range] offset 2d): the offset modifier shifts the
    evaluated window (still a pushable range predicate) and delta takes
    last-minus-first per series.

    The input relation must extend BELOW EV_START by the offset — the
    shifted window [EV_START-2d, EV_END-2d] reads pre-range samples (the
    testdata spans well before EV_START), so the usual [EV_START, EV_END]
    dedup relation would silently truncate the window's head (caught in
    round-5 review)."""
    rel = events_relation(
        spark, sf_dir, EV_START - DELTA_OFFSET, EV_END
    ).filter(F.col("ts").between(EV_START - DELTA_OFFSET, EV_END))
    dedup = (
        rel.groupBy("series_key", "ts")
        .agg(F.any_value("labels").alias("labels"), F.max("value").alias("value"))
        .select("labels", "ts", "value", "series_key")
    )
    shifted = promql.offset_range(dedup, EV_START, EV_END, DELTA_OFFSET)
    out = promql.delta(shifted, EV_START, EV_END)
    return flatten_labels(out.select(F.col("labels"), F.round("value", 4).alias("value")))


_DEDUP_WIDE = f"""
WITH rel AS ({TSDB_SQL_REL}),
d AS (
    SELECT metric, user, k, ts, max(value) AS value
    FROM rel
    WHERE ts BETWEEN {EV_START - DELTA_OFFSET} AND {EV_END}
    GROUP BY metric, user, k, ts
)
"""

PROMQL_DELTA_OFFSET_SQL = f"""{_DEDUP_WIDE},
shifted AS (
    SELECT metric, user, k, ts + {DELTA_OFFSET} AS ts, value
    FROM d
    WHERE ts BETWEEN {EV_START - DELTA_OFFSET} AND {EV_END - DELTA_OFFSET}
),
ranked AS (
    SELECT metric, user, k, ts, value,
           first_value(value) OVER w AS first_v,
           last_value(value) OVER w AS last_v,
           count(*) OVER (PARTITION BY metric, user, k) AS n
    FROM shifted
    WHERE ts BETWEEN {EV_START} AND {EV_END}
    WINDOW w AS (PARTITION BY metric, user, k ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT DISTINCT metric, user, k,
       round(CAST(last_v - first_v AS DOUBLE), 4) AS value
FROM ranked WHERE n >= 2
"""

QUERIES["promql_delta_offset"] = promql_delta_offset
ORACLES["promql_delta_offset"] = PROMQL_DELTA_OFFSET_SQL


def promql_idelta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """idelta(gauge[range]): difference of each series' last two samples."""
    out = promql.idelta(_dedup_rel(spark, sf_dir), EV_START, EV_END)
    return flatten_labels(out.select(F.col("labels"), F.round("value", 4).alias("value")))


PROMQL_IDELTA_SQL = f"""{_DEDUP},
s AS (
    SELECT metric, user, k, ts, value,
           lag(value) OVER (PARTITION BY metric, user, k ORDER BY ts) AS prev,
           row_number() OVER (PARTITION BY metric, user, k ORDER BY ts DESC) AS rn
    FROM d
)
SELECT metric, user, k, round(CAST(value - prev AS DOUBLE), 4) AS value
FROM s WHERE rn = 1 AND prev IS NOT NULL
"""

QUERIES["promql_idelta"] = promql_idelta
ORACLES["promql_idelta"] = PROMQL_IDELTA_SQL
