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

QUERIES = {
    "promql_increase": promql_increase,
    "promql_rate": promql_rate,
    "promql_avg_over_time": promql_avg_over_time,
    "promql_sum_by_metric": promql_sum_by_metric,
}

ORACLES = {
    "promql_increase": PROMQL_INCREASE_SQL,
    "promql_rate": PROMQL_RATE_SQL,
    "promql_avg_over_time": PROMQL_AVG_OVER_TIME_SQL,
    "promql_sum_by_metric": PROMQL_SUM_BY_METRIC_SQL,
}
