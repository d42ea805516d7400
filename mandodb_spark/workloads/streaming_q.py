"""Declared queries through the STREAMING window operators in batch mode.

Structured Streaming window operators are batch/streaming dual — the same
``tumbling_series_agg`` / ``sliding_series_agg`` / ``session_series_agg``
functions run under ``foreachBatch`` in the live ingest path
(streaming/ingest.py) and on a batch DataFrame here.  Declaring them as
oracle-checked queries proves the streaming family's SEMANTICS against
DuckDB (window alignment, session-gap closure, overlap fan-out), not just
pytest fixtures: the driver's correctness gate covers the exact code the
stream runs.

Window alignment: ``F.window`` buckets are epoch-aligned in the session
timezone (UTC here) — floor(ts / width) * width — which is what the SQL
mirrors.  ``session_window`` ends ``gap`` after the last event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming import windows as sw
from .common import EV_END, EV_START, TSDB_SQL_REL, events_relation, flatten_labels

WIN = 7200
SLIDE = 1800
GAP = 1800

_REL_CTE = f"""
WITH rel AS ({TSDB_SQL_REL}),
d AS (
    SELECT metric, user, k, ts, value FROM rel
    WHERE ts BETWEEN {EV_START} AND {EV_END}
)
"""


def _rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_relation(spark, sf_dir, EV_START, EV_END).filter(
        F.col("ts").between(EV_START, EV_END)
    )


def stream_tumbling_dual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming tumbling-window operator (T1+A6) on batch input."""
    out = sw.tumbling_series_agg(_rel(spark, sf_dir), window="2 hours")
    return flatten_labels(
        out.select(
            "labels",
            "window_start",
            "window_end",
            "n_points",
            F.round("min_value", 4).alias("min_value"),
            F.round("max_value", 4).alias("max_value"),
            F.round("sum_value", 4).alias("sum_value"),
        )
    )


STREAM_TUMBLING_SQL = f"""{_REL_CTE}
SELECT metric, user, k,
       CAST(floor(ts / {WIN}.0) AS BIGINT) * {WIN} AS window_start,
       CAST(floor(ts / {WIN}.0) AS BIGINT) * {WIN} + {WIN} AS window_end,
       CAST(count(*) AS BIGINT) AS n_points,
       round(CAST(min(value) AS DOUBLE), 4) AS min_value,
       round(CAST(max(value) AS DOUBLE), 4) AS max_value,
       round(CAST(sum(value) AS DOUBLE), 4) AS sum_value
FROM d
GROUP BY metric, user, k, 4, 5
"""


def stream_sliding_dual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming sliding-window operator on batch input (each sample
    lands in window/slide overlapping windows)."""
    out = sw.sliding_series_agg(_rel(spark, sf_dir), window="2 hours", slide="30 minutes")
    return flatten_labels(
        out.select(
            "labels",
            "window_start",
            "window_end",
            "n_points",
            F.round("avg_value", 4).alias("avg_value"),
        )
    )


#: A sample at ts is in the window/slide overlapping windows whose starts
#: step back from its own slide-aligned bucket.
STREAM_SLIDING_SQL = f"""{_REL_CTE},
fanout AS (
    SELECT metric, user, k, value,
           CAST(floor(ts / {SLIDE}.0) AS BIGINT) * {SLIDE} - o.off * {SLIDE} AS window_start
    FROM d, (SELECT unnest(range(0, {WIN // SLIDE})) AS off) o
)
SELECT metric, user, k, window_start, window_start + {WIN} AS window_end,
       CAST(count(*) AS BIGINT) AS n_points,
       round(CAST(avg(value) AS DOUBLE), 4) AS avg_value
FROM fanout
GROUP BY metric, user, k, window_start
"""


def stream_session_dual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming session-window operator on batch input (gap-based
    dynamic windows the reference cannot express)."""
    out = sw.session_series_agg(_rel(spark, sf_dir), gap="30 minutes")
    return flatten_labels(
        out.select("labels", "session_start", "session_end", "n_points")
    )


STREAM_SESSION_SQL = f"""{_REL_CTE},
flagged AS (
    SELECT metric, user, k, ts,
           -- session windows are [start, last + gap): an event exactly at
           -- the closing edge starts a NEW session, hence >= not >
           CASE WHEN ts - lag(ts) OVER w >= {GAP} OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
    FROM d
    WINDOW w AS (PARTITION BY metric, user, k ORDER BY ts)
),
sess AS (
    SELECT metric, user, k, ts,
           sum(new_s) OVER (PARTITION BY metric, user, k ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM flagged
)
SELECT metric, user, k,
       min(ts) AS session_start,
       max(ts) + {GAP} AS session_end,
       CAST(count(*) AS BIGINT) AS n_points
FROM sess
GROUP BY metric, user, k, sid
"""


QUERIES = {
    "stream_tumbling_dual": stream_tumbling_dual,
    "stream_sliding_dual": stream_sliding_dual,
    "stream_session_dual": stream_session_dual,
}

ORACLES = {
    "stream_tumbling_dual": STREAM_TUMBLING_SQL,
    "stream_sliding_dual": STREAM_SLIDING_SQL,
    "stream_session_dual": STREAM_SESSION_SQL,
}


#: Attribution lookback for the stream-stream join dual (seconds).
JOIN_LOOKBACK = 900


def stream_join_dual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-stream interval join (streaming/joins.py) on batch
    input: purchases joined to the same user's clicks within the
    preceding 15 minutes — the attribution primitive.  In streaming mode
    the double watermark bounds both sides' state; in batch mode the
    equi-key (user_id) keeps it a plain shuffle hash/merge join with the
    range as a post-predicate — never a nested loop."""
    from ..streaming.joins import interval_join_stream
    from .common import events_base

    ev = events_base(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    joined = interval_join_stream(
        purchases, clicks, key="user_id", lookback_s=JOIN_LOOKBACK
    )
    return joined.groupBy("user_id", F.col("l_event_id").alias("purchase_id")).agg(
        F.count(F.lit(1)).alias("n_clicks")
    )


STREAM_JOIN_SQL = f"""
WITH ev AS (
    SELECT user_id, event_id, event_type,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts
    FROM events
)
SELECT p.user_id, p.event_id AS purchase_id, CAST(count(*) AS BIGINT) AS n_clicks
FROM ev p
JOIN ev c ON c.user_id = p.user_id
         AND c.event_type = 'click'
         AND c.ts BETWEEN p.ts - {JOIN_LOOKBACK} AND p.ts
WHERE p.event_type = 'purchase'
GROUP BY 1, 2
"""

QUERIES["stream_join_dual"] = stream_join_dual
ORACLES["stream_join_dual"] = STREAM_JOIN_SQL


def stream_enrich_dual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-static dimension-enrichment join (streaming/joins.py::
    enrich_stream) on batch input: every event picks up its customer's
    market segment via an explicit broadcast (stream side never
    shuffles), then rolls up per (segment, event_type).

    ``tests/test_streaming.py`` drives the identical function through a
    real file-source ``writeStream`` with a dim update between batches;
    this declared query pins the join + rollup semantics against DuckDB.
    """
    from ..streaming.joins import enrich_stream
    from .common import events_base, load

    ev = events_base(spark, sf_dir).filter(
        F.col("ts").between(EV_START, EV_END)
    )
    dim = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    out = enrich_stream(ev, dim, key="user_id", dim_key="c_custkey")
    return (
        out.groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact decimal accumulation: a parallel double sum's rounding
            # depends on partial-sum order (repo convention since the
            # avg_quality fix) — values carry 2dp, so decimal(18,6) is exact
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("sum_value"),
        )
        .orderBy("c_mktsegment", "event_type")
    )


STREAM_ENRICH_SQL = f"""
SELECT c.c_mktsegment, e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
WHERE CAST(floor(epoch(e.ts)) AS BIGINT) BETWEEN {EV_START} AND {EV_END}
GROUP BY 1, 2
ORDER BY 1, 2
"""

QUERIES["stream_enrich_dual"] = stream_enrich_dual
ORACLES["stream_enrich_dual"] = STREAM_ENRICH_SQL
