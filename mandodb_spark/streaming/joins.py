"""Stream-stream event-time interval join.

Beyond the reference's streaming surface (its ingest is point-appends
only, tsdb.go:205-233): joining two live streams on a key within an
event-time window — the attribution/funnel primitive ("purchases joined
to the same user's clicks in the preceding N minutes").

Spark-first shape: this is exactly the case Structured Streaming's
stream-stream inner join with watermarks on BOTH sides solves natively —
the time-range join condition lets the engine bound each side's state
(rows older than watermark + range are evicted), so state is
O(in-flight window), not O(stream).  No custom state management needed.

Batch/streaming duality: ``withWatermark`` is a no-op on static frames,
so the same function runs on batch input — the declared
``stream_join_dual`` query oracle-checks the join's exact semantics
against DuckDB while ``tests/test_streaming.py`` drives the identical
code through a real two-stream ``writeStream``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback_s: int = 900,
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join ``right`` rows to ``left`` rows with the same ``key`` where
    ``right.ts`` falls in ``[left.ts - lookback_s, left.ts]``.

    Both inputs carry unix-seconds ``left_ts``/``right_ts``; both get an
    event-time column and a watermark (state eviction bound in streaming,
    no-op in batch).  Column names from both sides survive with ``l_`` /
    ``r_`` prefixes (except the shared key).

    ``how="left_outer"`` keeps unmatched left rows (the "purchase with no
    attributable click" row): in streaming mode the null-padded row is
    emitted only once the watermark proves no matching right row can still
    arrive — exactly-once late-data semantics the engine provides natively
    because the time-range condition bounds how long a left row must wait.
    """
    lev = left.withColumn("l_event_time", F.timestamp_seconds(F.col(left_ts)))
    rev = right.withColumn("r_event_time", F.timestamp_seconds(F.col(right_ts)))
    lev = lev.withWatermark("l_event_time", watermark)
    rev = rev.withWatermark("r_event_time", watermark)
    lhs = lev.select(
        F.col(key), *[F.col(c).alias(f"l_{c}") for c in left.columns if c != key],
        "l_event_time",
    )
    rhs = rev.select(
        F.col(key).alias("__rkey"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != key],
        "r_event_time",
    )
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (F.col("r_event_time") >= F.col("l_event_time") - F.expr(f"INTERVAL {lookback_s} SECONDS"))
        & (F.col("r_event_time") <= F.col("l_event_time"))
    )
    return lhs.join(rhs, cond, how).drop("__rkey", "l_event_time", "r_event_time")
