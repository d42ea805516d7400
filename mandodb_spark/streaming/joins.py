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


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    dim_key: str | None = None,
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment: join a (possibly streaming)
    fact relation to a static dimension snapshot.

    The canonical ingest-enrichment primitive (every event picks up its
    user/segment/geo attributes on the way in).  Structured Streaming
    supports stream-static joins natively; the static side is re-EXECUTED
    per micro-batch, but a path-based relation pins its file listing when
    the query is analyzed — so the direct form enriches against the dim
    SNAPSHOT at query start (measured: refreshByPath does not re-resolve
    a running stream's static subplan).  For update-visible enrichment,
    call this inside a ``foreachBatch`` sink with a freshly-read dim —
    the shape this engine's checkpointed ingest already uses
    (streaming/ingest.py), pinned by
    ``test_stream_static_enrichment_picks_up_dim_updates``.  The static
    side is explicitly broadcast: the stream side never shuffles and the
    plan is a BroadcastHashJoin per batch — at cluster scale the dim
    ships with the tasks, the 100 TB fact stream stays put.  Batch dual:
    the same call on two static frames is the ordinary broadcast dim
    join, which is how the declared oracle query checks these semantics.

    ``how="left"`` keeps facts with no dimension row (nulls), the
    standard "enrich, never drop" contract; ``"inner"`` filters to
    matched facts.
    """
    dk = dim_key or key
    if dk not in dim.columns:
        raise ValueError(f"dimension has no key column {dk!r}: {dim.columns}")
    if dk != key and key in dim.columns:
        raise ValueError(
            f"dimension already has a column named {key!r}; renaming its key "
            f"{dk!r} onto it would be ambiguous — drop or rename one first"
        )
    rhs = dim.withColumnRenamed(dk, key) if dk != key else dim
    return stream.join(F.broadcast(rhs), key, how)
