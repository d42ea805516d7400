"""Streaming window operators over the canonical TSDB relation.

The reference's only windowing is the 2h segment bucketing (T1); these
operators provide the full streaming-native family on top of the same
event-time column, with watermarks bounding state for late data (T2's
principled replacement):

- tumbling/sliding aggregation per series (window + groupBy),
- gap-based session windows (``session_window``),
- batch/streaming duality: every function takes either a static or a
  streaming DataFrame — identical semantics, so the batch oracle validates
  the streaming plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_event_time(rel: DataFrame, watermark: str | None) -> DataFrame:
    out = rel.withColumn("event_time", F.timestamp_seconds(F.col("ts")))
    if watermark:
        out = out.withWatermark("event_time", watermark)
    return out


def tumbling_series_agg(
    rel: DataFrame, window: str = "2 hours", watermark: str | None = None
) -> DataFrame:
    """Per-series tumbling-window aggregates (streaming T1 + A6 stats).

    Output: series_key, labels, window_start/end (unix seconds), n_points,
    min/max/sum of value.  In streaming mode the watermark closes windows
    ``watermark`` after their end — late rows inside the allowance are
    merged exactly (the reference's out-of-order tolerance, T2, but with a
    defined bound instead of "whenever the head rotates").
    """
    ev = _with_event_time(rel, watermark)
    w = F.window("event_time", window)
    return (
        ev.groupBy(F.col("series_key"), w.alias("w"))
        .agg(
            F.any_value("labels").alias("labels"),
            F.count(F.lit(1)).alias("n_points"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "series_key",
            "labels",
            F.unix_timestamp("w.start").alias("window_start"),
            F.unix_timestamp("w.end").alias("window_end"),
            "n_points",
            "min_value",
            "max_value",
            "sum_value",
        )
    )


def sliding_series_agg(
    rel: DataFrame, window: str = "2 hours", slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per-series sliding-window aggregates (each row lands in
    window/slide overlapping windows — smoothing/rate dashboards).
    Same output shape as :func:`tumbling_series_agg`; state in streaming
    mode is bounded by watermark × (window/slide) open windows per series.
    """
    ev = _with_event_time(rel, watermark)
    w = F.window("event_time", window, slide)
    return (
        ev.groupBy(F.col("series_key"), w.alias("w"))
        .agg(
            F.any_value("labels").alias("labels"),
            F.count(F.lit(1)).alias("n_points"),
            F.avg("value").alias("avg_value"),
        )
        .select(
            "series_key",
            "labels",
            F.unix_timestamp("w.start").alias("window_start"),
            F.unix_timestamp("w.end").alias("window_end"),
            "n_points",
            "avg_value",
        )
    )


def session_series_agg(
    rel: DataFrame, gap: str = "30 minutes", watermark: str | None = None
) -> DataFrame:
    """Gap-based session windows per series (``session_window`` — dynamic
    windows the reference cannot express)."""
    ev = _with_event_time(rel, watermark)
    sw = F.session_window("event_time", gap)
    return (
        ev.groupBy(F.col("series_key"), sw.alias("w"))
        .agg(F.any_value("labels").alias("labels"), F.count(F.lit(1)).alias("n_points"))
        .select(
            "series_key",
            "labels",
            F.unix_timestamp("w.start").alias("session_start"),
            F.unix_timestamp("w.end").alias("session_end"),
            "n_points",
        )
    )
