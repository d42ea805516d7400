"""PromQL-style query functions over the canonical TSDB relation.

The reference stores Prometheus-shaped data but has no query functions at
all (README.md:38: no query engine of its own; SURVEY.md §2.7).  A user
switching from the reference + an external PromQL layer needs these; they
are the natural "complete engine" surface for the data model, and every one
is a pure DataFrame transform:

- range-vector functions: ``rate``, ``increase``, ``delta`` — per-series
  counter math over [start, end] windows via window functions;
- ``*_over_time`` aggregations: avg/min/max/sum/count per series per
  tumbling window;
- instant-vector selection: ``instant`` (latest sample per series at t);
- label aggregation: ``sum_by`` / ``avg_by`` etc. — regroup series by a
  label subset (PromQL's ``sum by (labels) (...)``).

All shuffles are keyed on series_key (or the by-labels subset) — the same
partitioning the store writes, so co-location is preserved where possible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..model import series_key


def _series_window():
    return Window.partitionBy("series_key").orderBy("ts")


def _ensure_series_key(rel: DataFrame) -> DataFrame:
    if "series_key" not in rel.columns:
        rel = rel.withColumn("series_key", series_key(F.col("labels")))
    return rel


def instant(rel: DataFrame, at_ts: int, lookback: int = 300) -> DataFrame:
    """Instant vector at ``at_ts``: the newest sample per series within the
    PromQL-style lookback window (default 5m)."""
    rel = _ensure_series_key(rel)
    w = Window.partitionBy("series_key").orderBy(F.col("ts").desc())
    return (
        rel.filter(F.col("ts").between(at_ts - lookback, at_ts))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("series_key", "labels", "ts", "value")
    )


def delta(rel: DataFrame, start: int, end: int) -> DataFrame:
    """Gauge delta over the range: last - first per series."""
    rel = _ensure_series_key(rel).filter(F.col("ts").between(start, end))
    return (
        rel.groupBy("series_key")
        .agg(
            F.any_value("labels").alias("labels"),
            (F.max_by("value", "ts") - F.min_by("value", "ts")).alias("value"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .filter(F.col("n_samples") >= 2)
        .drop("n_samples")
    )


def increase(rel: DataFrame, start: int, end: int) -> DataFrame:
    """Counter increase over the range: sum of positive per-sample deltas
    (counter resets clamp to the new value, mirroring PromQL's reset
    handling without extrapolation)."""
    rel = _ensure_series_key(rel).filter(F.col("ts").between(start, end))
    w = _series_window()
    stepped = rel.withColumn("__prev", F.lag("value").over(w)).withColumn(
        "__inc",
        F.when(F.col("__prev").isNull(), F.lit(0.0))
        .when(F.col("value") >= F.col("__prev"), F.col("value") - F.col("__prev"))
        .otherwise(F.col("value")),  # reset: counter restarted at `value`
    )
    return (
        stepped.groupBy("series_key")
        .agg(
            F.any_value("labels").alias("labels"),
            F.sum("__inc").alias("value"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .filter(F.col("n_samples") >= 2)
        .drop("n_samples")
    )


def rate(rel: DataFrame, start: int, end: int) -> DataFrame:
    """Counter rate: increase / observed time span (per series)."""
    rel = _ensure_series_key(rel).filter(F.col("ts").between(start, end))
    w = _series_window()
    stepped = rel.withColumn("__prev", F.lag("value").over(w)).withColumn(
        "__inc",
        F.when(F.col("__prev").isNull(), F.lit(0.0))
        .when(F.col("value") >= F.col("__prev"), F.col("value") - F.col("__prev"))
        .otherwise(F.col("value")),
    )
    return (
        stepped.groupBy("series_key")
        .agg(
            F.any_value("labels").alias("labels"),
            F.sum("__inc").alias("__total"),
            (F.max("ts") - F.min("ts")).alias("__span"),
            F.count(F.lit(1)).alias("__n"),
        )
        .filter((F.col("__n") >= 2) & (F.col("__span") > 0))
        .select(
            "series_key",
            "labels",
            (F.col("__total") / F.col("__span")).alias("value"),
        )
    )


_OVER_TIME = {
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "count": lambda c: F.count(c).cast("double"),
}


def over_time(rel: DataFrame, fn: str, start: int, end: int, step: int) -> DataFrame:
    """``<fn>_over_time`` evaluated on tumbling ``step`` windows across
    [start, end]: one row per (series, window).

    Output: series_key, labels, window_start, value.
    """
    agg = _OVER_TIME[fn]
    rel = _ensure_series_key(rel).filter(F.col("ts").between(start, end))
    bucket = (F.floor((F.col("ts") - F.lit(start)) / F.lit(step)) * step + start).cast("long")
    return (
        rel.groupBy("series_key", bucket.alias("window_start"))
        .agg(F.any_value("labels").alias("labels"), agg(F.col("value")).alias("value"))
        .select("series_key", "labels", "window_start", "value")
    )


def agg_by(vector: DataFrame, fn: str, by: list[str]) -> DataFrame:
    """PromQL ``<fn> by (labels) (vector)``: regroup an instant/range vector
    by a label subset.  Output labels contain only the ``by`` labels.
    """
    agg = _OVER_TIME[fn]
    keys = [F.col("labels").getItem(name).alias(name) for name in by]
    grouped = vector.groupBy(*keys).agg(agg(F.col("value")).alias("value"))
    new_labels = F.map_from_arrays(
        F.array(*[F.lit(n) for n in by]), F.array(*[F.col(n) for n in by])
    )
    return grouped.select(new_labels.alias("labels"), "value")
