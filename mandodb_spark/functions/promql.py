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


def quantile_over_time(
    rel: DataFrame, q: float, start: int, end: int, step: int, exact: bool = True
) -> DataFrame:
    """``quantile_over_time(q, ...)`` on tumbling ``step`` windows.

    ``exact=True`` uses ``percentile`` (exact, needs the window's samples
    grouped — right for dashboards over pruned ranges); ``exact=False``
    uses ``approx_percentile`` (t-digest sketch, mergeable map-side — the
    100 TB path, where an exact per-group sort of raw samples is the
    bottleneck).  Same output shape either way.
    """
    rel = _ensure_series_key(rel).filter(F.col("ts").between(start, end))
    bucket = (F.floor((F.col("ts") - F.lit(start)) / F.lit(step)) * step + start).cast("long")
    quant = (
        F.percentile(F.col("value"), F.lit(q))
        if exact
        else F.approx_percentile(F.col("value"), F.lit(q), F.lit(10_000))
    )
    return (
        rel.groupBy("series_key", bucket.alias("window_start"))
        .agg(F.any_value("labels").alias("labels"), quant.alias("value"))
        .select("series_key", "labels", "window_start", "value")
    )


def resets(rel: DataFrame, start: int, end: int) -> DataFrame:
    """PromQL ``resets``: number of counter resets (value drops) per series
    over the range."""
    rel = _ensure_series_key(rel).filter(F.col("ts").between(start, end))
    w = _series_window()
    stepped = rel.withColumn("__prev", F.lag("value").over(w))
    return (
        stepped.groupBy("series_key")
        .agg(
            F.any_value("labels").alias("labels"),
            F.sum(
                F.when(F.col("__prev").isNotNull() & (F.col("value") < F.col("__prev")), 1).otherwise(0)
            ).alias("value"),
            F.count(F.lit(1)).alias("__n"),
        )
        .filter(F.col("__n") >= 2)
        .select("series_key", "labels", F.col("value").cast("long").alias("value"))
    )


def deriv(rel: DataFrame, start: int, end: int) -> DataFrame:
    """PromQL ``deriv``: per-second derivative of a gauge via simple linear
    regression over the range (exactly PromQL's definition).

    One codegen'd aggregation (``regr_slope`` is covariance/variance —
    partial-aggregable map-side, same scale shape as sum/avg).  Time is
    shifted to range-relative before regressing: both engines compute in
    double, and regressing on raw epoch seconds (~1.7e9) loses precision to
    cancellation differently per engine.
    """
    rel = _ensure_series_key(rel).filter(F.col("ts").between(start, end))
    x = (F.col("ts") - F.lit(start)).cast("double")
    return (
        rel.groupBy("series_key")
        .agg(
            F.any_value("labels").alias("labels"),
            F.regr_slope(F.col("value"), x).alias("value"),
            F.count(F.lit(1)).alias("__n"),
        )
        .filter((F.col("__n") >= 2) & F.col("value").isNotNull())
        .select("series_key", "labels", "value")
    )


def predict_linear(rel: DataFrame, start: int, end: int, horizon: int) -> DataFrame:
    """PromQL ``predict_linear``: extrapolate each series ``horizon``
    seconds past ``end`` on the least-squares line over the range."""
    rel = _ensure_series_key(rel).filter(F.col("ts").between(start, end))
    x = (F.col("ts") - F.lit(start)).cast("double")
    at = float(end - start + horizon)
    return (
        rel.groupBy("series_key")
        .agg(
            F.any_value("labels").alias("labels"),
            F.regr_slope(F.col("value"), x).alias("__slope"),
            F.regr_intercept(F.col("value"), x).alias("__icept"),
            F.count(F.lit(1)).alias("__n"),
        )
        .filter((F.col("__n") >= 2) & F.col("__slope").isNotNull())
        .select(
            "series_key",
            "labels",
            (F.col("__icept") + F.col("__slope") * F.lit(at)).alias("value"),
        )
    )


def topk(vector: DataFrame, k: int, largest: bool = True) -> DataFrame:
    """PromQL ``topk(k, vector)`` / ``bottomk``: the k series with the
    largest (smallest) values from an instant vector.  Ties break on
    series_key so the selection is deterministic; plans as a per-partition
    partial top-k (TakeOrderedAndProject) — no full sort, no shuffle of
    the losers."""
    order = [F.col("value").desc() if largest else F.col("value").asc(), F.col("series_key")]
    return vector.orderBy(*order).limit(k)


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
