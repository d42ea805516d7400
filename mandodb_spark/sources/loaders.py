"""Ingestion adapters: external formats → the canonical ROW_SCHEMA shape.

The reference's only ingress is Go structs via ``InsertRows`` (tsdb.go:205).
A Spark engine ingests from files/streams; these adapters normalize the
common wire shapes into ``(metric, labels, ts, value)`` rows ready for
``TSDB.insert_rows`` / ``StreamingIngestor`` — each works identically on
``spark.read`` and ``spark.readStream`` inputs (batch/streaming duality).

Supported shapes:
- JSON lines: ``{"metric": "...", "labels": {...}, "ts": 1700000000,
  "value": 0.5}`` (the natural JSON rendering of tsdb.go:158-163).
- Prometheus-style flat JSON: all labels inline with ``__name__``
  (prometheus remote-read rendering); labels = everything except ts/value.
- CSV with a fixed (metric, ts, value) prefix and label columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

#: Schema for the JSON-lines wire shape (pass to read/readStream).
JSONL_SCHEMA = StructType(
    [
        StructField("metric", StringType(), False),
        StructField("labels", MapType(StringType(), StringType(), True), True),
        StructField("ts", LongType(), False),
        StructField("value", DoubleType(), True),
    ]
)


def rows_from_jsonl(spark: SparkSession, path: str, streaming: bool = False) -> DataFrame:
    """JSON-lines files → ROW_SCHEMA rows (batch or streaming source)."""
    reader = spark.readStream if streaming else spark.read
    return reader.schema(JSONL_SCHEMA).json(path).select("metric", "labels", "ts", "value")


def rows_from_flat(df: DataFrame, metric_label: str = "__name__",
                   ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Flat wide relation → ROW_SCHEMA: every column except ts/value is a
    label; ``metric_label`` names the metric column (Prometheus flat form).

    Null label values are dropped per-row (map_filter) mirroring label
    sanitation (label.go:189-203).
    """
    label_cols = [c for c in df.columns if c not in (ts_col, value_col)]
    if metric_label not in label_cols:
        raise ValueError(f"metric column {metric_label!r} not present")
    entries: list = []
    for c in label_cols:
        entries.append(F.lit(c))
        entries.append(F.col(c).cast("string"))
    labels = F.map_filter(F.create_map(*entries), lambda _, v: v.isNotNull())
    return df.select(
        F.col(metric_label).cast("string").alias("metric"),
        labels.alias("labels"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    ).where(F.col("metric").isNotNull())


def rows_from_csv(spark: SparkSession, path: str, label_cols: list[str],
                  streaming: bool = False) -> DataFrame:
    """CSV with header ``metric,ts,value,<label columns...>`` → ROW_SCHEMA."""
    fields = [
        StructField("metric", StringType(), False),
        StructField("ts", LongType(), False),
        StructField("value", DoubleType(), True),
        *[StructField(c, StringType(), True) for c in label_cols],
    ]
    reader = spark.readStream if streaming else spark.read
    df = reader.schema(StructType(fields)).option("header", "true").csv(path)
    flat = df.withColumn("__name__", F.col("metric")).drop("metric")
    return rows_from_flat(flat)
