"""Memory-only store — the reference's ``onlyMemoryMode`` (T6).

The reference can pin everything in the head segment and never freeze it
(tsdb.go:30,83-87; memory_segment.go:64-66).  The Spark analogue keeps the
canonical relation as a cached in-memory DataFrame: each append unions the
canonicalized batch and ``localCheckpoint``s eagerly, which both
materializes the data in executor memory and truncates lineage so repeated
appends don't grow the plan.

Same interface as SegmentStore, so TSDB works over either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import DEFAULT_SEGMENT_DURATION, ROW_SCHEMA, canonicalize


class MemoryStore:
    def __init__(
        self,
        spark: SparkSession,
        segment_duration: int = DEFAULT_SEGMENT_DURATION,
    ) -> None:
        self.spark = spark
        self.segment_duration = segment_duration
        self._df: DataFrame | None = None

    # ---------------------------------------------------------------- write
    def append(self, rows: DataFrame) -> None:
        batch = canonicalize(rows, self.segment_duration)
        merged = batch if self._df is None else self._df.unionByName(batch)
        self._df = merged.localCheckpoint(eager=True)

    def insert_pylist(self, rows: list[tuple]) -> None:
        self.append(self.spark.createDataFrame(rows, ROW_SCHEMA))

    # ----------------------------------------------------------------- read
    def relation(self) -> DataFrame:
        if self._df is not None:
            return self._df
        return self.spark.createDataFrame([], ROW_SCHEMA).select(
            "labels",
            "ts",
            "value",
            F.lit(None).cast("long").alias("series_key"),
            F.lit(None).cast("long").alias("seg"),
        )

    # ------------------------------------------------------------ retention
    def remove_expired(self, now_ts: int, retention: int) -> list[int]:
        if self._df is None:
            return []
        cutoff = now_ts - retention
        expired = sorted(
            r.seg
            for r in self._df.select("seg").distinct().collect()
            if (r.seg + 1) * self.segment_duration - 1 < cutoff
        )
        if expired:
            self._df = self._df.filter(
                ~F.col("seg").isin(expired)
            ).localCheckpoint(eager=True)
        return expired

    # ----------------------------------------------------------- compaction
    def compact(self) -> None:
        """No-op: memory rows have no file layout to restore."""

    # ---------------------------------------------------------------- stats
    def stats(self) -> DataFrame:
        return (
            self.relation()
            .groupBy("seg")
            .agg(
                F.countDistinct("series_key").alias("series_count"),
                F.count(F.lit(1)).alias("data_points_count"),
                F.min("ts").alias("min_ts"),
                F.max("ts").alias("max_ts"),
            )
            .orderBy("seg")
        )
