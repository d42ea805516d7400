"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``mandodb_spark.workloads`` (one entry per
operator family from SURVEY.md §2 plus the training-data extensions);
this module just adapts them to the contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mandodb_spark.workloads import ORACLES, QUERIES
from mandodb_spark.workloads.tsdb_queries import tsdb_series_agg


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the engine's QueryRange
    (per-series sorted point arrays → per-series stats) over events."""
    return tsdb_series_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL equivalents, keyed like ``queries()``."""
    return dict(ORACLES)
