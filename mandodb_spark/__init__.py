"""mandodb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of chenjiandongx/mandodb (a Prometheus-style
time-series database), re-expressed Spark-first: DataFrame/SQL plans,
partitioned-Parquet storage, Structured Streaming ingestion.

Not a port: the reference's storage machinery (Gorilla TSZ, mmap, roaring
bitmaps, AVL trees) is replaced wholesale by Parquet + Catalyst equivalents;
what is preserved exactly is query semantics (SURVEY.md §2-§3).
"""

from .engine import TSDB
from .matchers import LabelMatcher
from .model import (
    DEFAULT_RETENTION,
    DEFAULT_SEGMENT_DURATION,
    METRIC_NAME_LABEL,
    ROW_SCHEMA,
    canonicalize,
    series_key,
)
from .session import get_spark

__all__ = [
    "TSDB",
    "LabelMatcher",
    "DEFAULT_RETENTION",
    "DEFAULT_SEGMENT_DURATION",
    "METRIC_NAME_LABEL",
    "ROW_SCHEMA",
    "canonicalize",
    "series_key",
    "get_spark",
]

__version__ = "0.1.0"
