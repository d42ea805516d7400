"""Temporal join operators: interval (range) join, scale-safe.

Spark has no native range-join optimization: a join whose only condition
is an inequality (``r.ts BETWEEN l.start AND l.end``) plans as
BroadcastNestedLoopJoin or CartesianProduct — O(|L|·|R|) work that dies at
cluster scale.  The standard fix is *bucketing*: overlap can only happen
inside a shared time bucket, so explode each interval onto the buckets it
spans, give each point its single bucket, equi-join on the bucket (a plain
shuffle hash join), then apply the exact predicate.  Cost becomes
O(|L|·spans + |R| + true_matches) and shuffles on a well-distributed key.

(The as-of join in workloads/events_q.py is the ordered cousin; this is
the containment form.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` rows into every ``intervals`` row whose
    [start, end] contains their ``ts`` — via bucket equi-join.

    Each (interval, point) pair can meet in at most ONE bucket (the
    point's own), so the join produces no duplicates and needs no
    distinct.  ``bucket_width`` should be on the order of typical interval
    length: too small explodes intervals wide, too large degrades the
    equi-join's selectivity toward the nested loop it replaces.
    """
    buckets = F.sequence(
        F.floor(F.col(start_col) / bucket_width).cast("long"),
        F.floor(F.col(end_col) / bucket_width).cast("long"),
    )
    lhs = intervals.withColumn("__bucket", F.explode(buckets))
    rhs = points.withColumn("__bucket", F.floor(F.col(ts_col) / bucket_width).cast("long"))
    return (
        lhs.join(rhs, "__bucket", how)
        .filter(F.col(ts_col).between(F.col(start_col), F.col(end_col)))
        .drop("__bucket")
    )
