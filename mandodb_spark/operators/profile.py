"""Column-profiling operator: per-column stats for data-quality monitoring.

Beyond-reference surface: every curation pipeline fronts its tables with a
profiling pass (null rates, cardinalities, ranges) to catch upstream
schema/content drift — the operational complement of the schema-drift
loader contract in workloads/common.py.

Shape: ONE aggregate job over the table computes every column's stats
simultaneously (count / nulls / exact distinct / min / max), then a
driver-free ``stack`` unpivots the single result row into one row per
column.  The multi-column exact ``count_distinct`` plans as Catalyst's
Expand (one input row fans to one row per distinct-agg) — a deliberate
trade for exactness; pass ``approximate=True`` at 100 TB to swap in
``approx_count_distinct`` (HLL, no Expand) when ±2% cardinality is fine
(that path keeps the same output schema but is not oracle-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str], approximate: bool = False) -> DataFrame:
    """One row per column: (column, n_nonnull, n_null, n_distinct,
    min_value, max_value) — min/max rendered as strings so heterogeneous
    column types share one schema."""
    distinct = F.approx_count_distinct if approximate else F.count_distinct
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            distinct(F.col(c)).alias(f"__d_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __n_{c}, __nn_{c}, __d_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stacked}) AS "
        "(column, n_nonnull, n_null, n_distinct, min_value, max_value)"
    )


def profile_table_sql(table: str, cols: list[str]) -> str:
    """DuckDB mirror of :func:`profile_table` (exact mode)."""
    parts = [
        f"""SELECT '{c}' AS column,
       CAST(count({c}) AS BIGINT) AS n_nonnull,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_value,
       CAST(max({c}) AS VARCHAR) AS max_value
FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)
