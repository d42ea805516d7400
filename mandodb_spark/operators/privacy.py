"""Privacy operators for training-data release: pseudonymization and
k-anonymity auditing.

Complements ``text.redact_pii`` (content-level scrubbing) with the
record-level half: replacing stable identifiers with keyed digests so
cross-table joins still work but raw ids never leave the pipeline, and
auditing whether a released column combination isolates small groups.
Pure column expressions / one groupBy — JVM-side, oracle-mirrored.
Beyond-reference surface (SURVEY §2.7)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pseudonymize(col: Column, salt: str, length: int = 16) -> Column:
    """Keyed pseudonym for an identifier column: the first ``length`` hex
    chars of sha256(salt || ':' || value).  Deterministic per salt (joins
    across tables pseudonymized with the SAME salt still line up), not
    reversible without it, and rotating the salt unlinks releases.  NULL
    stays NULL (absence is not an identity)."""
    return F.when(
        col.isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.substring(
            F.sha2(F.concat(F.lit(salt), F.lit(":"), col.cast("string")), 256),
            1, length,
        )
    )


def pseudonymize_sql(col_expr: str, salt: str, length: int = 16) -> str:
    """DuckDB mirror of :func:`pseudonymize` (oracle generator)."""
    esc = salt.replace("'", "''")
    return (f"CASE WHEN {col_expr} IS NULL THEN NULL ELSE "
            f"substr(sha256('{esc}' || ':' || CAST({col_expr} AS VARCHAR)), "
            f"1, {length}) END")


def k_anonymity_violations(df: DataFrame, quasi_cols: list[str],
                           k: int) -> DataFrame:
    """Groups of quasi-identifier values that isolate fewer than ``k``
    records — the release gate: a (zip, birth-year, gender)-style combo
    appearing once re-identifies someone.  One partial-aggregated
    groupBy + HAVING; output ``(quasi cols..., n_records)`` sorted-free
    (callers gate on count() == 0)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("n_records"))
        .filter(F.col("n_records") < k)
    )


def k_anonymity_violations_sql(table: str, quasi_cols: list[str],
                               k: int) -> str:
    """DuckDB mirror of :func:`k_anonymity_violations`."""
    gc = ", ".join(quasi_cols)
    return (f"SELECT {gc}, CAST(count(*) AS BIGINT) AS n_records "
            f"FROM {table} GROUP BY {gc} HAVING count(*) < {k}")
