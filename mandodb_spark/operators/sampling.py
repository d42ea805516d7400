"""Deterministic sampling operators for training-data pipelines.

Beyond-reference surface: corpus mixing/rebalancing for pretraining-data
curation.  Sampling is HASH-based, not RNG-based, which buys three
properties RNG sampling can't give at 100 TB:

- deterministic: the same row is always in or out, across reruns, engines,
  partitionings, and retries (a speculative task re-execution can't change
  the sample);
- map-side only: a pure column predicate — no shuffle, no state, composes
  with partition pruning and pushdown;
- oracle-checkable: md5 is identical in DuckDB, so the driver's
  correctness gate covers the sample exactly (rows+schema+hash), which no
  rand()-based sample could pass.

The unit interval is the first 8 md5 hex digits of ``salt:key`` scaled by
2^-32 — uniform to ~2e-10, far below any sampling-rate granularity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_unit(key: Column, salt: str = "sample") -> Column:
    """Deterministic uniform-[0,1) value for a key (32-bit md5 prefix)."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string"))), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(1 << 32))
    )


def hash_sample(df: DataFrame, key_col: str, rate: float, salt: str = "sample") -> DataFrame:
    """Uniform deterministic sample: keep rows with hash_unit < rate."""
    return df.filter(hash_unit(F.col(key_col), salt) < F.lit(rate))


def stratified_sample(df: DataFrame, key_col: str, strata_col: str,
                      rates: dict[str, float], default_rate: float = 0.0,
                      salt: str = "sample") -> DataFrame:
    """Per-stratum deterministic sampling — the training-data mix operator
    (e.g. downsample web text, keep all code/books).

    ``rates`` maps stratum value → keep probability.  The rate lookup is a
    literal CASE chain (strata are a curated handful by definition); the
    whole operator stays a scan-side predicate — at 100 TB the sample never
    shuffles and never materializes the rejected rows.
    """
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(rate)
    return df.filter(hash_unit(F.col(key_col), salt) < rate)


def hash_unit_sql(key_expr: str, salt: str = "sample") -> str:
    """DuckDB mirror of :func:`hash_unit` (oracle generator)."""
    return (
        f"(CAST(CAST(concat('0x', substr(md5(concat('{salt}:', CAST({key_expr} AS VARCHAR)))"
        f", 1, 8)) AS BIGINT) AS DOUBLE) / {float(1 << 32)})"
    )
