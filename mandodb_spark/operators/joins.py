"""Join-strategy helpers: the skew rescue the planner can't always make.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin``) handles the
common case at runtime; this module covers the two places it can't:

- a sort-merge/shuffle-hash join whose hot key exceeds the split
  threshold on BOTH sides (AQE only splits one side),
- deterministic plan shapes for tests/benchmarks where runtime re-plans
  would make ``.explain`` assertions flaky.

Complements ``profile.skew_report`` (the diagnostic that tells you WHICH
keys are hot) — ``salted_join`` is the corresponding treatment.  Same
design family as the salted ``query_range`` variant
(``tsdb_ops.query_range(salt_partitions=...)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, on: list[str] | str,
                n_salts: int = 8, how: str = "inner",
                salt_cols: list[str] | None = None,
                seed: int = 42) -> DataFrame:
    """Equi-join with the LEFT side's hot keys spread over ``n_salts``
    shuffle partitions: left rows get a per-row salt, the right side is
    replicated ``n_salts``× via a sequence fan-out, and the join runs
    on ``(keys..., salt)``.  Result ≡ ``left.join(right, on, how)`` for
    ``inner``/``left`` joins (pinned by an equivalence test).

    Salt derivation: pass ``salt_cols`` — columns that VARY within a hot
    key (an event id, a timestamp) — for a fully deterministic
    ``pmod(xxhash64(salt_cols), n)`` assignment (bit-stable across runs
    and task retries, the repo's preference); without them the salt is
    ``floor(rand(seed)·n)``, which is still retry-safe (rand is
    re-derived per input split) but not stable across different
    partitionings of the input.

    Cost model: right-side replication costs ``n_salts × |right|`` rows
    of shuffle — worth it exactly when the hot key's row count divided by
    ``n_salts`` still dominates |right|; use ``profile.skew_report`` to
    pick targets, and keep the smaller relation on the RIGHT.  ``right``
    must have unique join keys or any multiplicity it has is preserved —
    identical to the plain join's semantics either way.

    ``how``: ``inner`` or ``left`` (salting the left side cannot express
    right/full outer joins — unmatched RIGHT rows would appear once per
    salt; use the plain join or swap sides for those).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left' only")
    keys = [on] if isinstance(on, str) else list(on)
    if salt_cols:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]),
                      F.lit(n_salts)).cast("int")
    else:
        salt = F.floor(F.rand(seed) * n_salts).cast("int")
    l_s = left.withColumn("__salt", salt)
    r_s = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = l_s.join(r_s, keys + ["__salt"], how)
    return out.drop("__salt")
