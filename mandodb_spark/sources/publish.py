"""Write-Audit-Publish: validation-gated atomic dataset publication.

The WAP pattern (popularized by Iceberg deployments) as plain Spark over
the repo's atomic-exchange primitive: write the new dataset version to a
staging root, run the audit checks against the STAGED files (exactly what
readers would see), and only on all-green swap it into place with
:func:`~mandodb_spark.sources.segment_store.swap_in` — a failed audit
leaves the live version untouched and the bad candidate on disk for
inspection.  This is how a 100 TB pipeline ships a new corpus snapshot:
the expensive rewrite happens off to the side; the publish is one
metadata-level exchange; consumers never observe a half-written or
failed-validation state.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Callable, Mapping

from pyspark.sql import DataFrame

from .segment_store import swap_in


def write_audit_publish(
    spark,
    df: DataFrame,
    dest: str,
    checks: Mapping[str, Callable[[DataFrame], bool]],
    partition_by: list[str] | None = None,
    codec: str = "zstd",
    keep_failed: bool = True,
) -> dict:
    """Write ``df`` to ``<dest>__wap``, audit, and atomically publish.

    ``checks``: name → predicate over the STAGED DataFrame (row-count
    floors, null-rate ceilings, schema membership, PSI gates…).  Each
    predicate's boolean lands in the returned report; publication happens
    only if every one passes.  A check that RAISES is recorded as failed
    (message in ``errors``) — an auditing bug must not publish data.

    Returns ``{"published": bool, "checks": {name: bool}, "errors":
    {name: str}, "staging": path|None}`` — ``staging`` points at the
    retained failed candidate when ``keep_failed`` (default), so the bad
    version is inspectable, never live.
    """
    staging = f"{dest}__wap"
    shutil.rmtree(staging, ignore_errors=True)
    writer = df.write.mode("overwrite").option("compression", codec)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)

    staged = spark.read.parquet(staging)
    results: dict = {"published": False, "checks": {}, "errors": {}, "staging": None}
    for name, fn in checks.items():
        try:
            results["checks"][name] = bool(fn(staged))
        except Exception as exc:  # noqa: BLE001 - audit bug must not publish
            results["checks"][name] = False
            results["errors"][name] = str(exc)[:200]
    if all(results["checks"].values()) and results["checks"]:
        if Path(dest).exists():
            swap_in(dest, staging)
        else:
            Path(staging).rename(dest)
        spark.catalog.refreshByPath(dest)
        results["published"] = True
    elif keep_failed:
        results["staging"] = staging
    else:
        shutil.rmtree(staging, ignore_errors=True)
    return results
