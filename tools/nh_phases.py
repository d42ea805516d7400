#!/usr/bin/env python
"""Phase-split timing for the native-histogram grid queries: isolates the
_nh_daily_rel build (observe+accumulate+localCheckpoint) from the grid
evaluation so the optimization round targets the real cost center."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


RESULTS: list[str] = []


def t(label, fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    RESULTS.append(f"{label}: {best:.3f}s")
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    from mandodb_spark.session import get_spark
    from mandodb_spark.workloads.extra_parity import _nh_daily_rel
    from mandodb_spark.workloads.common import EV_END, EV_START
    from mandodb_spark.functions import native_hist as nh
    import bench

    spark = get_spark("nh-phases", shuffle_partitions=16)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    RESULTS.append(f"canary: {bench.calibration_canary(spark):.3f}")

    # phase 1: the hist_rel build (localCheckpoint is eager => timed here)
    t("build keep_k=False (rate_quantile)", lambda: _nh_daily_rel(spark, sf_dir, keep_k=False))
    t("build keep_k=True (range_count)", lambda: _nh_daily_rel(spark, sf_dir, keep_k=True))

    rel = _nh_daily_rel(spark, sf_dir, keep_k=False)
    g0 = EV_START + 3 * 86_400
    t("grid_hist_rate over built rel", lambda: noop(
        nh.grid_hist_rate(rel, g0, EV_END, 3 * 86_400, 86_400, "rate")))
    gr = nh.grid_hist_rate(rel, g0, EV_END, 3 * 86_400, 86_400, "rate")
    t("quantile over grid_hist_rate", lambda: noop(
        nh.hist_quantile(nh.grid_hist_rate(rel, g0, EV_END, 3 * 86_400, 86_400, "rate"), 0.5)))

    # full query for reference
    from mandodb_spark.workloads import QUERIES
    from mandodb_spark.workloads import extra_parity
    QUERIES.update(extra_parity.QUERIES)
    t("FULL x_promql_native_hist_rate_quantile", lambda: noop(
        QUERIES["x_promql_native_hist_rate_quantile"](spark, sf_dir)))

    import sys as _sys
    for line in RESULTS:
        print(f"## {line}", file=_sys.stderr, flush=True)


if __name__ == "__main__":
    main()
