#!/usr/bin/env python
"""Headline benchmark: run the declared queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is fully executed (collected to the driver via a count over the
materialized result — write-discard shape) and timed individually; the
headline value is the total wall time of the suite.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

#: The headline subset — one per operator family, heaviest variants.
HEADLINE = [
    "tsdb_range_rows",
    "tsdb_series_agg",
    "tsdb_bucket_stats",
    "tsdb_latest_point",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "docs_token_stats",
    "docs_simhash",
    "docs_minhash_pairs",
    "emb_cosine_topk",
    "emb_neardup_pairs",
    "events_sessionize",
    "events_hourly",
    "events_asof_click",
    "mm_binary_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)

    from mandodb_spark.session import get_spark
    from mandodb_spark.workloads import QUERIES

    spark = get_spark("mandodb-spark-bench")

    # Warm the JVM + file listing once so per-query times measure the plan,
    # not session bootstrap.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = QUERIES[name]
        best, n = None, 0
        for _ in range(2):  # min-of-2: second run measures the plan, not JIT/worker spin-up
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.2f}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
