#!/usr/bin/env python
"""Core-scaling rung for SCALE.md (round 13, verdict item 8): the sf0.1
bench's 8-vs-32-core ratios are all <=1.0 because the corpus (~100 MB) is
per-task-overhead-dominated — the scaling block says nothing about
parallelism posture.  This tool times the verdict's top-5 queries at the
sf1-equivalent rung (10x sf0.1, where the data term dominates) under
local[8] and local[32] in SEPARATE subprocesses (own JVM each, the same
isolation the grading driver uses for its c8 run), so the ratio measures
executor parallelism, not shared-JVM warmth.

Synthesis reuses tools/third_rung.py for documents x10 / events x10 and
adds customer x10 for the fuzzy query: each copy shifts c_custkey into a
disjoint range and REGENERATES c_name from the shifted key (TPC-H's
'Customer#%09d' format), so per-copy edit-distance structure is preserved
exactly while cross-copy name collisions are impossible (names encode the
disjoint key ranges) — matches scale x10 by construction.  The remaining
sf0.1 tables are copied as-is (the five queries only read documents,
events and customer, but load() must find the full star schema).

Usage:
  python tools/core_rung.py [dest_dir]          # synthesize + both runs
  python tools/core_rung.py --timed-run DEST    # internal: one timing run
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.01"
COPIES = 10

TOP5 = [
    "docs_minhash_pairs",
    "x_promql_native_hist_rate_quantile",
    "x_docs_jaccard_join",
    "x_customer_fuzzy_match",
    "docs_curation_full",
]


def synthesize(dest: str) -> None:
    from pyspark.sql import functions as F

    import third_rung
    from mandodb_spark.session import get_spark

    spark = get_spark("core-rung-synth", master="local[32]",
                      shuffle_partitions=32)
    third_rung.synthesize(spark, dest)  # documents x10, events x10 (cached)

    dest_p = Path(dest)
    if not (dest_p / "customer.parquet").exists():
        cust = spark.read.parquet(f"{SRC}/customer.parquet")
        max_key = cust.agg(F.max("c_custkey")).first()[0] + 1
        parts = []
        for k in range(COPIES):
            shifted = (F.col("c_custkey") + F.lit(k * max_key)).alias("c_custkey")
            parts.append(cust.select(
                shifted,
                F.concat(F.lit("Customer#"),
                         F.lpad((F.col("c_custkey") + F.lit(k * max_key))
                                .cast("string"), 9, "0")).alias("c_name"),
                "c_nationkey", "c_acctbal", "c_mktsegment",
            ))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.coalesce(8).write.mode("overwrite").parquet(
            f"{dest}/customer.parquet")
        print(f"# customer x{COPIES} written", flush=True)
    # the rest of the star schema: copy once so load() finds every table
    for f in Path(SRC).glob("*.parquet"):
        tgt = dest_p / f.name
        if not tgt.exists():
            shutil.copytree(f, tgt) if f.is_dir() else shutil.copy2(f, tgt)
    spark.stop()


def timed_run(dest: str) -> None:
    """One warm-JVM pass over TOP5 at the rung — run in a subprocess with
    SPARK_GRAFT_CPUS set by the parent.  Prints one JSON line."""
    from bench import calibration_canary
    from mandodb_spark.session import get_spark
    from mandodb_spark.workloads import QUERIES
    from mandodb_spark.workloads import extra_parity

    queries = dict(QUERIES)
    queries.update(extra_parity.QUERIES)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("core-rung", shuffle_partitions=cpus)
    c0 = calibration_canary(spark)
    for q in TOP5:  # compile warmup at sf0.01 (JIT/codegen, not data)
        queries[q](spark, WARM).write.format("noop").mode("overwrite").save()
    out = {}
    for q in TOP5:
        t0 = time.time()
        queries[q](spark, dest).write.format("noop").mode("overwrite").save()
        out[q] = round(time.time() - t0, 2)
        print(f"# c{cpus} {q}: {out[q]}s", file=sys.stderr, flush=True)
    print(json.dumps({"cpus": cpus, "canary_start": c0,
                      "canary_end": calibration_canary(spark),
                      "queries": out}), flush=True)


def main() -> None:
    if "--timed-run" in sys.argv:
        timed_run(sys.argv[sys.argv.index("--timed-run") + 1])
        return
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xsf_sf1"
    synthesize(dest)
    rows = {}
    for cpus in (32, 8, 32):  # 32 twice brackets the 8-core run for drift
        env = {**os.environ, "SPARK_GRAFT_CPUS": str(cpus)}
        out = subprocess.run(
            [sys.executable, __file__, "--timed-run", dest],
            capture_output=True, text=True, timeout=3600, env=env)
        sys.stderr.write(out.stderr[-2000:])
        payload = json.loads(out.stdout.strip().splitlines()[-1])
        rows.setdefault(cpus, []).append(payload)
        print(f"# done c{cpus}: {payload}", flush=True)
    print("\n| query | c8 | c32 (min of 2) | ratio c8/c32 |")
    print("|---|---|---|---|")
    for q in TOP5:
        c8 = rows[8][0]["queries"][q]
        c32 = min(r["queries"][q] for r in rows[32])
        print(f"| {q} | {c8}s | {c32}s | {c8 / c32:.2f}x |")


if __name__ == "__main__":
    main()
