#!/usr/bin/env python
"""Third scaling rung for SCALE.md (round 10, verdict item 4): the
cross-SF tables stopped at sf0.1, where "flat" can just mean plan-fixed
cost.  This tool synthesizes an sf1-equivalent rung (10× sf0.1) for the
heavy operators' input tables and times the heavy five at sf0.1 and the
new rung in ONE session (canary-bracketed, min-of-1 after a compile
warmup at sf0.01 — same protocol as cross_sf_timing.py).

Synthesis preserves the workload's character instead of inflating it:

- ``documents`` ×10: each copy remaps doc ids to a disjoint range and
  pushes every character-shingle into a copy-private alphabet via a
  bijective vowel/consonant ``translate`` — within-copy duplicate
  structure (and therefore pair counts, prefix selectivities, LSH bucket
  shapes) is preserved EXACTLY per copy, while cross-copy shingle
  collisions are negligible.  Ground truth: pairs scale ×10, so any
  super-linear runtime is the engine's, not the generator's.
- ``events`` ×10: each copy shifts user_id into a disjoint range —
  series count ×10 at the same per-series sample density, the realistic
  scale-out axis for a TSDB (more series, not denser time).

Usage: python tools/third_rung.py [dest_dir]   (default /tmp/xsf_sf1)
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.01"
COPIES = 10

#: Per-copy bijective character maps: rotations of the high-frequency
#: letter set — virtually every 8-char shingle of natural text contains
#: one, so each copy's shingle space is private.
_ALPHA = "etaoinshr"


def synthesize(spark, dest: str) -> None:
    from pyspark.sql import functions as F

    dest_p = Path(dest)
    if (dest_p / "events.parquet").exists() and (
            dest_p / "documents.parquet").exists():
        print(f"# reusing existing rung at {dest}")
        return
    shutil.rmtree(dest, ignore_errors=True)
    dest_p.mkdir(parents=True)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    max_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    parts = []
    for k in range(COPIES):
        rot = _ALPHA[k % len(_ALPHA):] + _ALPHA[:k % len(_ALPHA)]
        parts.append(docs.select(
            (F.col("doc_id") + F.lit(k * max_doc)).alias("doc_id"),
            (F.translate(F.col("text"), _ALPHA, rot)
             if k else F.col("text")).alias("text"),
            "lang", "source", "n_chars",
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.coalesce(8).write.mode("overwrite").parquet(
        f"{dest}/documents.parquet")

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    max_user = ev.agg(F.max("user_id")).first()[0] + 1
    max_eid = ev.agg(F.max("event_id")).first()[0] + 1
    parts = []
    for k in range(COPIES):
        parts.append(ev.select(
            (F.col("event_id") + F.lit(k * max_eid)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(k * max_user)).alias("user_id"),
            "event_type", "value", "props",
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.coalesce(8).write.mode("overwrite").parquet(f"{dest}/events.parquet")
    print(f"# rung written at {dest}: documents x{COPIES}, events x{COPIES}")


HEAVY = [
    "x_docs_jaccard_join",
    "docs_minhash_pairs",
    "x_promql_native_hist_rate_quantile",
    "tsdb_gapfill",
    "x_docs_dsir_weights",
    "x_docs_dsir_select",
]


def main() -> None:
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xsf_sf1"

    from bench import calibration_canary
    from mandodb_spark.session import get_spark
    from mandodb_spark.workloads import _ALL_QUERIES
    from mandodb_spark.workloads import extra_parity

    queries = dict(_ALL_QUERIES)
    queries.update(extra_parity.QUERIES)

    spark = get_spark("third-rung", master="local[32]",
                      shuffle_partitions=32)
    synthesize(spark, dest)
    print(f"canary: {calibration_canary(spark)}", flush=True)

    # compile warmup (sf0.01): first execution pays JIT/codegen
    for q in HEAVY:
        queries[q](spark, WARM).write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, float]] = {}
    for sf in (SRC, dest):
        tag = "sf0.1" if sf == SRC else "sf1~"
        for q in HEAVY:
            t0 = time.time()
            queries[q](spark, sf).write.format("noop").mode(
                "overwrite").save()
            dt = round(time.time() - t0, 2)
            results.setdefault(q, {})[tag] = dt
            print(f"{tag} {q}: {dt}s", flush=True)

    print(f"canary end: {calibration_canary(spark)}")
    print("\n| query | sf0.1 | sf1~ (10x) | ratio |")
    print("|---|---|---|---|")
    for q, r in results.items():
        ratio = r["sf1~"] / r["sf0.1"] if r["sf0.1"] else float("nan")
        print(f"| {q} | {r['sf0.1']}s | {r['sf1~']}s | {ratio:.1f}x |")


if __name__ == "__main__":
    main()
