#!/usr/bin/env python
"""Measured cross-SF scaling for SCALE.md: time the round-6 heavy
operators at sf0.01 and sf0.1 in ONE session (same protocol as the
round-5 table — calibration canary printed so runs are comparable).

Usage: python tools/cross_sf_timing.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def timed(fn):
    t0 = time.time()
    n = fn()
    return round(time.time() - t0, 2), n


def main() -> None:
    from pyspark.sql import functions as F

    from bench import calibration_canary
    from mandodb_spark.operators.dedup import minhash_lsh_pairs
    from mandodb_spark.operators.graph import k_core, triangle_count
    from mandodb_spark.operators.multimodal import cdc_chunks
    from mandodb_spark.session import get_spark
    from mandodb_spark.sources.text_index import TextIndex
    from mandodb_spark.workloads import extra_parity
    from mandodb_spark.workloads.common import load

    spark = get_spark("cross-sf", master="local[32]", shuffle_partitions=32)
    print(f"canary: {calibration_canary(spark)}")

    results: dict[str, dict[str, float]] = {}

    # warmup pass (not recorded): the first execution of each pipeline
    # pays JIT/codegen compilation — without this the sf0.01 column reads
    # high and ratios come out below 1.0
    for q in ("x_docs_jaccard_join", "x_docs_duplicate_spans",
              "x_docs_bm25", "x_docs_dup_triangles",
              "x_customer_fuzzy_match"):
        extra_parity.QUERIES[q](spark, SFS[0]).count()

    for sf in SFS:
        tag = sf.rsplit("/", 1)[1]
        docs = load(spark, sf, "documents")

        for q in ("x_docs_jaccard_join", "x_docs_duplicate_spans",
                  "x_docs_bm25", "x_docs_dup_triangles",
                  "x_customer_fuzzy_match"):
            dt, n = timed(lambda q=q: extra_parity.QUERIES[q](spark, sf).count())
            results.setdefault(q, {})[tag] = dt
            print(f"{tag} {q}: {dt}s ({n} rows)", flush=True)

        # streaming near-dup gate: the whole corpus in 3 id-ordered
        # batches through a fresh state (probe + in-batch join + state
        # append per batch — the crawl-dedup loop's steady state)
        import shutil

        from mandodb_spark.streaming.neardup import NearDupGate

        gate_root = f"/tmp/xsf_ndgate_{tag}"
        shutil.rmtree(gate_root, ignore_errors=True)
        ids = docs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
        lo, hi = ids[0], ids[1] + 1
        cuts = [lo, lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3, hi]
        gate = NearDupGate(spark, gate_root, threshold=0.8, n_buckets=16)

        def run_gate():
            kept = 0
            for i in range(3):
                b = docs.filter(F.col("doc_id").between(cuts[i], cuts[i + 1] - 1))
                kept += gate.filter_batch(b, "doc_id", "text", batch_id=i).count()
            return kept

        dt, n = timed(run_gate)
        results.setdefault("neardup_gate(3 batches)", {})[tag] = dt
        print(f"{tag} neardup_gate: {dt}s ({n} kept)", flush=True)

        # text-index search (vs the bm25 full scan above): build once per
        # SF (build cost reported), then the pruned search
        idx_root = f"/tmp/xsf_tidx_{tag}"
        import shutil

        shutil.rmtree(idx_root, ignore_errors=True)
        idx = TextIndex(spark, idx_root, n_buckets=16)
        dt_b, _ = timed(lambda: idx.build(docs, "doc_id", "text") or 1)
        idx.search(["spark", "shuffle"], k=5).count()  # warm the search path
        dt, n = timed(lambda: idx.search(
            ["spark", "shuffle", "parquet", "window"], k=25).count())
        results.setdefault("text_index.search", {})[tag] = dt
        results.setdefault("text_index.build", {})[tag] = dt_b
        print(f"{tag} text_index build {dt_b}s / search: {dt}s ({n} rows)", flush=True)

        # k_core over the minhash dup graph (same edge source as the
        # pagerank/triangles workloads); the triangles warmup above
        # already compiled the LSH pipeline
        pairs = minhash_lsh_pairs(docs, "doc_id", "text")
        dt, n = timed(lambda: k_core(pairs, 2, "id_a", "id_b").count())
        results.setdefault("k_core(minhash graph)", {})[tag] = dt
        print(f"{tag} k_core: {dt}s ({n} rows)", flush=True)

        # cdc_chunks over the documents' text bytes
        payloads = docs.select(
            "doc_id", F.encode("text", "UTF-8").alias("payload"))
        dt, n = timed(lambda: cdc_chunks(
            payloads, "doc_id", "payload", avg_size=256).count())
        results.setdefault("cdc_chunks(text bytes)", {})[tag] = dt
        print(f"{tag} cdc_chunks: {dt}s ({n} rows)", flush=True)

        # triangle_count is covered by x_docs_dup_triangles above

    print(f"canary end: {calibration_canary(spark)}")
    print("\n| query | sf0.01 | sf0.1 | 10x-data ratio |")
    print("|---|---|---|---|")
    for q, r in results.items():
        ratio = r["sf0.1"] / r["sf0.01"] if r["sf0.01"] else float("nan")
        print(f"| {q} | {r['sf0.01']}s | {r['sf0.1']}s | {ratio:.1f}x |")


if __name__ == "__main__":
    main()
