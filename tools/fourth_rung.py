#!/usr/bin/env python
"""Fourth scaling rung for SCALE.md (round 11, verdict item 7): the third
rung showed ``docs_minhash_pairs`` at 2.3× for 10× data with the note
"the constant dominates until ~10⁶ docs".  This tool synthesizes a
≥10⁶-document rung (200× sf0.1's 5,000 docs → 1,000,000) for MINHASH
ALONE and times ``docs_minhash_pairs`` at sf0.1, the 10× rung and the
200× rung in one session, to confirm the data term stays linear past the
constant-dominated crossover.

Synthesis extends the third rung's copy-private-alphabet idea to 200
copies: one 9-letter rotation gives only 9 distinct bijections, so 200
copies would collide (copies sharing a rotation carry IDENTICAL text —
cross-copy exact duplicates that would inflate the pair count ~22×).
Three INDEPENDENT rotation factors over disjoint high-frequency letter
sets (9×7×6 = 378 ≥ 200 combinations) compose into a copy-private
bijection: virtually every 8-char shingle of natural text contains a
letter from each set, so within-copy duplicate structure (and the pair
ground truth) is preserved exactly per copy while cross-copy shingle
collisions stay negligible — pairs scale ×200 by construction.

Usage: python tools/fourth_rung.py [dest_dir]  (default /tmp/xsf_minhash)
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.01"
COPIES = 200

#: Disjoint high-frequency letter sets; per-copy rotation amounts are the
#: mixed-radix digits of the copy index, so every copy gets a distinct
#: composed bijection.
_SETS = ("etaoinshr", "dlcumwf", "gypbvk")


def _copy_map(k: int) -> tuple[str, str]:
    """The composed bijective translate (src, dst) for copy ``k``."""
    src = "".join(_SETS)
    dst = []
    for s in _SETS:
        r = k % len(s)
        k //= len(s)
        dst.append(s[r:] + s[:r])
    return src, "".join(dst)


def synthesize(spark, dest: str) -> None:
    from pyspark.sql import functions as F

    dest_p = Path(dest)
    if (dest_p / "documents.parquet").exists():
        print(f"# reusing existing rung at {dest}")
        return
    shutil.rmtree(dest, ignore_errors=True)
    dest_p.mkdir(parents=True)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    max_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    parts = []
    for k in range(COPIES):
        src, dst = _copy_map(k)
        parts.append(docs.select(
            (F.col("doc_id") + F.lit(k * max_doc)).alias("doc_id"),
            (F.translate(F.col("text"), src, dst)
             if k else F.col("text")).alias("text"),
            "lang", "source", "n_chars",
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{dest}/documents.parquet")
    n = spark.read.parquet(f"{dest}/documents.parquet").count()
    print(f"# rung written at {dest}: {n} documents ({COPIES}x)")


def main() -> None:
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xsf_minhash"
    third = "/tmp/xsf_sf1"  # reuse the 10x rung when present

    from bench import calibration_canary
    from mandodb_spark.workloads import _ALL_QUERIES
    from mandodb_spark.session import get_spark

    q = _ALL_QUERIES["docs_minhash_pairs"]
    spark = get_spark("fourth-rung", master="local[32]",
                      shuffle_partitions=32)
    synthesize(spark, dest)
    print(f"canary: {calibration_canary(spark)}", flush=True)

    q(spark, WARM).write.format("noop").mode("overwrite").save()  # JIT

    rungs = [("sf0.1", SRC)]
    if Path(f"{third}/documents.parquet").exists():
        rungs.append(("sf1~ (10x)", third))
    rungs.append(("200x", dest))
    results = {}
    for tag, sf in rungs:
        t0 = time.time()
        n = q(spark, sf).count()
        dt = round(time.time() - t0, 2)
        results[tag] = (dt, n)
        print(f"{tag}: {dt}s, {n} pairs", flush=True)

    print(f"canary end: {calibration_canary(spark)}")
    base_t, base_n = results["sf0.1"]
    print("\n| rung | docs | seconds | pairs | time ratio | pair ratio |")
    print("|---|---|---|---|---|---|")
    mult = {"sf0.1": 1, "sf1~ (10x)": 10, "200x": COPIES}
    for tag, (dt, n) in results.items():
        print(f"| {tag} | {5000 * mult[tag]} | {dt}s | {n} | "
              f"{dt / base_t:.1f}x | {n / base_n:.1f}x |")


if __name__ == "__main__":
    main()
