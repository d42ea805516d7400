#!/usr/bin/env python
"""Per-query optimization harness for the optimization rounds (r12/r13).

Times the named queries under EXACTLY the bench.py protocol (same session
conf, same shuffle-partition rule, warm JVM, min-of-2 noop-sink runs) and
optionally writes `.explain("formatted")` output to plans/r12/<q>_<tag>.txt.

Usage:
  python tools/opt_timer.py [--sf-dir D] [--plans TAG] [--reps N] q1 q2 ...

Prints one JSON line {"canary": s, "queries": {name: sec}} so A/B runs can
be compared canary-normalized.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    plans_tag = None
    reps = 2
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--sf-dir":
            sf_dir = next(it)
        elif a == "--plans":
            plans_tag = next(it)
        elif a == "--reps":
            reps = int(next(it))
        else:
            names.append(a)

    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sp = max(8, min(cpus, round(sf * 160)))

    from mandodb_spark.session import get_spark
    from mandodb_spark.workloads import QUERIES
    from mandodb_spark.workloads import extra_parity

    QUERIES.update(extra_parity.QUERIES)

    import bench

    spark = get_spark("mandodb-opt-timer", shuffle_partitions=sp)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    canary = bench.calibration_canary(spark)

    plans_dir = Path(__file__).resolve().parent.parent / "plans" / "r13"
    if plans_tag:
        plans_dir.mkdir(parents=True, exist_ok=True)

    out: dict[str, float] = {}
    for name in names:
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(cpus if name in bench.ARROW_HEAVY else sp),
        )
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"opt:{name}")
        df = fn(spark, sf_dir)
        if plans_tag:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            (plans_dir / f"{name}_{plans_tag}.txt").write_text(plan)
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"# {name}: {best:.3f}s", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"canary": canary, "queries": out}))


if __name__ == "__main__":
    main()
