#!/usr/bin/env python
"""Dump .explain('formatted') for named queries to plans/r12/<q>_<tag>.txt
without timing them (plan-only companion of opt_timer.py)."""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = sys.argv[1:]
    tag = args[0]
    names = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sp = max(8, min(cpus, round(sf * 160)))

    from mandodb_spark.session import get_spark
    from mandodb_spark.workloads import QUERIES, extra_parity

    QUERIES.update(extra_parity.QUERIES)
    import bench

    spark = get_spark("mandodb-plan-dump", shuffle_partitions=sp)
    plans_dir = Path(__file__).resolve().parent.parent / "plans" / "r12"
    plans_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(cpus if name in bench.ARROW_HEAVY else sp),
        )
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        (plans_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"# wrote {name}_{tag}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()
