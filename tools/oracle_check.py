#!/usr/bin/env python
"""Self-check harness replaying the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables, then compare row count, column names, and values
(order-insensitive; floats to 1e-9 relative).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count differs: spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    s, d = normalize(spark_df), normalize(duck_df)
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(dv.dtype, np.floating):
            sv = pd.to_numeric(s[c]).to_numpy(dtype="float64")
            dv = pd.to_numeric(d[c]).to_numpy(dtype="float64")
            ok = np.allclose(sv, dv, rtol=1e-9, atol=1e-9, equal_nan=True)
        else:
            ok = (pd.isna(sv) == pd.isna(dv)).all() and (
                (sv == dv) | pd.isna(sv)
            ).all()
        if not ok:
            mism = np.where(sv != dv)[0][:3] if sv.dtype == dv.dtype else []
            sample = [(sv[i], dv[i]) for i in mism] if len(mism) else "(dtype mismatch)"
            problems.append(f"values differ in column {c}: sample {sample}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    extra = "--extra" in sys.argv[1:]
    no_record = "--no-record" in sys.argv[1:]
    only = [a for a in sys.argv[1:]
            if "/" not in a and a not in ("--extra", "--no-record")]

    import __spark_entry__ as entry_mod
    from mandodb_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duck_con(sf_dir)
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    if extra:
        # second-tier registry: post-cap operators, same comparison, not
        # part of the 150-query driver contract (see workloads/extra_parity)
        from mandodb_spark.workloads import extra_parity

        qs = {**qs, **extra_parity.QUERIES}
        oracles = {**oracles, **extra_parity.ORACLES}
    names = [n for n in qs if not only or n in only]

    n_pass = n_fail = 0
    passed: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(sdf)})")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        dt = time.time() - t0
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({len(sdf)} rows, {dt:.1f}s)")
            for p in problems:
                print(f"     {p}")
        else:
            n_pass += 1
            passed.append(name)
            print(f"PASS {name} ({len(sdf)} rows, {dt:.1f}s)")
    print(f"\n{n_pass} pass / {n_fail} fail / {len(names)} total")
    # Ledger stamping is evidence of a FULL extra-tier sweep: partial runs
    # (an explicit query list) and --no-record verification runs must be
    # side-effect-free (round-11 verdict #7 — judge spot-checks were
    # mutating EXTRA_LEDGER.json).
    if not no_record and not only:
        _record_extra_passes(passed, sf_dir)
    return 1 if n_fail else 0


def _record_extra_passes(passed: list[str], sf_dir: str) -> None:
    """Extra-tier staleness ledger (round-7 verdict #8): every PASS of an
    extra_parity query is recorded as ``{query: {sf_label: round}}`` in
    EXTRA_LEDGER.json, and ``tests/test_rotation.py`` fails the suite
    when any extra's newest recorded pass at either SF is older than the
    rotation cycle — the second tier gets the same staleness discipline
    the 150-query driver registry has, with this ledger standing in for
    the driver's CORRECTNESS files."""
    import json

    from mandodb_spark.workloads import extra_parity, rotation

    extra_names = [n for n in passed if n in extra_parity.QUERIES]
    if not extra_names:
        return
    root = Path(__file__).resolve().parent.parent
    ledger_path = root / "EXTRA_LEDGER.json"
    ledger = (json.loads(ledger_path.read_text())
              if ledger_path.exists() else {})
    rnd = rotation.current_round(root)
    sf_label = Path(sf_dir).name
    for n in extra_names:
        ledger.setdefault(n, {})[sf_label] = rnd
    ledger_path.write_text(json.dumps(ledger, indent=0, sort_keys=True) + "\n")
    print(f"recorded {len(extra_names)} extra-tier passes at {sf_label} "
          f"(round {rnd}) in EXTRA_LEDGER.json")


if __name__ == "__main__":
    sys.exit(main())
