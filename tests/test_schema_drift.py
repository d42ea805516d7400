"""Schema-drift contract for the events loaders.

Round 4 proved physical-type drift in the driver's testdata is a real
failure mode: ``events.ts`` silently changed from parquet TIMESTAMP(NANOS)
(read as int64 nanoseconds under ``nanosAsLong``) to ``timestamp[us]``
(TIMESTAMP_NTZ), and every events query died at analysis time.  These
tests pin the contract that ``events_base`` / ``events_relation``
normalize BOTH physical encodings to identical unix seconds, and that the
time-range predicate still reaches the Parquet scan as a PushedFilters
entry in both cases.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mandodb_spark.plans import formatted_plan
from mandodb_spark.workloads.common import events_base, events_relation

# Three points: inside the window, at the window edge, outside it.
SECONDS = [1_704_412_900, 1_704_499_200, 1_705_276_800]
START, END = 1_704_412_800, 1_705_276_799  # [start, end] inclusive seconds


def _write_events(path: str, ts_array: pa.Array) -> str:
    n = len(ts_array)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["purchase"] * n),
            "value": pa.array([1.5] * n, pa.float64()),
            "props": pa.array(["k=42"] * n),
        }
    )
    pq.write_table(table, path)
    return path


@pytest.fixture(scope="module")
def fixture_dirs(tmp_path_factory):
    """One directory per physical ts encoding the generator has used or
    could drift to: timestamp[us] (round 4+), timestamp[ns] (rounds 1-3,
    read as int64-ns under nanosAsLong), raw int64 microseconds, and raw
    int64 seconds (the last two unit-sniffed from footer stats)."""
    base = tmp_path_factory.mktemp("schema_drift")
    encodings = {
        "micros": pa.array([s * 1_000_000 for s in SECONDS], pa.timestamp("us")),
        "nanos": pa.array([s * 1_000_000_000 for s in SECONDS], pa.timestamp("ns")),
        "int_micros": pa.array([s * 1_000_000 for s in SECONDS], pa.int64()),
        "int_seconds": pa.array(SECONDS, pa.int64()),
    }
    dirs = []
    for name, arr in encodings.items():
        d = base / name
        d.mkdir()
        _write_events(str(d / "events.parquet"), arr)
        dirs.append(str(d))
    return tuple(dirs)


def test_events_base_normalizes_both_encodings(spark, fixture_dirs):
    for d in fixture_dirs:
        df = events_base(spark, d)
        assert dict(df.dtypes)["ts"] == "bigint"
        assert sorted(r.ts for r in df.select("ts").collect()) == SECONDS


def test_events_relation_window_identical_across_encodings(spark, fixture_dirs):
    results = []
    for d in fixture_dirs:
        rel = events_relation(spark, d, START, END)
        rows = sorted(
            (r.ts, r.value, tuple(sorted(r.labels.items()))) for r in rel.collect()
        )
        results.append(rows)
    assert all(r == results[0] for r in results[1:])
    # the third point (== END+1 second) is excluded by the inclusive window
    assert [ts for ts, _, _ in results[0]] == SECONDS[:2]


def test_time_range_pushdown_survives_both_encodings(spark, fixture_dirs):
    for d in fixture_dirs:
        plan = formatted_plan(events_relation(spark, d, START, END))
        pushed = plan.split("PushedFilters", 1)[1][:400]
        assert "GreaterThanOrEqual(ts," in pushed
        assert "LessThanOrEqual(ts," in pushed or "LessThan(ts," in pushed


def test_load_restores_nanos_timestamp_columns(spark, tmp_path):
    """The generalized drift defense: a TIMESTAMP(NANOS) parquet column —
    which the pinned ``nanosAsLong`` conf makes Spark surface as a BIGINT
    of nanoseconds — comes out of ``load()`` as a real timestamp, so date
    expressions (the TPC-H filters) survive the same drift that broke the
    events queries in round 4.  Raw int64 columns are left untouched."""
    from mandodb_spark.workloads.common import load

    ds = ["1995-03-04", "1996-07-01", "1998-09-02"]
    epochs_us = [pa.array(ds, pa.string()).cast(pa.timestamp("us")), ]
    for unit in ("us", "ns"):
        d = tmp_path / f"orders_{unit}"
        d.mkdir()
        table = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_orderdate": epochs_us[0].cast(pa.timestamp(unit)),
            }
        )
        pq.write_table(table, str(d / "orders.parquet"))
        df = load(spark, str(d), "orders")
        dtype = dict(df.dtypes)["o_orderdate"]
        assert dtype.startswith("timestamp"), (unit, dtype)
        got = sorted(
            str(r[0]) for r in df.selectExpr("to_date(o_orderdate)").collect()
        )
        assert got == ds, (unit, got)
        assert dict(df.dtypes)["o_orderkey"] == "bigint"


def test_all_testdata_tables_load_and_normalize(spark):
    """Tripwire for driver testdata regeneration (the round-4 failure
    mode): every table loads through the adaptive loader, and the columns
    the workloads depend on surface with the LOGICAL types the queries
    assume — regardless of the physical parquet encoding du jour."""
    from mandodb_spark.workloads.common import events_base, load

    sf = "/root/testdata/sf0.001"
    INT = ("tinyint", "smallint", "int", "bigint")
    expectations = {
        "region": {"r_regionkey": INT},
        "nation": {"n_nationkey": INT},
        "customer": {"c_custkey": INT},
        "supplier": {"s_suppkey": INT},
        "part": {"p_partkey": INT},
        "orders": {"o_orderkey": INT},
        "lineitem": {"l_orderkey": INT, "l_quantity": ("double", "float")},
        "documents": {"doc_id": INT, "text": ("string",), "source": ("string",)},
        "embeddings": {"vec_id": INT, "embedding": ("array<float>", "array<double>")},
    }
    for table, cols in expectations.items():
        df = load(spark, sf, table)
        dtypes = dict(df.dtypes)
        for c, allowed in cols.items():
            assert dtypes.get(c) in allowed, f"{table}.{c}: {dtypes.get(c)!r} not in {allowed}"
        assert df.limit(1).count() == 1, f"{table} is empty"
    # timestamp-bearing tables normalize to usable temporal types
    li = dict(load(spark, sf, "lineitem").dtypes)
    assert li["l_shipdate"].startswith("timestamp"), li["l_shipdate"]
    ev = events_base(spark, sf)
    assert dict(ev.dtypes)["ts"] == "bigint"
    lo, hi = ev.selectExpr("min(ts)", "max(ts)").first()
    # unix SECONDS (1973..5138 band), not millis/micros/nanos
    assert 1e8 < lo <= hi < 1e11, (lo, hi)
