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


# --------------------------------------------------- documents / embeddings
def _write_documents(path: str, id_type, len_type, text_type) -> None:
    docs = ["alpha beta beta gamma", "delta alpha", "beta beta beta"]
    table = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), id_type),
            "text": pa.array(docs, text_type),
            "lang": pa.array(["en", "en", "de"]),
            "source": pa.array(["web", "web", "book"]),
            "n_chars": pa.array([len(d) for d in docs], len_type),
        }
    )
    pq.write_table(table, path)


def _write_embeddings(path: str, id_type, vec_value_type, label_type) -> None:
    vecs = [[1.0, 0.0, 2.0, 1.0], [0.5, 1.5, 0.0, 1.0], [2.0, 2.0, 1.0, 0.0]]
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), id_type),
            "embedding": pa.array(vecs, pa.list_(vec_value_type)),
            "label": pa.array([0, 1, 0], label_type),
        }
    )
    pq.write_table(table, path)


def test_documents_queries_survive_physical_type_drift(spark, tmp_path_factory):
    """The documents table's physical types are the generator's to change
    (round-4 lesson generalized): doc_id/n_chars narrowing to int32 and
    text widening to large_string must not change any query's OUTPUT
    values.  Driven through a representative text query end-to-end."""
    from mandodb_spark.workloads.docs import docs_token_stats

    base = tmp_path_factory.mktemp("docs_drift")
    variants = {
        "canonical": (pa.int64(), pa.int64(), pa.string()),
        "narrow_ids": (pa.int32(), pa.int32(), pa.string()),
        "large_text": (pa.int64(), pa.int64(), pa.large_string()),
    }
    results = {}
    for name, (idt, lent, textt) in variants.items():
        d = base / name
        d.mkdir()
        _write_documents(str(d / "documents.parquet"), idt, lent, textt)
        rows = docs_token_stats(spark, str(d)).collect()
        results[name] = sorted(tuple(r) for r in rows)
    assert results["narrow_ids"] == results["canonical"]
    assert results["large_text"] == results["canonical"]


def test_embeddings_queries_survive_physical_type_drift(spark, tmp_path_factory):
    """embedding list<float> widening to list<double> (or ids/labels
    changing width) must not change any query's OUTPUT values — both the
    column-expression path (norm stats) and the Arrow mapInPandas path
    (IVF assignment) are driven."""
    from pyspark.sql import functions as F

    from mandodb_spark.operators.similarity import ivf_assign, ivf_cells
    from mandodb_spark.workloads.common import load
    from mandodb_spark.workloads.embeddings_q import emb_norm_stats

    base = tmp_path_factory.mktemp("emb_drift")
    variants = {
        "canonical": (pa.int64(), pa.float32(), pa.int32()),
        "double_vecs": (pa.int64(), pa.float64(), pa.int32()),
        "narrow_ids": (pa.int32(), pa.float32(), pa.int64()),
    }
    results, assigns = {}, {}
    for name, (idt, vt, lt) in variants.items():
        d = base / name
        d.mkdir()
        _write_embeddings(str(d / "embeddings.parquet"), idt, vt, lt)
        results[name] = sorted(
            tuple(r) for r in emb_norm_stats(spark, str(d)).collect()
        )
        emb = load(spark, str(d), "embeddings")
        cents = ivf_cells(emb, "vec_id", "embedding", 2)
        assigns[name] = sorted(
            (r.vec_id, r.cell)
            for r in ivf_assign(emb, "vec_id", "embedding", cents).collect()
        )
    assert results["double_vecs"] == results["canonical"]
    assert results["narrow_ids"] == results["canonical"]
    assert assigns["double_vecs"] == assigns["canonical"]
    assert assigns["narrow_ids"] == assigns["canonical"]
