"""End-to-end TSDB scenarios — the spine of the reference's test suite
(tsdb_test.go:37-147) re-expressed over the Spark engine.

Fixture mirrors ``genPoints`` (tsdb_test.go:14-35): a grid of
ticks × nodes × dcs × metrics with value == tick index, scaled down
(the reference uses 720×3×24×16; correctness is grid-shape-independent).
"""

from __future__ import annotations

import pytest

from mandodb_spark import TSDB, LabelMatcher

START = 1_700_000_000  # fixture epoch origin
TICKS, NODES, DCS = 240, 3, 4
METRICS = ["cpu.busy", "disk.used", "disk.free", "net.in"]


def gen_points():
    """tsdb_test.go:14-35: one point per (tick, node, dc, metric)."""
    rows = []
    for tick in range(TICKS):
        for node in range(NODES):
            for dc in range(DCS):
                for metric in METRICS:
                    rows.append(
                        (
                            metric,
                            {"node": f"vm{node}", "dc": f"dc{dc}"},
                            START + tick * 60,
                            float(tick),
                        )
                    )
    return rows


@pytest.fixture(scope="module")
def db(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tsdb") / "store")
    db = TSDB(spark, path, segment_duration=7200)
    db.insert_rows(gen_points())
    return db


def test_query_range_exact_points(db):
    """tsdb_test.go:63-82: [start, start+120] at 60s steps → exactly 3 points."""
    out = db.query_range(
        "disk.used",
        [LabelMatcher("node", "vm1"), LabelMatcher("dc", "dc2")],
        START,
        START + 120,
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row["labels"] == {
        "__name__": "disk.used",
        "node": "vm1",
        "dc": "dc2",
    }
    assert [(p["ts"], p["value"]) for p in row["points"]] == [
        (START, 0.0),
        (START + 60, 1.0),
        (START + 120, 2.0),
    ]


def test_query_range_tail_window(db):
    """tsdb_test.go:84-89: the trailing [end-120, end] window → 3 ticks here
    (inclusive bounds, 60s step)."""
    end = START + (TICKS - 1) * 60
    out = db.query_range(
        "cpu.busy", [LabelMatcher("node", "vm0"), LabelMatcher("dc", "dc0")], end - 120, end
    ).collect()
    assert len(out) == 1
    assert [p["value"] for p in out[0]["points"]] == [TICKS - 3.0, TICKS - 2.0, TICKS - 1.0]


def test_query_series_regex_plus_eq(db):
    """tsdb_test.go:92-121: {__name__=~"disk.*", node=vm1, dc=dc0} → the two
    disk metrics' series, discovered via metric-as-label regex."""
    out = db.query_series(
        [
            LabelMatcher("__name__", "disk.*", is_regex=True),
            LabelMatcher("node", "vm1"),
            LabelMatcher("dc", "dc0"),
        ],
        START,
        START + 120,
    ).collect()
    names = sorted(r["labels"]["__name__"] for r in out)
    assert names == ["disk.free", "disk.used"]
    assert all(r["labels"]["node"] == "vm1" and r["labels"]["dc"] == "dc0" for r in out)


def test_query_label_values_sorted(db):
    """tsdb_test.go:123-147: distinct node values, sorted."""
    out = db.query_label_values("node", START, START + TICKS * 60).collect()
    assert [r["value"] for r in out] == ["vm0", "vm1", "vm2"]


def test_time_range_is_inclusive_and_pruned(db):
    """F1/F9: inclusive [start,end]; crossing a segment boundary works."""
    # 7200s segment → tick 120 starts segment 2 of the fixture.
    out = db.query_range_rows(
        "net.in", [LabelMatcher("node", "vm2"), LabelMatcher("dc", "dc3")],
        START + 7140, START + 7260,
    ).collect()
    assert sorted(r["ts"] for r in out) == [START + 7140, START + 7200, START + 7260]


def test_out_of_order_ingest_merged_on_read(db, spark):
    """T2/A5: late rows land in their event-time partition and come back
    time-sorted — the reference's AVL-sidecar merge (series.go:72-94),
    subsumed by sort-on-write + array_sort on read."""
    late = [
        ("oops.metric", {"node": "vmX"}, START + 300, 3.0),
        ("oops.metric", {"node": "vmX"}, START + 60, 1.0),
        ("oops.metric", {"node": "vmX"}, START + 180, 2.0),
    ]
    db.insert_rows(late)
    out = db.query_range("oops.metric", [], START, START + 600).collect()
    assert len(out) == 1
    assert [p["value"] for p in out[0]["points"]] == [1.0, 2.0, 3.0]


def test_retention_drops_old_segments(spark, tmp_path_factory):
    """T5 (tsdb.go:384-406): segments past retention are dropped whole."""
    path = str(tmp_path_factory.mktemp("tsdb") / "ret")
    db = TSDB(spark, path, segment_duration=7200, retention=7 * 86400)
    now = START + 30 * 86400
    old_ts = now - 8 * 86400
    fresh_ts = now - 3600
    db.insert_rows(
        [
            ("m", {"a": "1"}, old_ts, 1.0),
            ("m", {"a": "1"}, fresh_ts, 2.0),
        ]
    )
    dropped = db.remove_expires(now_ts=now)
    assert dropped == [old_ts // 7200]
    remaining = db.query_range_rows("m", [], 0, now).collect()
    assert [r["ts"] for r in remaining] == [fresh_ts]


def test_matcher_sanitation(db):
    """F11 (label.go:305-319): empty and duplicate matchers are dropped;
    first occurrence of a duplicated name wins."""
    out = db.query_range(
        "disk.used",
        [
            LabelMatcher("", "x"),
            LabelMatcher("node", ""),  # empty value → dropped, so node is NOT constrained...
            LabelMatcher("node", "vm1"),  # ...wait: first occurrence wins → the empty one was dropped first
            LabelMatcher("node", "vm2"),  # duplicate → ignored
            LabelMatcher("dc", "dc2"),
        ],
        START,
        START + 60,
    ).collect()
    assert len(out) == 1
    assert out[0]["labels"]["node"] == "vm1"
