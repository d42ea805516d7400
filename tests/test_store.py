"""Storage-layer tests: compaction, stats, and the A1 partial/final merge
invariant (property-style, mirroring tsdb.go:295-321)."""

from __future__ import annotations

import random
from pathlib import Path

from mandodb_spark import TSDB, LabelMatcher, ROW_SCHEMA

START = 1_700_000_000


def test_compaction_preserves_results_and_reduces_files(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("store") / "c")
    db = TSDB(spark, path)
    # three separate appends into the same segments → multiple files/partition
    for batch in range(3):
        db.insert_rows(
            [("m", {"b": str(i % 2)}, START + batch * 50 + i, float(i)) for i in range(40)]
        )
    before = len(list(Path(path).glob("seg=*/*.parquet")))
    res_before = db.query_range_rows("m", [], 0, 10**10).orderBy("ts", "value").collect()
    db.compact()
    after = len(list(Path(path).glob("seg=*/*.parquet")))
    res_after = db.query_range_rows("m", [], 0, 10**10).orderBy("ts", "value").collect()
    assert after < before
    assert [(r.ts, r.value) for r in res_before] == [(r.ts, r.value) for r in res_after]


def test_segment_stats(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("store") / "s")
    db = TSDB(spark, path)
    db.insert_rows(
        [("m", {"x": "1"}, START, 1.0), ("m", {"x": "2"}, START + 10, 2.0),
         ("m", {"x": "1"}, START + 7200, 3.0)]
    )
    stats = db.store.stats().collect()
    assert [(r.seg, r.series_count, r.data_points_count) for r in stats] == [
        (START // 7200, 2, 2),
        (START // 7200 + 1, 1, 1),
    ]
    assert stats[0].min_ts == START and stats[0].max_ts == START + 10


def test_partial_final_merge_invariant(spark, tmp_path_factory):
    """A1 property (tsdb.go:295-321): querying data ingested as many random
    batches equals querying the same rows ingested as one batch — Spark's
    partial/final aggregation must make segmentation invisible."""
    rng = random.Random(42)
    rows = [
        (
            rng.choice(["cpu", "mem"]),
            {"node": f"vm{rng.randrange(3)}"},
            START + rng.randrange(0, 30_000),
            round(rng.random() * 100, 3),
        )
        for _ in range(500)
    ]
    base = tmp_path_factory.mktemp("merge")
    whole = TSDB(spark, str(base / "whole"))
    split = TSDB(spark, str(base / "split"))
    whole.insert_rows(rows)
    # random partition into 5 batches
    batches = [[] for _ in range(5)]
    for r in rows:
        batches[rng.randrange(5)].append(r)
    for b in batches:
        if b:
            split.insert_rows(b)

    args = ("cpu", [LabelMatcher("node", "vm1")], START, START + 30_000)
    a = whole.query_range(*args).collect()
    b = split.query_range(*args).collect()
    key = lambda r: sorted(r.labels.items())
    a.sort(key=key)
    b.sort(key=key)
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert ra.labels == rb.labels
        assert [(p.ts, p.value) for p in ra.points] == [(p.ts, p.value) for p in rb.points]


def test_compact_while_reader_requeries(spark, tmp_path_factory):
    """Read-during-compact story (VERDICT r2 #8): a reader holding a
    DataFrame over the store re-queries across a compaction and gets
    identical results — the staging-dir + rename-aside swap never exposes
    a partially rewritten partition (the Parquet analogue of the
    reference's atomic segment swap, tsdb.go:242-265)."""
    path = str(tmp_path_factory.mktemp("store") / "swap")
    db = TSDB(spark, path)
    for batch in range(3):
        db.insert_rows(
            [("m", {"b": str(i % 2)}, START + batch * 50 + i, float(i)) for i in range(40)]
        )
    reader = db.query_range_rows("m", [], 0, 10**10).orderBy("ts", "value")
    before = [(r.ts, r.value) for r in reader.collect()]
    db.compact()
    # same lazy DataFrame, re-executed after the swap: re-lists the (new)
    # root and must see the same logical content
    after = [(r.ts, r.value) for r in reader.collect()]
    assert before == after
    # the crash-recovery artifacts are gone: no __old / __compact siblings
    assert not Path(f"{path}__old").exists() and not Path(f"{path}__compact").exists()


def test_compact_before_any_append_is_noop(spark, tmp_path_factory):
    """compact() on a never-written store must not raise (ADVICE r2: the
    bucketed variant rmtree'd an absent root)."""
    from mandodb_spark.sources.segment_store import BucketedSegmentStore, SegmentStore

    base = tmp_path_factory.mktemp("empty")
    SegmentStore(spark, str(base / "plain")).compact()
    BucketedSegmentStore(
        spark, str(base / "bucketed"), table="compact_noop_t"
    ).compact()


def test_incremental_rollup_rejects_incompatible_step(spark, tmp_path_factory):
    """materialize_rollup(incremental=True) must fail loudly when step and
    segment_duration are not divide-compatible (ADVICE r2: silent
    divergence from a full rebuild otherwise)."""
    import pytest

    path = tmp_path_factory.mktemp("rollup")
    db = TSDB(spark, str(path / "store"))
    db.insert_rows([("m", {"x": "1"}, START, 1.0)])
    with pytest.raises(ValueError, match="divide-compatible"):
        db.materialize_rollup(str(path / "r"), step=5000, incremental=True)
    # compatible steps still work both ways
    db.materialize_rollup(str(path / "r2"), step=3600, incremental=True)
    db.materialize_rollup(str(path / "r3"), step=14400, incremental=True)


# ------------------------------------------------------- duplicate policies
def test_default_policy_is_multiset(spark, tmp_path_factory):
    """The engine's documented default (SURVEY §7.4): re-sends accumulate."""
    path = str(tmp_path_factory.mktemp("store") / "ms")
    db = TSDB(spark, path)
    db.insert_rows([("m", {"x": "1"}, START, 1.0), ("m", {"x": "1"}, START, 2.0)])
    db.insert_rows([("m", {"x": "1"}, START, 3.0)])
    vals = sorted(r.value for r in db.query_range_rows("m", [], 0, 10**10).collect())
    assert vals == [1.0, 2.0, 3.0]


def test_dedup_points_last_write_wins_within_batch(spark, tmp_path_factory):
    """Opt-in dedup (reference series.go:24-27 / tsdb.go:91-97): one point
    per (series, ts); within a batch the LAST row by input order wins."""
    path = str(tmp_path_factory.mktemp("store") / "dd")
    db = TSDB(spark, path)
    db.insert_rows(
        [
            ("m", {"x": "1"}, START, 1.0),
            ("m", {"x": "1"}, START, 2.0),   # re-send, later in input order
            ("m", {"x": "1"}, START + 1, 5.0),
            ("m", {"x": "2"}, START, 7.0),   # different series, untouched
        ],
        dedup_points=True,
    )
    rows = {
        (r.labels["x"], r.ts): r.value
        for r in db.query_range_rows("m", [], 0, 10**10).collect()
    }
    assert rows == {("1", START): 2.0, ("1", START + 1): 5.0, ("2", START): 7.0}


def test_dedup_against_store_first_write_wins_across_batches(spark, tmp_path_factory):
    """Cross-batch mode: a (series, ts) already stored rejects the re-send —
    the net effect of the reference's TSZ ts<=maxTs drop."""
    path = str(tmp_path_factory.mktemp("store") / "xb")
    db = TSDB(spark, path)
    db.insert_rows([("m", {"x": "1"}, START, 1.0)])
    db.insert_rows(
        [("m", {"x": "1"}, START, 99.0), ("m", {"x": "1"}, START + 1, 2.0)],
        dedup_points=True,
        dedup_against_store=True,
    )
    rows = {(r.ts): r.value for r in db.query_range_rows("m", [], 0, 10**10).collect()}
    assert rows == {START: 1.0, START + 1: 2.0}


def test_dedup_policies_memory_store(spark):
    """The memory store honors the same policy surface (T6 parity)."""
    db = TSDB(spark, None, only_memory=True)
    db.insert_rows(
        [("m", {"x": "1"}, START, 1.0), ("m", {"x": "1"}, START, 2.0)],
        dedup_points=True,
    )
    db.insert_rows(
        [("m", {"x": "1"}, START, 50.0)], dedup_points=True, dedup_against_store=True
    )
    rows = [(r.ts, r.value) for r in db.query_range_rows("m", [], 0, 10**10).collect()]
    assert rows == [(START, 2.0)]
    db.store.close()


# ---------------------------------------------------- hot-segment write split
def test_max_rows_per_segment_fans_out_hot_segment(spark, tmp_path_factory):
    """A pathological hot window must not serialize into one writer task /
    one unsplittable file (reference WithMaxRowsPerSegment, tsdb.go:99-105):
    with a row budget the segment's batch lands as multiple sorted files,
    query results unchanged."""
    from mandodb_spark.sources.segment_store import SegmentStore

    path = str(tmp_path_factory.mktemp("store") / "hot")
    store = SegmentStore(spark, path, max_rows_per_segment=100)
    rows = [
        ("m", {"x": str(i % 7)}, START + (i % 3600), float(i)) for i in range(400)
    ]
    store.insert_pylist(rows)
    seg_dirs = list(Path(path).glob("seg=*"))
    assert len(seg_dirs) == 1  # all rows in one hot 2h segment
    files = list(seg_dirs[0].glob("*.parquet"))
    assert len(files) >= 4  # ceil(400/100) writer tasks
    got = sorted(r.value for r in store.relation().collect())
    assert got == sorted(float(i) for i in range(400))
    # a cold batch under the budget keeps the one-file-per-batch invariant
    store.insert_pylist([("m", {"x": "1"}, START + 7200 + i, 0.0) for i in range(10)])
    cold = list(Path(path).glob(f"seg={START // 7200 + 1}/*.parquet"))
    assert len(cold) == 1

    # same option through the TSDB facade (WithMaxRowsPerSegment parity)
    fpath = str(Path(path).parent / "hot_facade")
    db = TSDB(spark, fpath, max_rows_per_segment=100)
    db.insert_rows(rows)
    ffiles = list(Path(fpath).glob("seg=*/*.parquet"))
    assert len(ffiles) >= 4
    assert db.query_range_rows("m", [], 0, 10**12).count() == 400


def test_dedup_policies_bucketed_store(spark, tmp_path_factory):
    """The bucketed store honors the same duplicate-policy surface."""
    from mandodb_spark.sources.segment_store import BucketedSegmentStore

    path = str(tmp_path_factory.mktemp("store") / "bdd")
    store = BucketedSegmentStore(spark, path, table="t_bucket_dedup", n_buckets=2)
    try:
        rows = spark.createDataFrame(
            [("m", {"x": "1"}, START, 1.0), ("m", {"x": "1"}, START, 2.0)],
            "metric string, labels map<string,string>, ts long, value double",
        )
        store.append(rows, dedup_points=True)
        resend = spark.createDataFrame(
            [("m", {"x": "1"}, START, 9.0), ("m", {"x": "1"}, START + 1, 3.0)],
            "metric string, labels map<string,string>, ts long, value double",
        )
        store.append(resend, dedup_points=True, dedup_against_store=True)
        got = sorted((r.ts, r.value) for r in store.relation().collect())
        assert got == [(START, 2.0), (START + 1, 3.0)]
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucket_dedup")


def test_swap_in_atomic_exchange_and_fallback(tmp_path, monkeypatch):
    """swap_in's primary path is one renameat2(RENAME_EXCHANGE) syscall —
    no instant with a missing root (a concurrent lister can never hit
    FileNotFound); the two-rename fallback must produce the identical end
    state when the syscall is unavailable (non-Linux / old kernel)."""
    from mandodb_spark.sources import segment_store as ss

    def build(tag):
        root = tmp_path / f"root_{tag}"
        staging = tmp_path / f"root_{tag}__compact"
        root.mkdir(), staging.mkdir()
        (root / "data.txt").write_text("old")
        (staging / "data.txt").write_text("new")
        return str(root), str(staging)

    # primary (atomic exchange) path — only asserted where the kernel has it
    root, staging = build("atomic")
    if ss._renameat2_exchange(root, staging):
        # undo the probe exchange, then run the real swap
        assert ss._renameat2_exchange(root, staging)
        ss.swap_in(root, staging)
        assert (Path(root) / "data.txt").read_text() == "new"
        assert not Path(staging).exists() and not Path(f"{root}__old").exists()

    # forced fallback path: same observable end state
    monkeypatch.setattr(ss, "_renameat2_exchange", lambda a, b: False)
    root, staging = build("fallback")
    ss.swap_in(root, staging)
    assert (Path(root) / "data.txt").read_text() == "new"
    assert not Path(staging).exists() and not Path(f"{root}__old").exists()


def test_fsck_clean_corrupt_and_orphan_detection(spark, tmp_path_factory):
    """fsck mirrors the reference's loadFiles startup validation
    (tsdb.go:408-463) over the Parquet layout: footer-only (no data pages),
    flags truncated files, leftover swap dirs, and out-of-bounds ts stats."""
    from mandodb_spark.sources.segment_store import SegmentStore, fsck

    path = str(tmp_path_factory.mktemp("store") / "f")
    store = SegmentStore(spark, path)
    store.insert_pylist(
        [("m", {"x": str(i % 3)}, START + i * 1800, float(i)) for i in range(12)]
    )
    rep = fsck(path)
    assert rep["ok"] and not rep["corrupt"] and not rep["orphans"]
    assert sum(s["rows"] for s in rep["segments"]) == 12
    assert all(not s["out_of_bounds"] for s in rep["segments"])

    # truncate one file -> corrupt; plant a stale __compact dir -> orphan
    victim = next(Path(path).glob("seg=*/*.parquet"))
    victim.write_bytes(victim.read_bytes()[: victim.stat().st_size // 2])
    (Path(f"{path}__compact")).mkdir()
    rep2 = fsck(path)
    assert not rep2["ok"]
    assert [str(victim)] == rep2["corrupt"]
    assert rep2["orphans"] == [f"{path}__compact"]


def test_snapshot_is_instant_frozen_and_fsck_clean(spark, tmp_path_factory):
    """Hardlink snapshot: zero-copy, reads identically, stays frozen while
    the live store compacts and expires segments, and fsck passes on both
    trees.  Restore = snapshot back over a fresh root."""
    from mandodb_spark.sources.segment_store import fsck, snapshot

    base = tmp_path_factory.mktemp("snap")
    path = str(base / "live")
    db = TSDB(spark, path)
    rows = [("m", {"x": str(i % 3)}, START + i * 3600, float(i)) for i in range(10)]
    db.insert_rows(rows)
    before = sorted((r.ts, r.value) for r in db.query_range_rows("m", [], 0, 10**10).collect())

    snap = str(base / "backup")
    n = db.snapshot(snap)  # links every file, incl. _SUCCESS/.crc markers
    assert n >= len(list(Path(path).rglob("*.parquet")))
    assert sorted(p.name for p in Path(snap).rglob("*.parquet")) == sorted(
        p.name for p in Path(path).rglob("*.parquet")
    )
    assert fsck(snap)["ok"]

    # live tree mutates: compaction rewrites files, retention drops segments
    db.compact()
    dropped = db.store.remove_expired(now_ts=START + 10 * 3600, retention=3 * 3600)
    assert dropped
    live_now = sorted((r.ts, r.value) for r in db.query_range_rows("m", [], 0, 10**10).collect())
    assert len(live_now) < len(before)

    # the snapshot is frozen: full original content, fsck still clean
    snap_rows = sorted(
        (r.ts, r.value)
        for r in spark.read.parquet(snap).filter("labels['__name__'] = 'm'").collect()
    )
    assert snap_rows == before
    assert fsck(snap)["ok"]

    # restore into a fresh root and query through the engine again
    restored = str(base / "restored")
    snapshot(snap, restored)
    db2 = TSDB(spark, restored)
    back = sorted((r.ts, r.value) for r in db2.query_range_rows("m", [], 0, 10**10).collect())
    assert back == before
    # refusal on a non-empty destination
    import pytest as _pytest

    with _pytest.raises(FileExistsError):
        snapshot(snap, restored)


def test_compact_salvages_concurrent_append(spark, tmp_path_factory):
    """A batch committed between compaction's snapshot read and its swap
    must survive: the rewrite consumes exactly the files its plan listed,
    and post-swap salvage moves anything newer from the replaced tree
    into the live one (previously the swap silently discarded it)."""
    from mandodb_spark.sources.segment_store import SegmentStore

    path = str(tmp_path_factory.mktemp("store") / "race")
    store = SegmentStore(spark, path)
    for batch in range(2):
        store.insert_pylist(
            [("m", {"b": str(i % 2)}, START + batch * 30 + i, float(i)) for i in range(20)]
        )

    # interpose on the swap: a concurrent writer lands a batch AFTER the
    # compaction rewrite finished but BEFORE the directory swap
    orig = store._swap_in_keep_old
    late = [("m", {"late": "1"}, START + 9999, 123.0)]

    def hooked(staging_root):
        SegmentStore(spark, path).insert_pylist(late)
        return orig(staging_root)

    store._swap_in_keep_old = hooked
    try:
        store.compact()
    finally:
        store._swap_in_keep_old = orig

    got = sorted((r.ts, r.value) for r in store.relation().collect())
    assert (START + 9999, 123.0) in got          # the late batch survived
    assert len(got) == 41                        # 40 compacted + 1 salvaged
    assert not Path(f"{path}__compact").exists() and not Path(f"{path}__old").exists()


def test_bucketed_compact_salvages_concurrent_append(spark, tmp_path_factory):
    """Same race, bucketed store: a batch appended mid-compact survives the
    table swap (salvaged bucket files coexist like any multi-batch append)."""
    from mandodb_spark.sources.segment_store import BucketedSegmentStore

    path = str(tmp_path_factory.mktemp("store") / "brace")
    store = BucketedSegmentStore(spark, path, table="t_salvage", n_buckets=2)
    try:
        store.insert_pylist(
            [("m", {"b": str(i % 2)}, START + i, float(i)) for i in range(20)]
        )
        orig = store._swap_in_keep_old
        late = [("m", {"late": "1"}, START + 9999, 123.0)]

        def hooked(staging_root):
            BucketedSegmentStore(spark, path, table="t_salvage", n_buckets=2).insert_pylist(late)
            return orig(staging_root)

        store._swap_in_keep_old = hooked
        try:
            store.compact()
        finally:
            store._swap_in_keep_old = orig
        got = sorted((r.ts, r.value) for r in store.relation().collect())
        assert (START + 9999, 123.0) in got
        assert len(got) == 21
    finally:
        spark.sql("DROP TABLE IF EXISTS t_salvage")


def test_promote_labels_change_is_refused_then_migrated_by_compact(spark, tmp_path_factory):
    """A promotion change over existing files would mix schemas (missing
    promoted columns read as NULL and the pushable conjunct would silently
    drop their rows) — append refuses; compact() on the newly-configured
    store migrates every file, after which appends and matcher queries work."""
    import pytest

    from mandodb_spark import LabelMatcher
    from mandodb_spark.operators import tsdb_ops
    from mandodb_spark.sources.segment_store import SegmentStore

    path = str(tmp_path_factory.mktemp("store") / "promo_mig")
    rows = [("m", {"node": f"vm{i % 2}"}, START + i, float(i)) for i in range(10)]
    SegmentStore(spark, path).insert_pylist(rows)

    promoted = SegmentStore(spark, path, promote_labels=["node"])
    with pytest.raises(ValueError, match="promote_labels"):
        promoted.insert_pylist(rows)
    promoted.compact()  # migration: derives lbl_node for every file
    promoted.insert_pylist([("m", {"node": "vm1"}, START + 99, 42.0)])

    got = sorted(
        (r.ts, r.value)
        for r in tsdb_ops.query_range_rows(
            promoted.relation(), "m", [LabelMatcher("node", "vm1")], 0, 10**10
        ).collect()
    )
    assert (START + 99, 42.0) in got and len(got) == 6  # 5 original vm1 + 1 new


def test_fsck_flags_mixed_promoted_layout(spark, tmp_path_factory):
    """fsck reports files whose promoted-column set deviates from the
    store majority — the silent-row-drop hazard class the append guard
    refuses and compact() migrates."""
    from mandodb_spark.sources.segment_store import SegmentStore, fsck

    path = str(tmp_path_factory.mktemp("store") / "mix")
    plain = SegmentStore(spark, path)
    plain.insert_pylist([("m", {"node": "a"}, START + i, float(i)) for i in range(3)])
    plain.insert_pylist([("m", {"node": "a"}, START + 10 + i, float(i)) for i in range(3)])
    assert fsck(path)["ok"]
    # simulate a foreign writer dropping promoted files into the same tree
    # (bypassing the append guard): write a promoted batch elsewhere and
    # move its file in
    other = str(tmp_path_factory.mktemp("store") / "promoted")
    SegmentStore(spark, other, promote_labels=["node"]).insert_pylist(
        [("m", {"node": "b"}, START + 99, 9.0)]
    )
    import shutil as _sh

    seg = next(Path(other).glob("seg=*"))
    for f in seg.glob("*.parquet"):
        _sh.copy(f, Path(path) / seg.name / f"foreign-{f.name}")
    rep = fsck(path)
    assert not rep["ok"] and len(rep["mixed_promotion"]) == 1
    assert "foreign-" in rep["mixed_promotion"][0]


def test_selective_compact_only_fragmented_segments(spark, tmp_path_factory):
    """min_files_per_segment=N rewrites only segments with >= N files; the
    others keep their exact files, and query results are unchanged."""
    from mandodb_spark.sources.segment_store import SegmentStore

    path = str(tmp_path_factory.mktemp("store") / "sel")
    store = SegmentStore(spark, path)
    seg_dur = store.segment_duration
    # segment 0 of this range: 3 appends -> 3 files; next segment: 1 append
    base = (START // seg_dur) * seg_dur
    for batch in range(3):
        store.append(spark.createDataFrame(
            [("m", {"b": "x"}, base + batch, 1.0 * batch)], ROW_SCHEMA))
    store.append(spark.createDataFrame(
        [("m", {"b": "x"}, base + seg_dur + 1, 9.0)], ROW_SCHEMA))

    seg_hot, seg_cold = base // seg_dur, base // seg_dur + 1
    cold_files = sorted(p.name for p in Path(path).glob(f"seg={seg_cold}/*.parquet"))
    assert len(list(Path(path).glob(f"seg={seg_hot}/*.parquet"))) == 3
    before = sorted((r.ts, r.value) for r in store.relation().collect())

    done = store.compact(min_files_per_segment=2)
    assert done == [seg_hot]
    assert len(list(Path(path).glob(f"seg={seg_hot}/*.parquet"))) == 1
    # cold segment untouched — identical file names, not rewritten
    assert sorted(p.name for p in Path(path).glob(f"seg={seg_cold}/*.parquet")) == cold_files
    assert sorted((r.ts, r.value) for r in store.relation().collect()) == before

    # nothing fragmented anymore -> no-op, returns []
    assert store.compact(min_files_per_segment=2) == []


def test_selective_compact_guards(spark, tmp_path_factory):
    import pytest as _pytest

    from mandodb_spark.sources.segment_store import BucketedSegmentStore, SegmentStore

    path = str(tmp_path_factory.mktemp("store") / "g")
    store = SegmentStore(spark, path)
    store.append(spark.createDataFrame([("m", {"n": "a"}, START, 1.0)], ROW_SCHEMA))
    with _pytest.raises(ValueError, match="min_files_per_segment"):
        store.compact(min_files_per_segment=0)
    # promotion change must go through FULL compact, not selective
    promoted = SegmentStore(spark, path, promote_labels=["n"])
    with _pytest.raises(ValueError, match="promote_labels"):
        promoted.compact(min_files_per_segment=1)

    bpath = str(tmp_path_factory.mktemp("store") / "b")
    b = BucketedSegmentStore(spark, bpath, table="t_selcomp_guard")
    b.append(spark.createDataFrame([("m", {"n": "a"}, START, 1.0)], ROW_SCHEMA))
    with _pytest.raises(ValueError, match="selective compaction"):
        b.compact(min_files_per_segment=2)


def test_selective_compact_fallback_never_pollutes_partition_discovery(spark, tmp_path_factory, monkeypatch):
    """Force the non-renameat2 fallback: the displaced tree must land
    OUTSIDE the store root (a seg=N__old dir inside it would poison
    partition discovery), results unchanged, no leftovers."""
    from mandodb_spark.sources import segment_store as ss

    path = str(tmp_path_factory.mktemp("store") / "fb")
    store = ss.SegmentStore(spark, path)
    for b in range(2):
        store.append(spark.createDataFrame(
            [("m", {"b": "x"}, START + b, float(b))], ROW_SCHEMA))
    before = sorted((r.ts, r.value) for r in store.relation().collect())

    monkeypatch.setattr(ss, "_renameat2_exchange", lambda a, b: False)
    done = store.compact(min_files_per_segment=2)
    assert len(done) == 1
    assert sorted((r.ts, r.value) for r in store.relation().collect()) == before
    root = Path(path)
    assert not any("__old" in p.name for p in root.glob("*"))      # inside root
    assert not Path(f"{path}__old").exists()                       # sibling cleaned
    assert not Path(f"{path}__compact").exists()


def test_vacuum_removes_only_orphan_trees(spark, tmp_path_factory):
    """vacuum reclaims crashed-swap residue trees, never live data or
    corrupt in-root files; dry_run only reports."""
    from pathlib import Path

    from mandodb_spark import TSDB
    from mandodb_spark.sources.segment_store import fsck, vacuum

    root = str(tmp_path_factory.mktemp("vac") / "s")
    db = TSDB(spark, root)
    db.insert_rows([("m", {"n": "a"}, 1_700_000_000 + i, float(i))
                    for i in range(50)])
    n_before = db.query_range("m", [], 0, 2**40).count()

    # simulate a crashed swap: leftover __old tree + a corrupt file in-root
    old = Path(f"{root}__old")
    (old / "seg=0").mkdir(parents=True)
    (old / "seg=0" / "part-junk.parquet").write_bytes(b"x" * 1024)
    seg = next(Path(root).glob("seg=*"))
    corrupt = seg / "part-corrupt.parquet"
    corrupt.write_bytes(b"not a parquet file")

    rep = fsck(root, db.store.segment_duration)
    assert str(old) in rep["orphans"] and str(corrupt) in rep["corrupt"]

    dry = vacuum(root)
    assert dry["dry_run"] and dry["removed"] == [str(old)]
    assert dry["freed_bytes"] >= 1024 and old.exists()

    wet = db.vacuum(dry_run=False)
    assert wet["removed"] == [str(old)] and not old.exists()
    assert corrupt.exists()  # corrupt in-root file untouched
    rep2 = db.fsck()
    assert rep2["orphans"] == [] and str(corrupt) in rep2["corrupt"]
    corrupt.unlink()
    assert db.query_range("m", [], 0, 2**40).count() == n_before


def test_downsample_expire_tiered_retention(spark, tmp_path_factory):
    """Downsample-then-expire: expired raw segments land in the rollup
    store (exact n/sum/min/max per series x step bucket) BEFORE being
    purged; recent raw data is untouched; a rerun is a no-op (idempotent
    dynamic-overwrite + already-purged segs)."""
    base = tmp_path_factory.mktemp("tiered")
    db = TSDB(spark, str(base / "live"), segment_duration=2 * 3600,
              retention=3 * 3600)
    rows = [("m", {"x": str(i % 2)}, START + i * 1800, float(i))
            for i in range(16)]  # 8 hours of half-hour points
    db.insert_rows(rows)
    now = START + 8 * 3600
    roll_dest = str(base / "rollup")

    dropped = db.downsample_expire(step=3600, dest_root=roll_dest, now_ts=now)
    assert dropped  # segments wholly older than now - 3h
    cutoff = now - 3 * 3600
    # raw points past the horizon are gone, recent ones intact
    live = sorted(r.ts for r in db.query_range_rows("m", [], 0, 10**10).collect())
    assert live and min(live) >= (min(dropped) + 1) * 2 * 3600
    # rollup reproduces the dropped points exactly at 1h resolution
    roll = spark.read.parquet(roll_dest)
    got = {(r["series_key"], r["bucket_ts"]): (r["n"], r["sum"], r["min"], r["max"])
           for r in roll.collect()}
    expect = {}
    dropped_set = set(dropped)
    for _m, lab, ts, v in rows:
        seg = ts // (2 * 3600)
        if seg not in dropped_set:
            continue
        key = (lab["x"], ts // 3600 * 3600)
        cur = expect.get(key, (0, 0.0, float("inf"), float("-inf")))
        expect[key] = (cur[0] + 1, cur[1] + v, min(cur[2], v), max(cur[3], v))
    assert len(got) == len(expect)
    by_bucket = {}
    for (sk, b), agg in got.items():
        by_bucket.setdefault(b, []).append(agg)
    for (x, b), (n, s, mn, mx) in expect.items():
        assert (n, s, mn, mx) in by_bucket[b], (x, b)
    # rerun: nothing left to downsample
    assert db.downsample_expire(step=3600, dest_root=roll_dest, now_ts=now) == []


def test_tier_write_fails_fast_on_pre_gen_layout(spark, tmp_path_factory):
    """Round-7 ADVICE: a tier root holding pre-generation seg-only
    partitions (seg=N/*.parquet with no gen= level) breaks partition
    discovery if (seg, gen) writes mix in — the writer must refuse with
    a migration hint, not corrupt the tier."""
    import pytest

    base = tmp_path_factory.mktemp("pregen")
    dest = base / "tier"
    # forge a legacy seg-only tier partition
    spark.range(1).selectExpr("CAST(1.0 AS DOUBLE) AS v") \
        .write.parquet(str(dest / "seg=100"))
    db = TSDB(spark, str(base / "live"), segment_duration=2 * 3600,
              retention=3600)
    db.insert_rows([("m", {"x": "a"}, START + i * 600, float(i))
                    for i in range(6)])
    with pytest.raises(RuntimeError, match="pre-generation seg-only"):
        db.downsample_expire(step=3600, dest_root=str(dest),
                             now_ts=START + 40 * 3600)


def test_query_range_buckets_tiered_continuous_across_horizon(spark, tmp_path_factory):
    """Tiered query ≡ the buckets computed over the FULL pre-purge data:
    after downsample_expire, query_range_buckets_tiered returns the same
    per-series (bucket, n, sum, min, max) the raw store would have given,
    for a range spanning rollup-only, straddling, and raw-only buckets —
    and matchers filter both tiers."""
    from mandodb_spark.operators import tsdb_ops

    base = tmp_path_factory.mktemp("tieredq")
    db = TSDB(spark, str(base / "live"), segment_duration=2 * 3600,
              retention=3 * 3600)
    rows = [("m", {"x": str(i % 2)}, START + i * 1800, float(i))
            for i in range(16)]
    db.insert_rows(rows)
    # ground truth BEFORE purge, computed by the same tiered operator
    # with an empty rollup side (pure raw)
    empty_roll = spark.createDataFrame(
        [], "series_key long, labels map<string,string>, bucket_ts long, "
            "n long, sum double, min double, max double, seg long")
    s, e = START, START + 16 * 1800
    want = sorted(
        (r["labels"]["x"], r["bucket_ts"], r["n"], r["sum"], r["min"], r["max"])
        for r in tsdb_ops.query_range_buckets_tiered(
            db.store.relation(), empty_roll, "m", [], s, e, 3600,
            db.segment_duration).collect())

    now = START + 8 * 3600
    roll = str(base / "rollup")
    assert db.downsample_expire(step=3600, dest_root=roll, now_ts=now)
    got = sorted(
        (r["labels"]["x"], r["bucket_ts"], r["n"], r["sum"], r["min"], r["max"])
        for r in db.query_range_buckets_tiered("m", [], s, e, 3600, roll).collect())
    assert got == want

    only_x1 = db.query_range_buckets_tiered(
        "m", [LabelMatcher("x", "1")], s, e, 3600, roll).collect()
    assert only_x1 and all(r["labels"]["x"] == "1" for r in only_x1)
    assert len(only_x1) == sum(1 for w in want if w[0] == "1")


def test_delete_series_rewrites_only_touched_segments(spark, tmp_path_factory):
    """GDPR delete: matching series vanish across all their segments,
    other series and untouched segments are byte-identical (file mtimes
    unchanged), fully-matching partitions are dropped, and the op
    reports the exact point count removed."""
    import os

    base = tmp_path_factory.mktemp("gdpr")
    db = TSDB(spark, str(base / "live"), segment_duration=2 * 3600)
    rows = []
    for i in range(8):
        rows.append(("m", {"user": "alice"}, START + i * 3600, 1.0))
        rows.append(("m", {"user": "bob"}, START + i * 3600, 2.0))
    # a segment where ONLY alice lives (must be dropped entirely)
    rows.append(("m", {"user": "alice"}, START + 50 * 3600, 3.0))
    db.insert_rows(rows)
    seg_dirs = sorted((base / "live").glob("seg=*"))
    untouched_probe = None
    for d in seg_dirs:
        pass
    before_files = {str(p): os.path.getmtime(p)
                    for d in seg_dirs for p in d.glob("part-*")}

    n = db.delete_series([LabelMatcher("user", "alice")])
    assert n == 9
    left = db.query_range_rows("m", [], 0, 10**12).collect()
    assert len(left) == 8 and all(r["labels"]["user"] == "bob" for r in left)
    # alice-only segment directory is gone
    last_seg = (START + 50 * 3600) // (2 * 3600)
    assert not (base / "live" / f"seg={last_seg}").exists()
    # deleting again is a no-op
    assert db.delete_series([LabelMatcher("user", "alice")]) == 0


def test_delete_series_memory_mode(spark):
    """Memory-mode parity for the GDPR delete: same matcher language,
    same count contract, empty-matcher rejection."""
    import pytest as _pytest

    db = TSDB(spark, None, only_memory=True, segment_duration=2 * 3600)
    db.insert_rows([("m", {"u": "a"}, START, 1.0),
                    ("m", {"u": "b"}, START + 1, 2.0),
                    ("m", {"u": "a"}, START + 2, 3.0)])
    with _pytest.raises(ValueError):
        db.delete_series([])
    assert db.delete_series([LabelMatcher("u", "a")]) == 2
    left = db.query_range_rows("m", [], 0, 10**12).collect()
    assert len(left) == 1 and left[0]["labels"]["u"] == "b"
    assert db.delete_series([LabelMatcher("u", "a")]) == 0


def test_delete_series_bucketed_store(spark, tmp_path_factory):
    """Bucketed-store GDPR delete is a TOMBSTONE OVERLAY (round-7): the
    data files are untouched (O(deletions), not O(store)), reads hide the
    matched rows immediately, and the count contract is identical to the
    rewrite form."""
    import os

    base = tmp_path_factory.mktemp("gdprb")
    db = TSDB(spark, str(base / "live"), segment_duration=2 * 3600,
              bucket_by_series=4, table="gdpr_bucketed_t")
    db.insert_rows([("m", {"u": "a"}, START + i * 3600, float(i)) for i in range(4)]
                   + [("m", {"u": "b"}, START, 9.0)])
    before_files = {str(p): os.path.getmtime(p)
                    for p in (base / "live").rglob("part-*")}
    assert db.delete_series([LabelMatcher("u", "a")]) == 4
    left = db.query_range_rows("m", [], 0, 10**12).collect()
    assert len(left) == 1 and left[0]["labels"]["u"] == "b"
    assert db.delete_series([LabelMatcher("u", "a")]) == 0
    # overlay, not rewrite: every data file is byte-identical
    after_files = {str(p): os.path.getmtime(p)
                   for p in (base / "live").rglob("part-*")}
    assert after_files == before_files
    spark.sql("DROP TABLE IF EXISTS gdpr_bucketed_t")


def test_snapshot_restore_carries_tombstone_overlay(spark, tmp_path_factory):
    """Round-7 ADVICE: the tombstone overlay lives at the SIBLING path
    <root>__tombstones, so snapshot/restore must carry it explicitly.

    Both GDPR directions are pinned:
    1. snapshot taken WITH pending tombstones, then compact (applies the
       deletes physically), then restore → the deletes survive (the
       overlay rode the snapshot; without it the restore would resurrect
       the deleted rows);
    2. snapshot taken BEFORE any delete, restored over a store with
       pending tombstones → rows visible again and the stale live
       overlay is GONE (restore means exactly the snapshot's state)."""
    base = tmp_path_factory.mktemp("gdprsnap")
    root = str(base / "live")
    db = TSDB(spark, root, segment_duration=2 * 3600,
              bucket_by_series=4, table="gdpr_snap_t")
    db.insert_rows([("m", {"u": "a"}, START + i * 60, float(i)) for i in range(3)]
                   + [("m", {"u": "b"}, START, 9.0)])

    clean_snap = str(base / "snap_clean")
    db.snapshot(clean_snap)          # no tombstones yet

    assert db.delete_series([LabelMatcher("u", "a")]) == 3
    pending_snap = str(base / "snap_pending")
    n = db.snapshot(pending_snap)    # overlay pending
    assert (base / "snap_pending__tombstones").exists() and n > 0

    db.store.compact()               # deletes applied physically, overlay cleared
    assert not (base / "live__tombstones").exists()

    # 1. restore the pending-overlay snapshot: deletes still in force
    db.restore(pending_snap)
    assert (base / "live__tombstones").exists()
    left = db.query_range_rows("m", [], 0, 10**12).collect()
    assert len(left) == 1 and left[0]["labels"]["u"] == "b"
    # and the carried overlay still compacts cleanly
    db.store.compact()
    assert not (base / "live__tombstones").exists()
    assert db.query_range_rows("m", [], 0, 10**12).count() == 1

    # 2. re-delete to create a live overlay, then restore the clean
    # snapshot: all rows back, stale overlay removed
    db.insert_rows([("m", {"u": "a"}, START + i * 60, float(i)) for i in range(3)])
    assert db.delete_series([LabelMatcher("u", "a")]) == 3
    assert (base / "live__tombstones").exists()
    db.restore(clean_snap)
    assert not (base / "live__tombstones").exists()
    assert db.query_range_rows("m", [], 0, 10**12).count() == 4
    spark.sql("DROP TABLE IF EXISTS gdpr_snap_t")


def test_bucketed_tombstone_overlay_semantics(spark, tmp_path_factory):
    """The deletion-vector contract of the bucketed delete:

    1. rows of the SAME series appended AFTER the delete (even into the
       same segment) are new data — never hidden by old tombstones;
    2. dedup_against_store treats deleted points as gone (a re-append of
       the very same (seg, series, ts) is accepted);
    3. compact() applies tombstones physically and clears the overlay,
       with reads identical before and after (overlay ≡ rewrite);
    4. the overlay costs no shuffle on the read path (broadcast anti-join
       — the bucketed zero-shuffle guarantee survives deletes)."""
    import os

    from mandodb_spark.plans import shuffle_count

    base = tmp_path_factory.mktemp("gdprv")
    db = TSDB(spark, str(base / "live"), segment_duration=2 * 3600,
              bucket_by_series=4, table="gdpr_tomb_t")
    db.insert_rows([("m", {"u": "a"}, START + i * 60, float(i)) for i in range(3)]
                   + [("m", {"u": "b"}, START, 9.0)])
    assert db.delete_series([LabelMatcher("u", "a")]) == 3
    tomb_root = str(base / "live") + "__tombstones"
    assert os.path.exists(tomb_root)

    # (1) same series, same segment, appended after the delete: visible
    db.insert_rows([("m", {"u": "a"}, START + 10 * 60, 42.0)])
    rows = db.query_range_rows("m", [LabelMatcher("u", "a")], 0, 10**12).collect()
    assert [(r["ts"], r["value"]) for r in rows] == [(START + 600, 42.0)]

    # (2) re-append of a deleted point passes the store dedup gate
    db.insert_rows([("m", {"u": "a"}, START, 7.0)], dedup_against_store=True)
    rows = sorted((r["ts"], r["value"]) for r in db.query_range_rows(
        "m", [LabelMatcher("u", "a")], 0, 10**12).collect())
    assert rows == [(START, 7.0), (START + 600, 42.0)]

    # (4) overlay read path: still no Exchange in the bucketed aggregation
    agg = db.query_range("m", [], 0, 10**12)
    assert shuffle_count(agg) == 0

    # (3) compact folds the overlay in; reads identical, overlay cleared
    before = sorted((r["series_key"], r["ts"], r["value"])
                    for r in db.store.relation().collect())
    db.store.compact()
    after = sorted((r["series_key"], r["ts"], r["value"])
                   for r in db.store.relation().collect())
    assert after == before
    assert not os.path.exists(tomb_root)
    spark.sql("DROP TABLE IF EXISTS gdpr_tomb_t")


def test_downsample_expire_memory_mode(spark, tmp_path_factory):
    """Memory-mode tiered retention: expired head segments land in the
    parquet rollup before leaving the head; the tiered query then spans
    both tiers identically to the disk-store form."""
    base = tmp_path_factory.mktemp("tieredm")
    db = TSDB(spark, None, only_memory=True, segment_duration=2 * 3600,
              retention=3 * 3600)
    rows = [("m", {"x": str(i % 2)}, START + i * 1800, float(i))
            for i in range(16)]
    db.insert_rows(rows)
    now = START + 8 * 3600
    roll = str(base / "rollup")
    dropped = db.downsample_expire(step=3600, dest_root=roll, now_ts=now)
    assert dropped
    live = db.query_range_rows("m", [], 0, 10**12).count()
    assert 0 < live < 16
    from pyspark.sql import functions as F

    got = db.query_range_buckets_tiered(
        "m", [], START, START + 16 * 1800, 3600, roll)
    assert got.agg(F.sum("n")).collect()[0][0] == 16  # nothing lost
    assert db.downsample_expire(step=3600, dest_root=roll, now_ts=now) == []


def test_snapshot_restore_roundtrip(spark, tmp_path_factory):
    """restore() returns the store to the snapshotted state atomically:
    post-snapshot mutations (GDPR delete + new appends) are rolled back,
    fsck passes, and queries read the restored data."""
    from mandodb_spark.sources.segment_store import fsck

    base = tmp_path_factory.mktemp("restore")
    db = TSDB(spark, str(base / "live"), segment_duration=2 * 3600)
    rows = [("m", {"u": chr(97 + i % 2)}, START + i * 3600, float(i))
            for i in range(6)]
    db.insert_rows(rows)
    before = sorted((r["ts"], r["value"]) for r in
                    db.query_range_rows("m", [], 0, 10**12).collect())
    snap = str(base / "snap")
    db.snapshot(snap)

    db.delete_series([LabelMatcher("u", "a")])
    db.insert_rows([("m", {"u": "z"}, START + 99 * 3600, 42.0)])
    assert sorted((r["ts"], r["value"]) for r in
                  db.query_range_rows("m", [], 0, 10**12).collect()) != before

    n = db.restore(snap)
    assert n > 0
    after = sorted((r["ts"], r["value"]) for r in
                   db.query_range_rows("m", [], 0, 10**12).collect())
    assert after == before
    assert fsck(str(base / "live"))["ok"]


def test_relation_after_full_purge_is_empty_not_error(spark, tmp_path_factory):
    """Retention can purge EVERY segment: the root dir then exists but
    holds no seg partitions, and relation() must return the empty
    canonical relation (schema inference over zero files would throw) —
    found driving the double-downsample generation scenario end-to-end
    in round 7."""
    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("fullpurge")
    db = TSDB(spark, str(base / "live"), segment_duration=7200,
              retention=6 * 3600)
    db.insert_rows([("m", {"u": "a"}, START + i * 600, 1.0) for i in range(12)])
    db.downsample_expire(3600, str(base / "tier"), now_ts=START + 16 * 3600)
    assert db.store.relation().count() == 0
    # the store keeps working: late rows land, a second expiry rolls them
    # into a SECOND tier generation, and the tiered read merges both
    db.insert_rows([("m", {"u": "a"}, START + i * 600 + 300, 1.0)
                    for i in range(12)])
    db.downsample_expire(3600, str(base / "tier"), now_ts=START + 16 * 3600)
    total = db.query_range_buckets_tiered(
        "m", [], 0, 2**40, 3600, str(base / "tier")
    ).agg(F.sum("n")).first()[0]
    assert total == 24
