"""Rotation-schedule invariants (VERDICT r5 item 2): the 3-round window
cycle must partition the registry, the live driver window must follow the
plan for the round in progress, and the staleness debt must clear on
schedule.  No Spark session needed — pure registry/metadata checks."""

from __future__ import annotations

from mandodb_spark.workloads import _PRIORITY, ORACLES, QUERIES
from mandodb_spark.workloads import rotation


def test_cycle_partitions_registry():
    """Every registered query sits in exactly one window of the cycle —
    guarantees every query gets a driver row within any 3 consecutive
    rounds, and caps the registry at CYCLE_ROUNDS * WINDOW_SIZE (adding a
    query without rebalancing the plan fails here, loudly)."""
    windows = [set(w) for w in rotation.CYCLE.values()]
    union: set[str] = set()
    for w in windows:
        assert not (w & union), f"query in two windows: {sorted(w & union)}"
        union |= w
    assert union == set(QUERIES), (
        f"plan != registry; unplanned={sorted(set(QUERIES) - union)} "
        f"ghost={sorted(union - set(QUERIES))}"
    )
    for rnd, w in rotation.CYCLE.items():
        assert len(w) == len(set(w)) <= rotation.WINDOW_SIZE, f"round {rnd} window"


def test_live_window_matches_plan_for_current_round():
    """The first WINDOW_SIZE registry entries must be exactly the planned
    window of the round in progress — when a new round starts (a fresh
    CORRECTNESS file appears) and the registry doesn't advance, this
    fails the suite."""
    rnd = max(rotation.current_round(), rotation.ANCHOR_ROUND)
    planned = set(rotation.planned_window(rnd))
    live = list(QUERIES)[: rotation.WINDOW_SIZE]
    assert len(live) == min(rotation.WINDOW_SIZE, len(QUERIES))
    assert set(live) == planned, (
        f"round {rnd}: live window drifted from plan; "
        f"missing={sorted(planned - set(live))} extra={sorted(set(live) - planned)}"
    )
    assert set(_PRIORITY) == planned


def test_staleness_debt_clears_on_schedule():
    """Forward-looking ratchet over the RECORDED window history: by the
    end of the current round, no registered query's newest driver-window
    appearance may be older than the cycle length — except queries whose
    turn the plan schedules within the remaining current cycle (the
    pre-round-6 debt, which the partition test proves is paid by round 8).
    """
    hist = rotation.window_history()
    assert hist, "driver correctness files missing at repo root"
    rnd = max(rotation.current_round(), rotation.ANCHOR_ROUND)
    last_seen: dict[str, int] = {}
    for r in sorted(hist):
        for q in hist[r]:
            last_seen[q] = r
    for q in QUERIES:
        seen = last_seen.get(q, 0)
        if rnd - seen <= rotation.CYCLE_ROUNDS:
            continue  # within tolerance
        # overdue: must be scheduled in the current or next window(s) of
        # this cycle — i.e. appear in a planned round r with seen < r <=
        # rnd + (how far the plan may defer it without exceeding the
        # cycle from ITS OWN planned slot)
        planned_round = next(
            r for r in range(rnd, rnd + rotation.CYCLE_ROUNDS)
            if q in set(rotation.planned_window(r))
        )
        assert planned_round <= rotation.ANCHOR_ROUND + rotation.CYCLE_ROUNDS - 1, (
            f"{q}: last driver window r{seen}, not scheduled before the "
            f"anchor cycle ends"
        )


def test_every_registered_query_is_oracle_paired():
    """The registry contract: every queries() entry has an oracle_sql()
    entry (the driver records a weaker rows-only check otherwise)."""
    assert set(QUERIES) == set(ORACLES)


def test_auto_advance_simulated_future_rounds(tmp_path):
    """When the driver drops CORRECTNESS_r06.json (end of round 6), the
    inferred round becomes 7 and the planned window flips to the r7 set
    (TPC-H + remaining round-2-stale) without any code change; round 9
    wraps to the anchor window."""
    import json

    for r in range(1, 7):
        (tmp_path / f"CORRECTNESS_r{r:02d}.json").write_text(json.dumps({}))
    assert rotation.current_round(tmp_path) == 7
    assert set(rotation.planned_window(7)) == set(rotation.WINDOW_R7)
    (tmp_path / "CORRECTNESS_r07.json").write_text(json.dumps({}))
    (tmp_path / "CORRECTNESS_r08.json").write_text(json.dumps({}))
    assert rotation.current_round(tmp_path) == 9
    assert set(rotation.planned_window(9)) == set(rotation.WINDOW_R6)
    # an empty root (files missing in a packaging) must not crash the
    # registry import path — current_round falls back to 1 and the
    # workloads module clamps to the anchor
    empty = tmp_path / "empty"
    empty.mkdir()
    assert rotation.current_round(empty) == 1
    assert set(rotation.planned_window(max(1, rotation.ANCHOR_ROUND))) == set(
        rotation.WINDOW_R6
    )


def test_extra_tier_staleness_ledger():
    """Round-7 verdict #8: the extra tier (post-cap oracle queries in
    workloads/extra_parity) gets the same staleness discipline as the
    150-query driver registry.  tools/oracle_check.py records every
    extra-tier PASS in EXTRA_LEDGER.json as {query: {sf_label: round}};
    this test fails when any extra query lacks a recorded pass at BOTH
    sf0.01 and sf0.1 within the rotation cycle (newest pass >=
    current_round - (CYCLE_ROUNDS - 1)) — so adding an extra without
    sweeping it at both scales, or letting one rest on stale evidence,
    is loud."""
    import json
    from pathlib import Path

    from mandodb_spark.workloads import extra_parity

    root = Path(__file__).resolve().parent.parent
    ledger_path = root / "EXTRA_LEDGER.json"
    assert ledger_path.exists(), (
        "EXTRA_LEDGER.json missing — run tools/oracle_check.py --extra at "
        "both /root/testdata/sf0.01 and /root/testdata/sf0.1")
    ledger = json.loads(ledger_path.read_text())
    cur = rotation.current_round(root)
    floor = cur - (rotation.CYCLE_ROUNDS - 1)
    stale: dict[str, dict] = {}
    for q in extra_parity.QUERIES:
        rec = ledger.get(q, {})
        if not all(rec.get(sf, -1) >= floor for sf in ("sf0.01", "sf0.1")):
            stale[q] = rec
    assert not stale, (
        f"extra-tier queries without a both-SF pass since round {floor}: "
        f"{sorted(stale)} — run tools/oracle_check.py --extra at both SFs")
