"""Custom stateful streaming operator: per-series counter `increase` with
reset detection, state carried across micro-batches.

SURVEY.md §2.6 lists arbitrary stateful ops as absent in the reference
(its only cross-batch state is the head segment itself); this is the
canonical Spark-native form: ``applyInPandasWithState`` over the canonical
relation grouped by ``series_key``.

Why stateful instead of the batch ``functions.promql.increase``: the batch
operator needs every point of the window resident to diff neighbours; the
streaming form keeps ONE fixed-size state row per series (last ts, last
value, running total) — O(series) state and O(batch) work per trigger,
which is the only shape that holds when the window is "forever" on an
unbounded stream.  Counter-reset semantics match PromQL/the batch op:
a value drop means the counter restarted, so the post-reset value is the
contribution.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: One output row per (series, trigger): what this batch contributed.
OUT_SCHEMA = (
    "series_key long, n_points long, batch_increase double, "
    "total_increase double, last_ts long, last_value double"
)
#: Fixed-size per-series state.
STATE_SCHEMA = "last_ts long, last_value double, total double"


def _update_counter(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (last_ts, last_value, total) = state.get if state.exists else (None, None, 0.0)
    inc = 0.0
    n = 0
    # batch-internal ordering: one concat+sort per (series, trigger) — the
    # per-group slice of a micro-batch, small by construction
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch):
        batch = batch.sort_values("ts")
    for pdf in (batch,):
        for ts, v in zip(pdf["ts"], pdf["value"]):
            ts = int(ts)
            v = float(v)
            if last_ts is not None and ts <= last_ts:
                # regressions against already-folded state are dropped:
                # the monotone contract a counter state machine requires
                # (batch-internal late rows are handled by the sort below)
                continue
            if last_value is not None:
                inc += (v - last_value) if v >= last_value else v
            last_ts, last_value = ts, v
            n += 1
    total += inc
    state.update((last_ts, last_value, total))
    yield pd.DataFrame(
        [
            {
                "series_key": key[0],
                "n_points": n,
                "batch_increase": inc,
                "total_increase": total,
                "last_ts": last_ts,
                "last_value": last_value,
            }
        ]
    )


def streaming_counter_increase(rel: DataFrame) -> DataFrame:
    """Attach the stateful counter-increase operator to a streaming relation
    carrying (series_key, ts, value).

    Rows are sorted by event time inside the state function (a global sort
    is not allowed on a streaming DataFrame), and cross-batch regressions
    are dropped (see ``_update_counter``).  Emits one row per updated
    series per trigger (update output mode).
    """
    ordered = rel.select("series_key", "ts", "value")
    return ordered.groupBy("series_key").applyInPandasWithState(
        _update_counter, OUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters (SpaceSaving), round 5.
# ---------------------------------------------------------------------------

#: Output: the shard's current summary, one row per tracked item per trigger.
HH_OUT_SCHEMA = "shard long, item string, count_upper long, err long"
#: Capacity-bounded SpaceSaving table as parallel arrays (fixed-size state).
HH_STATE_SCHEMA = "items array<string>, counts array<long>, errs array<long>"


def _spacesaving_update(capacity: int):
    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            items, counts, errs = state.get
            table = {i: [c, e] for i, c, e in zip(items, counts, errs)}
        else:
            table = {}
        batch = pd.concat(list(pdfs), ignore_index=True)
        # per-batch pre-aggregation happens HERE (value_counts), not as an
        # upstream streaming groupBy().count() — that would be a second
        # stateful operator emitting CUMULATIVE counts every trigger,
        # double-counting items into the table
        agg = batch["item"].value_counts() if len(batch) else None
        for item, w in (agg.items() if agg is not None else ()):
            w = int(w)
            if item in table:
                table[item][0] += w
            elif len(table) < capacity:
                table[item] = [w, 0]
            else:
                # evict the current minimum; the newcomer inherits its
                # count as overestimation error (Metwally et al. 2005)
                victim = min(table, key=lambda k: table[k][0])
                vcount = table[victim][0]
                del table[victim]
                table[item] = [vcount + w, vcount]
        items = list(table.keys())
        state.update((items, [table[i][0] for i in items], [table[i][1] for i in items]))
        yield pd.DataFrame(
            {
                "shard": key[0],
                "item": items,
                "count_upper": [table[i][0] for i in items],
                "err": [table[i][1] for i in items],
            }
        )

    return update


def streaming_heavy_hitters(rel: DataFrame, item_col: str,
                            capacity: int = 64, n_shards: int = 8) -> DataFrame:
    """Streaming top-item tracking with bounded state: a SpaceSaving
    summary (Metwally et al. 2005) per hash shard, carried across
    micro-batches via ``applyInPandasWithState``.

    Scale shape: items hash to a fixed shard (same item → same shard
    always), so per-shard summaries never double-count and the global
    heavy hitters are the union of shard tables.  State is
    O(n_shards × capacity) regardless of stream length or item
    cardinality; per-trigger work is map-side pre-aggregation (one
    (shard, item) count per batch) + the bounded table update.
    Guarantees: ``count_upper`` ≥ true count ≥ ``count_upper - err``;
    any item with true count > N/capacity (per shard) is in the table.
    """
    import pyspark.sql.functions as F

    # NULL items are counted under a sentinel, not dropped — pandas
    # value_counts would silently exclude NaN, breaking the frequency
    # guarantee for a heavily-null tracked field
    pre = (
        rel.select(
            F.coalesce(F.col(item_col).cast("string"), F.lit("<NULL>")).alias("item")
        )
        .withColumn("shard", F.pmod(F.xxhash64("item"), F.lit(n_shards)))
    )
    return pre.groupBy("shard").applyInPandasWithState(
        _spacesaving_update(capacity),
        HH_OUT_SCHEMA,
        HH_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming alert state machine (round 6) — the continuous dual of
# operators/tsdb_ops.alert_intervals.
# ---------------------------------------------------------------------------

#: One row per (series, trigger): the alert state after folding the batch.
ALERT_OUT_SCHEMA = (
    "series_key long, state string, run_start_ts long, last_hot_ts long, "
    "transitioned boolean"
)
#: Fixed-size per-series state: the open run (if any) and its phase.
ALERT_STATE_SCHEMA = "run_start_ts long, last_hot_ts long, firing boolean"


def _alert_update(for_duration: int, max_gap: int):
    def update(key, pdfs, state):
        import pandas as pd

        run_start, last_hot, firing = (
            state.get if state.exists else (None, None, False)
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values("ts")
        was = (
            "FIRING" if firing else ("PENDING" if run_start is not None else "OK")
        )
        for ts, hot in zip(batch["ts"], batch["hot"]):
            ts = int(ts)
            if last_hot is not None and ts <= last_hot:
                continue  # regression against folded state: monotone contract
            if hot:
                if run_start is None or ts - last_hot > max_gap:
                    run_start, firing = ts, False  # new run, pending
                last_hot = ts
                if ts - run_start >= for_duration:
                    firing = True
            else:
                run_start, firing = None, False  # healthy sample resolves
                last_hot = ts
        now = (
            "FIRING" if firing else ("PENDING" if run_start is not None else "OK")
        )
        state.update((run_start, last_hot, firing))
        yield pd.DataFrame(
            [
                {
                    "series_key": key[0],
                    "state": now,
                    "run_start_ts": run_start,
                    "last_hot_ts": last_hot,
                    "transitioned": now != was,
                }
            ]
        )

    return update


def streaming_alert_state(rel: DataFrame, condition, for_duration: int,
                          max_gap: int) -> DataFrame:
    """Continuous Prometheus-style alerting over the ingest stream: one
    fixed-size state row per series tracks the open condition run; each
    trigger folds the batch and emits the series' current phase
    (``OK`` / ``PENDING`` / ``FIRING``) plus a ``transitioned`` flag (the
    notification edge).  Semantics match the batch
    :func:`~mandodb_spark.operators.tsdb_ops.alert_intervals`: a healthy
    sample resolves immediately; a gap > ``max_gap`` starts a fresh
    pending run at the next hot sample; firing requires the run to
    persist ``for_duration``.  O(series) state, O(batch) work — the only
    shape that holds on an unbounded stream.

    ``rel``: streaming relation carrying (series_key, ts, value);
    ``condition`` is a boolean Column over it.
    """
    marked = rel.select("series_key", "ts", condition.alias("hot"))
    return marked.groupBy("series_key").applyInPandasWithState(
        _alert_update(for_duration, max_gap),
        ALERT_OUT_SCHEMA,
        ALERT_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming CUSUM (round 6) — the continuous dual of
# operators/temporal.cusum_changepoints (the batch prefix-sum closed form).
# ---------------------------------------------------------------------------

#: One row per (series, trigger): the CUSUM state after folding the batch.
CUSUM_OUT_SCHEMA = (
    "series_key long, cusum_up double, cusum_dn double, last_ts long, "
    "alarm boolean, transitioned boolean"
)
#: Fixed-size per-series state: the two one-sided statistics.
CUSUM_STATE_SCHEMA = "s_up double, s_dn double, last_ts long, alarmed boolean"


def _cusum_update(target: float, sigma: float, slack_sigmas: float,
                  threshold_sigmas: float):
    k = slack_sigmas * sigma
    h = threshold_sigmas * sigma

    def update(key, pdfs, state):
        import pandas as pd

        s_up, s_dn, last_ts, alarmed = (
            state.get if state.exists else (0.0, 0.0, None, False)
        )
        was = alarmed
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values("ts")
        for ts, v in zip(batch["ts"], batch["value"]):
            ts = int(ts)
            if last_ts is not None and ts <= last_ts:
                continue  # folded already: monotone contract, same as alerts
            s_up = max(0.0, s_up + (float(v) - target - k))
            s_dn = max(0.0, s_dn - (float(v) - target) - k)
            last_ts = ts
        alarmed = s_up > h or s_dn > h
        state.update((s_up, s_dn, last_ts, alarmed))
        yield pd.DataFrame(
            [
                {
                    "series_key": key[0],
                    "cusum_up": round(s_up, 6),
                    "cusum_dn": round(s_dn, 6),
                    "last_ts": last_ts,
                    "alarm": alarmed,
                    "transitioned": alarmed != was,
                }
            ]
        )

    return update


def streaming_cusum_state(rel: DataFrame, target: float, sigma: float,
                          slack_sigmas: float = 0.5,
                          threshold_sigmas: float = 4.0) -> DataFrame:
    """Continuous CUSUM change-point monitoring over the ingest stream:
    per-series Page recursion carried as two floats of state — the exact
    recursion whose prefix-sum closed form the batch
    :func:`~mandodb_spark.operators.temporal.cusum_changepoints` evaluates
    (pinned equal by test), so batch backfills and the live stream agree.

    ``target``/``sigma`` come from a calibration window (the streaming
    side cannot estimate them from the unbounded future — and self-
    estimation contaminates the baseline anyway, see the batch docstring).
    O(series) state, O(batch) work; same monotone-fold contract as
    :func:`streaming_alert_state` (late/duplicate samples skipped, not
    reordered — the batch form is the replayable source of truth).

    ``rel``: streaming relation carrying (series_key, ts, value).
    """
    return rel.select("series_key", "ts", "value").groupBy(
        "series_key"
    ).applyInPandasWithState(
        _cusum_update(float(target), float(sigma), slack_sigmas, threshold_sigmas),
        CUSUM_OUT_SCHEMA,
        CUSUM_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


BURN_OUT_SCHEMA = (
    "key string, bucket_ts long, n_events long, n_errors long, "
    "long_events long, long_errors long, short_burn double, "
    "long_burn double, firing boolean"
)
BURN_STATE_SCHEMA = "buckets array<long>, ns array<long>, es array<long>"


def _burn_update(short_window: int, long_window: int, budget: float,
                 threshold: float, keep_buckets: int):
    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            bks, ns, es = state.get
            st = {int(b): [int(n), int(e)] for b, n, e in zip(bks, ns, es)}
        else:
            st = {}
        batch = pd.concat(list(pdfs), ignore_index=True)
        touched = set()
        for ts, err in zip(batch["ts"], batch["is_err"]):
            b = int(ts) // short_window * short_window
            cur = st.setdefault(b, [0, 0])
            cur[0] += 1
            cur[1] += int(bool(err))
            touched.add(b)
        if st:
            horizon = max(st) - keep_buckets * short_window
            st = {b: v for b, v in st.items() if b >= horizon}
        ks = sorted(st)
        state.update(
            (ks, [st[b][0] for b in ks], [st[b][1] for b in ks])
        )
        rows = []
        for b in sorted(t for t in touched if t in st):
            lo = b - (long_window - short_window)
            ln = sum(v[0] for bb, v in st.items() if lo <= bb <= b)
            le = sum(v[1] for bb, v in st.items() if lo <= bb <= b)
            n, e = st[b]
            sb = round((e / n) / budget, 6)
            lb = round((le / ln) / budget, 6)
            rows.append({
                "key": key[0], "bucket_ts": b, "n_events": n, "n_errors": e,
                "long_events": ln, "long_errors": le, "short_burn": sb,
                "long_burn": lb,
                "firing": bool(sb > threshold and lb > threshold),
            })
        yield pd.DataFrame(
            rows,
            columns=["key", "bucket_ts", "n_events", "n_errors",
                     "long_events", "long_errors", "short_burn",
                     "long_burn", "firing"],
        )

    return update


def streaming_burn_rate(rel: DataFrame, short_window: int, long_window: int,
                        slo: float, threshold: float = 1.0,
                        keep_buckets: int | None = None) -> DataFrame:
    """Continuous multiwindow SLO burn-rate monitoring — the streaming
    dual of :func:`~mandodb_spark.operators.temporal.burn_rate_alert`,
    with identical bucket math and rounding so the batch form is the
    replayable source of truth.

    State per key: per-bucket (events, errors) counters for the trailing
    ``keep_buckets`` short buckets (default 2×long/short — the
    correction horizon, the watermark analogue; older late data is
    dropped, same contract as the windowed duals).  Each trigger merges
    its events into the touched buckets and re-emits those buckets'
    rows recomputed against current state — UPSERT semantics: a late
    event inside the horizon re-emits its bucket corrected.  Correction
    scope is the touched buckets; under the ingest path's in-order
    arrival the last emission per bucket equals the batch operator row
    (pinned by test across triggers).

    ``rel``: streaming relation carrying (key, ts, is_err) — ts unix
    seconds, is_err boolean.
    """
    if long_window % short_window != 0 or long_window < short_window:
        raise ValueError("long_window must be a multiple of short_window")
    if not (0.0 < slo < 1.0):
        raise ValueError("slo must be in (0, 1)")
    if keep_buckets is None:
        keep_buckets = 2 * (long_window // short_window)
    return rel.select("key", "ts", "is_err").groupBy("key").applyInPandasWithState(
        _burn_update(short_window, long_window, 1.0 - slo, float(threshold),
                     keep_buckets),
        BURN_OUT_SCHEMA,
        BURN_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming delta → cumulative (round 12): the unbounded-stream leg of
# rows_from_otlp(delta="cumulate").
# ---------------------------------------------------------------------------

#: One output row PER INPUT POINT: the point with its value replaced by
#: the per-series running sum of deltas.
DC_OUT_SCHEMA = "metric string, labels_json string, ts long, value double"
#: Fixed-size per-series state: newest folded event time + running total.
DC_STATE_SCHEMA = "last_ts long, total double"


def _delta_update(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (last_ts, total) = state.get if state.exists else (None, 0.0)
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch):
        batch = batch.sort_values("ts", kind="stable")
    out_ts: list[int] = []
    out_v: list[float] = []
    for ts, v in zip(batch["ts"], batch["value"]):
        ts = int(ts)
        if last_ts is not None and ts <= last_ts:
            # out-of-order (or duplicate-ts) delta against already-folded
            # state: dropped, matching the collector's deltatocumulative
            # processor — folding it NOW would time-shift the increment
            continue
        total += float(v)
        last_ts = ts
        out_ts.append(ts)
        out_v.append(total)
    state.update((last_ts, total))
    yield pd.DataFrame({
        "metric": [key[0]] * len(out_ts),
        "labels_json": [key[1]] * len(out_ts),
        "ts": out_ts,
        "value": out_v,
    })


def streaming_delta_to_cumulative(rel: DataFrame) -> DataFrame:
    """DELTA-temporality float samples on an UNBOUNDED stream →
    cumulative samples: per series, each point's value becomes the
    running sum of every delta folded so far — the streaming dual of
    ``sources.otlp.rows_from_otlp(delta="cumulate")`` (whose event-time
    window needs the whole history resident and is therefore batch-only).
    One fixed-size state row per series (newest ts + running total),
    O(batch) work per trigger.

    Feed it the delta slice of a tagged OTLP decode
    (``rows_from_otlp(..., delta="tag")``, filter ``is_delta``) and
    union the cumulative slice back; out-of-order deltas drop like the
    collector's deltatocumulative processor.  Emits converted ROW_SCHEMA
    rows per trigger (update mode) — chain into a ``StreamingIngestor``
    sink."""
    from pyspark.sql import functions as F

    from ..model import canonical_labels_json

    keyed = rel.select(
        "metric",
        canonical_labels_json(F.col("labels")).alias("labels_json"),
        "ts", "value")
    out = keyed.groupBy("metric", "labels_json").applyInPandasWithState(
        _delta_update, DC_OUT_SCHEMA, DC_STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)
    entries = F.from_json(
        "labels_json", "array<struct<key:string,value:string>>")
    return out.select(
        "metric",
        F.map_from_entries(entries).alias("labels"),
        "ts", "value")
