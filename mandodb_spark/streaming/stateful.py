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
