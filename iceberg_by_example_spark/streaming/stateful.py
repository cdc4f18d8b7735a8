"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming at all (§2.13); these are the
engine-extension operators a production event pipeline needs. Each
function is a group-state transition: (key, Arrow batches, GroupState)
→ output batches. State is per-key and partition-local, so the
operator scales with the shuffle that groups keys — no global state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql.streaming.state import GroupState


def running_count(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Cumulative event count per key, emitted on every update."""
    count = state.get[0] if state.exists else 0
    for pdf in pdfs:
        count += len(pdf)
    state.update((count,))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [count]})


def running_value_stats(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Streaming per-key (count, sum, min, max) over a double column —
    the partial-aggregate shape that composes under restarts."""
    if state.exists:
        count, total, vmin, vmax = state.get
    else:
        count, total, vmin, vmax = 0, 0.0, None, None
    for pdf in pdfs:
        if len(pdf):
            count += len(pdf)
            total += float(pdf["value"].sum())
            bmin = float(pdf["value"].min())
            bmax = float(pdf["value"].max())
            vmin = bmin if vmin is None else min(vmin, bmin)
            vmax = bmax if vmax is None else max(vmax, bmax)
    state.update((count, total, vmin, vmax))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [count],
            "sum_value": [total],
            "min_value": [vmin],
            "max_value": [vmax],
        }
    )


RUNNING_COUNT_OUTPUT = "user_id long, n_events long"
RUNNING_COUNT_STATE = "n long"
RUNNING_STATS_OUTPUT = (
    "user_id long, n_events long, sum_value double, "
    "min_value double, max_value double"
)
RUNNING_STATS_STATE = "n long, total double, vmin double, vmax double"
