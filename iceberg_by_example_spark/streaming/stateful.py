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


# ---------------------------------------------------------------------------
# transformWithState (Spark 4): the successor arbitrary-state API
# ---------------------------------------------------------------------------

try:  # pragma: no cover - import guard exercised by the test module
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningCountProcessor(StatefulProcessor):
        """Per-key cumulative count on the ``transformWithState``
        API — the Spark-4 successor of ``applyInPandasWithState``
        above, with typed per-key state handles (ValueState /
        ListState / MapState), timers, and initial-state support
        instead of a single tuple. State remains per-key and
        partition-local: the operator scales with the grouping
        shuffle, exactly like its predecessor."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("count", "n long")

        def handleInputRows(self, key, rows, timerValues):
            v = self._count.get()
            n = v[0] if v else 0
            for pdf in rows:
                n += len(pdf)
            self._count.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

        def close(self) -> None:
            pass

except ImportError:  # older pyspark: the predecessor API above remains
    RunningCountProcessor = None  # type: ignore[assignment]
