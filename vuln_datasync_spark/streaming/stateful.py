"""Custom stateful streaming operator: per-repo running ingest statistics.

The reference accumulates per-run counters in Go structs
(/root/reference/internal/jobs/server.go:241-261, ProcessingResult) and
persists them per source run (processing_stats). The streaming-native
restatement keeps PER-KEY state across micro-batches with
``applyInPandasWithState``: for every repo, a running count of change
events, inserts/updates/deletes, max commit_seq, and distinct-path
estimate — emitted as an updated row whenever the key sees new events.

Arrow-batched (pandas per group), bounded state (fixed-width counters
per key). ``idle_timeout_ms`` retires cold repos via processing-time
timeout — without it, state grows with the number of EVER-seen keys
(unbounded over a 10^10-event stream); with it, state is bounded by the
working set of ACTIVE repos.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = (
    "n_events long, n_insert long, n_update long, n_delete long, "
    "max_seq long"
)
OUTPUT_SCHEMA = (
    "repo string, n_events long, n_insert long, n_update long, "
    "n_delete long, max_seq long"
)


def _make_update_fn(idle_timeout_ms: int):
    """Build the per-group update function with the timeout captured in the
    closure — closures are cloudpickled BY VALUE to the Python workers,
    while a module-level global would be re-imported there as its default
    (workers import this module fresh; they do not see driver-side
    mutations)."""

    def update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            # cold key: retire its counters; a later event starts fresh
            state.remove()
            return
        if state.exists:
            n_events, n_ins, n_upd, n_del, max_seq = state.get
        else:
            n_events = n_ins = n_upd = n_del = 0
            max_seq = -1
        for pdf in pdfs:
            n_events += len(pdf)
            ops = pdf["op"].value_counts()
            n_ins += int(ops.get("insert", 0))
            n_upd += int(ops.get("update", 0))
            n_del += int(ops.get("delete", 0))
            max_seq = max(max_seq, int(pdf["commit_seq"].max()))
        state.update((n_events, n_ins, n_upd, n_del, max_seq))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "repo": [key[0]],
                "n_events": [n_events],
                "n_insert": [n_ins],
                "n_update": [n_upd],
                "n_delete": [n_del],
                "max_seq": [max_seq],
            }
        )

    return update


# default (no-timeout) instance, kept importable for tests/back-compat
_update_repo_stats = _make_update_fn(0)


def repo_stats_stream(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Streaming DataFrame -> per-repo running counters (update mode).

    ``idle_timeout_ms``: retire a repo's state after it has seen no events
    for this long (processing time). The timed-out key emits nothing; its
    next event restarts counters from zero. Omitted, counters live for the
    stream's lifetime (the r02 behavior)."""
    return (
        events.select("repo", "op", "commit_seq")
        .groupBy("repo")
        .applyInPandasWithState(
            _make_update_fn(int(idle_timeout_ms or 0)),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_timeout_ms
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
