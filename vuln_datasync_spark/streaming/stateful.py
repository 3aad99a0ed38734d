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


def _make_kmv_update_fn(k: int, idle_timeout_ms: int):
    def update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        import numpy as np

        if state.hasTimedOut:
            state.remove()
            return
        cur = (
            np.array(state.get[0], dtype="int64")
            if state.exists
            else np.empty(0, dtype="int64")
        )
        for pdf in pdfs:
            hs = pdf["_h"].to_numpy(dtype="int64")
            cur = np.unique(np.concatenate([cur, hs]))[:k]
        state.update(([int(h) for h in cur],))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        est = len(cur) if len(cur) < k else int(
            float(k - 1) * (2.0 ** 60) // float(cur[-1])
        )
        yield pd.DataFrame({"key": [key[0]], "est_distinct": [est]})

    return update


def kmv_distinct_stream(
    events: DataFrame,
    key_col: str,
    value_col: str,
    k: int = 64,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming distinct-count per key with O(k) state: the KMV sketch
    of :mod:`..operators.sketch` carried across micro-batches via
    ``applyInPandasWithState`` (update mode).

    Hashing happens JVM-side BEFORE the stateful operator (the same
    md5-derived 60-bit hash as batch ``kmv_distinct``), so the Python
    side only merges sorted int arrays — no per-row Python on values.
    Because the hash is deterministic and KMV union is order-free, the
    final per-key estimate is IDENTICAL to running batch
    ``kmv_distinct`` over the concatenation of every micro-batch —
    however the stream was chopped (the e2e test asserts equality).
    State per key is k int64s; ``idle_timeout_ms`` retires cold keys.
    A streaming ``count(DISTINCT)`` is unexpressible in Spark; the
    exact alternative (dropDuplicates + count) keeps state ∝ distinct
    values, unbounded over a 10^10-event stream — this keeps it O(k).
    """
    from pyspark.sql import functions as F

    from ..operators.sketch import _h60

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    hashed = (
        events.select(
            F.col(key_col).alias("key"),
            _h60(F.col(value_col).cast("string")).alias("_h"),
        )
        .filter(F.col("_h").isNotNull())
    )
    key_type = hashed.schema["key"].dataType.simpleString()
    return hashed.groupBy("key").applyInPandasWithState(
        _make_kmv_update_fn(int(k), int(idle_timeout_ms or 0)),
        outputStructType=f"key {key_type}, est_distinct long",
        stateStructType="hashes array<bigint>",
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms
            else GroupStateTimeout.NoTimeout
        ),
    )
