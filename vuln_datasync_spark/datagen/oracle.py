"""Single-threaded pandas oracle: replay the changelog to the final state.

This is the stand-in for the reference system's final table state after a
full sync (reference semantics: deterministic-key upsert overwrites the row,
last writer wins — /root/reference/sql/vulnerabilities.sql:66-90; identical
data_hash is a no-op — /root/reference/internal/merger/merger.go:124-137;
delete removes the row — /root/reference/sql/vulnerabilities.sql:101-102).

Total order for "last": ``(commit_seq, commit, op)`` — duplicates (identical
rows) are naturally idempotent; distinct events with equal commit_seq resolve
by the same deterministic tiebreak the engine uses, so sha256 row equality
holds at any parallelism (SURVEY.md §7.3 #2).
"""

from __future__ import annotations

import hashlib

import pandas as pd


def replay_oracle(events: pd.DataFrame) -> pd.DataFrame:
    """Replay change events -> final state with ``content_sha256``.

    Returns columns: repo, path, commit, lang, content, content_sha256
    (+ any extra payload columns, e.g. size_bytes) for keys whose winning
    event is not a delete.
    """
    ev = events.sort_values(
        ["commit_seq", "commit", "op"], kind="stable"
    ).drop_duplicates()  # exact duplicate events are no-ops
    winners = ev.groupby(["repo", "path"], sort=False).tail(1)
    final = winners[winners.op != "delete"].copy()
    final["content_sha256"] = [
        hashlib.sha256(c.encode()).hexdigest() for c in final.content
    ]
    drop = [c for c in ("op", "ts") if c in final.columns]
    return final.drop(columns=drop).reset_index(drop=True)
