"""Watermarked stream-stream joins (SURVEY.md §2.10).

The reference correlates two live feeds only by landing both in Postgres
and joining at query time (advisories ∪ changelog events; e.g. the alias
lookups behind sync, /root/reference/sql/vulnerabilities.sql:16-21). The
streaming-native form is Spark's stream-stream interval join: each side
buffers rows in state, emits matches as they arrive, and — this is the
part that makes it viable at 100 TB/day — evicts state as the watermark
passes, so memory is bounded by (event-time skew + interval width) ×
arrival rate, never by stream length.

Correct state cleanup needs BOTH of:

* a watermark on both inputs (how late data may arrive), and
* a time-range join condition bounding how far apart matching events can
  be — without it Spark must keep every row forever.

``stream_interval_join`` assembles exactly that shape and refuses column
collisions up front (the asof-join lesson: silent ambiguity is worse
than an error).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | tuple[str, ...],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "15 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING frames on equality keys + an event-time
    interval: a right row matches a left row when ``on`` keys are equal
    and ``right_ts`` lies in ``[left_ts - lower, left_ts + upper]``.

    Output: all left columns, plus the right side's non-key columns
    (``right_ts`` included — callers often want the matched event's own
    time). A name collision between the two sides raises ``ValueError``;
    rename before joining.

    ``watermark`` applies to both sides: rows later than this (vs the
    max event time seen) may be dropped, and matched state older than
    watermark + interval is evicted. ``how``: inner | left_outer |
    right_outer | full_outer (outer results emit only once the watermark
    proves no match can still arrive — expect them at least one trigger
    late).

    Batch frames are accepted too (same plan, no state) — handy for
    backtesting the exact join a stream will run.

    Scale: state is partitioned by the join keys (one shuffle per side),
    per-key state bounded by interval × per-key rate; skewed keys behave
    like any skewed shuffle (salt upstream if one key dominates).
    """
    on = list(on)
    for k in on:
        for side, df in (("left", left), ("right", right)):
            if k not in df.columns:
                raise ValueError(f"join key {k!r} missing from {side} side")
    if left_ts not in left.columns:
        raise ValueError(f"left_ts {left_ts!r} missing from left side")
    if right_ts not in right.columns:
        raise ValueError(f"right_ts {right_ts!r} missing from right side")
    r_payload = [c for c in right.columns if c not in on]
    clash = sorted(set(r_payload) & set(left.columns))
    if clash:
        raise ValueError(
            f"column collision between sides: {clash}; rename before joining"
        )

    l_ = left.withWatermark(left_ts, watermark).alias("_sjl")
    r_ = right.withWatermark(right_ts, watermark).alias("_sjr")
    eq = [F.col(f"_sjl.{k}") == F.col(f"_sjr.{k}") for k in on]
    lo = F.col(f"_sjr.{right_ts}") >= (
        F.col(f"_sjl.{left_ts}") - F.expr(f"INTERVAL {lower}")
    )
    hi = F.col(f"_sjr.{right_ts}") <= (
        F.col(f"_sjl.{left_ts}") + F.expr(f"INTERVAL {upper}")
    )
    cond = reduce(lambda a, b: a & b, eq + [lo, hi])
    joined = l_.join(r_, cond, how)
    out_keys = [
        F.coalesce(F.col(f"_sjl.{k}"), F.col(f"_sjr.{k}")).alias(k)
        if how in ("right_outer", "full_outer")
        else F.col(f"_sjl.{k}").alias(k)
        for k in on
    ]
    l_payload = [
        F.col(f"_sjl.{c}").alias(c) for c in left.columns if c not in on
    ]
    r_cols = [F.col(f"_sjr.{c}").alias(c) for c in r_payload]
    return joined.select(*out_keys, *l_payload, *r_cols)
