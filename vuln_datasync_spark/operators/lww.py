"""Last-writer-wins resolution per key — the engine's core reduce.

Reference semantics: every upsert overwrites the full row, so the final state
is the event with the greatest sequence per key
(/root/reference/sql/vulnerabilities.sql:66-90 — ON CONFLICT DO UPDATE;
/root/reference/internal/merger/normalizer.go:408-411 — most-recent wins).

Total order: ``(commit_seq, commit, op)`` so ties (exact duplicate events,
~3% of the log) resolve identically at any parallelism.

Two strategies, same result:

* ``mode="maxby"`` — single ``groupBy(key).agg(max(struct(ord, payload)))``.
  Spark's hash aggregate already performs a map-side partial ``max`` per
  task, so this is implicitly a local/global two-phase reduce with no skew
  exposure: each task's hot-key contribution collapses to ONE row before the
  shuffle.  This is the plan you want at 100 TB.

* ``mode="salted"`` — the explicit salted two-phase reduce (north-rule
  form): repartition on ``(repo, path, salt)`` with
  ``salt = pmod(xxhash64(commit), n_salts)``, local max per salt group, then
  global max per key.  Useful when the local aggregate is forced through a
  sort- or object-hash path (wide payloads) where map-side combine degrades;
  kept benchmarked against ``maxby`` in bench.py.

Both avoid the window-function formulation (``row_number() OVER
(PARTITION BY key ORDER BY ...)``), which materializes and sorts EVERY event
of a hot key inside one partition — exactly the skew the north rule exists
to break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import LWW_ORDER_COLS

KEY_COLS = ("repo", "path")


def _ord_struct() -> F.Column:
    return F.struct(*[F.col(c) for c in LWW_ORDER_COLS]).alias("_ord")


def lww_resolve(
    events: DataFrame,
    mode: str = "maxby",
    n_salts: int = 16,
    key_cols: tuple[str, ...] = KEY_COLS,
) -> DataFrame:
    """Reduce a change-event batch to one winning event per key.

    Input: normalized events (must contain key_cols + LWW_ORDER_COLS).
    Output: one row per key, original event columns.
    """
    payload_cols = [c for c in events.columns if c not in key_cols]
    packed = F.struct(
        _ord_struct(), F.struct(*[F.col(c) for c in payload_cols]).alias("_p")
    )

    if mode == "maxby":
        won = events.groupBy(*key_cols).agg(F.max(packed).alias("_w"))
    elif mode == "salted":
        salt = F.pmod(F.xxhash64(F.col("commit"), F.col("commit_seq")), F.lit(n_salts))
        local = (
            events.withColumn("_salt", salt)
            .groupBy(*key_cols, "_salt")
            .agg(F.max(packed).alias("_w"))
        )
        won = local.groupBy(*key_cols).agg(F.max(F.col("_w")).alias("_w"))
    else:
        raise ValueError(f"unknown lww mode: {mode}")

    return won.select(
        *key_cols, *[F.col(f"_w._p.{c}").alias(c) for c in payload_cols]
    )
