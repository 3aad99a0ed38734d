"""SCD Type-2 dimension maintenance off the change feed.

Keeps a full modification HISTORY of a :class:`ManifestTable` — one row
per version of each key with ``valid_from_ms``/``valid_to_ms`` (commit
epoch-millis of the snapshot that opened/closed it) — maintained
incrementally from :meth:`ManifestTable.read_changes`. Reference analog:
the reference overwrites ``updated_at`` in place
(/root/reference/migrations/001_initial_schema.up.sql:18) and loses
history; here a point-in-time dimension lookup becomes a range predicate
(``valid_from_ms <= t < coalesce(valid_to_ms, inf)``) instead of a
snapshot restore.

Layout (the 100 TB shape):
  * ``current/v-<snapshot>/`` — open versions, REWRITTEN per sync
    (cost ∝ live dimension size, same as any dim-table refresh);
  * ``closed/delta-<snapshot>/`` — versions closed by that sync,
    APPEND-ONLY (cost ∝ delta). History is never rewritten, so the
    unbounded part of the table never participates in a sync.

Exactly-once despite the feed cursor's at-least-once delivery: the
atomic ``_current`` pointer records the applied snapshot; a replayed
window whose target is already applied returns before any write, and
the closed-delta dir is keyed by target snapshot + written with
overwrite, so even a crash between writes replays idempotently.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.manifest_table import ManifestTable


def _pointer(state_root: str) -> dict | None:
    try:
        with open(os.path.join(state_root, "_current")) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _snap_millis(snapshot_id: str) -> int:
    return int(snapshot_id.split("-", 1)[0])


def read_scd2(
    spark: SparkSession, state_root: str, current_only: bool = False
) -> DataFrame:
    """The maintained history (or just the open versions)."""
    cur = _pointer(state_root)
    if cur is None:
        raise FileNotFoundError(f"no scd2 state at {state_root}")
    live = spark.read.parquet(
        os.path.join(state_root, "current", cur["version"])
    )
    if current_only:
        return live
    closed_root = os.path.join(state_root, "closed")
    deltas = [
        os.path.join(closed_root, d)
        for d in (
            sorted(os.listdir(closed_root))
            if os.path.isdir(closed_root)
            else []
        )
    ]
    if not deltas:
        return live
    closed = spark.read.option("mergeSchema", "true").parquet(*deltas)
    return live.unionByName(closed, allowMissingColumns=True)


def scd2_as_of(spark: SparkSession, state_root: str, millis: int) -> DataFrame:
    """Dimension rows as of an epoch-millis instant — a pure range
    filter over the history (zone-map friendly at scale)."""
    h = read_scd2(spark, state_root)
    return h.filter(
        (F.col("valid_from_ms") <= F.lit(millis))
        & (
            F.col("valid_to_ms").isNull()
            | (F.col("valid_to_ms") > F.lit(millis))
        )
    )


def sync_scd2(
    table: ManifestTable,
    state_root: str,
    consumer_id: str = "scd2",
) -> dict | None:
    """Advance the SCD2 history to the table's current snapshot.
    Returns the feed-advance record (+ row stats), or None when
    already current."""
    spark = table.spark
    keys = list(table.key_cols)
    stats: dict = {}

    def handler(feed: DataFrame, frm, to):
        cur = _pointer(state_root)
        if cur is not None and cur["snapshot_id"] == to:
            stats["replayed_noop"] = True
            return
        stamp = _snap_millis(to)
        val_cols = [
            c for c in feed.columns if c not in keys and c != "_change_type"
        ]
        feed = feed.persist()
        try:
            touched = feed.select(*keys).distinct()
            opened = feed.filter(
                F.col("_change_type").isin("insert", "update")
            ).select(
                *keys,
                *val_cols,
                F.lit(stamp).cast("long").alias("valid_from_ms"),
                F.lit(None).cast("long").alias("valid_to_ms"),
            )
            if cur is None:
                base = spark.createDataFrame([], opened.schema)
            else:
                base = spark.read.parquet(
                    os.path.join(state_root, "current", cur["version"])
                )
            # versions of touched keys close at this commit; broadcast
            # decided by AQE from the (delta-sized) touched frame
            closing = base.join(touched, on=keys, how="left_semi").withColumn(
                "valid_to_ms", F.lit(stamp).cast("long")
            )
            surviving = base.join(touched, on=keys, how="left_anti")
            closed_dir = os.path.join(state_root, "closed", f"delta-{to}")
            closing.write.mode("overwrite").parquet(closed_dir)
            version = f"v-{to}"
            # allowMissingColumns: a column added to the table between
            # syncs appears in `opened` before the old `base` has it
            new_cur = surviving.unionByName(
                opened, allowMissingColumns=True
            )
            new_cur.write.mode("overwrite").parquet(
                os.path.join(state_root, "current", version)
            )
            ptr = os.path.join(state_root, "_current")
            with open(ptr + ".tmp", "w") as f:
                json.dump({"version": version, "snapshot_id": to}, f)
            os.replace(ptr + ".tmp", ptr)
        finally:
            feed.unpersist()
        stats["current_rows"] = spark.read.parquet(
            os.path.join(state_root, "current", version)
        ).count()
        stats["closed_rows"] = spark.read.parquet(closed_dir).count()
        if cur is not None and cur["version"] != version:
            shutil.rmtree(
                os.path.join(state_root, "current", cur["version"]),
                ignore_errors=True,
            )

    rec = table.consume_changes(consumer_id, handler)
    if rec is None:
        return None
    rec.update(stats)
    return rec
