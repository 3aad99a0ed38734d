"""Incremental materialized-aggregate maintenance off the change feed.

The classic CDC consumer (reference analog: the dashboard count queries
re-run per sync, /root/reference/sql/vulnerabilities.sql:105-126 — here
they become O(delta) instead of O(table)): maintain per-dimension counts
(and an optional sum) in a tiny persisted state table by applying
+f(row) for insert/update_postimage and -f(row) for
delete/update_preimage rows of :meth:`ManifestTable.read_changes`
``include_preimage=True`` feed.

Cost per sync ∝ the delta (feed read prunes untouched buckets, the
delta aggregate shuffles feed rows only, the state merge joins two
group-count tables) — never the base table. State commits are
exactly-once despite the feed's at-least-once delivery: each state
version records the snapshot it reflects under a versioned directory +
atomic pointer (the same construction as the ManifestTable manifest),
and a replayed window whose target snapshot is already applied becomes
a no-op before any write.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.manifest_table import ManifestTable


def _pointer(state_root: str) -> dict | None:
    try:
        with open(os.path.join(state_root, "_current")) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def read_agg(spark: SparkSession, state_root: str) -> DataFrame:
    """Current materialized aggregate (empty-state error if never synced)."""
    cur = _pointer(state_root)
    if cur is None:
        raise FileNotFoundError(f"no aggregate state at {state_root}")
    return spark.read.parquet(os.path.join(state_root, cur["version"]))


def sync_agg(
    table: ManifestTable,
    state_root: str,
    dims: list[str],
    consumer_id: str = "agg",
    sum_col: str | None = None,
    distinct_col: str | None = None,
) -> dict | None:
    """Advance the materialized per-``dims`` aggregate to the table's
    current snapshot. Returns the feed-advance record, or None when
    already current. Maintained measures: ``n`` (live row count) and,
    with ``sum_col``, ``sum_<col>`` — both additive, so the feed delta
    is exact.

    ``distinct_col`` additionally maintains an EXACT
    ``distinct_<col>`` (COUNT(DISTINCT col) per dims, nulls ignored)
    under the feed's insert/delete/update retractions. Distinct is not
    additive, so it rides a *support table* — one (dims, value, cnt)
    row per live distinct value, updated with the same +/- signs and
    swept at cnt == 0 (the classic incremental-view-maintenance
    construction; a KMV sketch would be O(k) but is not retractable —
    a delete cannot resurrect an evicted hash). Support state is ∝
    live distinct values, never ∝ rows; the per-sync update joins the
    delta only. It lives under ``<version>/_sup`` — the underscore
    prefix keeps parquet readers of the version dir blind to it."""
    spark = table.spark
    stats: dict = {}

    def handler(feed: DataFrame, frm, to):
        cur = _pointer(state_root)
        if cur is not None and cur["snapshot_id"] == to:
            stats["replayed_noop"] = True
            return
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1),
        ).otherwise(F.lit(-1))
        measures = [F.sum(sign).alias("n")]
        if sum_col is not None:
            measures.append(
                F.sum(sign * F.coalesce(F.col(sum_col), F.lit(0))).alias(
                    f"sum_{sum_col}"
                )
            )
        dcol = f"distinct_{distinct_col}" if distinct_col else None
        delta = feed.groupBy(*dims).agg(*measures)
        if cur is None:
            merged = delta
        else:
            base = spark.read.parquet(os.path.join(state_root, cur["version"]))
            merged = (
                base.drop(dcol) if dcol else base
            )
            merged = (
                merged.unionByName(delta)
                .groupBy(*dims)
                .agg(
                    *[
                        F.sum(c).alias(c)
                        for c in merged.columns
                        if c not in dims
                    ]
                )
            )
        merged = merged.filter(F.col("n") != 0)
        version = f"v-{to}"
        vdir = os.path.join(state_root, version)
        # a crashed previous attempt at the same target snapshot may have
        # left a partial vdir (the pointer never moved to it) — clear it,
        # then build the version dir additively: _sup first, agg files
        # appended beside it (mode("overwrite") on vdir would delete _sup)
        import shutil

        shutil.rmtree(vdir, ignore_errors=True)
        if distinct_col is not None:
            sup_delta = (
                feed.filter(F.col(distinct_col).isNotNull())
                .groupBy(*dims, F.col(distinct_col).alias("_val"))
                .agg(F.sum(sign).alias("_cnt"))
            )
            if cur is None:
                sup = sup_delta
            else:
                sup_base = spark.read.parquet(
                    os.path.join(state_root, cur["version"], "_sup")
                )
                sup = (
                    sup_base.unionByName(sup_delta)
                    .groupBy(*dims, "_val")
                    .agg(F.sum("_cnt").alias("_cnt"))
                )
            sup = sup.filter(F.col("_cnt") != 0)
            sup.write.mode("overwrite").parquet(os.path.join(vdir, "_sup"))
            dc = (
                spark.read.parquet(os.path.join(vdir, "_sup"))
                .groupBy(*dims)
                .agg(F.count("*").alias(dcol))
            )
            # left join: a group can be live (n > 0) with zero non-null
            # distinct values
            merged = merged.join(dc, dims, "left").withColumn(
                dcol, F.coalesce(F.col(dcol), F.lit(0))
            )
        merged.write.mode("append").parquet(vdir)
        ptr = os.path.join(state_root, "_current")
        with open(ptr + ".tmp", "w") as f:
            json.dump({"version": version, "snapshot_id": to}, f)
        os.replace(ptr + ".tmp", ptr)
        # count from the just-written files: merged's plan still reads the
        # OLD version dir, which is about to be removed
        stats["groups"] = spark.read.parquet(vdir).count()
        if cur is not None and cur["version"] != version:
            import shutil

            shutil.rmtree(
                os.path.join(state_root, cur["version"]), ignore_errors=True
            )

    def preimage_feed(frm, to):
        return table.read_changes(frm, to, include_preimage=True)

    # consume_changes hands us the plain feed; re-read with preimages so
    # dimension-changing updates decrement their old group
    def wrapped(_feed, frm, to):
        handler(preimage_feed(frm, to), frm, to)

    rec = table.consume_changes(consumer_id, wrapped)
    if rec is None:
        return None
    rec.update(stats)
    return rec
