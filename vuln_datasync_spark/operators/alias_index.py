"""Persisted alias -> canonical-id inverted index for point lookups.

The reference resolves advisories by ANY of their aliases —
``GetVulnerabilityByAlias``: ``SELECT * FROM vulnerabilities WHERE $1 =
ANY(aliases) LIMIT 1`` (/root/reference/sql/vulnerabilities.sql:1-23) —
and materializes an alias cache by unnesting the alias arrays
(/root/reference/sql/vulnerabilities.sql:136-139) so the array-contains
scan becomes an indexed probe. This module is that cache re-expressed
for a partitioned store:

* the exploded ``(alias, id)`` rows are written partitioned by ``pfx``
  (first two hex chars of ``md5(alias)``, ``'x'``-guarded — a FIXED
  256-directory fan-out regardless of catalog size);
* a k-alias probe reads ONLY the partitions its aliases hash into
  (static ``pfx IN`` filter -> parquet directory pruning at planning
  time), so lookup I/O is ∝ k × per-partition volume, never catalog
  size — the Postgres-GIN-index analog for a 10^10-row store;
* maintenance is partition-scoped: an update rewrites only the cells of
  its OLD and NEW aliases (the old side comes from the change feed's
  preimage rows — see ``pipelines/index_sync.py sync_alias_index``),
  untouched partition files stay byte-identical, and replaying a batch
  is idempotent.
"""

from __future__ import annotations

import glob as _glob
import logging
import os as _os
import shutil as _shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

_INDEX_COLS = ["alias", "id", "pfx"]


def _pfx(col: Column) -> Column:
    # the "x" guard pins partition-column type inference (an index whose
    # hex dirs are all-decimal would infer pfx as INT and break the
    # static string `pfx IN` probe filter)
    return F.concat(F.lit("x"), F.substring(F.md5(col), 1, 2))


def _alias_rows(df: DataFrame, alias_col: str, id_col: str) -> DataFrame:
    """(alias, id, pfx) — one row per (record, alias); null/empty alias
    arrays contribute nothing (such records are reachable by primary key
    via ``ManifestTable.lookup`` only, matching the reference's ANY()
    semantics)."""
    return (
        df.select(
            F.explode(F.col(alias_col)).alias("alias"),
            F.col(id_col).alias("id"),
        )
        .where(F.col("alias").isNotNull() & (F.col("alias") != ""))
        .distinct()
        .withColumn("pfx", _pfx(F.col("alias")))
    )


def build_alias_index(
    df: DataFrame,
    index_path: str,
    alias_col: str = "aliases",
    id_col: str = "vuln_id",
) -> dict:
    """Materialize the full alias cache: one explode + one shuffle on
    pfx, 256 output directories. Overwrites any existing index."""
    rows = _alias_rows(df, alias_col, id_col)
    rows.select(*_INDEX_COLS).repartition("pfx").write.partitionBy(
        "pfx"
    ).mode("overwrite").parquet(index_path)
    return {"index_path": index_path}


def lookup_aliases(
    spark: SparkSession, index_path: str, aliases: list[str]
) -> DataFrame:
    """(alias, id) pairs for the probe aliases. Reads ONLY the probe
    aliases' pfx partitions (static planning-time pruning); an alias with
    no record simply yields no row. One alias can map to several ids if
    distinct records genuinely share it (the reference's
    GetVulnerabilityByAliasWithPriority case) — resolution policy belongs
    to the caller."""
    if not aliases:
        return spark.createDataFrame([], "alias string, id string")
    probe = spark.createDataFrame(
        [(a,) for a in aliases], "alias string"
    ).withColumn("pfx", _pfx(F.col("alias")))
    pfxs = sorted({r["pfx"] for r in probe.select("pfx").distinct().collect()})
    idx = spark.read.parquet(index_path).filter(F.col("pfx").isin(pfxs))
    return idx.join(
        F.broadcast(probe.select("alias")), "alias", "inner"
    ).select("alias", "id")


def resolve_aliases(table, index_path: str, aliases: list[str]) -> DataFrame:
    """Full records for the probe aliases: index probe -> id set ->
    ``ManifestTable.lookup`` (bucket-pruned). Total I/O: k pfx partitions
    of the index + ≤k buckets of the table — the end-to-end
    GetVulnerabilityByAlias path, never a table scan."""
    ids = sorted(
        {
            r["id"]
            for r in lookup_aliases(
                table.spark, index_path, aliases
            ).collect()
        }
    )
    return table.lookup(ids)


def update_alias_index(
    index_path: str,
    upserts: DataFrame | None = None,
    removals: DataFrame | None = None,
    alias_col: str = "aliases",
    id_col: str = "vuln_id",
) -> dict:
    """Partition-scoped index maintenance.

    ``upserts``: rows with the records' NEW (id, aliases) state —
    inserts and update postimages. ``removals``: rows with the OLD
    state whose cells must be cleared — deletes and update PREIMAGES
    (an update that dropped an alias leaves a stale cell otherwise;
    the change feed's ``include_preimage=True`` rows are exactly this).

    Touched partitions = pfx cells of old ∪ new aliases. Within them,
    every changed id's rows are dropped and the new rows written back
    (dynamic partition overwrite; a partition vacated entirely is
    removed explicitly, since dynamic overwrite skips partitions absent
    from the written data). Untouched partition files stay
    byte-identical; replay is idempotent. I/O ∝ touched-partition
    volume, never index size."""
    from functools import reduce

    if upserts is None and removals is None:
        return {"touched_partitions": 0}
    spark = (upserts if upserts is not None else removals).sparkSession
    new_rows = (
        _alias_rows(upserts, alias_col, id_col).localCheckpoint(eager=True)
        if upserts is not None
        else None
    )
    old_rows = (
        _alias_rows(removals, alias_col, id_col)
        if removals is not None
        else None
    )
    sides = [s for s in (upserts, removals) if s is not None]
    changed_ids = (
        reduce(
            lambda a, b: a.unionByName(b),
            [s.select(F.col(id_col).alias("id")) for s in sides],
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    touched = sorted(
        {
            r["pfx"]
            for r in reduce(
                lambda a, b: a.unionByName(b),
                [
                    f.select("pfx")
                    for f in (new_rows, old_rows)
                    if f is not None
                ],
            )
            .distinct()
            .collect()
        }
    )
    if not touched:
        return {"touched_partitions": 0}
    have_index = bool(_glob.glob(_os.path.join(index_path, "pfx=*")))
    parts = []
    if have_index:
        parts.append(
            spark.read.parquet(index_path)
            .filter(F.col("pfx").isin(touched))
            .join(changed_ids, "id", "left_anti")
            .select(*_INDEX_COLS)
        )
    if new_rows is not None:
        parts.append(new_rows.select(*_INDEX_COLS))
    if not parts:  # removals against a not-yet-built index
        return {"touched_partitions": 0}
    merged = reduce(lambda a, b: a.unionByName(b), parts)
    # break the read-path dependency: the write overwrites partitions
    # this plan reads
    merged = merged.localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.repartition("pfx").write.partitionBy("pfx").mode(
            "overwrite"
        ).parquet(index_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    present = {
        r["pfx"] for r in merged.select("pfx").distinct().collect()
    }
    for pfx in set(touched) - present:
        cell = _os.path.join(index_path, f"pfx={pfx}")
        if _glob.glob(_os.path.join(cell, "*")):
            _shutil.rmtree(cell, ignore_errors=True)
    return {"touched_partitions": len(touched)}
