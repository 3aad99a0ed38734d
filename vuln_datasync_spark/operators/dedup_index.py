"""Persisted MinHash-LSH index for INCREMENTAL near-dup detection.

The batch operator (``operators/dedup.py minhash_lsh_candidates``) prices
every call at a full signature pass over its input — right for one-shot
corpus dedup, wrong for a STREAMING corpus where each micro-batch must be
checked against everything already ingested (reference analog: the
reference re-probes its whole store per sync run —
/root/reference/sql/vulnerabilities.sql:34-35 data-hash scan; at 10^10
docs a per-batch recompute of corpus signatures is the scale-killer).

Here the corpus's banded signature rows are materialized ONCE, partitioned
by ``(band, pfx)`` where ``pfx`` is the first two hex chars of the bucket
hash — a FIXED ``bands x 256`` directory fan-out regardless of corpus
size, so the touched-partition set is always collectable on the driver.
Each incoming micro-batch then:

1. signatures ONLY its own docs (compute ∝ batch size),
2. reads ONLY the index partitions its buckets hash into (static
   per-band ``pfx IN`` filters → parquet directory pruning; I/O ∝ the
   batch's bucket spread × per-partition volume, never corpus size),
3. emits ``(new_id, dup_id, est_jaccard)`` pairs against the corpus, and
4. optionally folds its own rows into the touched partitions (dynamic
   partition overwrite — untouched partition files stay byte-identical,
   re-published ids are replaced within touched partitions, so replaying
   a micro-batch is idempotent).

Documents are treated as content-immutable (the normal corpus contract:
ids are content-addressed upstream). A re-published id whose TEXT changed
hashes into different buckets and may leave stale rows in its old cells;
that flow belongs to a rebuild, and ``upsert_minhash_index`` documents it.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _cap_hot_groups, minhash_signature

logger = logging.getLogger(__name__)

_INDEX_COLS = ["id", "minhash", "bucket", "band", "pfx"]


def _band_rows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    bands: int,
    shingle_k: int,
) -> DataFrame:
    """(id, minhash, band, bucket, pfx) — one row per doc per band.

    The minhash array rides along on every band row (k × 32-char strings,
    duplicated ``bands`` times) so a probe can compute est_jaccard from
    the joined rows alone — no second lookup pass over the index. The
    frame is localCheckpoint-ed: callers fan it into several plan
    branches (touched-set collect, the probe join, the upsert write) and
    the expensive shingle→md5 signature work must run once.
    """
    r = k // bands
    sig = minhash_signature(df, text_col, k, shingle_k).select(
        F.col(id_col).alias("id"), "minhash"
    )
    rows = sig.select(
        "id",
        "minhash",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[F.col("minhash")[b * r + j] for j in range(r)],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    ).withColumn(
        # the "x" guard pins partition-column type inference: a small
        # index whose two-hex-char dirs happen to be all-decimal
        # (pfx=12, pfx=34, ...) would otherwise infer pfx as INT on
        # read, and the static `pfx IN ('5d', ...)` probe filter would
        # die casting its string literals
        "pfx",
        F.concat(F.lit("x"), F.substring("bucket", 1, 2)),
    )
    return rows.localCheckpoint(eager=True)


def _touched_filter(touched: list[tuple[int, str]]) -> Column:
    """Static (band, pfx) membership filter — bounded by bands × 256
    cells structurally, so it is always small enough to inline (directory
    pruning happens at planning time, no runtime DPP needed)."""
    by_band: dict[int, list[str]] = {}
    for band, pfx in touched:
        by_band.setdefault(band, []).append(pfx)
    cond = None
    for band, pfxs in sorted(by_band.items()):
        c = (F.col("band") == band) & F.col("pfx").isin(pfxs)
        cond = c if cond is None else (cond | c)
    return cond


def build_minhash_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    out_path: str,
    k: int = 8,
    bands: int = 4,
    shingle_k: int = 5,
) -> dict:
    """Materialize the corpus's banded minhash rows, partitioned by
    (band, pfx). One signature pass, one write; the layout is what makes
    every later probe's I/O ∝ probe size."""
    rows = _band_rows(df, text_col, id_col, k, bands, shingle_k)
    rows.select(*_INDEX_COLS).repartition("band", "pfx").write.partitionBy(
        "band", "pfx"
    ).mode("overwrite").parquet(out_path)
    return {"bands": bands, "k": k, "shingle_k": shingle_k}


def dedup_against_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    index_path: str,
    k: int = 8,
    bands: int = 4,
    shingle_k: int = 5,
    max_bucket_size: int | None = 2000,
    threshold: float | None = None,
) -> DataFrame:
    """Near-dup pairs (new_id, dup_id, est_jaccard) between a new batch
    and the PERSISTED corpus index — without touching corpus docs outside
    the batch's own (band, pfx) partitions.

    ``max_bucket_size`` caps hot index buckets (boilerplate) exactly like
    the batch operator — default on, pass ``None`` to opt out. A doc id
    present on both sides never matches itself, so re-probing an
    already-ingested batch is safe. ``threshold`` optionally filters on
    est_jaccard (fraction of matching minhashes).
    """
    spark = df.sparkSession
    delta = _band_rows(df, text_col, id_col, k, bands, shingle_k)
    touched = [
        (r["band"], r["pfx"])
        for r in delta.select("band", "pfx").distinct().collect()
    ]
    if not touched:
        idt = df.schema[id_col].dataType.simpleString()
        return spark.createDataFrame(
            [], f"new_id {idt}, dup_id {idt}, est_jaccard double"
        )
    idx = spark.read.parquet(index_path).filter(_touched_filter(touched))
    if max_bucket_size is not None:
        idx = _cap_hot_groups(
            idx, ["band", "bucket"], max_bucket_size, "minhash_index"
        )
    n, e = delta.alias("n"), idx.alias("e")
    joined = n.join(
        e,
        (F.col("n.band") == F.col("e.band"))
        & (F.col("n.bucket") == F.col("e.bucket"))
        & (F.col("n.id") != F.col("e.id")),
    )
    # a pair matching in several bands collapses to one row; minhash
    # arrays are functionally dependent on the id, so first() is exact
    pairs = joined.groupBy(
        F.col("n.id").alias("new_id"), F.col("e.id").alias("dup_id")
    ).agg(
        F.first(F.col("n.minhash")).alias("_mh_n"),
        F.first(F.col("e.minhash")).alias("_mh_e"),
    )
    out = pairs.select(
        "new_id",
        "dup_id",
        F.round(
            F.size(
                F.filter(
                    F.zip_with("_mh_n", "_mh_e", lambda x, y: x == y),
                    lambda m: m,
                )
            )
            / F.lit(float(k)),
            4,
        ).alias("est_jaccard"),
    )
    if threshold is not None:
        out = out.filter(F.col("est_jaccard") >= threshold)
    return out


def upsert_minhash_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    index_path: str,
    k: int = 8,
    bands: int = 4,
    shingle_k: int = 5,
) -> dict:
    """Fold a batch's band rows into the index, rewriting ONLY the
    (band, pfx) partitions the batch hashes into (dynamic partition
    overwrite — untouched partition files stay byte-identical). Existing
    rows for the batch's ids are replaced within those partitions, so
    replaying the same batch is idempotent.

    Every touched partition receives at least one delta row by
    construction (touched = the delta's own cells), so — unlike
    ``upsert_ann_index``, which probes old signatures — no vacated-cell
    cleanup is needed here. The flip side: a re-published id whose TEXT
    changed may leave stale rows in its OLD cells; content-immutable ids
    are this index's contract (rebuild if that ever breaks).
    """
    spark = df.sparkSession
    rows = _band_rows(df, text_col, id_col, k, bands, shingle_k)
    touched = [
        (r["band"], r["pfx"])
        for r in rows.select("band", "pfx").distinct().collect()
    ]
    if not touched:
        return {"touched_partitions": 0}
    existing = spark.read.parquet(index_path).filter(
        _touched_filter(touched)
    )
    delta_ids = rows.select("id").distinct()
    kept = existing.join(delta_ids, "id", "left_anti")
    merged = (
        kept.select(*_INDEX_COLS)
        .unionByName(rows.select(*_INDEX_COLS))
        # break the read-path dependency: the write overwrites partitions
        # this plan reads
        .localCheckpoint(eager=True)
    )
    prev = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.repartition("band", "pfx").write.partitionBy(
            "band", "pfx"
        ).mode("overwrite").parquet(index_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {"touched_partitions": len(touched)}


def delete_from_minhash_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    index_path: str,
    k: int = 8,
    bands: int = 4,
    shingle_k: int = 5,
) -> dict:
    """Remove documents from the index (takedown / corpus delete): the
    content-addressed contract means a doc's cells are RECOMPUTABLE from
    its text — no sidecar needed — and a delete feed row carries the old
    text (``read_changes`` delete rows / ``update_preimage``), so this
    composes directly with the change feed.

    Recomputes the victims' band rows (compute ∝ victims), rewrites only
    their (band, pfx) partitions without their ids, and explicitly clears
    a partition whose rows ALL belonged to victims (dynamic overwrite
    skips partitions absent from the written data — same vacated-cell
    rule as ``upsert_ann_index``). I/O ∝ touched-partition volume."""
    import glob as _g
    import os as _os
    import shutil as _sh

    spark = df.sparkSession
    rows = _band_rows(df, text_col, id_col, k, bands, shingle_k)
    touched = [
        (r["band"], r["pfx"])
        for r in rows.select("band", "pfx").distinct().collect()
    ]
    if not touched:
        return {"touched_partitions": 0, "deleted_ids": 0}
    victim_ids = rows.select("id").distinct().localCheckpoint(eager=True)
    kept = (
        spark.read.parquet(index_path)
        .filter(_touched_filter(touched))
        .join(victim_ids, "id", "left_anti")
        .select(*_INDEX_COLS)
        .localCheckpoint(eager=True)
    )
    prev = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        kept.repartition("band", "pfx").write.partitionBy(
            "band", "pfx"
        ).mode("overwrite").parquet(index_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    present = {
        (r["band"], r["pfx"])
        for r in kept.select("band", "pfx").distinct().collect()
    }
    for band, pfx in set(touched) - present:
        cell = _os.path.join(index_path, f"band={band}", f"pfx={pfx}")
        if _g.glob(_os.path.join(cell, "*")):
            _sh.rmtree(cell, ignore_errors=True)
    return {
        "touched_partitions": len(touched),
        "deleted_ids": victim_ids.count(),
    }
