"""Change-feed -> ANN-index synchronization.

Composes the two incremental halves the engine already has into the
search-index-maintenance loop a vector corpus needs (reference analog:
the incremental since-watermark sync consumers,
/root/reference/sql/vulnerabilities.sql:128-132):

    ManifestTable (vectors, CDC-merged)
        └─ consume_changes(consumer)       rows changed since the cursor
             └─ upsert_ann_index           rewrite only touched cells
                (insert/update -> upsert; delete -> sidecar-guided drop)

Every step is ∝ the delta: the feed reads only buckets whose manifest
file lists changed, the index rewrite touches only the delta's
(band, bucket) cells, deletes find their cells via the ``_ids`` sidecar.
Nothing in the loop scales with table or index size, so the same call
services a 10^10-vector corpus. Delivery is at-least-once off the feed
cursor and the index write is an idempotent overwrite of the same cells,
so a crash between index write and cursor advance is safe to replay.
"""

from __future__ import annotations

import glob
import logging

from pyspark.sql import functions as F

from ..operators.similarity import build_ann_index, upsert_ann_index
from ..sinks.manifest_table import ManifestTable

logger = logging.getLogger(__name__)


def _seed_rows(table: ManifestTable, to_snapshot_id: str, cols: list[str]):
    """Re-seed source when the index directory is MISSING but the
    consumer cursor EXISTS (frm is not None — e.g. the index was wiped or
    relocated between syncs). The delta alone must not seed the rebuild:
    the cursor still advances, so every document outside that delta would
    be silently absent from the index until a manual rebuild. Read the
    full live table at the feed's target snapshot instead — same cost as
    the first-ever bootstrap, and the cursor advance stays truthful."""
    return table.read(to_snapshot_id).select(*cols)


def sync_ann_index(
    table: ManifestTable,
    index_path: str,
    vec_col: str,
    dim: int,
    consumer_id: str = "ann-index",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    reset_on_missing_base: bool = False,
) -> dict | None:
    """Advance ``index_path`` to the table's current snapshot. Returns
    the feed-advance record annotated with the index-maintenance stats,
    or None when the index is already current.

    The table must be single-key (the key is the vector id). First call
    (or a re-seed after the cursor's base snapshot expired) bulk-builds
    the index from the full feed; later calls upsert only the delta."""
    if len(table.key_cols) != 1:
        raise ValueError(
            "sync_ann_index needs a single-key table (the vector id); "
            f"got key_cols={table.key_cols}"
        )
    id_col = table.key_cols[0]
    stats: dict = {}

    def handler(feed, frm, to):
        ups = feed.filter(
            F.col("_change_type").isin("insert", "update")
        ).select(id_col, vec_col)
        have_index = bool(glob.glob(f"{index_path}/band=*"))
        if frm is None or not have_index:
            # frm None: the feed IS the full live table. frm set but index
            # missing: re-seed from the full table at `to` (see _seed_rows)
            src = ups if frm is None else _seed_rows(
                table, to, [id_col, vec_col]
            )
            build_ann_index(
                src, vec_col, id_col, dim, index_path, n_planes, bands, seed
            )
            stats["bootstrap"] = True
            return
        dels = feed.filter(F.col("_change_type") == "delete").select(id_col)
        # a tiny action on the (delta-sized) feed decides whether the
        # delete path runs at all
        n_dels = dels.count()
        stats.update(
            upsert_ann_index(
                ups,
                vec_col,
                id_col,
                dim,
                index_path,
                n_planes,
                bands,
                seed,
                delete_ids=dels if n_dels else None,
            )
        )

    rec = table.consume_changes(
        consumer_id, handler, reset_on_missing_base=reset_on_missing_base
    )
    if rec is None:
        return None
    rec.update(stats)
    logger.info("sync_ann_index advanced to %s: %s", rec["snapshot_id"], stats)
    return rec


def sync_minhash_index(
    table: ManifestTable,
    index_path: str,
    text_col: str,
    consumer_id: str = "minhash-index",
    k: int = 8,
    bands: int = 4,
    shingle_k: int = 5,
    reset_on_missing_base: bool = False,
) -> dict | None:
    """Keep the near-dup minhash index current with a document table's
    change feed — the dedup analog of :func:`sync_ann_index`, plus the
    one case the raw upsert cannot express: a CONTENT-CHANGING update.
    The preimage feed carries the old text, so the old cells are cleared
    by recomputation (``delete_from_minhash_index``) before the new
    text's rows are upserted; takedown deletes use the same path. Every
    step ∝ the delta."""
    import glob as _glob

    from ..operators.dedup_index import (
        build_minhash_index,
        delete_from_minhash_index,
        upsert_minhash_index,
    )

    if len(table.key_cols) != 1:
        raise ValueError(
            "sync_minhash_index needs a single-key table (the doc id); "
            f"got key_cols={table.key_cols}"
        )
    id_col = table.key_cols[0]
    stats: dict = {}

    def handler(_feed, frm, to):
        feed = table.read_changes(frm, to, include_preimage=True)
        new_rows = feed.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(id_col, text_col)
        have_index = bool(_glob.glob(f"{index_path}/band=*"))
        if frm is None or not have_index:
            src = new_rows if frm is None else _seed_rows(
                table, to, [id_col, text_col]
            )
            build_minhash_index(
                src, text_col, id_col, index_path, k, bands, shingle_k
            )
            stats["bootstrap"] = True
            return
        old_rows = feed.filter(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select(id_col, text_col)
        stats["removed"] = delete_from_minhash_index(
            old_rows, text_col, id_col, index_path, k, bands, shingle_k
        )
        stats["upserted"] = upsert_minhash_index(
            new_rows, text_col, id_col, index_path, k, bands, shingle_k
        )

    rec = table.consume_changes(
        consumer_id, handler, reset_on_missing_base=reset_on_missing_base
    )
    if rec is None:
        return None
    rec.update(stats)
    logger.info(
        "sync_minhash_index advanced to %s: %s", rec["snapshot_id"], stats
    )
    return rec


def sync_alias_index(
    table: ManifestTable,
    index_path: str,
    alias_col: str = "aliases",
    consumer_id: str = "alias-index",
    reset_on_missing_base: bool = False,
) -> dict | None:
    """Keep the alias -> id inverted index current with the vuln table's
    change feed (reference analog: the alias cache refreshed per sync,
    /root/reference/sql/vulnerabilities.sql:136-139 — here ∝ the delta,
    never a full unnest of the catalog).

    Update PREIMAGES carry each changed record's OLD alias array, so an
    alias dropped by a merge stops resolving (its stale cell is cleared
    by ``update_alias_index``'s removals side); deletes clear all of a
    record's cells. At-least-once feed delivery + idempotent
    partition-scoped rewrite = safe replay, same contract as the ANN and
    minhash syncs."""
    import glob as _glob

    from ..operators.alias_index import build_alias_index, update_alias_index

    if len(table.key_cols) != 1:
        raise ValueError(
            "sync_alias_index needs a single-key table (the record id); "
            f"got key_cols={table.key_cols}"
        )
    id_col = table.key_cols[0]
    stats: dict = {}

    def handler(_feed, frm, to):
        feed = table.read_changes(frm, to, include_preimage=True)
        new_rows = feed.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(id_col, alias_col)
        have_index = bool(_glob.glob(f"{index_path}/pfx=*"))
        if frm is None or not have_index:
            src = new_rows if frm is None else _seed_rows(
                table, to, [id_col, alias_col]
            )
            build_alias_index(
                src, index_path, alias_col=alias_col, id_col=id_col
            )
            stats["bootstrap"] = True
            return
        old_rows = feed.filter(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select(id_col, alias_col)
        stats.update(
            update_alias_index(
                index_path,
                upserts=new_rows,
                removals=old_rows,
                alias_col=alias_col,
                id_col=id_col,
            )
        )

    rec = table.consume_changes(
        consumer_id, handler, reset_on_missing_base=reset_on_missing_base
    )
    if rec is None:
        return None
    rec.update(stats)
    logger.info(
        "sync_alias_index advanced to %s: %s", rec["snapshot_id"], stats
    )
    return rec


def sync_token_index(
    table: ManifestTable,
    index_path: str,
    text_col: str,
    consumer_id: str = "token-index",
    reset_on_missing_base: bool = False,
) -> dict | None:
    """Keep the inverted token index current with a document table's
    change feed — the retrieval/decontamination analog of
    :func:`sync_minhash_index`. Update preimages carry the old text, so
    a content-changing update clears the id's postings under terms it no
    longer contains (their partitions join the touched set); deletes
    clear all of an id's postings the same way. At-least-once feed
    delivery + idempotent partition-scoped rewrite = safe replay."""
    import glob as _glob

    from ..operators.token_index import build_token_index, upsert_token_index

    if len(table.key_cols) != 1:
        raise ValueError(
            "sync_token_index needs a single-key table (the doc id); "
            f"got key_cols={table.key_cols}"
        )
    id_col = table.key_cols[0]
    stats: dict = {}

    def handler(_feed, frm, to):
        feed = table.read_changes(frm, to, include_preimage=True)
        new_rows = feed.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(id_col, text_col)
        have_index = bool(_glob.glob(f"{index_path}/pfx=*"))
        if frm is None or not have_index:
            src = new_rows if frm is None else _seed_rows(
                table, to, [id_col, text_col]
            )
            build_token_index(src, text_col, id_col, index_path)
            stats["bootstrap"] = True
            return
        old_rows = feed.filter(
            F.col("_change_type").isin("delete", "update_preimage")
        ).select(id_col, text_col)
        stats["partitions_rewritten"] = upsert_token_index(
            table.spark,
            index_path,
            new_rows,
            text_col,
            id_col,
            old_docs=old_rows,
        )

    rec = table.consume_changes(
        consumer_id, handler, reset_on_missing_base=reset_on_missing_base
    )
    if rec is None:
        return None
    rec.update(stats)
    logger.info(
        "sync_token_index advanced to %s: %s", rec["snapshot_id"], stats
    )
    return rec
