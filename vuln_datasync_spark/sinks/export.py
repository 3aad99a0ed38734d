"""Export sink — snapshot-versioned JSON/CSV exports with optional
compression (reference analog: export jobs S15,
/root/reference/internal/jobs/server.go:544-588, 639-668; tracked in the
``exports`` table, migrations/001_initial_schema.up.sql:95-108).

Unlike the reference (count-only stub), this actually writes the data and
records the export in a small manifest next to the output.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame

from .manifest_table import ManifestTable


def export_table(
    table: ManifestTable,
    out_dir: str,
    fmt: str = "json",
    compression: bool = False,
    snapshot_id: str | None = None,
) -> dict:
    """Export a table snapshot to JSON/CSV. Returns the export record,
    which is also appended to the table's ``_exports`` run log (reference
    ``exports`` table analog) so `stats` can account for every export —
    the merge path has lineage, the export path has this."""
    df = table.read(snapshot_id=snapshot_id)
    record = export_df(
        df, out_dir, fmt, compression,
        snapshot_id or table.current_snapshot_id(),
    )
    record["file_bytes"] = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(out_dir)
        for f in fs
        if not f.startswith("_") and not f.startswith(".")
    )
    return table.record_export(record)


def export_df(
    df: DataFrame,
    out_dir: str,
    fmt: str = "json",
    compression: bool = False,
    snapshot_id: str | None = None,
) -> dict:
    codec = "gzip" if compression else "none"
    writer = df.write.mode("overwrite").option("compression", codec)
    if fmt == "json":
        writer.json(out_dir)
    elif fmt == "csv":
        # CSV cannot carry nested types; stringify any array/map/struct cols
        from pyspark.sql import functions as F

        flat = df
        for name, dtype in df.dtypes:
            if dtype.startswith(("array", "map", "struct")):
                flat = flat.withColumn(name, F.to_json(F.col(name)))
        flat.write.mode("overwrite").option("compression", codec).option(
            "header", "true"
        ).csv(out_dir)
    else:
        raise ValueError(f"unsupported export format: {fmt}")
    record = {
        "format": fmt,
        "compression": compression,
        "snapshot_id": snapshot_id,
        "path": out_dir,
        "rows": df.count(),
        "exported_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(os.path.join(out_dir, "_export.json"), "w") as f:
        json.dump(record, f)
    return record


def export_incremental(
    table: ManifestTable,
    out_dir: str,
    fmt: str = "json",
    compression: bool = False,
) -> dict:
    """Incremental export: write only the row-level CHANGES since the
    last recorded export (the reference re-exports the full dataset
    weekly — internal/jobs/server.go:639-668; at 10^10 rows a consumer
    wants the delta, not the world). The output is the change feed
    between the last export's snapshot and the current one: one row per
    changed key with a ``_change_type`` column (insert/update/delete;
    delete rows carry the last-seen values), which is everything a
    downstream mirror needs to apply the delta idempotently.

    Falls back to a FULL export when there is no prior export, or when
    the last export's base snapshot has been expired in the meantime
    (the record says which via ``mode``/``base_snapshot_id``). A no-op
    delta (same snapshot) writes an empty feed and records rows=0 —
    schedulers can fire it blindly. Scan cost rides ``read_changes``:
    ∝ rows in touched buckets, never table size."""
    import pyspark.sql.functions as F  # noqa: F401  (parity with siblings)

    cur = table.current_snapshot_id()
    prior = None
    exports = table.read_exports()
    if exports.limit(1).count():
        last = exports.orderBy(
            exports.exported_at.desc(), exports.export_id.desc()
        ).first()
        prior = last["snapshot_id"]
    mode, base = "incremental", prior
    if prior is None:
        df, mode, base = table.read(), "full", None
    else:
        try:
            df = table.read_changes(prior, cur)
        except ValueError:
            # base snapshot expired between exports: the delta is
            # unrecoverable, re-ship the world (recorded as mode=full)
            df, mode, base = table.read(), "full", None
    record = export_df(df, out_dir, fmt, compression, cur)
    record["file_bytes"] = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(out_dir)
        for f in fs
        if not f.startswith("_") and not f.startswith(".")
    )
    record["mode"] = mode
    record["base_snapshot_id"] = base
    return table.record_export(record)
