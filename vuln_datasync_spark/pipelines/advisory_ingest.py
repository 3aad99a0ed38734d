"""End-to-end advisory ingest — the reference's sync loop as ONE pipeline.

Reference flow (/root/reference/internal/jobs/server.go:115-170
handleSyncVulnerabilities → processBatch → processSingleOSVVuln
864-907): per source, normalize each record, find an alias-overlap match,
merge cross-source fields under priority, skip the write when the data
hash is unchanged, upsert the rest. This module is the batch restatement a
reference user would call instead:

    normalize per source (sources/osv.py, cve.py, advisories.py)
      → to_canonical (one vulnerability schema)
      → merge_by_alias_overlap (transitive closure + n-ary field fold)
      → data-hash unchanged-skip (M2 no-op, merger.go:124-137)
      → ManifestTable.merge (bucketed COW upsert, exactly-once epoch)

Scale shape: the alias merge is the documented closure+fold plan (shuffles
∝ keys); the unchanged-skip anti-join means a steady-state re-sync touches
ONLY buckets with genuinely changed records — the merge's COW cost is ∝
actual change volume, not catalog size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import SOURCE_PRIORITY, merge_by_alias_overlap
from ..sinks.manifest_table import ManifestTable

CANON_SCALARS = ["summary", "details", "severity", "package_name", "ecosystem"]
CANON_ARRAYS = ["aliases", "affected_versions", "fixed_versions"]
VULN_KEY = ("vuln_id",)
# recency used for merge-rank ties; epoch millis of the record's modified
# timestamp (0 when the source supplies none)
_ORD = "modified_seq"


def to_canonical(df: DataFrame, source_name: str | None = None) -> DataFrame:
    """Project a per-source normalized frame onto the canonical
    vulnerability schema (reference types.Vulnerability,
    /root/reference/internal/types/types.go): missing scalars become
    null, missing arrays empty, and recency is derived from whichever
    modified/updated timestamp the source produced. ``source_name=None``
    keeps the frame's own per-row ``source`` column (mixed-source input,
    e.g. a streaming micro-batch)."""
    cols = [F.col("vuln_id").cast("string").alias("vuln_id")]
    for c in CANON_SCALARS:
        cols.append(
            (F.col(c).cast("string") if c in df.columns else F.lit(None).cast(
                "string"
            )).alias(c)
        )
    for c in CANON_ARRAYS:
        cols.append(
            (
                F.coalesce(F.col(c), F.array().cast("array<string>"))
                if c in df.columns
                else F.array().cast("array<string>")
            ).alias(c)
        )
    ts = None
    for cand in ("modified_at", "updated_at", "published_at"):
        if cand in df.columns:
            ts = F.col(cand) if ts is None else F.coalesce(ts, F.col(cand))
    cols.append(
        (
            F.coalesce(F.unix_millis(ts), F.lit(0)) if ts is not None
            else F.lit(0)
        ).cast("long").alias(_ORD)
    )
    cols.append(
        (
            F.lit(source_name) if source_name is not None else F.col("source")
        ).alias("source")
    )
    return df.select(*cols)


def gitlab_advisories_to_vulns(df: DataFrame) -> DataFrame:
    """Adapter: parse_yaml_advisories output → ingest input (the
    reference's GitLab normalization, /root/reference/internal/merger/
    normalizer.go NormalizeGitLab): identifier becomes the id, the alias
    pool is the sanitized identifiers list, package name is the slug's
    last segment, and recency parses RFC3339 or date-only forms."""
    from ..functions.hashing import sanitize_aliases
    from ..functions.timestamps import parse_date_only, parse_rfc3339

    return df.select(
        F.col("identifier").alias("vuln_id"),
        sanitize_aliases(
            F.coalesce(F.col("identifiers"), F.array().cast("array<string>"))
        ).alias("aliases"),
        F.col("title").alias("summary"),
        F.col("description").alias("details"),
        F.col("cvss").alias("severity"),
        F.element_at(F.split(F.col("package_slug"), "/"), -1).alias(
            "package_name"
        ),
        F.col("ecosystem"),
        F.col("fixed_versions"),
        F.coalesce(
            parse_rfc3339(F.col("modified_date")),
            parse_date_only(F.col("modified_date")),
        ).alias("modified_at"),
    )


def _data_hash() -> F.Column:
    """M8 content hash over the merged record's payload (reference
    CalculateDataHash analog) — recency/bookkeeping columns excluded so an
    unchanged record hashes identically run after run."""
    return F.sha2(
        F.to_json(
            F.struct(
                *[F.col(c) for c in CANON_SCALARS + CANON_ARRAYS],
                F.col("sources"),
            )
        ),
        256,
    )


def create_vuln_table(
    spark: SparkSession,
    root: str,
    n_buckets: int = 16,
    merge_mode: str = "cow",
) -> ManifestTable:
    """``merge_mode="mor"`` makes every sync run append per-bucket log
    deltas instead of rewriting touched buckets (see ManifestTable.create)
    — the right trade when syncs are frequent and small relative to the
    store; fold with ``compact_logs()`` in maintenance windows."""
    return ManifestTable.create(
        spark, root, n_buckets=n_buckets, key_cols=VULN_KEY,
        merge_mode=merge_mode,
    )


def ingest_advisories(
    table: ManifestTable,
    by_source: dict[str, DataFrame],
    run_seq: int,
    checkpoint_id: str = "advisories",
    batch_id: int | None = None,
) -> dict | None:
    """One sync run. ``by_source`` maps source name (must appear in
    SOURCE_PRIORITY) to its normalized frame (output of
    normalize_osv_records / normalize_cve_records /
    parse_yaml_advisories, or anything with vuln_id+aliases). ``run_seq``
    must increase per run (it is the LWW order of the upsert). Returns the
    commit's lineage record, or None when this epoch already committed."""
    unknown = set(by_source) - set(SOURCE_PRIORITY)
    if unknown:
        raise ValueError(f"unknown sources (no priority): {sorted(unknown)}")
    inc = None
    for name, df in by_source.items():
        c = to_canonical(df, name)
        inc = c if inc is None else inc.unionByName(c)
    return ingest_canonical(
        table, inc, run_seq, checkpoint_id=checkpoint_id, batch_id=batch_id
    )


def ingest_canonical(
    table: ManifestTable,
    inc: DataFrame,
    run_seq: int,
    checkpoint_id: str = "advisories",
    batch_id: int | None = None,
) -> dict | None:
    """The sync core over an already-canonical frame (``to_canonical``
    output — mixed sources allowed): alias-closure merge, per-source
    recency, unchanged-hash skip, epoch-tagged MERGE. ``ingest_advisories``
    and the streaming tail both land here."""
    # rank tiebreak: at exactly equal (priority, recency) the INCOMING
    # copy must win the fold (the reference merges each incoming record
    # INTO the stored one — its values take effect for its source)
    inc = inc.withColumn("_inc", F.lit(1))

    stored = table.read()
    have_store = "sources" in stored.columns
    if have_store:
        # one row per provenance source, each carrying that source's OWN
        # recency from the persisted source_ords map (fold_merge's
        # aggregation is duplicate-insensitive, so the merged record
        # reconstructs the full source set and the alias window still
        # picks one best match). Exploding the group-max _ORD instead
        # would inflate every source's recency to the group max: a
        # source's genuinely fresh update whose own timestamp sits below
        # that max would lose the rank to its own stale stored copy and
        # the unchanged-hash skip would silently drop it. Rows persisted
        # before the map existed (schema evolution) fall back to the
        # group max — the legacy behavior, self-healing on first rewrite.
        if "source_ords" in stored.columns:
            src_ords = F.coalesce(
                F.col("source_ords"),
                F.map_from_arrays(
                    F.col("sources"),
                    F.array_repeat(F.col(_ORD), F.size("sources")),
                ),
            )
        else:
            src_ords = F.map_from_arrays(
                F.col("sources"),
                F.array_repeat(F.col(_ORD), F.size("sources")),
            )
        existing_all = stored.select(
            "vuln_id",
            *CANON_SCALARS,
            *CANON_ARRAYS,
            F.explode(src_ords).alias("source", _ORD),
            F.lit(0).alias("_inc"),
        )
        # restrict the merge to stored records the batch can actually
        # touch: alias-matched ones plus direct id collisions (an incoming
        # record re-publishing a stored id with disjoint aliases must
        # still fold with the stored row, not overwrite it). Everything
        # else would fold to itself and be dropped by the hash-skip anyway
        # — pre-filtering makes the fold's compute ∝ incoming+touched, not
        # catalog size (the reference pays a full alias-cache scan per run,
        # merger.go:46-71; the column-pruned match scan here is that
        # analog, but payload never flows for untouched records)
        from ..operators.merge import alias_overlap_match

        # computed ONCE (localCheckpoint: one row per matched incoming id,
        # tiny) and reused as the merge's match — without this the
        # alias-explode join executes twice per sync run
        pre = alias_overlap_match(
            inc, existing_all, order_col=_ORD, with_order=True
        ).localCheckpoint(eager=True)
        touched_ids = (
            pre.select(F.col("matched_id").alias("vuln_id"))
            .unionByName(inc.select("vuln_id"))
            .distinct()
        )
        existing = existing_all.join(touched_ids, "vuln_id", "left_semi")
    else:
        pre = None
        existing = inc.limit(0)

    merged = merge_by_alias_overlap(
        inc,
        existing,
        scalar_cols=CANON_SCALARS,
        array_cols=CANON_ARRAYS,
        order_col=_ORD,
        tiebreak_col="_inc",
        with_source_ords=True,
        precomputed_match=pre,
    ).withColumn("data_hash", _data_hash())

    if have_store:
        # M2 unchanged-skip: records whose merged payload hashes exactly
        # like the stored row never touch their bucket
        changed = merged.join(
            stored.select("vuln_id", "data_hash"),
            ["vuln_id", "data_hash"],
            "left_anti",
        )
    else:
        changed = merged

    winners = (
        changed.withColumn("commit_seq", F.lit(run_seq).cast("long"))
        .withColumn("commit", F.col("data_hash"))
        .withColumn("op", F.lit("insert"))
    )
    return table.merge(
        winners,
        checkpoint_id=checkpoint_id,
        batch_id=run_seq if batch_id is None else batch_id,
    )


# canonical advisory stream input: one row per (record, source), recency as
# a timestamp the canonical projection converts to modified_seq
ADVISORY_STREAM_DDL = (
    "vuln_id string, source string, summary string, details string, "
    "severity string, package_name string, ecosystem string, "
    "aliases array<string>, affected_versions array<string>, "
    "fixed_versions array<string>, modified_at timestamp"
)


def run_advisory_stream(
    spark: SparkSession,
    incoming_dir: str,
    table_root: str,
    checkpoint_dir: str,
    schema: str = ADVISORY_STREAM_DDL,
    max_files_per_trigger: int | None = None,
    on_batch=None,
    await_termination: bool = True,
):
    """The advisory sync pipeline as a resumable micro-batch TAIL — the
    reference's scheduled batch sync (internal/jobs/server.go:115-170)
    restated as Structured Streaming over a drop directory of canonical
    advisory records, exactly like the CDC path (streaming/pipeline.py
    run_stream): offsets live in the checkpoint, each micro-batch runs the
    full closure-merge + hash-skip + MERGE core, and the sink's
    (checkpoint_id, batch_id) epoch ledger makes a batch interrupted
    between sink commit and checkpoint commit replay as a no-op.

    ``trigger(availableNow=True)``: drains what's there and stops; a later
    call with the same checkpoint resumes after the last committed batch.
    ``on_batch(batch_id, lineage)`` is the crash-simulation test hook."""
    import os

    from ..streaming.pipeline import checkpoint_identity

    if os.path.exists(os.path.join(table_root, "_table.json")):
        table = ManifestTable(spark, table_root)
    else:
        table = create_vuln_table(spark, table_root)
    ckpt_id = checkpoint_identity(checkpoint_dir)

    def process(batch_df: DataFrame, batch_id: int):
        lineage = ingest_canonical(
            table,
            to_canonical(batch_df),
            run_seq=batch_id,
            checkpoint_id=ckpt_id,
            batch_id=batch_id,
        )
        if on_batch is not None:
            on_batch(batch_id, lineage)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    query = (
        reader.parquet(incoming_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not await_termination:
        return table, query
    query.awaitTermination()
    return table
