"""Column rename/drop as metadata-only commits (Iceberg-style evolution
without field IDs: the manifest's schema_log + per-file write eras stand in
for field-id tracking; reference analog: additive migrations,
/root/reference/migrations/002_fix_nullable_summary.up.sql — here extended
to rename/drop with no data rewrite)."""

import pytest
from pyspark.sql import types as T

from vuln_datasync_spark.sinks.manifest_table import ManifestTable
from vuln_datasync_spark.streaming.pipeline import apply_batch

CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("commit_seq", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)


def _rows(seqs, repo="r0", size=None):
    return [
        (
            s,
            "insert",
            repo,
            f"f{s}.py",
            f"c{s}",
            "py",
            f"v{s}",
            None,
            size if size is not None else s * 10,
        )
        for s in seqs
    ]


def _apply(spark, table, rows, bid, schema=CHANGELOG_SCHEMA, ckpt="al"):
    return apply_batch(
        spark.createDataFrame(rows, schema), table, ckpt, bid
    )


def test_rename_is_metadata_only_and_reads_map_old_files(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, _rows(range(1, 9)), 0)
    files_before = sorted(
        p for v in table.manifest()["files"].values() for p in v
    )
    table.rename_column("size_bytes", "byte_count")
    # metadata-only: identical file set
    files_after = sorted(
        p for v in table.manifest()["files"].values() for p in v
    )
    assert files_after == files_before
    got = table.read()
    assert "byte_count" in got.columns and "size_bytes" not in got.columns
    vals = {r["path"]: r["byte_count"] for r in got.collect()}
    assert vals["f3.py"] == 30  # old physical files mapped through the log


def test_merge_after_rename_mixes_eras(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, _rows(range(1, 9)), 0)
    table.rename_column("size_bytes", "byte_count")
    renamed_schema = T.StructType(
        [
            T.StructField(
                "byte_count" if f.name == "size_bytes" else f.name,
                f.dataType,
            )
            for f in CHANGELOG_SCHEMA.fields
        ]
    )
    # new batch arrives with the NEW column name; touches SOME buckets
    _apply(
        spark,
        table,
        [(100, "insert", "r0", "f1.py", "c100", "py", "new", None, 777)],
        1,
        schema=renamed_schema,
    )
    vals = {r["path"]: r["byte_count"] for r in table.read().collect()}
    assert vals["f1.py"] == 777  # new-era row
    assert vals["f5.py"] == 50  # old-era row in an untouched bucket
    # zone maps followed the rename: range filter on the NEW name prunes
    rep = table.prune_report({"byte_count": (777, 777)})
    assert len(rep["skipped"]) > 0


def test_chained_renames_resolve(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    _apply(spark, table, _rows(range(1, 4)), 0)
    table.rename_column("size_bytes", "nbytes")
    table.rename_column("nbytes", "length")
    vals = {r["path"]: r["length"] for r in table.read().collect()}
    assert vals == {"f1.py": 10, "f2.py": 20, "f3.py": 30}


def test_drop_then_readd_never_resurrects_ghosts(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    _apply(spark, table, _rows(range(1, 4)), 0)
    table.drop_column("size_bytes")
    assert "size_bytes" not in table.read().columns
    # re-add via schema evolution in a later merge (different key so the
    # pre-drop rows stay in their original files)
    _apply(
        spark,
        table,
        [(50, "insert", "r9", "g.py", "c50", "py", "g", None, 5)],
        1,
    )
    got = {r["path"]: r["size_bytes"] for r in table.read().collect()}
    assert got["g.py"] == 5
    # pre-drop rows: physical values exist in the old files but must NOT
    # come back (the field-id guarantee)
    assert got["f1.py"] is None and got["f3.py"] is None


def test_read_changes_across_rename_is_quiet(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    _apply(spark, table, _rows(range(1, 6)), 0)
    base = table.current_snapshot_id()
    table.rename_column("size_bytes", "byte_count")
    # the rename alone is not a data change
    assert table.read_changes(base).count() == 0
    renamed_schema = T.StructType(
        [
            T.StructField(
                "byte_count" if f.name == "size_bytes" else f.name,
                f.dataType,
            )
            for f in CHANGELOG_SCHEMA.fields
        ]
    )
    _apply(
        spark,
        table,
        [(9, "update", "r0", "f2.py", "c9", "py", "v2x", None, 20)],
        1,
        schema=renamed_schema,
    )
    ch = table.read_changes(base).collect()
    assert len(ch) == 1
    assert ch[0]["path"] == "f2.py" and ch[0]["_change_type"] == "update"


def test_protected_columns_refuse_alter(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    _apply(spark, table, _rows(range(1, 3)), 0)
    for col in ("repo", "path", "commit_seq", "op", "content",
                "content_sha256", "is_deleted"):
        with pytest.raises(ValueError, match="protected"):
            table.drop_column(col)
    with pytest.raises(ValueError, match="protected"):
        table.rename_column("repo", "repository")
    with pytest.raises(ValueError, match="already exists"):
        table.rename_column("size_bytes", "lang")
    with pytest.raises(ValueError, match="no column"):
        table.rename_column("nope", "x")


def test_rollback_across_alter_restores_schema(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    _apply(spark, table, _rows(range(1, 4)), 0)
    pre = table.current_snapshot_id()
    table.rename_column("size_bytes", "byte_count")
    assert "byte_count" in table.read().columns
    table.rollback(pre)
    got = table.read()
    assert "size_bytes" in got.columns and "byte_count" not in got.columns
    assert {r["size_bytes"] for r in got.collect()} == {10, 20, 30}


def test_cluster_rewrite_preserves_renamed_column(spark, tmp_path):
    # maintenance rewrites after an alter must carry old-era values into
    # new-era files (a direct read with the new schema would null them)
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    _apply(spark, table, _rows(range(1, 9)), 0)
    table.rename_column("size_bytes", "byte_count")
    table.cluster(sort_by=("commit_seq",), target_file_rows=2)
    vals = {r["path"]: r["byte_count"] for r in table.read().collect()}
    assert vals["f7.py"] == 70
