"""Schema evolution at the sink: column-add and type-widen reconciliation
before each merge (reference analog: additive migration
/root/reference/migrations/002_fix_nullable_summary.up.sql:1-6)."""

import pytest
from pyspark.sql import types as T

from vuln_datasync_spark.sinks.manifest_table import ManifestTable, _merge_schemas
from vuln_datasync_spark.streaming.pipeline import apply_batch

BASE = "commit_seq long, op string, repo string, path string, commit string, lang string, content string"


def _df(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def test_column_add(spark, tmp_path):
    t = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    apply_batch(
        _df(spark, [(1, "insert", "r", "a.py", "c1", "python", "v1")], BASE),
        t, "c", 0,
    )
    # later batch carries a new nullable column
    apply_batch(
        _df(
            spark,
            [(2, "insert", "r", "b.py", "c2", "python", "v2", 99)],
            BASE + ", size_bytes long",
        ),
        t, "c", 1,
    )
    out = {r["path"]: r["size_bytes"] for r in t.read().collect()}
    assert out == {"a.py": None, "b.py": 99}  # old rows read back as null
    assert "size_bytes" in [f.name for f in t.schema().fields]


def test_type_widen_int_to_long(spark, tmp_path):
    t = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    apply_batch(
        _df(
            spark,
            [(1, "insert", "r", "a.py", "c1", "python", "v1", 7)],
            BASE + ", size_bytes int",
        ),
        t, "c", 0,
    )
    apply_batch(
        _df(
            spark,
            [(2, "insert", "r", "b.py", "c2", "python", "v2", 2**40)],
            BASE + ", size_bytes long",
        ),
        t, "c", 1,
    )
    fields = {f.name: f.dataType for f in t.schema().fields}
    assert fields["size_bytes"] == T.LongType()
    out = {r["path"]: r["size_bytes"] for r in t.read().collect()}
    assert out == {"a.py": 7, "b.py": 2**40}


def test_incompatible_change_rejected():
    a = T.StructType([T.StructField("x", T.StringType())])
    b = T.StructType([T.StructField("x", T.ArrayType(T.StringType()))])
    with pytest.raises(ValueError, match="incompatible"):
        _merge_schemas(a, b)
