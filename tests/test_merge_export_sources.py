"""Cross-source priority merge (M3/M4), export sink (S15), archive source
(S4/S9), changelog sources (P9/S6)."""

import io
import json
import zipfile

from pyspark.sql import functions as F

from vuln_datasync_spark.operators.merge import (
    map_merge_with_precedence,
    priority_merge,
)
from vuln_datasync_spark.sinks.export import export_df
from vuln_datasync_spark.sources.archive import read_zip_json
from vuln_datasync_spark.sources.changelog import read_changelog_batch


def test_priority_merge_semantics(spark):
    rows = [
        # key k1 in all three sources: osv wins, gitlab supplements
        ("k1", "osv", "", "osv details", 10, ["CVE-1"]),
        ("k1", "gitlab", "gl summary", "gl details", 11, ["CVE-1", "GHSA-x"]),
        ("k1", "cve", "cve summary", "cve details", 12, ["CVE-1", "CVE-2"]),
        # key k2 single source
        ("k2", "cve", "only cve", "d", 5, ["CVE-9"]),
    ]
    df = spark.createDataFrame(
        rows, "key string, source string, summary string, details string, "
        "commit_seq long, aliases array<string>"
    )
    out = {
        r["key"]: r
        for r in priority_merge(
            df, ["key"], ["summary", "details"], ["aliases"]
        ).collect()
    }
    k1 = out["k1"]
    # primary = osv; empty osv summary falls back to gitlab's (coalesce M4)
    assert k1["summary"] == "gl summary"
    assert k1["details"] == "osv details"
    # dedup-union keeps primary-first order (A7)
    assert k1["aliases"] == ["CVE-1", "GHSA-x"]
    assert k1["sources"] == ["gitlab", "osv"]
    assert k1["commit_seq"] == 11
    assert out["k2"]["summary"] == "only cve" and out["k2"]["sources"] == ["cve"]


def test_map_merge_precedence(spark):
    df = spark.createDataFrame(
        [({"a": "1", "b": None}, {"b": "2", "a": "X"})],
        "p map<string,string>, s map<string,string>",
    )
    got = df.select(
        map_merge_with_precedence(F.col("p"), F.col("s")).alias("m")
    ).head()["m"]
    assert got == {"a": "1", "b": "2"}  # primary overrides, secondary fills


def test_export_json_and_csv(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "x", ["a", "b"]), (2, "y", ["c"])], "id long, s string, arr array<string>"
    )
    rec = export_df(df, str(tmp_path / "j"), fmt="json", compression=True)
    assert rec["rows"] == 2 and rec["compression"]
    back = spark.read.json(str(tmp_path / "j"))
    assert back.count() == 2
    rec2 = export_df(df, str(tmp_path / "c"), fmt="csv")
    back2 = spark.read.option("header", True).csv(str(tmp_path / "c"))
    assert back2.count() == 2  # nested col stringified, not dropped
    assert "arr" in back2.columns


def test_zip_json_source(spark, tmp_path):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a/r1.json", json.dumps({"id": "A", "score": 1.5}))
        zf.writestr("a/r2.json", json.dumps({"id": "B", "score": 2.0}))
        zf.writestr("a/skip.txt", "not json")
        zf.writestr("b/bad.json", "{broken")
        zf.writestr("../evil.json", json.dumps({"id": "evil"}))
    (tmp_path / "arch.zip").write_bytes(buf.getvalue())
    df = read_zip_json(
        spark, str(tmp_path), "id string, score double", member_glob="*.json"
    )
    rows = {r["member"]: r for r in df.collect()}
    assert set(rows) == {"a/r1.json", "a/r2.json", "b/bad.json"}
    assert rows["a/r1.json"]["id"] == "A" and rows["a/r2.json"]["score"] == 2.0
    assert rows["b/bad.json"]["_corrupt"] is not None  # graceful skip


def test_changelog_incremental_read(spark, tmp_path):
    from vuln_datasync_spark.datagen import generate_changelog_pandas, write_changelog

    ev = generate_changelog_pandas(1000, seed=5)
    write_changelog(ev, str(tmp_path / "log"), n_files=2)
    full = read_changelog_batch(spark, str(tmp_path / "log"))
    inc = read_changelog_batch(spark, str(tmp_path / "log"), since_seq=500)
    assert full.count() == len(ev)
    assert inc.agg(F.min("commit_seq")).first()[0] == 501
