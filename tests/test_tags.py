"""Snapshot tags (named refs): resolution everywhere a snapshot id is
accepted, pinning through expire_snapshots, drop + re-expiry reclaim,
and the CLI surface."""

import json

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


def _rows(seqs):
    return [
        (s, "insert", "r0", f"f{s}.py", f"c{s}", "py", f"v{s}", None, None)
        for s in seqs
    ]


def _apply(spark, table, rows, bid):
    return apply_batch(
        spark.createDataFrame(rows, CHANGELOG_SCHEMA), table, "tg", bid
    )


def test_tag_resolves_in_read_changes_rollback(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    _apply(spark, table, _rows(range(1, 6)), 0)
    table.tag("corpus-v1")
    _apply(spark, table, _rows(range(101, 104)), 1)
    table.tag("corpus-v2")

    assert table.read("corpus-v1").count() == 5
    assert table.read("corpus-v2").count() == 8
    ch = table.read_changes("corpus-v1", "corpus-v2")
    assert ch.count() == 3
    assert {r["_change_type"] for r in ch.collect()} == {"insert"}

    table.rollback("corpus-v1")
    assert table.read().count() == 5
    # tagging a tag re-pins the underlying sid, not the name
    sid = table.tag("alias-of-v2", snapshot_id="corpus-v2")
    assert sid == table.refs()["tags"]["corpus-v2"]

    with pytest.raises(ValueError, match="unknown snapshot"):
        table.tag("bad", snapshot_id="never-existed")


def test_tagged_snapshot_survives_expiry_until_dropped(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    _apply(spark, table, _rows(range(1, 4)), 0)
    table.tag("pinned")
    for b in range(1, 5):
        _apply(spark, table, _rows(range(100 * b, 100 * b + 2)), b)

    table.expire_snapshots(keep=2)
    # pinned snapshot still fully readable after expiry
    assert table.read("pinned").count() == 3
    assert {r["path"] for r in table.read("pinned").collect()} == {
        "f1.py", "f2.py", "f3.py"
    }
    # current chain unaffected
    assert table.read().count() == 11

    table.drop_tag("pinned")
    table.expire_snapshots(keep=2)
    assert table.manifest("pinned") is None
    # its exclusive files are physically gone
    import glob as g
    import os

    live = set()
    for m in table.snapshots():
        for ps in m["files"].values():
            live.update(ps)
    on_disk = {
        os.path.relpath(p, str(tmp_path / "t"))
        for p in g.glob(
            str(tmp_path / "t" / "data" / "snap-*" / "bucket=*" / "*.parquet")
        )
    }
    assert on_disk <= live


def test_snapshot_as_of_time_travel(spark, tmp_path, capsys, monkeypatch):
    import datetime as dt
    import time

    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    _apply(spark, table, _rows(range(1, 4)), 0)
    s1 = table.current_snapshot_id()
    t_mid = time.time() * 1000
    time.sleep(0.05)
    _apply(spark, table, _rows(range(11, 16)), 1)
    s2 = table.current_snapshot_id()

    assert table.snapshot_as_of(int(t_mid)) == s1
    assert table.snapshot_as_of(time.time() * 1000) == s2
    assert table.read(table.snapshot_as_of(int(t_mid))).count() == 3
    # datetime + ISO string forms (UTC)
    mid_dt = dt.datetime.fromtimestamp(t_mid / 1000, dt.timezone.utc)
    assert table.snapshot_as_of(mid_dt) == s1
    assert table.snapshot_as_of(mid_dt.isoformat()) == s1
    # before the first commit -> None
    assert table.snapshot_as_of(0) is None

    # CLI: scan --as-of
    import json

    from vuln_datasync_spark import cli

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    assert (
        cli.main(
            ["scan", "--table", str(tmp_path / "t"),
             "--as-of", mid_dt.isoformat()]
        )
        == 0
    )
    rows = [
        json.loads(x) for x in capsys.readouterr().out.strip().splitlines()
    ]
    assert len(rows) == 3


def test_cli_tag(spark, tmp_path, capsys, monkeypatch):
    from vuln_datasync_spark import cli

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    tbl = str(tmp_path / "t")
    table = ManifestTable.create(spark, tbl, n_buckets=2)
    _apply(spark, table, _rows(range(1, 4)), 0)

    assert cli.main(["tag", "--table", tbl, "v1"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["tag"] == "v1" and out["snapshot_id"]

    assert cli.main(["tag", "--table", tbl, "--list"]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {
        "v1": out["snapshot_id"]
    }

    assert cli.main(["tag", "--table", tbl, "--drop", "v1"]) == 0
    capsys.readouterr()
    assert cli.main(["tag", "--table", tbl, "--list"]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {}
