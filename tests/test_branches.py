"""Branches (movable refs, write-audit-publish) and orphan-file vacuum.

WAP pattern (Iceberg branch + fast_forward analog; reference analog: the
sync loop's staged-write-then-commit job flow,
/root/reference/internal/jobs/server.go:544-588): stage a risky ingest on
a branch, audit it with ordinary reads, publish by fast-forwarding main.
"""

import os
import time

import pytest
from pyspark.sql import types as T

from vuln_datasync_spark.sinks.manifest_table import CommitConflict, ManifestTable
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


def _rows(seqs, repo="r0"):
    return [
        (s, "insert", repo, f"f{s}.py", f"c{s}", "py", f"v{s}", None, None)
        for s in seqs
    ]


def _apply(spark, table, rows, bid, ckpt="br"):
    return apply_batch(
        spark.createDataFrame(rows, CHANGELOG_SCHEMA), table, ckpt, bid
    )


def test_wap_write_audit_publish(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    _apply(spark, table, _rows(range(1, 4)), 0)
    main_sid = table.current_snapshot_id()

    table.create_branch("audit")
    br = table.for_branch("audit")
    _apply(spark, br, _rows(range(11, 16)), 1)

    # write: branch advanced, main untouched
    assert br.current_snapshot_id() != main_sid
    assert table.current_snapshot_id() == main_sid
    # audit: branch readable by name from the MAIN handle
    assert table.read("audit").count() == 8
    assert table.read().count() == 3
    # publish: fast-forward main
    head = table.publish("audit")
    assert table.current_snapshot_id() == head
    assert table.read().count() == 8
    # exactly-once carries across publish: replaying the branch batch on
    # MAIN is a no-op (epoch inherited through the manifest chain)
    assert _apply(spark, table, _rows(range(11, 16)), 1) is None


def test_publish_conflict_when_main_advances(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    _apply(spark, table, _rows(range(1, 4)), 0)
    table.create_branch("wap")
    br = table.for_branch("wap")
    _apply(spark, br, _rows(range(11, 14)), 1)
    # main advances past the fork point
    _apply(spark, table, _rows(range(21, 23)), 2)
    with pytest.raises(CommitConflict, match="fork point"):
        table.publish("wap")
    # rebase: re-branch from the new main, replay (exactly-once on the new
    # chain — epochs differ per chain, so the batch applies), publish
    table.drop_branch("wap")
    table.create_branch("wap")
    br2 = table.for_branch("wap")
    assert _apply(spark, br2, _rows(range(11, 14)), 1) is not None
    table.publish("wap")
    assert table.read().count() == 8


def test_branch_commit_isolation_and_concurrency(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    _apply(spark, table, _rows(range(1, 4)), 0)
    table.create_branch("b1")
    table.create_branch("b2")
    b1 = table.for_branch("b1")
    b2 = table.for_branch("b2")
    _apply(spark, b1, _rows(range(11, 14), repo="ra"), 1)
    _apply(spark, b2, _rows(range(21, 26), repo="rb"), 1)
    assert table.read("b1").count() == 6
    assert table.read("b2").count() == 8
    assert table.read().count() == 3
    # same epoch key committed independently per branch (separate chains)
    assert _apply(spark, b1, _rows(range(11, 14), repo="ra"), 1) is None


def test_expiry_pins_branch_head_not_intermediates(spark, tmp_path):
    table = ManifestTable.create(
        spark, str(tmp_path / "t"), n_buckets=2
    )
    _apply(spark, table, _rows(range(1, 4)), 0)
    table.create_branch("keepme")
    br = table.for_branch("keepme")
    _apply(spark, br, _rows(range(11, 14)), 1)
    mid = br.current_snapshot_id()
    _apply(spark, br, _rows(range(21, 24)), 2)
    head = br.current_snapshot_id()
    # advance main so the branch head is off the kept main chain
    for i in range(3, 7):
        _apply(spark, table, _rows(range(100 * i, 100 * i + 2)), i)

    table.expire_snapshots(keep=2)
    mdir = tmp_path / "t" / "_manifests"
    assert (mdir / f"{head}.json").exists()
    assert not (mdir / f"{mid}.json").exists()  # intermediate swept
    assert table.read("keepme").count() == 9  # head still fully readable
    table.drop_branch("keepme")
    table.expire_snapshots(keep=2)
    assert not (mdir / f"{head}.json").exists()


def test_remove_orphan_files(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    _apply(spark, table, _rows(range(1, 6)), 0)
    root = str(tmp_path / "t")
    # plant a crashed-writer orphan: a snap dir never linked to a manifest
    odir = os.path.join(root, "data", "snap-000-dead", "bucket=0")
    os.makedirs(odir)
    orphan = os.path.join(odir, "part-dead.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    # and a RECENT orphan (in-flight writer) that must survive
    rdir = os.path.join(root, "data", "snap-000-live", "bucket=0")
    os.makedirs(rdir)
    recent = os.path.join(rdir, "part-live.parquet")
    with open(recent, "wb") as f:
        f.write(b"in flight")

    before = table.read().count()
    out = table.remove_orphan_files(older_than_seconds=3600)
    assert out["removed"] == [
        os.path.relpath(orphan, root)
    ]
    assert out["kept_recent"] == 1
    assert not os.path.exists(orphan)
    assert not os.path.exists(os.path.dirname(odir))  # empty snap dir gone
    assert os.path.exists(recent)
    # live data untouched
    assert table.read().count() == before
    # second pass: nothing left old enough
    assert table.remove_orphan_files(older_than_seconds=3600)["removed"] == []


def test_stream_into_branch_then_publish(spark, tmp_path):
    import pandas as pd

    from vuln_datasync_spark.streaming.pipeline import run_stream

    log = tmp_path / "log"
    log.mkdir()
    pd.DataFrame(
        {
            "commit_seq": [1, 2, 3],
            "op": ["insert"] * 3,
            "repo": ["r0"] * 3,
            "path": ["a.py", "b.py", "c.py"],
            "commit": ["c1", "c2", "c3"],
            "lang": ["py"] * 3,
            "content": ["v1", "v2", "v3"],
            "ts": pd.to_datetime(["2026-01-01"] * 3),
            "size_bytes": [1, 2, 3],
        }
    ).to_parquet(log / "b0.parquet", coerce_timestamps="us")
    troot = str(tmp_path / "t")
    table = ManifestTable.create(spark, troot, n_buckets=2)
    _apply(spark, table, _rows(range(100, 102)), 0)
    schema = (
        "commit_seq long, op string, repo string, path string, commit "
        "string, lang string, content string, ts timestamp, size_bytes long"
    )
    run_stream(
        spark,
        str(log),
        troot,
        str(tmp_path / "ckpt"),
        schema,
        branch="staged",
    )
    assert table.read().count() == 2  # main untouched by the stream
    assert table.read("staged").count() == 5
    table.publish("staged")
    assert table.read().count() == 5


def test_expire_snapshots_older_than(spark, tmp_path):
    import time

    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    _apply(spark, table, _rows(range(1, 3)), 0)
    _apply(spark, table, _rows(range(11, 13)), 1)
    time.sleep(0.05)
    cut = time.time() * 1000
    time.sleep(0.05)
    _apply(spark, table, _rows(range(21, 23)), 2)
    _apply(spark, table, _rows(range(31, 33)), 3)
    # keep=1 + older_than=cut: the two pre-cut snapshots go, both
    # post-cut snapshots stay even though keep alone would drop one
    table.expire_snapshots(keep=1, older_than=int(cut))
    kept = [m["snapshot_id"] for m in table.snapshots()]
    assert len(kept) == 2
    assert all(int(s.split("-", 1)[0]) > cut for s in kept)
    assert table.read().count() == 8  # state intact


def test_cli_branch_publish_vacuum(spark, tmp_path, capsys, monkeypatch):
    import json

    from vuln_datasync_spark import cli

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    _apply(spark, table, _rows(range(1, 4)), 0)
    t = str(tmp_path / "t")

    assert cli.main(["branch", "--table", t, "stage"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["branch"] == "stage"
    br = table.for_branch("stage")
    _apply(spark, br, _rows(range(11, 14)), 1)
    assert cli.main(["branch", "--table", t, "--list"]) == 0
    assert "stage" in json.loads(capsys.readouterr().out)
    assert cli.main(["branch", "--table", t, "--publish", "stage"]) == 0
    assert json.loads(capsys.readouterr().out)["published"] == "stage"
    assert table.read().count() == 6
    assert cli.main(["branch", "--table", t, "--drop", "stage"]) == 0
    capsys.readouterr()
    assert cli.main(["vacuum", "--table", t, "--older-than", "0"]) == 0
    assert "removed" in json.loads(capsys.readouterr().out)


def test_lookup_prunes_files_by_key_zone(spark, tmp_path):
    # one bucket, clustered by repo into many small files -> a point
    # lookup must open only the file(s) whose key zone covers the probe
    table = ManifestTable.create(
        spark,
        str(tmp_path / "t"),
        n_buckets=1,
        write_sort=("repo",),
        target_file_rows=10,
    )
    rows = []
    for i in range(100):
        rows.append(
            (i, "insert", f"repo{i:03d}", "f.py", f"c{i}", "py", f"v{i}", None, None)
        )
    _apply(spark, table, rows, 0)
    m = table.manifest()
    n_files = sum(len(v) for v in m["files"].values())
    assert n_files >= 5  # clustered layout actually split the bucket
    got = table.lookup([("repo042", "f.py")]).collect()
    assert len(got) == 1 and got[0]["content"] == "v42"
    # manifest-level proof: the probe's key range skips most of the
    # bucket's files (lookup passes the same range_filters to read())
    rep = table.prune_report({"repo": ("repo042", "repo042")})
    assert len(rep["skipped"]) > 0
    assert len(rep["kept"]) < n_files
