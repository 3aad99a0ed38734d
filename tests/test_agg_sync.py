"""sync_agg: incremental materialized aggregate off the change feed —
must equal a full recompute after inserts, deletes, and
dimension-changing updates, and stay exactly-once under feed replay."""

import json
import os

from pyspark.sql import functions as F

from vuln_datasync_spark.pipelines.agg_sync import read_agg, sync_agg
from vuln_datasync_spark.sinks.manifest_table import ManifestTable

from .test_change_feed import CHANGELOG_SCHEMA, _batch


def _recompute(table):
    return {
        (r["lang"],): (r["n"], r["s"])
        for r in table.read()
        .groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce("size_bytes", F.lit(0))).alias("s"),
        )
        .collect()
    }


def _state(spark, root):
    return {
        (r["lang"],): (r["n"], r["sum_size_bytes"])
        for r in read_agg(spark, root).collect()
    }


def test_sync_agg_tracks_recompute(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    state = str(tmp_path / "agg")

    _batch(
        spark, table,
        [
            (1, "insert", "r1", "a.py", "c1", "python", "v1", None, 10),
            (2, "insert", "r1", "b.py", "c2", "python", "v2", None, 20),
            (3, "insert", "r2", "c.go", "c3", "go", "v3", None, 5),
        ],
        0,
    )
    rec = sync_agg(table, state, ["lang"], sum_col="size_bytes")
    assert rec["groups"] == 2
    assert _state(spark, state) == _recompute(table)

    # already current -> None
    assert sync_agg(table, state, ["lang"], sum_col="size_bytes") is None

    _batch(
        spark, table,
        [
            # lang flip + size change: old group must shrink
            (4, "update", "r1", "a.py", "c4", "rust", "v4", None, 7),
            (5, "delete", "r2", "c.go", "c5", None, None, None, None),
            (6, "insert", "r3", "d.rs", "c6", "rust", "v6", None, 3),
        ],
        1,
    )
    rec2 = sync_agg(table, state, ["lang"], sum_col="size_bytes")
    assert rec2 is not None
    assert _state(spark, state) == _recompute(table)
    # the emptied 'go' group is dropped, not kept at zero
    assert ("go",) not in _state(spark, state)

    # at-least-once replay: reset ONLY the feed cursor (simulates a crash
    # after the state commit but before the cursor advance) — re-sync must
    # detect the already-applied snapshot and not double the counts
    cpath = os.path.join(str(tmp_path / "t"), "_feeds", "agg.json")
    cur = json.load(open(cpath))
    cur["snapshot_id"] = cur["from_snapshot_id"]
    json.dump(cur, open(cpath, "w"))
    rec3 = sync_agg(table, state, ["lang"], sum_col="size_bytes")
    assert rec3 is not None and rec3.get("replayed_noop") is True
    assert _state(spark, state) == _recompute(table)


def test_cli_sync_agg(spark, tmp_path, capsys, monkeypatch):
    from vuln_datasync_spark import cli

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    tbl = str(tmp_path / "t")
    table = ManifestTable.create(spark, tbl, n_buckets=4)
    _batch(
        spark, table,
        [(1, "insert", "r1", "a.py", "c1", "python", "v1", None, 10)], 0,
    )
    state = str(tmp_path / "agg")
    argv = ["sync-agg", "--table", tbl, "--state", state,
            "--dims", "lang", "--sum-col", "size_bytes"]
    assert cli.main(argv) == 0
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["groups"] == 1
    assert _state(spark, state) == {("python",): (1, 10)}
    assert cli.main(argv) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {"status": "current"}
