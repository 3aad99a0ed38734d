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
    # --distinct-col passthrough (separate state dir + consumer)
    state2 = str(tmp_path / "agg2")
    argv2 = ["sync-agg", "--table", tbl, "--state", state2,
             "--dims", "lang", "--distinct-col", "commit",
             "--consumer", "agg2"]
    assert cli.main(argv2) == 0
    capsys.readouterr()
    [r] = read_agg(spark, state2).collect()
    assert (r["lang"], r["n"], r["distinct_commit"]) == ("python", 1, 1)


def _recompute_distinct(table):
    return {
        (r["lang"],): (r["n"], r["d"])
        for r in table.read()
        .groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("commit").alias("d"),
        )
        .collect()
    }


def _state_distinct(spark, root):
    return {
        (r["lang"],): (r["n"], r["distinct_commit"])
        for r in read_agg(spark, root).collect()
    }


def test_sync_agg_distinct_tracks_recompute(spark, tmp_path):
    """Exact COUNT(DISTINCT) maintenance: the support table must retract
    on deletes and dimension flips, and collapse duplicate values."""
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    state = str(tmp_path / "agg")

    _batch(
        spark, table,
        [
            # two python rows SHARING a commit -> distinct 1
            (1, "insert", "r1", "a.py", "cX", "python", "v1", None, 10),
            (2, "insert", "r1", "b.py", "cX", "python", "v2", None, 20),
            (3, "insert", "r1", "c.py", "cY", "python", "v3", None, 5),
            (4, "insert", "r2", "d.go", "cZ", "go", "v4", None, 5),
        ],
        0,
    )
    sync_agg(table, state, ["lang"], distinct_col="commit")
    assert _state_distinct(spark, state) == _recompute_distinct(table)
    assert _state_distinct(spark, state)[("python",)] == (3, 2)

    _batch(
        spark, table,
        [
            # drop ONE of the two cX rows: distinct must stay 2
            (5, "delete", "r1", "a.py", None, None, None, None, None),
            # lang flip carries cY out of python into rust
            (6, "update", "r1", "c.py", "cY", "rust", "v6", None, 7),
        ],
        1,
    )
    sync_agg(table, state, ["lang"], distinct_col="commit")
    got = _state_distinct(spark, state)
    assert got == _recompute_distinct(table)
    assert got[("python",)] == (1, 1)
    assert got[("rust",)] == (1, 1)

    _batch(
        spark, table,
        [
            # now the LAST cX row goes: python group disappears entirely
            (7, "delete", "r1", "b.py", None, None, None, None, None),
        ],
        2,
    )
    sync_agg(table, state, ["lang"], distinct_col="commit")
    got = _state_distinct(spark, state)
    assert got == _recompute_distinct(table)
    assert ("python",) not in got

    # replay guard still holds with the support table in play
    cpath = os.path.join(str(tmp_path / "t"), "_feeds", "agg.json")
    cur = json.load(open(cpath))
    cur["snapshot_id"] = cur["from_snapshot_id"]
    json.dump(cur, open(cpath, "w"))
    rec = sync_agg(table, state, ["lang"], distinct_col="commit")
    assert rec is not None and rec.get("replayed_noop") is True
    assert _state_distinct(spark, state) == _recompute_distinct(table)
