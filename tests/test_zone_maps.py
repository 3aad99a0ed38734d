"""Per-file zone maps (manifest min/max stats) and range-filtered reads:
file skipping must be provable (inputFiles / prune_report), results must
equal the unpruned filter, and the stats must survive rollback, no-op
commits, tombstone expiry, and schema evolution."""

import datetime as dt

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


def _batch(spark, table, rows, bid, ckpt="zm"):
    return apply_batch(
        spark.createDataFrame(rows, CHANGELOG_SCHEMA), table, ckpt, bid
    )


def _rows(seqs, repo="r0", ts=None):
    return [
        (
            s,
            "insert",
            repo,
            f"f{s}.py",
            f"c{s}",
            "python",
            f"v{s}",
            ts,
            s * 10,
        )
        for s in seqs
    ]


def _state(df):
    return sorted(
        (r["repo"], r["path"], r["content"], r["commit_seq"])
        for r in df.collect()
    )


def test_zone_maps_written_and_carried(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    _batch(spark, table, _rows(range(1, 21)), 0)
    m = table.manifest()
    fm = m["file_meta"]
    live = {p for paths in m["files"].values() for p in paths}
    assert set(fm) == live and live
    for meta in fm.values():
        mn, mx = meta["cols"]["commit_seq"]
        assert mn is not None and mn <= mx
        assert meta["rows"] >= 1
        # string key col stats present; content NOT tracked
        assert "repo" in meta["cols"] and "content" not in meta["cols"]

    # small second merge: the untouched buckets' entries must be carried
    # forward unchanged (and stay keyed to exactly the live file set)
    _batch(spark, table, _rows(range(1001, 1003)), 1)
    m2 = table.manifest()
    live2 = {p for paths in m2["files"].values() for p in paths}
    assert set(m2["file_meta"]) == live2
    carried = live & live2
    assert carried, "a 2-row merge must leave some buckets untouched"
    for p in carried:
        assert m2["file_meta"][p] == fm[p]


def test_range_read_skips_files_and_matches_full_filter(spark, tmp_path):
    # COW merges rewrite whole buckets, so a touched bucket's file mixes
    # old low-seq and new high-seq rows; only UNTOUCHED buckets keep a
    # narrow zone. 40 keys populate all 8 buckets, then a 2-key batch
    # touches at most 2 — the rest stay skippable for a high-seq filter.
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=8)
    _batch(spark, table, _rows(range(1, 41)), 0)
    _batch(spark, table, _rows(range(10001, 10003)), 1)

    rep = table.prune_report({"commit_seq": (10001, None)})
    assert rep["skipped"], "low-range files must be skipped"
    assert rep["kept"], "high-range files must be kept"

    pruned = table.read(range_filters={"commit_seq": (10001, None)})
    full = table.read().filter("commit_seq >= 10001")
    assert _state(pruned) == _state(full)
    assert len(_state(pruned)) == 2

    # physical evidence: the pruned plan never opens the skipped files
    opened = {f.rsplit("/", 1)[-1] for f in pruned.inputFiles()}
    skipped_names = {p.rsplit("/", 1)[-1] for p in rep["skipped"]}
    assert not opened & skipped_names
    # and it opened strictly fewer files than the full read
    assert len(pruned.inputFiles()) < len(full.inputFiles())

    # two-sided + both-None-side filters
    mid = table.read(range_filters={"commit_seq": (20, 10010)})
    assert _state(mid) == _state(
        table.read().filter("commit_seq between 20 and 10010")
    )


def test_range_read_timestamp_and_string_key(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    t0 = dt.datetime(2026, 1, 1)
    t1 = dt.datetime(2026, 6, 1)
    _batch(spark, table, _rows(range(1, 21), repo="aaa", ts=t0), 0)
    _batch(spark, table, _rows(range(101, 103), repo="zzz", ts=t1), 1)

    got = table.read(range_filters={"ts": (dt.datetime(2026, 3, 1), None)})
    assert {r["repo"] for r in got.collect()} == {"zzz"}
    rep = table.prune_report({"ts": (dt.datetime(2026, 3, 1), None)})
    assert rep["skipped"]

    got = table.read(range_filters={"repo": (None, "m")})
    assert {r["repo"] for r in got.collect()} == {"aaa"}


def test_all_null_column_skips_but_added_column_keeps(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    _batch(spark, table, _rows(range(1, 11), ts=None), 0)
    # every file's ts is all-null -> a ts range filter can skip everything
    rep = table.prune_report({"ts": (dt.datetime(2026, 1, 1), None)})
    assert rep["kept"] == [] and rep["skipped"]
    assert (
        table.read(
            range_filters={"ts": (dt.datetime(2026, 1, 1), None)}
        ).count()
        == 0
    )

    # schema evolution: add a column via a direct merge; OLD files have no
    # stats entry for it -> conservative keep (and correct null semantics)
    evolved = T.StructType(
        CHANGELOG_SCHEMA.fields + [T.StructField("stars", T.LongType())]
    )
    extra = spark.createDataFrame(
        [(2001, "insert", "rn", "new.py", "c", "py", "v", None, 1, 7)],
        evolved,
    )
    apply_batch(extra, table, "zm", 1)
    pruned = table.read(range_filters={"stars": (5, None)})
    assert [(r["path"], r["stars"]) for r in pruned.collect()] == [
        ("new.py", 7)
    ]


def test_stats_survive_noop_rollback_and_expiry(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    _batch(spark, table, _rows(range(1, 11)), 0)
    fm0 = table.manifest()["file_meta"]
    good = table.current_snapshot_id()

    # no-op commit (replay of an empty epoch) carries file_meta
    empty = spark.createDataFrame([], CHANGELOG_SCHEMA)
    apply_batch(empty, table, "zm", 5)
    assert table.manifest()["file_meta"] == fm0

    _batch(spark, table, _rows(range(501, 511)), 6)
    table.rollback(good)
    assert table.manifest()["file_meta"] == fm0

    # tombstone expiry rewrites buckets; stats must be recomputed for the
    # rewritten files and pruning must still be exact
    _batch(
        spark,
        table,
        [(600, "delete", "r0", "f1.py", "cX", None, None, None, None)],
        7,
    )
    table.expire_tombstones(below_seq=10**9)
    m = table.manifest()
    live = {p for paths in m["files"].values() for p in paths}
    assert set(m["file_meta"]) == live
    pruned = table.read(range_filters={"commit_seq": (5, 8)})
    assert _state(pruned) == _state(
        table.read().filter("commit_seq between 5 and 8")
    )


def test_cluster_enables_intra_bucket_pruning(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    _batch(spark, table, _rows(range(1, 201)), 0)
    before = _state(table.read())
    m0 = table.manifest()
    # pre-cluster: one wide file per bucket, nothing skippable mid-range
    assert all(len(ps) == 1 for ps in m0["files"].values())
    assert not table.prune_report({"commit_seq": (150, 160)})["skipped"]

    sid = table.cluster(["commit_seq"], target_file_rows=25)
    assert sid == table.current_snapshot_id()
    m1 = table.manifest()
    assert all(len(ps) >= 4 for ps in m1["files"].values())

    # logical state unchanged
    assert _state(table.read()) == before
    # narrow range now skips most files INSIDE each bucket
    rep = table.prune_report({"commit_seq": (150, 160)})
    assert len(rep["skipped"]) > len(rep["kept"])
    pruned = table.read(range_filters={"commit_seq": (150, 160)})
    assert _state(pruned) == _state(
        table.read().filter("commit_seq between 150 and 160")
    )
    assert len(_state(pruned)) == 11

    # merges after clustering keep working and keep stats consistent
    _batch(spark, table, _rows(range(5001, 5003)), 1)
    m2 = table.manifest()
    live = {p for paths in m2["files"].values() for p in paths}
    assert set(m2["file_meta"]) == live


def test_cluster_bucket_subset(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    _batch(spark, table, _rows(range(1, 101)), 0)
    m0 = table.manifest()
    sid = table.cluster(["commit_seq"], target_file_rows=10, buckets=[0, 1])
    assert sid is not None
    m1 = table.manifest()
    for b in ("2", "3"):
        assert m1["files"].get(b) == m0["files"].get(b)
    assert len(m1["files"]["0"]) > 1
    assert _state(table.read()) == _state(
        table.read(snapshot_id=m0["snapshot_id"])
    )


def test_cli_scan_and_cluster(spark, tmp_path, capsys, monkeypatch):
    import json

    from vuln_datasync_spark import cli

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    tbl = str(tmp_path / "t")
    table = ManifestTable.create(spark, tbl, n_buckets=2)
    _batch(spark, table, _rows(range(1, 101)), 0)

    assert (
        cli.main(
            ["cluster", "--table", tbl, "--by", "commit_seq",
             "--target-file-rows", "20"]
        )
        == 0
    )
    assert json.loads(capsys.readouterr().out.strip())["snapshot_id"]

    assert (
        cli.main(
            ["scan", "--table", tbl, "--where", "commit_seq=90..", "--report"]
        )
        == 0
    )
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["skipped"] > 0 and rep["kept"] > 0

    assert (
        cli.main(["scan", "--table", tbl, "--where", "commit_seq=90.."]) == 0
    )
    rows = [
        json.loads(x) for x in capsys.readouterr().out.strip().splitlines()
    ]
    assert sorted(r["commit_seq"] for r in rows) == list(range(90, 101))


def test_long_string_bounds_are_safe(spark, tmp_path):
    table = ManifestTable.create(
        spark, str(tmp_path / "t"), n_buckets=1, key_cols=("repo",)
    )
    long_repo = "m" * 200  # exceeds the 64-char stat cap
    rows = [
        (1, "insert", long_repo, "f.py", "c", "py", "v", None, 1),
        (2, "insert", "aaa", "g.py", "c", "py", "v", None, 1),
    ]
    _batch(spark, table, rows, 0)
    meta = next(iter(table.manifest()["file_meta"].values()))
    mn, mx = meta["cols"]["repo"]
    assert mn == "aaa"
    assert mx is None  # truncated max -> unbounded above, never wrong
    # a filter above the truncated prefix must still find the long key
    got = table.read(range_filters={"repo": ("mmm", None)})
    assert [r["repo"] for r in got.collect()] == [long_repo]
