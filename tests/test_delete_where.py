"""delete_where: predicate deletes expressed as CDC tombstones through
the normal MERGE — payload nulled in the tombstone, change feed sees
delete rows, epochs stay exactly-once, later genuine events resurrect,
and range_filters scope the scan via zone maps."""

import json

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


def _rows(seqs, repo="r0"):
    return [
        (s, "insert", repo, f"f{s}.py", f"c{s}", "py", f"secret{s}", None, s)
        for s in seqs
    ]


def _apply(spark, table, rows, bid, ckpt="dw"):
    return apply_batch(
        spark.createDataFrame(rows, CHANGELOG_SCHEMA), table, ckpt, bid
    )


def test_delete_where_basic_and_payload_nulled(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, _rows(range(1, 11), "keep") + _rows(range(21, 26), "gone"), 0)

    rec = table.delete_where("repo = 'gone'")
    assert rec["rows_applied"] == 5
    assert {r["repo"] for r in table.read().collect()} == {"keep"}

    # tombstones exist, outrank the stored rows, and carry NO payload
    tombs = (
        table.read(include_tombstones=True)
        .filter("is_deleted")
        .collect()
    )
    assert len(tombs) == 5
    for r in tombs:
        assert r["content"] is None and r["size_bytes"] is None
        assert r["op"] == "delete"
        assert r["commit_seq"] == int(r["path"][1:-3]) + 1

    # exactly-once: the SAME operation replays to None, state unchanged
    assert table.delete_where("repo = 'gone'") is None
    assert table.read().count() == 10

    # ...but a DIFFERENT predicate with default flags gets its own
    # derived epoch and actually applies (regression: a shared constant
    # default epoch used to swallow it silently)
    rec2 = table.delete_where("path = 'f1.py'")
    assert rec2["rows_applied"] == 1
    assert table.read().count() == 9


def test_delete_where_feeds_change_feed_and_resurrects(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, _rows(range(1, 6)), 0)
    s1 = table.current_snapshot_id()
    table.delete_where("path = 'f2.py'", batch_id=1)
    s2 = table.current_snapshot_id()

    ch = table.read_changes(s1, s2).collect()
    assert [(r["_change_type"], r["path"]) for r in ch] == [
        ("delete", "f2.py")
    ]

    # a later genuine event resurrects the key (its seq beats seq+1)
    _apply(spark, table, [(100, "insert", "r0", "f2.py", "c100", "py",
                           "back", None, 1)], 2)
    got = table.read().filter("path = 'f2.py'").collect()
    assert [r["content"] for r in got] == ["back"]


def test_delete_where_range_scoped_scan(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=8)
    _apply(spark, table, _rows(range(1, 41)), 0)
    _apply(spark, table, _rows(range(9001, 9003)), 1)

    # zone maps let the takedown scan skip the low-seq files entirely
    assert table.prune_report({"commit_seq": (9001, None)})["skipped"]
    rec = table.delete_where(
        "size_bytes >= 9001", range_filters={"commit_seq": (9001, None)}
    )
    assert rec["rows_applied"] == 2
    assert table.read().count() == 40


def test_delete_where_propagates_to_minhash_index(spark, tmp_path):
    """A takedown via delete_where nulls the tombstone payload, but the
    change feed's delete rows carry the OLD text (preimage side), so the
    feed-driven dedup index still clears the right cells."""
    from vuln_datasync_spark.operators.dedup_index import (
        build_minhash_index,
        dedup_against_index,
    )
    from vuln_datasync_spark.pipelines.index_sync import sync_minhash_index

    D_SCHEMA = (
        "doc_id long, commit_seq long, commit string, op string, text string"
    )
    text = "the quick brown fox jumps over the lazy dog again and again"
    table = ManifestTable.create(
        spark, str(tmp_path / "t"), n_buckets=4, key_cols=("doc_id",)
    )
    docs = [
        (i, i, f"c{i}", "insert",
         " ".join(f"w{i}x{j} filler{i * 7 + j}" for j in range(20)))
        for i in range(1, 6)
        if i != 3
    ] + [(3, 3, "c3", "insert", text)]
    table.merge(spark.createDataFrame(docs, D_SCHEMA), "dwmi", 0)
    idx = str(tmp_path / "idx")
    assert sync_minhash_index(table, idx, "text")["bootstrap"] is True

    probe = spark.createDataFrame(
        [(999, text + " tail")], ["doc_id", "text"]
    )
    assert {
        r["dup_id"]
        for r in dedup_against_index(probe, "text", "doc_id", idx).collect()
    } == {3}

    rec = table.delete_where("doc_id = 3", checkpoint_id="takedown")
    assert rec["rows_applied"] == 1
    assert sync_minhash_index(table, idx, "text")["removed"]["deleted_ids"] == 1
    assert (
        dedup_against_index(probe, "text", "doc_id", idx)
        .filter("dup_id = 3")
        .count()
        == 0
    )
    # index equals a fresh build over the post-takedown live table
    fresh = str(tmp_path / "fresh")
    build_minhash_index(table.read(), "text", "doc_id", fresh)

    def rows(path):
        return {
            tuple(tuple(v) if isinstance(v, list) else v for v in r)
            for r in spark.read.parquet(path)
            .select("id", "minhash", "bucket", "band", "pfx")
            .collect()
        }

    assert rows(idx) == rows(fresh)


def test_cli_delete_where(spark, tmp_path, capsys, monkeypatch):
    from vuln_datasync_spark import cli

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    tbl = str(tmp_path / "t")
    table = ManifestTable.create(spark, tbl, n_buckets=2)
    _apply(spark, table, _rows(range(1, 6)), 0)

    assert (
        cli.main(
            ["delete-where", "--table", tbl, "--predicate", "commit_seq <= 2"]
        )
        == 0
    )
    out = json.loads(capsys.readouterr().out.strip())
    assert out["rows_deleted"] == 2
    assert table.read().count() == 3


# ---------------------------------------------------------------- update


def test_update_where_sets_columns_and_recomputes_sha(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(
        spark,
        table,
        _rows(range(1, 6), "fix") + _rows(range(21, 24), "keep"),
        0,
    )
    before = {
        (r["repo"], r["path"]): r
        for r in table.read().collect()
    }
    rec = table.update_where(
        "repo = 'fix'",
        {"lang": F.lit("python3"), "content": "upper(content)"},
    )
    assert rec["rows_applied"] == 5
    after = {(r["repo"], r["path"]): r for r in table.read().collect()}
    for k, r in after.items():
        b = before[k]
        if k[0] == "fix":
            assert r["lang"] == "python3"
            assert r["content"] == b["content"].upper()
            # hash invariant recomputed, commit_seq outranks the stored row
            import hashlib

            assert (
                r["content_sha256"]
                == hashlib.sha256(r["content"].encode()).hexdigest()
            )
            assert r["commit_seq"] == b["commit_seq"] + 1
        else:
            assert r == b  # untouched rows byte-identical

    # change feed reports them as updates
    snaps = table.snapshots()
    feed = table.read_changes(snaps[0]["snapshot_id"])
    assert {r["_change_type"] for r in feed.collect()} == {"update"}

    # exactly-once: replaying the SAME operation (same derived epoch)
    # is a no-op; a different assignment would get its own epoch
    assert (
        table.update_where(
            "repo = 'fix'",
            {"lang": F.lit("python3"), "content": "upper(content)"},
        )
        is None
    )

    # a later genuine event still outranks the synthesized update
    _apply(
        spark,
        table,
        [(100, "update", "fix", "f1.py", "c100", "go", "v100", None, 1)],
        1,
    )
    got = {
        r["path"]: r["lang"]
        for r in table.read().filter("repo = 'fix'").collect()
    }
    assert got["f1.py"] == "go" and got["f2.py"] == "python3"

    with pytest.raises(ValueError, match="protected"):
        table.update_where("repo='fix'", {"commit_seq": F.lit(0)})
    with pytest.raises(ValueError, match="protected"):
        table.update_where("repo='fix'", {"content_sha256": F.lit("x")})
    with pytest.raises(ValueError, match="unknown column"):
        table.update_where("repo='fix'", {"nope": F.lit(1)})


def test_cli_update_where(spark, tmp_path, capsys, monkeypatch):
    from vuln_datasync_spark import cli

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(spark, table, _rows(range(1, 6), "fix"), 0)
    assert cli.main([
        "update-where", "--table", table.root,
        "--predicate", "repo = 'fix' AND commit_seq <= 3",
        "--set", "lang='rust'",
        "--set", "size_bytes=size_bytes * 2",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["rows_updated"] == 3
    rows = {r["path"]: r for r in table.read().collect()}
    assert rows["f1.py"]["lang"] == "rust"
    assert rows["f1.py"]["size_bytes"] == 2
    assert rows["f4.py"]["lang"] == "py"


def test_cli_distinct_ops_get_distinct_default_epochs(
    spark, tmp_path, capsys, monkeypatch
):
    """Two DIFFERENT update/delete operations run with default flags must
    both apply — the old constant default checkpoint-id swallowed the
    second one as a replayed epoch."""
    from vuln_datasync_spark import cli

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    tbl = str(tmp_path / "t")
    table = ManifestTable.create(spark, tbl, n_buckets=2)
    _apply(spark, table, _rows(range(1, 6), "fix"), 0)

    assert cli.main([
        "update-where", "--table", tbl,
        "--predicate", "commit_seq <= 2", "--set", "lang='rust'",
    ]) == 0
    out1 = json.loads(capsys.readouterr().out.strip())
    assert out1["rows_updated"] == 2

    # second, DIFFERENT update with defaults: must apply, not replay
    # (predicate on path — update_where bumps commit_seq, so seq-based
    # predicates would drift between runs)
    assert cli.main([
        "update-where", "--table", tbl,
        "--predicate", "path = 'f3.py'", "--set", "lang='go'",
    ]) == 0
    out2 = json.loads(capsys.readouterr().out.strip())
    assert out2.get("rows_updated") == 1, out2

    # re-running the SAME update IS a replay no-op (exactly-once kept)
    assert cli.main([
        "update-where", "--table", tbl,
        "--predicate", "path = 'f3.py'", "--set", "lang='go'",
    ]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {
        "status": "replayed-epoch"
    }

    # distinct deletes with defaults: both apply
    assert cli.main([
        "delete-where", "--table", tbl, "--predicate", "path = 'f1.py'",
    ]) == 0
    assert json.loads(capsys.readouterr().out.strip())["rows_deleted"] == 1
    assert cli.main([
        "delete-where", "--table", tbl, "--predicate", "path = 'f2.py'",
    ]) == 0
    assert json.loads(capsys.readouterr().out.strip())["rows_deleted"] == 1
    assert table.read().count() == 3
