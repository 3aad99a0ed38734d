"""Debezium/Maxwell envelope ingress: op routing, before/after image
selection, seq/ts contracts, malformed-row accounting, DLQ split, and the
end-to-end hop into the exactly-once MERGE sink."""

import json
import os

from pyspark.sql import functions as F

from vuln_datasync_spark.sources.debezium import (
    envelope_to_changelog,
    parse_debezium,
    parse_maxwell,
)


def _dbz(op, seq, repo="r1", path="a.py", content="x", ts_ms=1_700_000_000_123):
    img = {
        "repo": repo, "path": path, "commit": f"c{seq}",
        "lang": "py", "content": content, "size_bytes": len(content),
    }
    return json.dumps(
        {
            "payload": {
                "before": img if op == "d" else None,
                "after": None if op == "d" else img,
                "source": {
                    "ts_ms": ts_ms, "lsn": seq, "pos": None,
                    "db": "app", "table": "files",
                },
                "op": op,
                "ts_ms": ts_ms + 5,
            }
        }
    )


def test_debezium_op_routing_and_images(spark):
    vals = [
        (_dbz("c", 1),), (_dbz("r", 2),), (_dbz("u", 3),), (_dbz("d", 4),),
        ('{"not": "an envelope"}',), ("xx{ not json",),
        (_dbz("x", 7),),  # unknown op
        # op u with NO after image -> missing row image
        (json.dumps({"payload": {"op": "u", "source": {"ts_ms": 1}}}),),
    ]
    df = spark.createDataFrame(vals, "value string")
    out = parse_debezium(df).collect()
    by_seq = {r["commit_seq"]: r for r in out if r["_parse_error"] is None}
    assert sorted(by_seq) == [1, 2, 3, 4]
    assert by_seq[1]["op"] == "insert" and by_seq[2]["op"] == "insert"
    assert by_seq[3]["op"] == "update" and by_seq[4]["op"] == "delete"
    # the delete row came from the BEFORE image
    assert by_seq[4]["commit"] == "c4" and by_seq[4]["content"] == "x"
    # ts = source.ts_ms (commit time), not payload.ts_ms (connector time)
    assert by_seq[1]["ts"].microsecond == 123000
    errs = sorted(
        r["_parse_error"] for r in out if r["_parse_error"] is not None
    )
    assert errs == [
        "malformed envelope", "malformed envelope",
        "missing row image", "unknown op: x",
    ]


def test_debezium_seq_fallback_lsn_pos_tsms(spark):
    def env(lsn, pos, ts_ms):
        return json.dumps(
            {
                "payload": {
                    "after": {"repo": "r", "path": "p", "commit": "c",
                              "lang": "py", "content": "x", "size_bytes": 1},
                    "source": {"ts_ms": 1, "lsn": lsn, "pos": pos,
                               "db": "d", "table": "t"},
                    "op": "c", "ts_ms": ts_ms,
                }
            }
        )

    df = spark.createDataFrame(
        [(env(10, 20, 30),), (env(None, 20, 30),), (env(None, None, 30),)],
        "value string",
    )
    assert [r["commit_seq"] for r in
            parse_debezium(df).orderBy("commit_seq").collect()] == [10, 20, 30]


def test_maxwell_parse_and_second_precision(spark):
    def env(mtype, xid, ts=1_700_000_000):
        return json.dumps(
            {
                "database": "app", "table": "files", "type": mtype,
                "ts": ts, "xid": xid, "position": None,
                "data": {"repo": "r1", "path": "b.py", "commit": f"c{xid}",
                         "lang": "py", "content": "yy", "size_bytes": 2},
                "old": None,
            }
        )

    vals = [
        (env("insert", 1),), (env("bootstrap-insert", 2),),
        (env("update", 3),), (env("delete", 4),),
        (env("table-create", 5),), ("garbage",),
    ]
    out = parse_maxwell(
        spark.createDataFrame(vals, "value string")
    ).collect()
    good = {r["commit_seq"]: r for r in out if r["_parse_error"] is None}
    assert sorted(good) == [1, 2, 3, 4]
    assert good[1]["op"] == "insert" == good[2]["op"]
    assert good[3]["op"] == "update" and good[4]["op"] == "delete"
    # maxwell deletes carry the row in data — image present
    assert good[4]["content"] == "yy"
    assert str(good[1]["ts"]).endswith(":20")  # seconds, no millis
    errs = sorted(r["_parse_error"] for r in out if r["_parse_error"])
    assert errs == ["malformed envelope", "unknown op: table-create"]


def test_envelope_to_changelog_dlq_split(spark, tmp_path):
    dlq = str(tmp_path / "dlq")
    vals = [(_dbz("c", 1),), ("broken",), (_dbz("d", 2),)]
    good = envelope_to_changelog(
        spark.createDataFrame(vals, "value string"), dlq_path=dlq
    )
    assert good.count() == 2
    assert "_parse_error" not in good.columns and "_raw" not in good.columns
    bad = spark.read.parquet(dlq).collect()
    assert len(bad) == 1 and bad[0]["value"] == "broken"
    assert bad[0]["_parse_error"] == "malformed envelope"


def test_envelope_feeds_merge_sink_end_to_end(spark, tmp_path):
    """Debezium tail -> canonical changelog -> exactly-once MERGE: the
    full WAL-to-lake hop. A later update and a delete must land; the
    final state matches the op sequence."""
    from vuln_datasync_spark.sinks import ManifestTable
    from vuln_datasync_spark.streaming import apply_batch

    vals = [
        (_dbz("c", 1, path="a.py", content="v1"),),
        (_dbz("u", 2, path="a.py", content="v2"),),
        (_dbz("c", 3, path="b.py", content="w1"),),
        (_dbz("d", 4, path="b.py", content="w1"),),
        ("junk not json",),
    ]
    ch = envelope_to_changelog(
        spark.createDataFrame(vals, "value string")
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    table = ManifestTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    apply_batch(ch, table, "dbz", 0)
    rows = {(r["repo"], r["path"]): r["content"]
            for r in table.read().collect()}
    assert rows == {("r1", "a.py"): "v2"}


def test_envelope_stream_resume_and_dlq(spark, tmp_path):
    """Streaming WAL tail over raw Debezium JSON lines: first drain
    applies the available files, a later drain with the SAME checkpoint
    picks up only new files (offset resume), malformed lines land in an
    epoch-named DLQ dir, and the final state equals the op sequence."""
    from vuln_datasync_spark.streaming import run_stream

    log = tmp_path / "envlog"
    log.mkdir()
    (log / "f0.jsonl").write_text(
        _dbz("c", 1, path="a.py", content="v1") + "\n"
        + "junk line\n"
        + _dbz("c", 2, path="b.py", content="w1") + "\n"
    )
    table = run_stream(
        spark,
        str(log),
        str(tmp_path / "tbl"),
        str(tmp_path / "ckpt"),
        schema=None,
        envelope_format="debezium",
        envelope_dlq_dir=str(tmp_path / "dlq"),
    )
    state = {r["path"]: r["content"] for r in table.read().collect()}
    assert state == {"a.py": "v1", "b.py": "w1"}

    # tail: update one key, delete the other; same checkpoint resumes
    (log / "f1.jsonl").write_text(
        _dbz("u", 3, path="a.py", content="v2") + "\n"
        + _dbz("d", 4, path="b.py", content="w1") + "\n"
    )
    table = run_stream(
        spark,
        str(log),
        str(tmp_path / "tbl"),
        str(tmp_path / "ckpt"),
        schema=None,
        envelope_format="debezium",
        envelope_dlq_dir=str(tmp_path / "dlq"),
    )
    state = {r["path"]: r["content"] for r in table.read().collect()}
    assert state == {"a.py": "v2"}

    # DLQ holds exactly the malformed line, under an epoch-named dir
    bad = spark.read.parquet(str(tmp_path / "dlq" / "*")).collect()
    assert [r["value"] for r in bad] == ["junk line"]
    assert bad[0]["_parse_error"] == "malformed envelope"

    # replaying from a FRESH checkpoint into the same table is a no-op
    # batch-wise only if epochs match; a new checkpoint identity gets new
    # epochs — but LWW monotonicity still makes the replay harmless
    table = run_stream(
        spark,
        str(log),
        str(tmp_path / "tbl"),
        str(tmp_path / "ckpt2"),
        schema=None,
        envelope_format="debezium",
    )
    state = {r["path"]: r["content"] for r in table.read().collect()}
    assert state == {"a.py": "v2"}


def test_cli_stream_envelope_format(spark, tmp_path, monkeypatch):
    from vuln_datasync_spark import cli
    from vuln_datasync_spark.sinks import ManifestTable

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    log = tmp_path / "cli_envlog"
    log.mkdir()
    (log / "f0.jsonl").write_text(
        _dbz("c", 1, path="a.py", content="v1") + "\n"
        + "junk\n"
        + _dbz("u", 2, path="a.py", content="v2") + "\n"
    )
    tbl = str(tmp_path / "cli_tbl")
    assert cli.main(
        ["stream", "--changelog", str(log), "--table", tbl,
         "--checkpoint", str(tmp_path / "cli_ckpt"),
         "--envelope-format", "debezium",
         "--envelope-dlq", str(tmp_path / "cli_dlq")]
    ) == 0
    t = ManifestTable(spark, tbl)
    assert {r["content"] for r in t.read().collect()} == {"v2"}
    bad = spark.read.parquet(str(tmp_path / "cli_dlq" / "*")).collect()
    assert [r["value"] for r in bad] == ["junk"]


def test_envelope_fuzz_roundtrip(spark):
    """Property fuzz: random well-formed envelopes always parse to the
    planted row; random junk never crashes the parser and always gets a
    _parse_error. One Spark job over the whole corpus (not per-example)."""
    import random

    rng = random.Random(42)
    rows, want = [], {}
    for i in range(300):
        kind = rng.randrange(4)
        if kind == 0:  # debezium well-formed
            op = rng.choice(["c", "r", "u", "d"])
            content = "".join(
                rng.choice('abc"\\\n\t {}[]:,é中') for _ in range(rng.randrange(0, 24))
            )
            rows.append((i, _dbz(op, 1000 + i, path=f"p{i}.py", content=content)))
            want[1000 + i] = (
                {"c": "insert", "r": "insert", "u": "update", "d": "delete"}[op],
                content,
            )
        elif kind == 1:  # junk text
            rows.append((i, "".join(rng.choice("{}:,x\"'") for _ in range(rng.randrange(0, 30)))))
        elif kind == 2:  # valid JSON, wrong shape
            rows.append((i, json.dumps({"a": rng.randrange(9), "b": [1, 2]})))
        else:  # envelope with unknown op
            rows.append((i, _dbz("z", 2000 + i)))
    df = spark.createDataFrame(rows, "i int, value string")
    out = parse_debezium(df).collect()
    good = {r["commit_seq"]: r for r in out if r["_parse_error"] is None}
    assert {k: (v["op"], v["content"]) for k, v in good.items()} == want
    # every non-well-formed input is accounted for with a reason
    assert sum(1 for r in out if r["_parse_error"] is not None) == len(rows) - len(want)


def test_feed_to_debezium_roundtrip(spark, tmp_path):
    """CDC egress closes the loop: table A's change feed rendered as
    Debezium envelopes, parsed back by the engine's own ingress, and
    replayed into table B must reproduce A's live state exactly —
    including an update and a delete between two snapshots."""
    from vuln_datasync_spark.sinks import ManifestTable
    from vuln_datasync_spark.sources.debezium import feed_to_debezium
    from vuln_datasync_spark.streaming import apply_batch

    a = ManifestTable.create(spark, str(tmp_path / "a"), n_buckets=4)
    batch1 = envelope_to_changelog(spark.createDataFrame(
        [(_dbz("c", 1, path="a.py", content="v1"),),
         (_dbz("c", 2, path="b.py", content="w1"),)], "value string"))
    apply_batch(batch1, a, "src", 0)
    batch2 = envelope_to_changelog(spark.createDataFrame(
        [(_dbz("u", 3, path="a.py", content="v2"),),
         (_dbz("d", 4, path="b.py", content="w1"),)], "value string"))
    apply_batch(batch2, a, "src", 1)

    b = ManifestTable.create(spark, str(tmp_path / "b"), n_buckets=2)
    snaps = [s["snapshot_id"] for s in a.snapshots()]
    for i, (frm, to) in enumerate(zip([None] + snaps, snaps)):
        feed = a.read_changes(frm, to)
        env = feed_to_debezium(feed)
        # every emitted line is a well-formed envelope for our own parser
        parsed = parse_debezium(env)
        assert parsed.filter(F.col("_parse_error").isNotNull()).count() == 0
        apply_batch(
            parsed.filter(F.col("_parse_error").isNull())
            .drop("_parse_error"),
            b, "mirror", i,
        )
    sa = {(r["repo"], r["path"], r["content"]) for r in a.read().collect()}
    sb = {(r["repo"], r["path"], r["content"]) for r in b.read().collect()}
    assert sa == sb == {("r1", "a.py", "v2")}


def test_envelope_outbox_sync_cursor_and_idempotence(spark, tmp_path):
    """Outbox: cursor advances per sync, nothing-new returns None, a
    replayed window overwrites the same snap dir, and a second engine
    tailing the outbox dirs reproduces the source state."""
    from vuln_datasync_spark.sinks import ManifestTable
    from vuln_datasync_spark.sources.debezium import sync_envelope_outbox
    from vuln_datasync_spark.streaming import apply_batch

    a = ManifestTable.create(spark, str(tmp_path / "a"), n_buckets=4)
    out = str(tmp_path / "outbox")

    apply_batch(envelope_to_changelog(spark.createDataFrame(
        [(_dbz("c", 1, path="a.py", content="v1"),),
         (_dbz("c", 2, path="b.py", content="w1"),)], "value string")),
        a, "src", 0)
    r1 = sync_envelope_outbox(a, out)
    assert r1 is not None and r1["rows_published"] == 2
    assert sync_envelope_outbox(a, out) is None  # current -> no-op

    apply_batch(envelope_to_changelog(spark.createDataFrame(
        [(_dbz("u", 3, path="a.py", content="v2"),),
         (_dbz("d", 4, path="b.py", content="w1"),)], "value string")),
        a, "src", 1)
    r2 = sync_envelope_outbox(a, out)
    assert r2 is not None and r2["rows_published"] == 2

    # a mirror engine tailing the outbox reproduces the source state
    b = ManifestTable.create(spark, str(tmp_path / "b"), n_buckets=2)
    for i, d in enumerate(sorted(
        p for p in os.listdir(out) if p.startswith("snap=")
    )):
        ch = envelope_to_changelog(spark.read.text(os.path.join(out, d)))
        apply_batch(ch, b, "mirror", i)
    sa = {(r["path"], r["content"]) for r in a.read().collect()}
    sb = {(r["path"], r["content"]) for r in b.read().collect()}
    assert sa == sb == {("a.py", "v2")}


def test_cli_sync_outbox(spark, tmp_path, capsys, monkeypatch):
    from vuln_datasync_spark import cli
    from vuln_datasync_spark.sinks import ManifestTable
    from vuln_datasync_spark.streaming import apply_batch

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    tbl = str(tmp_path / "cli_out_tbl")
    a = ManifestTable.create(spark, tbl, n_buckets=2)
    apply_batch(envelope_to_changelog(spark.createDataFrame(
        [(_dbz("c", 1),)], "value string")), a, "src", 0)
    out = str(tmp_path / "cli_outbox")
    assert cli.main(["sync-outbox", "--table", tbl, "--out", out]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["rows_published"] == 1
    assert parse_debezium(
        spark.read.text(rec["dir"])
    ).filter(F.col("_parse_error").isNotNull()).count() == 0
    # current -> no-op
    assert cli.main(["sync-outbox", "--table", tbl, "--out", out]) == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    ) == {"status": "current"}


def test_feed_to_maxwell_roundtrip(spark, tmp_path):
    """Maxwell egress round-trips through the engine's own Maxwell
    ingress and reproduces the source state in a mirror table."""
    from vuln_datasync_spark.sinks import ManifestTable
    from vuln_datasync_spark.sources.debezium import (
        feed_to_maxwell,
        parse_maxwell,
    )
    from vuln_datasync_spark.streaming import apply_batch

    a = ManifestTable.create(spark, str(tmp_path / "ma"), n_buckets=4)
    apply_batch(envelope_to_changelog(spark.createDataFrame(
        [(_dbz("c", 1, path="a.py", content="v1"),),
         (_dbz("c", 2, path="b.py", content="w1"),)], "value string")),
        a, "src", 0)
    apply_batch(envelope_to_changelog(spark.createDataFrame(
        [(_dbz("u", 3, path="a.py", content="v2"),),
         (_dbz("d", 4, path="b.py", content="w1"),)], "value string")),
        a, "src", 1)

    b = ManifestTable.create(spark, str(tmp_path / "mb"), n_buckets=2)
    snaps = [s["snapshot_id"] for s in a.snapshots()]
    for i, (frm, to) in enumerate(zip([None] + snaps, snaps)):
        env = feed_to_maxwell(a.read_changes(frm, to))
        parsed = parse_maxwell(env)
        assert parsed.filter(F.col("_parse_error").isNotNull()).count() == 0
        apply_batch(
            parsed.filter(F.col("_parse_error").isNull())
            .drop("_parse_error"),
            b, "mmirror", i,
        )
    sa = {(r["path"], r["content"]) for r in a.read().collect()}
    sb = {(r["path"], r["content"]) for r in b.read().collect()}
    assert sa == sb == {("a.py", "v2")}
