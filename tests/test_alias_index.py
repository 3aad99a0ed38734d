"""Alias inverted index: build/probe pruning, partition-scoped
maintenance (incl. stale-cell clearing on alias-changing updates and
vacated-partition removal), and change-feed synchronization
(reference GetVulnerabilityByAlias / alias-cache analog)."""

import glob
import os

from pyspark.sql import functions as F

from vuln_datasync_spark.operators.alias_index import (
    build_alias_index,
    lookup_aliases,
    resolve_aliases,
    update_alias_index,
)
from vuln_datasync_spark.pipelines.index_sync import sync_alias_index
from vuln_datasync_spark.sinks.manifest_table import ManifestTable

SCHEMA = (
    "vuln_id string, commit_seq long, commit string, op string, "
    "severity string, aliases array<string>"
)


def _merge(spark, table, rows, bid):
    table.merge(spark.createDataFrame(rows, SCHEMA), "ai", bid)


def _rec(i, seq, op="insert", aliases=None, sev="HIGH"):
    return (
        f"VULN-{i:04d}",
        seq,
        f"c{seq}",
        op,
        sev,
        aliases if aliases is not None else [f"CVE-2026-{i:04d}", f"GHSA-{i:04d}"],
    )


def _pairs(spark, idx, aliases):
    return {
        (r["alias"], r["id"])
        for r in lookup_aliases(spark, idx, aliases).collect()
    }


def test_build_lookup_and_pruning(spark, tmp_path):
    idx = str(tmp_path / "idx")
    df = spark.createDataFrame(
        [_rec(i, i) for i in range(50)], SCHEMA
    ).select("vuln_id", "aliases")
    build_alias_index(df, idx, id_col="vuln_id")

    got = _pairs(spark, idx, ["CVE-2026-0003", "GHSA-0007", "NOPE-1"])
    assert got == {
        ("CVE-2026-0003", "VULN-0003"),
        ("GHSA-0007", "VULN-0007"),
    }
    assert _pairs(spark, idx, []) == set()

    # planning-time pruning: the scan's PartitionFilters carry exactly
    # the probe alias's pfx cell
    import hashlib

    exp_pfx = "x" + hashlib.md5(b"CVE-2026-0003").hexdigest()[:2]
    plan = (
        lookup_aliases(spark, idx, ["CVE-2026-0003"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and exp_pfx in pf[0]


def test_resolve_aliases_end_to_end(spark, tmp_path):
    table = ManifestTable.create(
        spark, str(tmp_path / "t"), n_buckets=4, key_cols=("vuln_id",)
    )
    _merge(spark, table, [_rec(i, i) for i in range(20)], 0)
    idx = str(tmp_path / "idx")
    build_alias_index(table.read().select("vuln_id", "aliases"), idx)

    recs = resolve_aliases(table, idx, ["GHSA-0005", "CVE-2026-0011"])
    got = {(r["vuln_id"], r["severity"]) for r in recs.collect()}
    assert got == {("VULN-0005", "HIGH"), ("VULN-0011", "HIGH")}
    assert resolve_aliases(table, idx, ["NOPE"]).count() == 0


def test_update_clears_stale_cells_and_matches_rebuild(spark, tmp_path):
    idx = str(tmp_path / "idx")
    base = [_rec(i, i) for i in range(30)]
    df = spark.createDataFrame(base, SCHEMA).select("vuln_id", "aliases")
    build_alias_index(df, idx)
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(idx, "pfx=*", "*.parquet"))
    }

    # update drops GHSA-0002 and gains OSV-0002; delete VULN-0004;
    # insert VULN-0099
    ups = spark.createDataFrame(
        [
            ("VULN-0002", ["CVE-2026-0002", "OSV-0002"]),
            ("VULN-0099", ["CVE-2026-0099"]),
        ],
        "vuln_id string, aliases array<string>",
    )
    rems = spark.createDataFrame(
        [
            ("VULN-0002", ["CVE-2026-0002", "GHSA-0002"]),
            ("VULN-0004", ["CVE-2026-0004", "GHSA-0004"]),
        ],
        "vuln_id string, aliases array<string>",
    )
    stats = update_alias_index(idx, upserts=ups, removals=rems)
    assert stats["touched_partitions"] > 0

    assert _pairs(spark, idx, ["GHSA-0002"]) == set()  # stale cell gone
    assert _pairs(spark, idx, ["OSV-0002"]) == {("OSV-0002", "VULN-0002")}
    assert _pairs(spark, idx, ["CVE-2026-0004", "GHSA-0004"]) == set()
    assert _pairs(spark, idx, ["CVE-2026-0099"]) == {
        ("CVE-2026-0099", "VULN-0099")
    }

    # equality with a fresh rebuild of the would-be live state
    live = [r for r in base if r[0] not in ("VULN-0002", "VULN-0004")] + [
        _rec(2, 100, aliases=["CVE-2026-0002", "OSV-0002"]),
        _rec(99, 101, aliases=["CVE-2026-0099"]),
    ]
    idx2 = str(tmp_path / "idx2")
    build_alias_index(
        spark.createDataFrame(live, SCHEMA).select("vuln_id", "aliases"), idx2
    )
    a = {(r["alias"], r["id"]) for r in spark.read.parquet(idx).collect()}
    b = {(r["alias"], r["id"]) for r in spark.read.parquet(idx2).collect()}
    assert a == b

    # small delta: most partition files untouched byte-for-byte (mtime)
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(idx, "pfx=*", "*.parquet"))
    }
    same = [f for f in before if f in after and before[f] == after[f]]
    assert len(same) > len(before) / 2


def test_update_removes_vacated_partition(spark, tmp_path):
    idx = str(tmp_path / "idx")
    df = spark.createDataFrame(
        [("V1", ["ONLY-ALIAS"])], "vuln_id string, aliases array<string>"
    )
    build_alias_index(df, idx)
    assert len(glob.glob(os.path.join(idx, "pfx=*"))) == 1
    update_alias_index(
        idx,
        removals=spark.createDataFrame(
            [("V1", ["ONLY-ALIAS"])], "vuln_id string, aliases array<string>"
        ),
    )
    assert glob.glob(os.path.join(idx, "pfx=*")) == []


def test_sync_alias_index_feed_loop(spark, tmp_path):
    table = ManifestTable.create(
        spark, str(tmp_path / "t"), n_buckets=4, key_cols=("vuln_id",)
    )
    idx = str(tmp_path / "idx")
    _merge(spark, table, [_rec(i, i) for i in range(15)], 0)

    rec = sync_alias_index(table, idx)
    assert rec["bootstrap"] is True
    assert sync_alias_index(table, idx) is None  # already current

    # alias-changing update + delete + insert
    _merge(
        spark,
        table,
        [
            _rec(3, 200, op="update", aliases=["CVE-2026-0003", "OSV-0003"]),
            _rec(6, 201, op="delete", aliases=None),
            _rec(77, 202, aliases=["GHSA-0077"]),
        ],
        1,
    )
    rec2 = sync_alias_index(table, idx)
    assert rec2 is not None and rec2["touched_partitions"] > 0

    assert _pairs(spark, idx, ["GHSA-0003"]) == set()  # dropped alias
    assert _pairs(spark, idx, ["OSV-0003"]) == {("OSV-0003", "VULN-0003")}
    assert _pairs(spark, idx, ["CVE-2026-0006", "GHSA-0006"]) == set()
    assert _pairs(spark, idx, ["GHSA-0077"]) == {("GHSA-0077", "VULN-0077")}

    # index equals a fresh build from the live table
    idx2 = str(tmp_path / "idx2")
    build_alias_index(table.read().select("vuln_id", "aliases"), idx2)
    a = {(r["alias"], r["id"]) for r in spark.read.parquet(idx).collect()}
    b = {(r["alias"], r["id"]) for r in spark.read.parquet(idx2).collect()}
    assert a == b

    # end-to-end probe: alias -> full record via bucket-pruned lookup
    got = resolve_aliases(table, idx, ["OSV-0003"]).collect()
    assert [(r["vuln_id"], r["severity"]) for r in got] == [
        ("VULN-0003", "HIGH")
    ]


def test_cli_sync_alias_and_lookup(spark, tmp_path, capsys, monkeypatch):
    import json

    from vuln_datasync_spark import cli

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    tbl, idx = str(tmp_path / "t"), str(tmp_path / "idx")
    table = ManifestTable.create(spark, tbl, n_buckets=4, key_cols=("vuln_id",))
    _merge(spark, table, [_rec(i, i) for i in range(10)], 0)

    assert cli.main(["sync-alias", "--table", tbl, "--index", idx]) == 0
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec.get("bootstrap") is True
    assert cli.main(["sync-alias", "--table", tbl, "--index", idx]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {"status": "current"}

    assert cli.main(["lookup", "--table", tbl, "--alias", "--index", idx,
                     "GHSA-0004"]) == 0
    rows = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert [r["vuln_id"] for r in rows] == ["VULN-0004"]

    assert cli.main(["lookup", "--table", tbl, "VULN-0002"]) == 0
    rows = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert [r["vuln_id"] for r in rows] == ["VULN-0002"]
