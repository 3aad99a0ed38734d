"""sync_ann_index: CDC change feed -> incremental ANN index maintenance
(bootstrap build, delta upsert, sidecar-guided delete, cursor no-op)."""

import numpy as np
from pyspark.sql import functions as F

from vuln_datasync_spark.pipelines.index_sync import sync_ann_index
from vuln_datasync_spark.sinks.manifest_table import ManifestTable

DIM = 8
SCHEMA = (
    "vec_id long, commit_seq long, commit string, op string, "
    "embedding array<double>"
)


def _vec(rng):
    return [float(x) for x in rng.standard_normal(DIM)]


def _merge(spark, table, rows, bid):
    table.merge(spark.createDataFrame(rows, SCHEMA), "ix", bid)


def test_sync_ann_index_end_to_end(spark, tmp_path):
    rng = np.random.default_rng(7)
    table = ManifestTable.create(
        spark, str(tmp_path / "vt"), n_buckets=4, key_cols=("vec_id",)
    )
    idx = str(tmp_path / "idx")

    base = {i: _vec(rng) for i in range(20)}
    _merge(
        spark, table,
        [(i, i, f"c{i}", "insert", v) for i, v in base.items()], 0,
    )
    rec = sync_ann_index(table, idx, "embedding", DIM)
    assert rec["bootstrap"] is True
    assert spark.read.parquet(idx).select("id").distinct().count() == 20

    # already current -> None, index untouched
    assert sync_ann_index(table, idx, "embedding", DIM) is None

    # delta: update vec 0, delete vec 1, insert vec 20
    v0_new, v20 = _vec(rng), _vec(rng)
    _merge(
        spark, table,
        [
            (0, 100, "c100", "update", v0_new),
            (1, 101, "c101", "delete", None),
            (20, 102, "c102", "insert", v20),
        ],
        1,
    )
    rec2 = sync_ann_index(table, idx, "embedding", DIM)
    assert rec2["deleted_ids"] == 1 and rec2["touched_partitions"] > 0

    after = spark.read.parquet(idx)
    ids = {r["id"] for r in after.select("id").distinct().collect()}
    assert 1 not in ids and 20 in ids and len(ids) == 20
    # updated vector replaced everywhere (no stale copy of the old v0)
    v0_rows = after.filter(F.col("id") == 0).select("vec").collect()
    assert v0_rows and all(
        [round(x, 6) for x in r["vec"]] == [round(x, 6) for x in v0_new]
        for r in v0_rows
    )
    # sidecar no longer tracks the deleted id
    side = spark.read.parquet(f"{idx}/_ids")
    assert side.filter(F.col("id") == 1).count() == 0
    assert side.filter(F.col("id") == 20).count() == 1

    # index results match a fresh full rebuild on the live table
    from vuln_datasync_spark.operators.similarity import (
        ann_index_topk,
        build_ann_index,
    )

    q = v20
    got = [
        (r["id"], r["cosine"])
        for r in ann_index_topk(spark, idx, q, k=5).collect()
    ]
    rebuilt = str(tmp_path / "idx_full")
    build_ann_index(table.read(), "embedding", "vec_id", DIM, rebuilt)
    want = [
        (r["id"], r["cosine"])
        for r in ann_index_topk(spark, rebuilt, q, k=5).collect()
    ]
    assert got == want


def test_sync_ann_index_requires_single_key(spark, tmp_path):
    import pytest

    table = ManifestTable.create(
        spark, str(tmp_path / "t2"), n_buckets=2, key_cols=("a", "b")
    )
    with pytest.raises(ValueError, match="single-key"):
        sync_ann_index(table, str(tmp_path / "i"), "embedding", DIM)


def test_cli_sync_index(spark, tmp_path, capsys, monkeypatch):
    import json

    from vuln_datasync_spark import cli

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    rng = np.random.default_rng(11)
    tbl = str(tmp_path / "vt")
    table = ManifestTable.create(spark, tbl, n_buckets=4, key_cols=("vec_id",))
    _merge(
        spark, table,
        [(i, i, f"c{i}", "insert", _vec(rng)) for i in range(10)], 0,
    )
    idx = str(tmp_path / "idx")
    argv = ["sync-index", "--table", tbl, "--index", idx, "--dim", str(DIM)]
    assert cli.main(argv) == 0
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec.get("bootstrap") is True
    assert cli.main(argv) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {"status": "current"}


def test_sync_minhash_index_content_update_and_takedown(spark, tmp_path):
    from vuln_datasync_spark.operators.dedup_index import (
        build_minhash_index,
        dedup_against_index,
    )
    from vuln_datasync_spark.pipelines.index_sync import sync_minhash_index

    D_SCHEMA = (
        "doc_id long, commit_seq long, commit string, op string, text string"
    )
    base_text = "the quick brown fox jumps over the lazy dog again and again"
    other = "entirely different material with no shingle overlap at all here"
    table = ManifestTable.create(
        spark, str(tmp_path / "dt"), n_buckets=4, key_cols=("doc_id",)
    )
    idx = str(tmp_path / "didx")

    table.merge(
        spark.createDataFrame(
            [
                (1, 1, "c1", "insert", base_text),
                (2, 2, "c2", "insert", other),
            ],
            D_SCHEMA,
        ),
        "mi", 0,
    )
    rec = sync_minhash_index(table, idx, "text")
    assert rec["bootstrap"] is True

    probe = spark.createDataFrame(
        [(999, base_text + " tail")], ["doc_id", "text"]
    )

    def hits():
        return {
            r["dup_id"]
            for r in dedup_against_index(probe, "text", "doc_id", idx).collect()
        }

    assert hits() == {1}

    # content-changing update: doc 1's text becomes unrelated — the old
    # cells must be cleared (preimage path), so the probe stops matching
    table.merge(
        spark.createDataFrame(
            [(1, 10, "c10", "update", "totally new unrelated content now")],
            D_SCHEMA,
        ),
        "mi", 1,
    )
    rec2 = sync_minhash_index(table, idx, "text")
    assert rec2["removed"]["deleted_ids"] == 1
    assert hits() == set()

    # takedown: delete doc 2 entirely
    table.merge(
        spark.createDataFrame(
            [(2, 11, "c11", "delete", None)], D_SCHEMA
        ),
        "mi", 2,
    )
    rec3 = sync_minhash_index(table, idx, "text")
    assert rec3["removed"]["deleted_ids"] == 1
    assert spark.read.parquet(idx).filter(F.col("id") == 2).count() == 0

    # index now equals a fresh build over the live table
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

    # current -> None
    assert sync_minhash_index(table, idx, "text") is None


def test_sync_token_index_update_delete_equals_rebuild(spark, tmp_path):
    from vuln_datasync_spark.operators.token_index import (
        build_token_index,
        search_token_index,
    )
    from vuln_datasync_spark.pipelines.index_sync import sync_token_index

    D_SCHEMA = (
        "doc_id long, commit_seq long, commit string, op string, text string"
    )
    table = ManifestTable.create(
        spark, str(tmp_path / "tt"), n_buckets=4, key_cols=("doc_id",)
    )
    idx = str(tmp_path / "tidx")

    table.merge(
        spark.createDataFrame(
            [
                (1, 1, "c1", "insert", "alpha beta gamma"),
                (2, 2, "c2", "insert", "beta delta"),
                (3, 3, "c3", "insert", "epsilon zeta"),
            ],
            D_SCHEMA,
        ),
        "ti", 0,
    )
    rec = sync_token_index(table, idx, "text")
    assert rec["bootstrap"] is True

    def found(phrase):
        return sorted(
            r["id"] for r in search_token_index(spark, idx, phrase).collect()
        )

    assert found("beta") == [1, 2]

    # content-changing update: doc 1 loses 'beta' — preimage clears it
    table.merge(
        spark.createDataFrame(
            [(1, 10, "c10", "update", "omega psi")], D_SCHEMA
        ),
        "ti", 1,
    )
    rec2 = sync_token_index(table, idx, "text")
    assert rec2["partitions_rewritten"] >= 1
    assert found("beta") == [2]
    assert found("omega") == [1]

    # takedown delete
    table.merge(
        spark.createDataFrame([(2, 11, "c11", "delete", None)], D_SCHEMA),
        "ti", 2,
    )
    sync_token_index(table, idx, "text")
    assert found("beta") == []

    # equals a fresh rebuild of the live table
    fresh = str(tmp_path / "tfresh")
    build_token_index(table.read(), "text", "doc_id", fresh)

    def rows(path):
        return sorted(
            tuple(r)
            for r in spark.read.parquet(path)
            .select("term", "id", "tf", "pfx")
            .collect()
        )

    assert rows(idx) == rows(fresh)
    assert sync_token_index(table, idx, "text") is None


def test_cli_sync_token(spark, tmp_path, capsys, monkeypatch):
    import json

    from vuln_datasync_spark import cli

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    tbl = str(tmp_path / "dt")
    table = ManifestTable.create(spark, tbl, n_buckets=4, key_cols=("doc_id",))
    table.merge(
        spark.createDataFrame(
            [(1, 1, "c1", "insert", "alpha beta")],
            "doc_id long, commit_seq long, commit string, op string, "
            "text string",
        ),
        "ct", 0,
    )
    idx = str(tmp_path / "idx")
    argv = [
        "sync-token", "--table", tbl, "--index", idx, "--text-col", "text",
    ]
    assert cli.main(argv) == 0
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec.get("bootstrap") is True
    assert cli.main(argv) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {"status": "current"}


def test_sync_reseed_missing_index_covers_full_table(spark, tmp_path):
    """Cursor exists but the index dir was wiped between syncs: the
    re-seed must rebuild from the FULL live table at the target snapshot,
    not from the delta alone — otherwise every doc outside the delta is
    silently unsearchable while the cursor still advances."""
    import shutil

    from vuln_datasync_spark.operators.token_index import (
        search_token_index,
    )
    from vuln_datasync_spark.pipelines.index_sync import sync_token_index

    D_SCHEMA = (
        "doc_id long, commit_seq long, commit string, op string, text string"
    )
    table = ManifestTable.create(
        spark, str(tmp_path / "rt"), n_buckets=4, key_cols=("doc_id",)
    )
    idx = str(tmp_path / "ridx")
    table.merge(
        spark.createDataFrame(
            [
                (1, 1, "c1", "insert", "alpha beta"),
                (2, 2, "c2", "insert", "gamma delta"),
            ],
            D_SCHEMA,
        ),
        "rs", 0,
    )
    assert sync_token_index(table, idx, "text")["bootstrap"] is True

    # wipe the index, then advance the table with a delta touching doc 3
    shutil.rmtree(idx)
    table.merge(
        spark.createDataFrame(
            [(3, 3, "c3", "insert", "epsilon zeta")], D_SCHEMA
        ),
        "rs", 1,
    )
    rec = sync_token_index(table, idx, "text")
    assert rec["bootstrap"] is True

    def found(term):
        return sorted(
            r["id"] for r in search_token_index(spark, idx, term).collect()
        )

    # docs OUTSIDE the delta are searchable again after the re-seed
    assert found("alpha") == [1]
    assert found("gamma") == [2]
    assert found("epsilon") == [3]
    # and the cursor is truthfully current
    assert sync_token_index(table, idx, "text") is None
