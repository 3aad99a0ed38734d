"""Incremental minhash dedup index: probe-vs-batch-operator equivalence,
partition pruning economics (untouched files byte-identical on upsert),
idempotent replays."""

import glob
import os

from pyspark.sql import functions as F

from vuln_datasync_spark.operators.dedup import minhash_lsh_candidates
from vuln_datasync_spark.operators.dedup_index import (
    build_minhash_index,
    dedup_against_index,
    upsert_minhash_index,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("doc_id") < 200
    )


def test_index_probe_matches_batch_operator(spark, tmp_path):
    """build(evens) + probe(odds) must report exactly the cross-parity
    subset of what the one-shot batch operator reports on the union."""
    d = _docs(spark)
    evens = d.filter(F.col("doc_id") % 2 == 0)
    odds = d.filter(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "mh_idx")
    build_minhash_index(evens, "text", "doc_id", idx)

    got = {
        (r["new_id"], r["dup_id"], r["est_jaccard"])
        for r in dedup_against_index(odds, "text", "doc_id", idx).collect()
    }

    batch = minhash_lsh_candidates(d, "text", "doc_id").collect()
    want = set()
    for r in batch:
        a, b = r["id_a"], r["id_b"]
        if a % 2 != b % 2:  # cross-parity only; orient odd -> even
            new, dup = (a, b) if a % 2 == 1 else (b, a)
            want.add((new, dup, r["est_jaccard"]))
    assert got == want
    assert got, "fixture should contain at least one cross-side near-dup"


def test_probe_self_pairs_excluded(spark, tmp_path):
    """Re-probing an already-indexed batch never matches a doc to itself
    (replay safety), but still reports true near-dup neighbours."""
    d = _docs(spark)
    idx = str(tmp_path / "mh_idx")
    build_minhash_index(d, "text", "doc_id", idx)
    pairs = dedup_against_index(d, "text", "doc_id", idx).collect()
    assert pairs, "full self-probe should surface the corpus near-dups"
    assert all(r["new_id"] != r["dup_id"] for r in pairs)


def test_upsert_touches_only_own_partitions_and_is_idempotent(
    spark, tmp_path
):
    d = _docs(spark)
    first = d.filter(F.col("doc_id") < 100)
    rest = d.filter(F.col("doc_id") >= 100)
    idx = str(tmp_path / "mh_idx")
    full_idx = str(tmp_path / "mh_full")
    build_minhash_index(first, "text", "doc_id", idx)
    build_minhash_index(d, "text", "doc_id", full_idx)

    def _snapshot(path):
        out = {}
        for f in glob.glob(f"{path}/band=*/pfx=*/*.parquet"):
            with open(f, "rb") as fh:
                out[os.path.relpath(f, path)] = fh.read()
        return out

    before = _snapshot(idx)
    res = upsert_minhash_index(rest, "text", "doc_id", idx)
    assert 0 < res["touched_partitions"] <= 4 * 256
    after = _snapshot(idx)

    touched_dirs = {
        os.path.dirname(rel)
        for rel in set(before) | set(after)
        if before.get(rel) != after.get(rel)
    }
    untouched = {os.path.dirname(rel) for rel in after} - touched_dirs
    for rel in before:
        if os.path.dirname(rel) in untouched:
            assert after[rel] == before[rel]

    # upserted index == full rebuild (same (id, band, bucket) set)
    key = lambda df: {  # noqa: E731
        (r["id"], r["band"], r["bucket"]) for r in df.collect()
    }
    got = key(spark.read.parquet(idx).select("id", "band", "bucket"))
    want = key(
        spark.read.parquet(full_idx).select("id", "band", "bucket")
    )
    assert got == want

    # replaying the same batch changes nothing (ids replaced in place)
    upsert_minhash_index(rest, "text", "doc_id", idx)
    assert (
        key(spark.read.parquet(idx).select("id", "band", "bucket")) == want
    )
    n_rows = spark.read.parquet(idx).count()
    assert n_rows == spark.read.parquet(full_idx).count()


def test_probe_empty_batch(spark, tmp_path):
    d = _docs(spark)
    idx = str(tmp_path / "mh_idx")
    build_minhash_index(d, "text", "doc_id", idx)
    empty = d.limit(0)
    out = dedup_against_index(empty, "text", "doc_id", idx)
    assert out.count() == 0
    assert out.columns == ["new_id", "dup_id", "est_jaccard"]
    assert upsert_minhash_index(empty, "text", "doc_id", idx) == {
        "touched_partitions": 0
    }


def test_delete_from_index_removes_matches_and_spares_other_cells(
    spark, tmp_path
):
    from vuln_datasync_spark.operators.dedup_index import (
        delete_from_minhash_index,
    )

    d = _docs(spark)
    idx = str(tmp_path / "idx")
    build_minhash_index(d, "text", "doc_id", idx)

    # a near-dup probe of doc 0 finds it before the takedown
    probe = spark.createDataFrame(
        [(999000, d.filter(F.col("doc_id") == 0).head()["text"] + " tail")],
        ["doc_id", "text"],
    )
    before = {
        r["dup_id"]
        for r in dedup_against_index(probe, "text", "doc_id", idx).collect()
    }
    assert 0 in before

    # snapshot files of cells doc 0 does NOT hash into
    victim = d.filter(F.col("doc_id") == 0)
    all_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{idx}/band=*/pfx=*/*.parquet")
    }
    rec = delete_from_minhash_index(victim, "text", "doc_id", idx)
    assert rec["deleted_ids"] == 1 and rec["touched_partitions"] >= 1

    # doc 0 gone from the index: the probe no longer reports it, and no
    # row with its id survives anywhere
    after = {
        r["dup_id"]
        for r in dedup_against_index(probe, "text", "doc_id", idx).collect()
    }
    assert 0 not in after
    assert (
        spark.read.parquet(idx).filter(F.col("id") == 0).count() == 0
    )
    # untouched cells' files byte-identical (same path, same mtime)
    untouched_survivors = [
        f for f, m in all_files.items()
        if os.path.exists(f) and os.path.getmtime(f) == m
    ]
    assert untouched_survivors, "delete rewrote every partition"

    # idempotent: deleting again touches its cells but removes nothing
    rec2 = delete_from_minhash_index(victim, "text", "doc_id", idx)
    assert rec2["deleted_ids"] == 1  # victims counted, already absent
    assert spark.read.parquet(idx).filter(F.col("id") == 0).count() == 0
