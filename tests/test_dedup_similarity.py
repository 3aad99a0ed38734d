"""Dedup + similarity operators: semantic correctness beyond SQL parity."""

import numpy as np
from pyspark.sql import functions as F

from vuln_datasync_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from vuln_datasync_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    embedding_neardup_pairs,
    ivf_topk,
)

SF = "/root/testdata/sf0.001"


def test_exact_dedup_keeps_one_per_hash(spark):
    base = spark.createDataFrame(
        [(1, "aaa"), (2, "aaa"), (3, "bbb"), (4, "aaa")], ["id", "txt"]
    )
    out = exact_dedup(base, "txt", "id").collect()
    assert {(r["id"], r["txt"]) for r in out} == {(1, "aaa"), (3, "bbb")}


def test_minhash_finds_planted_neardup(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    # plant a near-duplicate of doc 0 with a tiny suffix edit
    d0 = docs.filter(F.col("doc_id") == 0).select("text").head()["text"]
    planted = spark.createDataFrame(
        [(100000, d0 + " extra tail")], ["doc_id", "text"]
    )
    all_docs = docs.select("doc_id", "text").unionByName(planted)
    pairs = minhash_lsh_candidates(all_docs, "text", "doc_id").collect()
    found = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs}
    assert (0, 100000) in found
    assert found[(0, 100000)] >= 0.5


def test_jaccard_exactness(spark):
    a = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame([(1, a), (2, a), (3, "zzz qqq www")], ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in pairs] == [(1, 2, 1.0)]


def test_simhash_identical_and_different(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, a), (2, a), (3, "completely unrelated words entirely disjoint")],
        ["doc_id", "text"],
    )
    pairs = simhash_pairs(df, "text", "doc_id", max_hamming=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    assert pairs[0]["hamming"] == 0


def _brute_topk_ids(spark, k=10):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [float(x) for x in e.filter(F.col("vec_id") == 0).head()["embedding"]]
    return e, q, [r["vec_id"] for r in cosine_topk(e, "embedding", "vec_id", q, k).collect()]


def test_ann_lsh_recall(spark):
    e, q, brute = _brute_topk_ids(spark, k=10)
    ann = [
        r["vec_id"]
        for r in ann_lsh_topk(e, "embedding", "vec_id", q, k=10).collect()
    ]
    # the query vector itself must always be found; recall@10 >= 0.3 for
    # 16-plane/4-band LSH on random gaussian data (sanity bound, not SLO)
    assert ann[0] == brute[0] == 0
    assert len(set(ann) & set(brute)) >= 3


def test_ivf_topk_probes_cells(spark):
    e, q, brute = _brute_topk_ids(spark, k=5)
    cents = [
        [float(x) for x in r["embedding"]]
        for r in e.filter(F.col("vec_id") < 8).collect()
    ]
    got = ivf_topk(e, "embedding", "vec_id", cents, q, k=5, n_probe=4)
    ids = [r["vec_id"] for r in got.collect()]
    assert ids[0] == 0  # exact hit lives in the probed cell
    assert len(ids) == 5


def test_embedding_neardup_planted(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet").limit(100)
    v0 = e.filter(F.col("vec_id") == 0).head()["embedding"]
    noisy = [float(x) + 0.001 for x in v0]
    planted = spark.createDataFrame([(999000, noisy, 0)], e.schema)
    pairs = embedding_neardup_pairs(
        e.unionByName(planted), "embedding", "vec_id", dim=64, threshold=0.95
    ).collect()
    assert any(r["id_a"] == 0 and r["id_b"] == 999000 for r in pairs)
