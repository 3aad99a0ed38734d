"""Inverted token index: retrieval truth, pruned probes, incremental
upsert idempotence."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from vuln_datasync_spark.operators.token_index import (
    build_token_index,
    load_postings,
    search_token_index,
    upsert_token_index,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "A Hash Join beats a nested loop, usually."),
    (3, "hash partitioning; join ordering; hash join wins"),
    (4, "joinhash is one token so this must NOT match"),
    (5, "hash ... join but not adjacent: hash X join"),
    (6, ""),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_search_and_of_terms_and_exact_recheck(spark, tmp_path):
    idx = str(tmp_path / "tok")
    d = _docs(spark)
    build_token_index(d, "text", "doc_id", idx)

    # AND-of-terms only: docs whose token sets contain both terms
    cand = sorted(
        r["id"]
        for r in search_token_index(spark, idx, "hash join").collect()
    )
    assert cand == [2, 3, 5]  # 4's "joinhash" is ONE token, correctly out

    # exact-substring recheck drops the non-adjacent doc 5, keeps the
    # punctuation/case variants (lowercased contains)
    hits = sorted(
        r["id"]
        for r in search_token_index(
            spark, idx, "hash join", docs=d, text_col="text", id_col="doc_id"
        ).collect()
    )
    assert hits == [2, 3]

    with pytest.raises(ValueError):
        search_token_index(spark, idx, "!!! ...")
    with pytest.raises(ValueError):
        search_token_index(spark, idx, "hash", docs=d)


def test_probe_reads_only_hashed_partitions(spark, tmp_path):
    idx = str(tmp_path / "tok")
    build_token_index(_docs(spark), "text", "doc_id", idx)
    post = load_postings(spark, idx, ["hash", "join"])
    plan = post._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "pfx" in plan, plan
    # the two terms hash into (at most) two pfx dirs; the scan's file
    # listing must exclude every other partition directory
    want = {
        "x" + hashlib.md5(t.encode()).hexdigest()[:2] for t in ["hash", "join"]
    }
    all_pfx = {p for p in os.listdir(idx) if p.startswith("pfx=")}
    assert len(all_pfx) > len(want)  # the guard below is non-vacuous
    for p in all_pfx:
        val = p.split("=", 1)[1]
        if val not in want:
            assert f"pfx={val}" not in plan


def test_upsert_equals_rebuild_and_is_idempotent(spark, tmp_path):
    d = _docs(spark)
    half = d.filter(F.col("doc_id") <= 3)
    rest = d.filter(F.col("doc_id") > 3)

    inc = str(tmp_path / "inc")
    build_token_index(half, "text", "doc_id", inc)
    n1 = upsert_token_index(spark, inc, rest, "text", "doc_id")
    assert n1 >= 1

    full = str(tmp_path / "full")
    build_token_index(d, "text", "doc_id", full)

    def snap(path):
        return sorted(
            tuple(r)
            for r in spark.read.parquet(path)
            .select("term", "id", "tf", "pfx")
            .collect()
        )

    assert snap(inc) == snap(full)

    # replaying the same batch must change nothing (id rows replaced)
    upsert_token_index(spark, inc, rest, "text", "doc_id")
    assert snap(inc) == snap(full)

    # a content CHANGE with the preimage supplied clears the id's stale
    # postings (the old text's partitions join the touched set)
    changed = spark.createDataFrame(
        [(5, "completely fresh words")], ["doc_id", "text"]
    )
    upsert_token_index(
        spark,
        inc,
        changed,
        "text",
        "doc_id",
        old_docs=d.filter(F.col("doc_id") == 5),
    )
    got = {
        (r["term"], r["id"])
        for r in spark.read.parquet(inc)
        .filter(F.col("id") == 5)
        .collect()
    }
    assert got == {("completely", 5), ("fresh", 5), ("words", 5)}
    # and equals a fresh rebuild of the changed corpus
    full2 = str(tmp_path / "full2")
    build_token_index(
        d.filter(F.col("doc_id") != 5).unionByName(changed),
        "text",
        "doc_id",
        full2,
    )
    assert snap(inc) == snap(full2)


def test_verbatim_probe_relaxes_run_embedded_edge_tokens(spark, tmp_path):
    """>=3-token verbatim probes are EXACT substring search: phrase-edge
    tokens may be embedded in longer alnum runs in the text ('rehash
    joins them' contains 'ash joins the'), so candidates require only
    the interior tokens and the substring recheck restores precision."""
    docs = spark.createDataFrame(
        [
            (1, "rehash joins them quickly"),   # edges run-embedded
            (2, "ash joins the party"),          # plain occurrence
            (3, "ash and joins and the"),        # tokens yes, phrase no
            (4, "nothing relevant here"),
        ],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "tok")
    build_token_index(docs, "text", "doc_id", idx)

    hits = sorted(
        r["id"]
        for r in search_token_index(
            spark, idx, "ash joins the",
            docs=docs, text_col="text", id_col="doc_id",
        ).collect()
    )
    # doc 1 would be MISSED under all-token AND (no 'ash'/'the' tokens);
    # doc 3 has every token but not the verbatim phrase
    assert hits == [1, 2]

    # index-only retrieval keeps token-containment semantics
    cand = sorted(
        r["id"]
        for r in search_token_index(spark, idx, "ash joins the").collect()
    )
    assert cand == [2, 3]
