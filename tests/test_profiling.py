"""Profiling operators: planted skew / planted disorder fixtures with
hand-computed exact expectations, plus the cross-doc duplicate-span
coverage signal."""

import datetime as dt

import pytest

from vuln_datasync_spark.operators.corpus import duplicate_ngram_coverage
from vuln_datasync_spark.operators.profiling import (
    event_lateness_profile,
    key_skew_report,
)


def test_key_skew_report_planted_hot_key(spark):
    rows = [("hot",)] * 10 + [(k,) for k in "abcde" for _ in range(2)]
    df = spark.createDataFrame(rows, "k string")
    r = key_skew_report(df, "k", top_k=10).collect()[0]
    assert r["n_rows"] == 20
    assert r["n_keys"] == 6
    assert r["max_cnt"] == 10
    assert r["mean_cnt"] == round(20 / 6, 4)
    assert r["skew_ratio"] == 3.0  # max/mean = 10 / (20/6)
    assert r["top1_share"] == 0.5
    assert r["topk_share"] == 1.0  # 6 keys <= top_k=10 covers everything

    r1 = key_skew_report(df, "k", top_k=1).collect()[0]
    assert r1["topk_share"] == 0.5

    with pytest.raises(ValueError, match="top_k"):
        key_skew_report(df, "k", top_k=0)


def test_key_skew_uniform_is_ratio_one(spark):
    rows = [(k,) for k in "abcd" for _ in range(5)]
    df = spark.createDataFrame(rows, "k string")
    r = key_skew_report(df, "k", top_k=2).collect()[0]
    assert r["skew_ratio"] == 1.0
    assert r["topk_share"] == 0.5


def test_event_lateness_profile_planted_disorder(spark):
    t0 = dt.datetime(2026, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    # key A: event time dips 5s below the running max at arrival 3;
    # key B: perfectly ordered.
    rows = [
        ("A", 1, ts(10)),
        ("A", 2, ts(20)),
        ("A", 3, ts(15)),
        ("A", 4, ts(30)),
        ("B", 1, ts(5)),
        ("B", 2, ts(5)),
        ("B", 3, ts(6)),
    ]
    df = spark.createDataFrame(rows, "k string, arr long, ts timestamp")
    r = event_lateness_profile(df, "k", "ts", "arr").collect()[0]
    assert r["n_events"] == 7
    assert r["n_late"] == 1
    assert r["late_frac"] == round(1 / 7, 6)
    # lateness values sorted: [0,0,0,0,0,0,5] (seconds); type-7 quantiles
    assert r["q50_late_s"] == 0.0
    assert r["q95_late_s"] == round(0.7 * 5.0, 4)
    assert r["q99_late_s"] == round(0.94 * 5.0, 4)
    assert r["max_late_s"] == 5.0


def test_event_lateness_all_in_order(spark):
    t0 = dt.datetime(2026, 1, 1)
    rows = [
        ("A", i, t0 + dt.timedelta(seconds=i)) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "k string, arr long, ts timestamp")
    r = event_lateness_profile(df, "k", "ts", "arr").collect()[0]
    assert r["n_late"] == 0
    assert r["late_frac"] == 0.0
    assert r["max_late_s"] == 0.0


def test_duplicate_ngram_coverage_cross_doc_only(spark):
    docs = [
        (1, "a b c"),     # grams {a b, b c}; "a b" shared with doc 2
        (2, "a b d"),     # grams {a b, b d}
        (3, "x y"),       # gram {x y}: unique
        (4, "z"),         # too short for 2-grams
        (5, "q r q r"),   # within-doc repeat only: distinct {q r, r q}
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in duplicate_ngram_coverage(
            df, "text", "doc_id", ngram=2
        ).collect()
    }
    assert len(out) == 5  # every doc present, including the short one
    assert (out[1]["n_grams"], out[1]["n_dup_grams"]) == (2, 1)
    assert out[1]["dup_frac"] == 0.5
    assert (out[2]["n_grams"], out[2]["n_dup_grams"]) == (2, 1)
    assert (out[3]["n_grams"], out[3]["n_dup_grams"]) == (1, 0)
    assert out[3]["dup_frac"] == 0.0
    assert (out[4]["n_grams"], out[4]["n_dup_grams"]) == (0, 0)
    assert out[4]["dup_frac"] == 0.0
    # within-doc repetition is NOT cross-doc duplication
    assert (out[5]["n_grams"], out[5]["n_dup_grams"]) == (2, 0)

    with pytest.raises(ValueError, match="ngram"):
        duplicate_ngram_coverage(df, "text", "doc_id", ngram=0)


def test_duplicate_ngram_min_docs_threshold(spark):
    docs = [(i, "same exact text here") for i in range(3)] + [
        (9, "only once written here")
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # gram appears in 3 docs: passes min_docs=3, fails min_docs=4
    out3 = duplicate_ngram_coverage(
        df, "text", "doc_id", ngram=4, min_docs=3
    ).collect()
    assert {r["doc_id"]: r["n_dup_grams"] for r in out3} == {
        0: 1, 1: 1, 2: 1, 9: 0,
    }
    out4 = duplicate_ngram_coverage(
        df, "text", "doc_id", ngram=4, min_docs=4
    ).collect()
    assert all(r["n_dup_grams"] == 0 for r in out4)


def test_profile_columns_exact_and_nulls(spark):
    from vuln_datasync_spark.operators.profiling import profile_columns

    df = spark.createDataFrame(
        [("a", 1), ("b", 1), ("b", None), (None, 2)],
        "s string, v long",
    )
    got = {r["col_name"]: r for r in
           profile_columns(df, ["s", "v"], k=8).collect()}
    s, v = got["s"], got["v"]
    assert (s["n"], s["n_null"], s["min_val"], s["max_val"],
            s["ndv_est"]) == (4, 1, "a", "b", 2)
    assert (v["n"], v["n_null"], v["min_val"], v["max_val"],
            v["ndv_est"]) == (4, 1, "1", "2", 2)


def test_profile_columns_all_null_and_estimate(spark):
    from vuln_datasync_spark.operators.profiling import profile_columns

    import pytest

    df = spark.range(2000).selectExpr(
        "cast(id as string) AS wide", "cast(null as string) AS empty"
    )
    got = {r["col_name"]: r for r in
           profile_columns(df, ["wide", "empty"], k=64).collect()}
    assert got["empty"]["ndv_est"] == 0
    assert got["empty"]["n_null"] == 2000
    assert got["empty"]["min_val"] is None
    # estimate branch: within KMV error bounds of the true 2000
    assert abs(got["wide"]["ndv_est"] - 2000) / 2000 < 0.5
    with pytest.raises(ValueError, match="non-empty"):
        profile_columns(df, [])


def test_cli_profile(spark, tmp_path, capsys, monkeypatch):
    import json

    from vuln_datasync_spark import cli
    from vuln_datasync_spark.sinks.manifest_table import ManifestTable

    from .test_change_feed import _batch

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    tbl = str(tmp_path / "t")
    table = ManifestTable.create(spark, tbl, n_buckets=4)
    _batch(
        spark, table,
        [
            (1, "insert", "r1", "a.py", "c1", "python", "v1", None, 10),
            (2, "insert", "r1", "b.py", "c2", "go", "v2", None, None),
        ],
        0,
    )
    assert cli.main(["profile", "--table", tbl, "--cols",
                     "lang,size_bytes"]) == 0
    rows = {r["col_name"]: r
            for r in json.loads(capsys.readouterr().out.strip())}
    assert rows["lang"]["ndv_est"] == 2 and rows["lang"]["n_null"] == 0
    assert rows["size_bytes"]["n_null"] == 1
    assert rows["size_bytes"]["min_val"] == "10"
