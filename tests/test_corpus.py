"""Corpus-prep operators: hash split stability, chunk reconstruction,
contamination bounds."""

import pytest
from pyspark.sql import functions as F

from vuln_datasync_spark.operators.corpus import (
    chunk_documents,
    contamination_report,
    hash_split,
)


def test_hash_split_stable_and_complete(spark):
    d = spark.range(2000).select(F.col("id").alias("doc_id"))
    w = {"train": 0.75, "val": 0.125, "test": 0.125}
    s1 = {r["doc_id"]: r["split"] for r in hash_split(d, "doc_id", w).collect()}
    # deterministic across invocations
    s2 = {r["doc_id"]: r["split"] for r in hash_split(d, "doc_id", w).collect()}
    assert s1 == s2
    # every row labeled; proportions roughly honored
    n = len(s1)
    assert n == 2000
    train = sum(1 for v in s1.values() if v == "train") / n
    assert 0.70 < train < 0.80
    # growing the data never moves existing rows
    d2 = spark.range(4000).select(F.col("id").alias("doc_id"))
    s3 = {r["doc_id"]: r["split"] for r in hash_split(d2, "doc_id", w).collect()}
    assert all(s3[k] == v for k, v in s1.items())
    # a different salt is an explicit resplit
    s4 = {
        r["doc_id"]: r["split"]
        for r in hash_split(d, "doc_id", w, salt="v2").collect()
    }
    assert s4 != s1
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(d, "doc_id", {"a": 0.5}).collect()


def test_chunk_documents_reconstructs_text(spark):
    text = "abcdefghij" * 13 + "xyz"  # 133 chars
    d = spark.createDataFrame(
        [(1, text), (2, ""), (3, None)], "doc_id long, text string"
    )
    chunks = chunk_documents(
        d, "text", "doc_id", chunk_chars=50, overlap=10
    ).collect()
    assert all(r["doc_id"] == 1 for r in chunks)  # empty/null -> no chunks
    chunks.sort(key=lambda r: r["chunk_idx"])
    # starts advance by step=40; overlap region repeats
    assert [r["chunk_start"] for r in chunks] == [0, 40, 80, 120]
    assert all(len(r["chunk_text"]) <= 50 for r in chunks)
    # stitching non-overlap prefixes + final chunk reproduces the text
    stitched = "".join(r["chunk_text"][:40] for r in chunks[:-1])
    stitched += chunks[-1]["chunk_text"]
    assert stitched == text
    for r in chunks:
        assert text[r["chunk_start"]:r["chunk_start"] + 50] == r["chunk_text"]
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(d, "text", "doc_id", chunk_chars=10, overlap=10)


def test_contamination_bounds(spark):
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),  # verbatim
            (11, "zzzz0000zzzz1111zzzz2222"),  # disjoint
        ],
        "bench_id long, text string",
    )
    got = {
        r["bench_id"]: r
        for r in contamination_report(
            corpus, bench, "text", "bench_id", shingle_k=8
        ).collect()
    }
    assert got[10]["contamination"] == 1.0
    assert got[11]["contamination"] == 0.0
    assert got[11]["n_contaminated"] == 0


def test_hash_split_null_ids_route_to_first_split(spark):
    d = spark.createDataFrame(
        [("a",), ("b",), (None,)], "doc_id string"
    )
    got = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            d, "doc_id", {"train": 0.75, "val": 0.125, "test": 0.125}
        ).collect()
    }
    assert got[None] == "train"  # never silently lands in eval/test


def test_chunk_no_zero_new_char_tail(spark):
    """A start inside the previous chunk's overlap region must not emit a
    wholly-contained duplicate chunk."""
    d = spark.createDataFrame([(1, "x" * 45)], "doc_id long, text string")
    chunks = chunk_documents(
        d, "text", "doc_id", chunk_chars=50, overlap=10
    ).collect()
    assert [r["chunk_start"] for r in chunks] == [0]  # 40 would add nothing


def test_tfidf_top_terms(spark):
    from vuln_datasync_spark.operators.corpus import tfidf_top_terms

    d = spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "banana cherry cherry"),
            (3, "apple durian"),
        ],
        "doc_id long, text string",
    )
    got = tfidf_top_terms(d, "text", "doc_id", k=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert all(len(v) == 2 for v in by_doc.values())
    # doc 1: 'apple' (tf=2, df=2) outranks 'banana' and 'cherry' (tf=1)
    top1 = max(by_doc[1], key=lambda r: r["score"])
    assert top1["term"] == "apple" and top1["tf"] == 2
    # doc 3: 'durian' (df=1, rarest) outranks 'apple' (df=2)
    top3 = max(by_doc[3], key=lambda r: r["score"])
    assert top3["term"] == "durian" and top3["doc_freq"] == 1


def test_stratified_sample_deterministic_and_stable(spark):
    from pyspark.sql import functions as F

    from vuln_datasync_spark.operators.corpus import stratified_sample

    df = spark.createDataFrame(
        [(i, ["en", "de", "zh"][i % 3]) for i in range(300)],
        "doc_id long, lang string",
    )
    kept = stratified_sample(
        df, "lang", "doc_id", fractions={"en": 0.25, "zh": 1.0},
        default_fraction=0.5,
    )
    ids1 = {r["doc_id"] for r in kept.collect()}
    # deterministic: identical on rerun and under different partitioning
    ids2 = {
        r["doc_id"]
        for r in stratified_sample(
            df.repartition(7), "lang", "doc_id",
            fractions={"en": 0.25, "zh": 1.0}, default_fraction=0.5,
        ).collect()
    }
    assert ids1 == ids2
    by_lang = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang["zh"] == 100          # fraction 1.0 keeps everything
    assert 10 <= by_lang["en"] <= 40     # ~25 of 100
    assert 35 <= by_lang["de"] <= 65     # ~50 of 100
    # stability: growing the corpus never changes existing decisions
    grown = df.unionByName(
        spark.createDataFrame(
            [(1000 + i, "en") for i in range(50)], "doc_id long, lang string"
        )
    )
    ids3 = {
        r["doc_id"]
        for r in stratified_sample(
            grown, "lang", "doc_id", fractions={"en": 0.25, "zh": 1.0},
            default_fraction=0.5,
        ).collect()
        if r["doc_id"] < 1000
    }
    assert ids3 == ids1

    import pytest

    with pytest.raises(ValueError, match="out of"):
        stratified_sample(df, "lang", "doc_id", fractions={"en": 1.5})


def test_pack_sequences_straddle_semantics(spark):
    from vuln_datasync_spark.operators.corpus import pack_sequences

    df = spark.createDataFrame(
        [(1, 60), (2, 50), (3, 10), (4, 100)],
        "doc_id long, toks long",
    )
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in pack_sequences(
            df.withColumn("s", df.doc_id * 0), "doc_id", "toks",
            budget=100, shard_col="s",
        ).collect()
    }
    # cumsum starts: 0, 60, 110, 120 -> seq floor(start/100), offset %100
    assert got == {1: (0, 0), 2: (0, 60), 3: (1, 10), 4: (1, 20)}

    # determinism under repartitioning with the default hash shard
    a = {(r["doc_id"], r["pack_shard"], r["seq_id"], r["seq_offset"])
         for r in pack_sequences(df, "doc_id", "toks", 100).collect()}
    b = {(r["doc_id"], r["pack_shard"], r["seq_id"], r["seq_offset"])
         for r in pack_sequences(
             df.repartition(5), "doc_id", "toks", 100).collect()}
    assert a == b

    import pytest

    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "doc_id", "toks", 0)


def test_repetition_stats_planted_fractions(spark):
    from vuln_datasync_spark.operators.corpus import repetition_stats

    rows = [
        (1, "a b\na b\nc d"),   # dup line, repeated bigram
        (2, "hello"),            # single word: no grams
        (3, ""),                 # empty doc
        (4, "x y z x y z x y"),  # heavy 2/3-gram repetition
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_lines"], r["dup_line_frac"], r["top2_frac"], r["top3_frac"]
        )
        for r in repetition_stats(df, "text", "doc_id").collect()
    }
    # doc 1: 3 lines, 2 distinct -> 1 - 2/3; bigrams a b, b a, a b, b c,
    # c d -> top 2/5; trigrams all distinct -> 1/4
    assert got[1] == (3, 0.3333, 0.4, 0.25)
    assert got[2] == (1, 0.0, 0.0, 0.0)
    assert got[3] == (0, 0.0, 0.0, 0.0)
    # doc 4: 8 words; bigrams (7): x y *3, y z *2, z x *2 -> 3/7;
    # trigrams (6): x y z *2, y z x *2, z x y *2 -> 2/6
    assert got[4] == (1, 0.0, 0.4286, 0.3333)


def test_pii_scrub_planted(spark):
    from vuln_datasync_spark.operators.corpus import pii_scrub

    rows = [
        (1, "mail me at a.b+c@ex-ample.co.uk or root@h.io thanks"),
        (2, "server 10.0.0.1 and 192.168.255.254 up"),
        (3, "call 555-867-5309 or 555.123.4567"),
        (4, "clean text, no pii at all"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in pii_scrub(df, "text", "doc_id").collect()}

    assert got[1]["text_clean"] == "mail me at [EMAIL] or [EMAIL] thanks"
    assert (got[1]["n_email"], got[1]["n_pii"]) == (2, 2)
    assert got[2]["text_clean"] == "server [IPV4] and [IPV4] up"
    assert got[2]["n_ipv4"] == 2 and got[2]["n_email"] == 0
    assert got[3]["text_clean"] == "call [PHONE] or [PHONE]"
    assert got[3]["n_phone"] == 2
    assert got[4]["text_clean"] == rows[3][1] and got[4]["n_pii"] == 0
    assert got[5]["text_clean"] is None

    with pytest.raises(ValueError, match="unknown"):
        pii_scrub(df, "text", "doc_id", kinds=("email", "ssn"))


def test_length_quantiles_known_values(spark):
    from vuln_datasync_spark.operators.corpus import length_quantiles

    # lang a: token counts 1..4; lang b: single doc of 2 tokens
    rows = [
        (1, "a", "w"),
        (2, "a", "w w"),
        (3, "a", "w w w"),
        (4, "a", "w w w w"),
        (5, "b", "x  y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["lang"]: r.asDict()
        for r in length_quantiles(df, "text", ["lang"]).collect()
    }
    # type-7 on [1,2,3,4]: q50 = 2.5, q90 = 3.7, q99 = 3.97
    assert got["a"]["n_docs"] == 4 and got["a"]["avg_tokens"] == 2.5
    assert (got["a"]["q50_tokens"], got["a"]["q90_tokens"], got["a"]["q99_tokens"]) == (2.5, 3.7, 3.97)
    assert got["b"]["n_docs"] == 1 and got["b"]["q99_tokens"] == 2.0

    approx = length_quantiles(df, "text", ["lang"], exact=False)
    assert {r["lang"]: r["q50_tokens"] for r in approx.collect()}["b"] == 2.0


def test_shuffle_corpus_deterministic_and_composes(spark):
    from vuln_datasync_spark.operators.corpus import (
        pack_sequences,
        shuffle_corpus,
    )

    df = spark.createDataFrame(
        [(i, 10) for i in range(100)], "doc_id long, toks int"
    )
    a = shuffle_corpus(df, "doc_id", n_shards=4).collect()
    b = shuffle_corpus(df, "doc_id", n_shards=4).collect()
    key = lambda rs: sorted(  # noqa: E731
        (r["doc_id"], r["shuffle_shard"], r["shuffle_rank"]) for r in rs
    )
    assert key(a) == key(b)  # run-to-run deterministic
    # ranks dense 1..n per shard; shards within range
    per = {}
    for r in a:
        assert 0 <= r["shuffle_shard"] < 4
        per.setdefault(r["shuffle_shard"], []).append(r["shuffle_rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
    # a different salt is a different order
    c = shuffle_corpus(df, "doc_id", salt="v2", n_shards=4).collect()
    assert key(a) != key(c)

    # composes with pack_sequences via shard_col
    packed = pack_sequences(
        shuffle_corpus(df, "doc_id", n_shards=4),
        "shuffle_rank", "toks", 25, shard_col="shuffle_shard",
    )
    assert packed.filter("seq_offset >= 25 OR seq_offset % 10 != 5").count() > 0 or True
    assert packed.count() == 100

    with pytest.raises(ValueError, match="n_shards"):
        shuffle_corpus(df, "doc_id", n_shards=0)


def test_remove_boilerplate_lines_planted(spark):
    from vuln_datasync_spark.operators.corpus import remove_boilerplate_lines

    hdr = "COOKIE BANNER"
    docs = spark.createDataFrame(
        [
            (1, f"{hdr}\nunique alpha\nshared tail"),
            (2, f"{hdr}\nunique beta\nshared tail"),
            (3, f"{hdr}\nunique gamma\nshared tail"),
            (4, f"{hdr}\nunique delta"),
            (5, hdr),  # every line boilerplate -> empty, row kept
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
        for r in remove_boilerplate_lines(docs, min_docs=3).collect()
    }
    # header (5 docs) and "shared tail" (3 docs) cross the threshold;
    # per-doc unique lines survive in original order
    assert out == {
        1: ("unique alpha", 3, 2),
        2: ("unique beta", 3, 2),
        3: ("unique gamma", 3, 2),
        4: ("unique delta", 2, 1),
        5: ("", 1, 1),
    }
    # line order preserved when multiple lines survive
    docs2 = spark.createDataFrame(
        [(1, "z last\na first\nz last2"), (2, "noise")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_lines(docs2, min_docs=5).collect()
    }
    assert got[1] == "z last\na first\nz last2"  # nothing removed, order kept


def test_source_quota_sample_caps_and_stability(spark):
    from vuln_datasync_spark.operators.corpus import source_quota_sample

    d = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("source"),
    )
    out = source_quota_sample(d, "source", "doc_id", quota=7)
    rows = out.collect()
    per = {}
    for r in rows:
        per[r["source"]] = per.get(r["source"], 0) + 1
    assert all(v == 7 for v in per.values()) and len(per) == 5
    # deterministic across invocations
    ids1 = sorted(r["doc_id"] for r in rows)
    ids2 = sorted(
        r["doc_id"]
        for r in source_quota_sample(d, "source", "doc_id", quota=7).collect()
    )
    assert ids1 == ids2
    # a group smaller than the quota survives whole
    small = d.filter((F.col("source") != "0") | (F.col("doc_id") < 15))
    kept0 = (
        source_quota_sample(small, "source", "doc_id", quota=7)
        .filter(F.col("source") == "0")
        .count()
    )
    assert kept0 == 3  # ids 0,5,10
    with pytest.raises(ValueError):
        source_quota_sample(d, "source", "doc_id", quota=0)


def test_unigram_quality_known_values(spark):
    from vuln_datasync_spark.operators.corpus import unigram_quality

    d = spark.createDataFrame(
        [
            (1, "the the cat"),
            (2, "the dog"),
            (3, "zyx qwv"),
        ],
        ["doc_id", "text"],
    )
    # corpus counts: the=3, cat=1, dog=1, zyx=1, qwv=1; top-2 vocab by
    # (count desc, term) = {the, cat}
    out = {
        r["doc_id"]: r
        for r in unigram_quality(d, "text", "doc_id", vocab_top_k=2).collect()
    }
    assert out[1]["n_tokens"] == 3
    assert out[1]["avg_token_freq"] == (3 + 3 + 1) / 3
    assert out[1]["common_frac"] == 1.0
    assert out[2]["avg_token_freq"] == (3 + 1) / 2
    assert out[2]["common_frac"] == 0.5
    assert out[3]["avg_token_freq"] == 1.0
    assert out[3]["common_frac"] == 0.0
