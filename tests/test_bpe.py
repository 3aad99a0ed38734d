"""BPE tokenizer induction: the distributed learner must match an
independent pure-Python reference merge-for-merge (same tie-break total
order), be invariant to input partitioning, and encode map-only."""

from collections import Counter

from pyspark.sql import functions as F

from vuln_datasync_spark.operators.bpe import (
    EOW,
    apply_bpe,
    bpe_encode_word,
    learn_bpe,
    merges_table,
)

CORPUS = [
    "the cat sat on the mat",
    "the cats sat",
    "a hat on a mat",
    "the hat the cat",
    "mats and hats and cats",
]


def reference_learn(texts, n_merges, min_freq=2):
    """Independent in-memory BPE learner (dict-based, no Spark code
    shared with the implementation under test)."""
    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                vocab[w] += 1
    words = {w: (list(w) + [EOW], n) for w, n in vocab.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, n in words.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        # same total order: count desc, then (left, right) asc
        (l, r), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_freq:
            break
        merges.append((l, r))
        for w, (syms, n) in words.items():
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = (out, n)
    return merges


def test_learn_bpe_matches_reference_and_parallelism_invariant(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    want = reference_learn(CORPUS, 12)
    assert len(want) == 12  # corpus is rich enough to supply 12 merges
    got = learn_bpe(df, "text", n_merges=12)
    assert got == want
    got13 = learn_bpe(df.repartition(13), "text", n_merges=12)
    assert got13 == want
    mt = merges_table(spark, got).collect()
    assert [(r["left"], r["right"]) for r in sorted(mt, key=lambda r: r["rank"])] == want


def test_apply_bpe_encodes_and_roundtrips(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                               "doc_id int, text string")
    merges = learn_bpe(df, "text", n_merges=10)
    ranks = {m: i for i, m in enumerate(merges)}
    out = {r["doc_id"]: list(r["tokens"])
           for r in apply_bpe(df, "text", merges).collect()}
    for i, t in enumerate(CORPUS):
        want = []
        for w in t.lower().split():
            want.extend(bpe_encode_word(w, ranks))
        assert out[i] == want
        # tokens reconstruct the text: concat and strip sentinels
        assert "".join(out[i]).replace(EOW, " ").strip() == t
    # no merges -> pure character tokens (+ sentinel per word)
    chars = apply_bpe(df, "text", []).head()
    assert all(len(tok) == 1 or tok == EOW for tok in chars["tokens"])


def test_apply_bpe_is_map_only(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    plan = (
        apply_bpe(df, "text", [("t", "h"), ("th", "e")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_learn_bpe_min_freq_early_stop(spark):
    df = spark.createDataFrame([("zq xv",)], "text string")
    # every pair occurs once -> below min_freq=2 -> zero merges
    assert learn_bpe(df, "text", n_merges=5) == []
    # min_freq=1 learns something, still deterministically
    m1 = learn_bpe(df, "text", n_merges=3, min_freq=1)
    assert m1 == learn_bpe(df, "text", n_merges=3, min_freq=1) and len(m1) == 3


def test_cli_learn_bpe(spark, tmp_path, capsys, monkeypatch):
    import json as _json

    from vuln_datasync_spark import cli

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    src = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(t,) for t in CORPUS], "text string"
    ).write.parquet(src)
    out = str(tmp_path / "merges")
    assert cli.main(
        ["learn-bpe", "--input", src, "--merges", "8", "--out", out]
    ) == 0
    rec = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["merges_learned"] == 8
    mt = spark.read.parquet(out).orderBy("rank").collect()
    assert [(r["left"], r["right"]) for r in mt] == reference_learn(CORPUS, 8)


def test_cli_tokenize_with_shipped_merges(spark, tmp_path, capsys, monkeypatch):
    import json as _json

    from vuln_datasync_spark import cli

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    src = str(tmp_path / "corpus2")
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    ).write.parquet(src)
    merges_dir = str(tmp_path / "m2")
    assert cli.main(
        ["learn-bpe", "--input", src, "--merges", "6", "--out", merges_dir]
    ) == 0
    capsys.readouterr()
    out = str(tmp_path / "toks")
    assert cli.main(
        ["tokenize", "--input", src, "--merges", merges_dir, "--out", out]
    ) == 0
    rec = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["rows"] == len(CORPUS)
    got = {r["doc_id"]: list(r["tokens"])
           for r in spark.read.parquet(out).collect()}
    ranks = {m: i for i, m in enumerate(reference_learn(CORPUS, 6))}
    for i, t in enumerate(CORPUS):
        want = []
        for w in t.lower().split():
            want.extend(bpe_encode_word(w, ranks))
        assert got[i] == want
