"""mix_domains (deterministic domain-mixture resampling) and
normalize_text (zero-width/control strip + NFC) — planted fixtures with
hand-computed expectations."""

import hashlib

import pytest

from vuln_datasync_spark.operators.corpus import mix_domains, normalize_text


def _frac(id_str, salt="v1"):
    return int(hashlib.md5((id_str + salt).encode()).hexdigest()[:15], 16) / 16**15


def test_mix_domains_repeat_and_subsample(spark):
    rows = [(i, "a") for i in range(4)] + [(i, "b") for i in range(10, 12)]
    df = spark.createDataFrame(rows, "doc_id long, dom string")
    out = mix_domains(df, "dom", "doc_id", {"a": 0.5, "b": 0.5}).collect()

    # N=6, targets 3/3 -> epochs a = 0.75, b = 1.5
    exp = {}
    for i in range(4):
        exp[i] = 1 if _frac(str(i)) < 0.75 else 0
    for i in (10, 11):
        exp[i] = 1 + (1 if _frac(str(i)) < 0.5 else 0)
    got = {}
    for r in out:
        got[r["doc_id"]] = got.get(r["doc_id"], 0) + 1
    assert got == {k: v for k, v in exp.items() if v > 0}
    # epoch numbering is 0..n-1 per row
    epochs = sorted(
        r["epoch"] for r in out if r["doc_id"] in (10, 11) and exp[r["doc_id"]] == 2
    )
    assert set(epochs) <= {0, 1}

    # deterministic under re-execution
    again = {}
    for r in mix_domains(df, "dom", "doc_id", {"a": 0.5, "b": 0.5}).collect():
        again[r["doc_id"]] = again.get(r["doc_id"], 0) + 1
    assert again == got


def test_mix_domains_drops_unlisted_and_nulls(spark):
    rows = [(1, "a"), (2, "junk"), (None, "b"), (3, "b")]
    df = spark.createDataFrame(rows, "doc_id long, dom string")
    out = mix_domains(df, "dom", "doc_id", {"a": 0.5, "b": 0.5}).collect()
    assert all(r["dom"] != "junk" for r in out)

    # null id keeps its floor(epochs) copies when epochs is integral
    out2 = mix_domains(df, "dom", "doc_id", {"b": 1.0}, scale=2.0).collect()
    n_null = sum(1 for r in out2 if r["doc_id"] is None)
    assert n_null == 2  # e_b = 1.0*(2*2)/2 = 2.0 -> exactly 2 copies

    with pytest.raises(ValueError, match="weights"):
        mix_domains(df, "dom", "doc_id", {})
    with pytest.raises(ValueError, match="scale"):
        mix_domains(df, "dom", "doc_id", {"a": 1.0}, scale=0)


def test_normalize_text_strips_and_composes(spark):
    rows = [
        (1, "a\u200bb\u200cc\u200dd\ufeffe"),  # zero-widths out
        (2, "x\x01y\x7fz"),                    # controls out
        (3, "keep\tthis\nand\rthat"),          # tab/nl/cr kept
        (4, "cafe\u0301"),                  # NFC: e + accent -> e-acute
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in normalize_text(df, "text").collect()}
    assert out[1]["text_norm"] == "abcde"
    assert out[1]["n_chars_removed"] == 4
    assert out[2]["text_norm"] == "xyz"
    assert out[2]["n_chars_removed"] == 2
    assert out[3]["text_norm"] == "keep\tthis\nand\rthat"
    assert out[3]["n_chars_removed"] == 0
    assert out[4]["text_norm"] == "caf\u00e9"
    assert out[4]["n_chars_removed"] == 1  # composition shrank it
    assert out[5]["text_norm"] is None
    assert out[5]["n_chars_removed"] is None


def test_normalize_text_jvm_only_path(spark):
    df = spark.createDataFrame(
        [(1, "a\u200bb e\u0301")], "doc_id long, text string"
    )
    r = normalize_text(df, "text", nfc=False).collect()[0]
    assert r["text_norm"] == "ab e\u0301"  # stripped but NOT composed
