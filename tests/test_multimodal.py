"""Multimodal plumbing: schema, Arrow batch shape, 1:N frame sampling,
stub gating (the decode itself is stubbed — no media libs in container)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from vuln_datasync_spark.operators.multimodal import (
    as_media_table,
    extract_features,
    sample_frames,
)

SF = "/root/testdata/sf0.001"


def _media(spark, n=20):
    d = spark.read.parquet(f"{SF}/documents.parquet").filter(F.col("doc_id") < n)
    return as_media_table(d, "doc_id", "text")


def test_media_schema_and_metadata(spark):
    m = _media(spark)
    assert dict(m.dtypes)["content"] == "binary"
    row = m.head()
    assert row["meta"]["width"] >= 32 and row["meta"]["sample_rate"] == 16000


def test_feature_extraction_deterministic(spark):
    m = _media(spark)
    a = {r["media_id"]: (r["content_md5"], list(r["feat"])) for r in extract_features(m).collect()}
    b = {r["media_id"]: (r["content_md5"], list(r["feat"])) for r in extract_features(m).collect()}
    assert a == b
    assert all(len(v[1]) == 8 for v in a.values())


def test_frame_sampling_one_to_many(spark):
    frames = sample_frames(_media(spark)).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(idxs == sorted(idxs) and idxs[0] == 0 for idxs in by_id.values())
    assert max(len(v) for v in by_id.values()) >= 1


def test_real_decode_is_gated(spark):
    with pytest.raises(PythonException, match="NotImplementedError"):
        extract_features(_media(spark, 3), decode_stub=False).collect()


def test_resize_media_size_arithmetic_and_determinism(spark):
    from vuln_datasync_spark.operators.multimodal import (
        as_media_table,
        resize_media,
    )

    df = spark.createDataFrame(
        [(1, "x" * 1000), (2, "y")], "doc_id long, text string"
    )
    m = as_media_table(df, "doc_id", "text")
    src = {r["media_id"]: r for r in m.collect()}
    out = {r["media_id"]: r for r in resize_media(m, 64, 64).collect()}

    for mid, r in out.items():
        s = src[mid]
        want = max(
            1,
            len(bytes(s["content"])) * 64 * 64
            // (s["meta"]["width"] * s["meta"]["height"]),
        )
        assert len(bytes(r["content"])) == want
        assert (r["meta"]["width"], r["meta"]["height"]) == (64, 64)
        assert r["meta"]["sample_rate"] == s["meta"]["sample_rate"]

    # deterministic: same inputs -> byte-identical payloads
    again = {r["media_id"]: bytes(r["content"]) for r in resize_media(m, 64, 64).collect()}
    assert {k: bytes(v["content"]) for k, v in out.items()} == again

    import pytest

    with pytest.raises(ValueError, match="dims"):
        resize_media(m, 0, 64)
    with pytest.raises(Exception):
        resize_media(m, 64, 64, decode_stub=False).collect()
