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
