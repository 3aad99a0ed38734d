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


def test_real_decode_rejects_opaque_codecs(spark):
    # real path decodes PPM only; opaque bytes must fail loudly, not fake
    with pytest.raises(PythonException, match="PPM"):
        extract_features(_media(spark, 3), decode_stub=False).collect()


def test_ppm_codec_roundtrip_and_header_parsing():
    import numpy as np

    from vuln_datasync_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
        resize_nearest,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()

    # header variants a real P6 reader must accept: comments + extra ws
    raw = (
        b"P6 # comment after magic\n# full comment line\n9\t6\n255\n"
        + img.tobytes()
    )
    assert (decode_ppm(raw) == img).all()

    with pytest.raises(ValueError, match="P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n4 4\n255\n\x00\x01")

    # nearest-neighbor floor grid: out[y,x] = src[y*H//h2, x*W//w2]
    small = resize_nearest(img, 3, 2)
    assert small.shape == (2, 3, 3)
    for y in range(2):
        for x in range(3):
            assert (small[y, x] == img[(y * 6) // 2, (x * 9) // 3]).all()
    # upscale works too (indices repeat)
    big = resize_nearest(img, 18, 12)
    assert big.shape == (12, 18, 3)
    assert (big[::2, ::2] == img).all()


def test_real_ppm_decode_resize_end_to_end(spark):
    import numpy as np

    from vuln_datasync_spark.operators.multimodal import (
        decode_ppm,
        planted_ppm_table,
        resize_media,
        resize_nearest,
    )

    d = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    m = planted_ppm_table(d, "doc_id")

    # payloads are REAL decodable P6 matching the plant rule + meta dims
    for r in m.collect():
        img = decode_ppm(bytes(r["content"]))
        mid = r["media_id"]
        w, h = mid % 5 + 4, mid % 4 + 3
        assert img.shape == (h, w, 3)
        assert (r["meta"]["width"], r["meta"]["height"]) == (w, h)
        x = np.arange(w)[None, :, None]
        y = np.arange(h)[:, None, None]
        c = np.arange(3)[None, None, :]
        assert (img == (x * 7 + y * 13 + mid * 3 + c * 29) % 256).all()

    # real resize == numpy reference resample, re-encoded as valid P6
    src = {r["media_id"]: bytes(r["content"]) for r in m.collect()}
    out = resize_media(m, 5, 4, decode_stub=False).collect()
    for r in out:
        got = decode_ppm(bytes(r["content"]))
        want = resize_nearest(decode_ppm(src[r["media_id"]]), 5, 4)
        assert (got == want).all()
        assert (r["meta"]["width"], r["meta"]["height"]) == (5, 4)

    # real-resize path rejects non-PPM bytes
    with pytest.raises(PythonException, match="PPM"):
        resize_media(_media(spark, 3), 5, 4, decode_stub=False).collect()


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


def test_wav_codec_roundtrip_and_resample():
    import numpy as np

    from vuln_datasync_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
        resample_nearest_audio,
    )

    rng = np.random.default_rng(5)
    mono = rng.integers(-32768, 32768, size=60, dtype=np.int16)
    s, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and s.shape == (60, 1) and (s[:, 0] == mono).all()

    stereo = rng.integers(-32768, 32768, size=(40, 2), dtype=np.int16)
    s2, r2 = decode_wav(encode_wav(stereo, 8000))
    assert r2 == 8000 and (s2 == stereo).all()

    # unknown chunks must be skipped by declared size (LIST/INFO etc.)
    raw = encode_wav(mono, 16000)
    import struct

    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    spliced = raw[:12] + extra + raw[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    s3, r3 = decode_wav(spliced)
    assert r3 == 16000 and (s3[:, 0] == mono).all()

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS....")

    # nearest-neighbor pick: out[t] = src[t*n//m]
    out = resample_nearest_audio(stereo, 8000, 4000)
    assert out.shape == (20, 2)
    assert (out == stereo[(np.arange(20) * 40) // 20]).all()


def test_real_wav_decode_resample_end_to_end(spark):
    import numpy as np

    from vuln_datasync_spark.operators.multimodal import (
        decode_wav,
        extract_features,
        planted_wav_table,
        resample_media,
    )

    d = spark.createDataFrame([(i,) for i in range(9)], "doc_id long")
    m = planted_wav_table(d, "doc_id")
    for r in m.collect():
        s, rate = decode_wav(bytes(r["content"]))
        mid = r["media_id"]
        n = mid % 50 + 20
        assert rate == 8000 + (mid % 3) * 4000 and s.shape == (n, 1)
        t = np.arange(n)
        assert (s[:, 0] == ((t * 31 + mid * 17) % 4096 - 2048)).all()
        assert r["meta"]["duration_ms"] == n * 1000 // rate

    # real features route by magic bytes (RIFF -> audio stats)
    f = {r["media_id"]: r for r in
         extract_features(m, decode_stub=False).collect()}
    for mid, r in f.items():
        n = mid % 50 + 20
        assert int(r["feat"][3]) == n
        assert int(r["feat"][4]) == 8000 + (mid % 3) * 4000

    # resample == numpy reference, meta rewritten
    out = resample_media(m, 6000).collect()
    for r in out:
        s, rate = decode_wav(bytes(r["content"]))
        mid = r["media_id"]
        n = mid % 50 + 20
        src_rate = 8000 + (mid % 3) * 4000
        m_out = max(1, n * 6000 // src_rate)
        assert rate == 6000 and s.shape == (m_out, 1)
        idx = (np.arange(m_out) * n) // m_out
        assert (s[:, 0] == ((idx * 31 + mid * 17) % 4096 - 2048)).all()
        assert r["meta"]["sample_rate"] == 6000

    # non-WAV bytes fail loudly on the real resample path
    with pytest.raises(PythonException, match="WAV"):
        resample_media(_media(spark, 3), 6000).collect()


def test_y4m_codec_roundtrip_and_c420_upsample():
    import numpy as np

    from vuln_datasync_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
    )

    rng = np.random.default_rng(11)
    clip = rng.integers(0, 256, size=(4, 5, 7, 3), dtype=np.uint8)
    out, fn, fd = decode_y4m(encode_y4m(clip, fps=(30, 1)))
    assert (out == clip).all() and (fn, fd) == (30, 1)

    # C420 stream (ffmpeg's default): chroma at half res, nearest-doubled
    w, h = 6, 4
    y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    raw = (
        f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode()
        + b"FRAME\n" + y.tobytes() + u.tobytes() + v.tobytes()
    )
    f420, _, _ = decode_y4m(raw)
    assert (f420[0, ..., 0] == y).all()
    assert (f420[0, ..., 1] == u.repeat(2, 0).repeat(2, 1)).all()
    assert (f420[0, ..., 2] == v.repeat(2, 0).repeat(2, 1)).all()

    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m(b"\x00\x00\x00\x18ftypmp42")
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C444\nFRAME\n\x00\x01")
    with pytest.raises(ValueError, match="colorspace"):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 Cmono\n")
    # header-only stream = zero frames, not an error
    empty, _, _ = decode_y4m(b"YUV4MPEG2 W4 H3 F25:1 Ip A1:1 C444\n")
    assert empty.shape == (0, 3, 4, 3)


def test_real_y4m_decode_and_frame_sampling_end_to_end(spark):
    import numpy as np

    from vuln_datasync_spark.operators.multimodal import (
        decode_y4m,
        extract_features,
        planted_y4m_table,
        sample_frames_y4m,
    )

    d = spark.createDataFrame([(i,) for i in range(13)], "doc_id long")
    m = planted_y4m_table(d, "doc_id")
    for r in m.collect():
        mid = r["media_id"]
        w, h, n = mid % 4 + 2, mid % 3 + 2, mid % 6 + 2
        frames, fn, fd = decode_y4m(bytes(r["content"]))
        assert frames.shape == (n, h, w, 3) and (fn, fd) == (25, 1)
        f = np.arange(n)[:, None, None, None]
        yy = np.arange(h)[None, :, None, None]
        x = np.arange(w)[None, None, :, None]
        p = np.arange(3)[None, None, None, :]
        want = ((f * 41 + yy * 13 + x * 7 + mid * 3 + p * 29) % 256)
        assert (frames == want).all()

    # real features route by magic bytes (YUV4MPEG2 -> video stats)
    feats = {r["media_id"]: r for r in
             extract_features(m, decode_stub=False).collect()}
    for mid, r in feats.items():
        w, h, n = mid % 4 + 2, mid % 3 + 2, mid % 6 + 2
        assert int(r["feat"][5]) == n
        assert int(r["feat"][6]) == w and int(r["feat"][7]) == h
        assert r["byte_len"] == 35 + n * (6 + 3 * w * h)

    # frame sampling: uniform floor grid, exact per-frame sums
    rows = sample_frames_y4m(m, max_frames=3).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    for mid, rs in by_id.items():
        n = mid % 6 + 2
        n_out = min(3, n)
        assert [r["frame_idx"] for r in sorted(rs, key=lambda r: r["frame_idx"])] == list(range(n_out))
        for r in rs:
            src = r["frame_idx"] * n // n_out
            assert r["src_frame"] == src
            w, h = mid % 4 + 2, mid % 3 + 2
            yy = np.arange(h)[:, None]
            x = np.arange(w)[None, :]
            ysum = int(((src * 41 + yy * 13 + x * 7 + mid * 3) % 256).sum())
            assert r["y_sum"] == ysum
