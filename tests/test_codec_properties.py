"""Property tests for the pure-numpy media codecs: any (dims, pixels)
roundtrips bit-exactly, resamples use the floor grid everywhere, and the
encoders always emit payloads the decoders accept (closure under
re-encode). Hypothesis drives the shapes/values."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vuln_datasync_spark.operators.multimodal import (
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    resample_nearest_audio,
    resize_nearest,
)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_ppm_roundtrip_any_shape(w, h, seed):
    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    out = decode_ppm(encode_ppm(img))
    assert out.shape == img.shape and (out == img).all()


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 25),
    h=st.integers(1, 25),
    w2=st.integers(1, 25),
    h2=st.integers(1, 25),
    seed=st.integers(0, 2**31 - 1),
)
def test_ppm_resize_floor_grid_and_reencode_closure(w, h, w2, h2, seed):
    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    small = resize_nearest(img, w2, h2)
    assert small.shape == (h2, w2, 3)
    # floor grid, element-for-element
    for y in (0, h2 - 1):
        for x in (0, w2 - 1):
            assert (small[y, x] == img[(y * h) // h2, (x * w) // w2]).all()
    # closure: the resized image is itself a valid P6 roundtrip
    assert (decode_ppm(encode_ppm(small)) == small).all()


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(1, 300),
    ch=st.integers(1, 2),
    rate=st.sampled_from([8000, 12000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_any_shape(n, ch, rate, seed):
    s = np.random.default_rng(seed).integers(
        -32768, 32768, size=(n, ch), dtype=np.int16
    )
    out, r = decode_wav(encode_wav(s, rate))
    assert r == rate and out.shape == (n, ch) and (out == s).all()


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(1, 200),
    src=st.sampled_from([8000, 16000, 44100]),
    dst=st.sampled_from([4000, 6000, 8000, 22050]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_resample_floor_grid_and_closure(n, src, dst, seed):
    s = np.random.default_rng(seed).integers(
        -32768, 32768, size=(n, 1), dtype=np.int16
    )
    out = resample_nearest_audio(s, src, dst)
    m = max(1, n * dst // src)
    assert out.shape == (m, 1)
    idx = (np.arange(m) * n) // m
    assert (out[:, 0] == s[idx, 0]).all()
    # closure under re-encode at the new rate
    dec, r = decode_wav(encode_wav(out, dst))
    assert r == dst and (dec == out).all()


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(0, 6),
    w=st.integers(1, 16),
    h=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
)
def test_y4m_roundtrip_any_shape(n, w, h, seed):
    from vuln_datasync_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
    )

    clip = np.random.default_rng(seed).integers(
        0, 256, size=(n, h, w, 3), dtype=np.uint8
    )
    out, fn, fd = decode_y4m(encode_y4m(clip))
    assert out.shape == clip.shape and (out == clip).all()
    assert (fn, fd) == (25, 1)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 12),
    k=st.integers(1, 12),
)
def test_y4m_frame_pick_grid_is_uniform_floor(n, k):
    # the temporal grid matches the spatial one: src = i*n//n_out,
    # strictly nondecreasing, first frame always 0, never out of range
    n_out = min(k, n)
    picks = [i * n // n_out for i in range(n_out)]
    assert picks[0] == 0 and picks == sorted(picks)
    assert all(0 <= p < n for p in picks)
    assert len(set(picks)) == n_out  # distinct: no frame sampled twice
