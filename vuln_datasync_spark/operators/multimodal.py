"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` operators.

Decode support is two-tier:

* **Real decode for uncompressed PPM (P6) images** — a pure-numpy codec
  (``decode_ppm`` / ``encode_ppm``), honest nearest-neighbor resize, and
  real pixel-statistic features. No external library needed: P6 is a
  text header + raw RGB bytes, so ``np.frombuffer`` IS the decoder.
* **Deterministic stub for every other codec** (JPEG/PNG/audio/video
  would need PIL/ffmpeg, absent in this container): ``decode_stub=True``
  (default) produces fake features from the bytes; ``decode_stub=False``
  decodes PPM payloads for real and raises ValueError on bytes it cannot
  honestly decode. Everything around the decode — schema, Arrow batch
  shape, partitioning, UDF signatures — is identical in both tiers.

Scale notes: binary payloads ride the normal parquet path (no driver
collect); ``mapInPandas`` streams Arrow record batches so executor memory
is bounded by batch size (spark.sql.execution.arrow.maxRecordsPerBatch),
not file size. Feature extraction fans out with the scan partitions —
no shuffle until the (tiny) feature output is aggregated.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, byte_len long, content_md5 string, "
    "feat array<float>"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame_md5 string"


def as_media_table(
    df: DataFrame, id_col: str, text_col: str, kind: str = "image"
) -> DataFrame:
    """Wrap any string column as an opaque binary media table (the test
    stand-in for real image/audio bytes) with typed metadata."""
    b = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        b.alias("content"),
        F.struct(
            (F.length(b) % 640 + 32).cast("int").alias("width"),
            (F.length(b) % 480 + 32).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (F.length(b) * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


# ---------------------------------------------------------- PPM (P6) codec
#
# P6 layout: b"P6" <ws> width <ws> height <ws> maxval <single ws> raw RGB
# triplets (1 byte/channel when maxval < 256). '#' starts a comment that
# runs to end-of-line anywhere in the header. Pure numpy: the "decode" of
# an uncompressed raster is a frombuffer + reshape.


def encode_ppm(img: np.ndarray) -> bytes:
    """Serialize an (H, W, 3) uint8 array as a binary PPM (P6)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) array, got {img.shape}")
    h, w = img.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def decode_ppm(raw: bytes) -> np.ndarray:
    """Parse a binary PPM (P6) into an (H, W, 3) uint8 array."""
    if raw[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 ints, whitespace separated, '#' comments allowed;
    # exactly ONE whitespace byte separates maxval from the raster
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":
            while pos < len(raw) and raw[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(raw[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval >= 256:
        raise ValueError("16-bit PPM not supported")
    n = w * h * 3
    if len(raw) - pos < n:
        raise ValueError(f"truncated raster: need {n} bytes")
    return np.frombuffer(raw, dtype=np.uint8, count=n, offset=pos).reshape(
        h, w, 3
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample: out[y, x] = src[y*H//height, x*W//width]
    (floor mapping — the standard integer nearest-neighbor grid)."""
    src_h, src_w = img.shape[:2]
    rows = (np.arange(height) * src_h) // height
    cols = (np.arange(width) * src_w) // width
    return img[rows][:, cols]


def _ppm_pixel_features(img: np.ndarray) -> np.ndarray:
    """Real decoded-image features, chosen to be EXACTLY representable in
    float32 (small integers): per-channel sums, global min/max, pixel
    count, and dimensions. Cross-engine parity holds bit-for-bit — no
    float mean to drift."""
    h, w = img.shape[:2]
    px = img.astype(np.int64)
    return np.array(
        [
            px[:, :, 0].sum(),
            px[:, :, 1].sum(),
            px[:, :, 2].sum(),
            px.min(),
            px.max(),
            h * w,
            w,
            h,
        ],
        dtype=np.float32,
    )


def planted_ppm_table(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic real-PPM fixture: one small RGB image per row with
    ``pixel(y, x, c) = (x*7 + y*13 + id*3 + c*29) % 256`` and dimensions
    ``w = id%5 + 4``, ``h = id%4 + 3`` — analytic functions of the id, so
    a SQL oracle can recompute any pixel statistic without touching
    bytes. The payloads are REAL P6 files (decodable by any PPM reader)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, contents, metas = [], [], []
            for mid in pdf["_id"]:
                mid = int(mid)
                w, h = mid % 5 + 4, mid % 4 + 3
                x = np.arange(w)[None, :, None]
                y = np.arange(h)[:, None, None]
                c = np.arange(3)[None, None, :]
                img = ((x * 7 + y * 13 + mid * 3 + c * 29) % 256).astype(
                    np.uint8
                )
                out_ids.append(mid)
                contents.append(encode_ppm(img))
                metas.append(
                    {
                        "width": w,
                        "height": h,
                        "sample_rate": 0,
                        "duration_ms": 0,
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": out_ids,
                    "kind": "image/ppm",
                    "content": contents,
                    "meta": metas,
                }
            )

    return df.select(F.col(id_col).alias("_id")).mapInPandas(
        op, schema=MEDIA_SCHEMA
    )


# ------------------------------------------------------- WAV (PCM) codec
#
# RIFF/WAVE with a 16-byte PCM fmt chunk and int16 LE samples — like PPM,
# an uncompressed raster where np.frombuffer IS the decoder. Unknown
# chunks (LIST/INFO etc.) are skipped by their declared size, as a real
# reader must.


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Serialize int16 samples ((n,) mono or (n, ch)) as PCM WAV."""
    import struct

    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = np.ascontiguousarray(s).tobytes()
    block = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(raw: bytes) -> tuple[np.ndarray, int]:
    """Parse a PCM WAV into ((n, ch) int16 array, sample_rate)."""
    import struct

    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, rate, _brate, _block, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (fmt={audio_format}, bits={bits})")
    n = len(data) // (ch * 2)
    return (
        np.frombuffer(data, dtype="<i2", count=n * ch).reshape(n, ch),
        rate,
    )


def resample_nearest_audio(
    samples: np.ndarray, src_rate: int, target_rate: int
) -> np.ndarray:
    """Nearest-neighbor (sample-pick) resample: out has
    ``n_out = n_src * target_rate // src_rate`` frames and
    ``out[t] = src[t * n_src // n_out]`` — the audio analog of the image
    floor grid; exact, no interpolation, SQL-reproducible."""
    n_src = samples.shape[0]
    n_out = max(1, n_src * target_rate // src_rate)
    idx = (np.arange(n_out) * n_src) // n_out
    return samples[idx]


def _wav_pixel_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """Real decoded-audio features as exactly-float32-representable small
    integers: total sum, min, max, frame count, rate, channels (+ zero
    padding to the 8-dim feat shape)."""
    s = samples.astype(np.int64)
    return np.array(
        [
            s.sum(),
            s.min(),
            s.max(),
            samples.shape[0],
            rate,
            samples.shape[1],
            0,
            0,
        ],
        dtype=np.float32,
    )


def planted_wav_table(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic real-WAV fixture: mono int16 clips with
    ``sample(t) = ((t*31 + id*17) % 4096) - 2048``, ``n = id%50 + 20``
    frames at ``rate = 8000 + (id%3)*4000`` — analytic in the id, so SQL
    oracles recompute any sample statistic. Payloads are REAL PCM WAV."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, contents, metas = [], [], []
            for mid in pdf["_id"]:
                mid = int(mid)
                n = mid % 50 + 20
                rate = 8000 + (mid % 3) * 4000
                t = np.arange(n, dtype=np.int64)
                s = ((t * 31 + mid * 17) % 4096 - 2048).astype(np.int16)
                ids.append(mid)
                contents.append(encode_wav(s, rate))
                metas.append(
                    {
                        "width": 0,
                        "height": 0,
                        "sample_rate": rate,
                        "duration_ms": n * 1000 // rate,
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "audio/wav",
                    "content": contents,
                    "meta": metas,
                }
            )

    return df.select(F.col(id_col).alias("_id")).mapInPandas(
        op, schema=MEDIA_SCHEMA
    )


def resample_media(media: DataFrame, target_rate: int) -> DataFrame:
    """REAL audio resample over Arrow batches: decode PCM WAV, pick
    samples on the nearest-neighbor grid, re-encode at ``target_rate``,
    rewrite ``meta.sample_rate``/``duration_ms``. Map-only; a downsample
    shrinks payloads before any shuffle/store (the 100 TB-friendly
    order). Non-WAV bytes raise ValueError."""
    if target_rate <= 0:
        raise ValueError(f"target_rate must be positive: {target_rate}")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, metas = [], []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                raw = bytes(content)
                if raw[:4] != b"RIFF":
                    raise ValueError(
                        "resample_media supports PCM WAV only; other "
                        "codecs need ffmpeg"
                    )
                s, _rate = decode_wav(raw)
                out = resample_nearest_audio(s, _rate, target_rate)
                contents.append(encode_wav(out, target_rate))
                metas.append(
                    {
                        "width": int(meta["width"]),
                        "height": int(meta["height"]),
                        "sample_rate": target_rate,
                        "duration_ms": out.shape[0] * 1000 // target_rate,
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": contents,
                    "meta": metas,
                }
            )

    return media.mapInPandas(op, schema=MEDIA_SCHEMA)


def _fake_decode_features(content: bytes, n_dims: int = 8) -> np.ndarray:
    """Deterministic fake 'decoded' feature vector: bytes -> md5-seeded
    pseudo-embedding. Stands in for a real decode+CNN/fbank pipeline."""
    h = hashlib.md5(content).digest()
    seed = int.from_bytes(h[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n_dims).astype(np.float32)


def extract_features(
    media: DataFrame, n_dims: int = 8, decode_stub: bool = True
) -> DataFrame:
    """Per-item feature extraction over Arrow batches (mapInPandas).

    ``decode_stub=False``: REAL decode — PPM (P6) images and PCM WAV
    audio are parsed with the pure-numpy codecs and yield 8 real
    statistics (images: channel sums/min/max/n_px/w/h; audio: sample
    sum/min/max/frames/rate/channels); any other codec raises ValueError
    (JPEG/PNG/compressed audio would need PIL/ffmpeg, absent here — no
    silent fake on the real path). ``decode_stub=True`` (default) keeps
    the deterministic md5-seeded fake for opaque bytes."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            if decode_stub:
                feats = [
                    _fake_decode_features(bytes(c), n_dims) for c in content
                ]
            else:
                feats = []
                for c in content:
                    raw = bytes(c)
                    if raw[:2] == b"P6":
                        feats.append(_ppm_pixel_features(decode_ppm(raw)))
                    elif raw[:4] == b"RIFF":
                        feats.append(_wav_pixel_features(*decode_wav(raw)))
                    else:
                        raise ValueError(
                            "real decode supports PPM (P6) images and PCM "
                            "WAV audio in this container; other codecs "
                            "need PIL/ffmpeg — pass decode_stub=True for "
                            "opaque bytes"
                        )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": content.str.len().astype("int64"),
                    "content_md5": [
                        hashlib.md5(c).hexdigest() for c in content
                    ],
                    "feat": feats,
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 256, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing: emit up to max_frames 'frames' per item
    (one output row per frame — a 1:N mapInPandas, the shape a real video
    frame sampler has)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, md5s = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                n = min(max_frames, max(1, len(raw) // every_n_bytes))
                for i in range(n):
                    chunk = raw[i * every_n_bytes : (i + 1) * every_n_bytes]
                    ids.append(mid)
                    idxs.append(i)
                    md5s.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_md5": md5s}
            )

    return media.mapInPandas(op, schema=FRAME_SCHEMA)


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    decode_stub: bool = True,
) -> DataFrame:
    """Resize plumbing (image thumbnail / audio resample shape): emit the
    same media schema with ``meta.width/height`` set to the target and a
    payload whose size scales with the target/source pixel ratio —
    ``max(1, byte_len * width*height // (src_w*src_h))`` bytes.

    ``decode_stub=False``: REAL resample — PPM (P6) payloads are decoded
    with the pure-numpy codec, nearest-neighbor resized
    (``resize_nearest``: floor grid mapping), and re-encoded as valid
    P6; other codecs raise ValueError (they would need PIL/ffmpeg).
    ``decode_stub=True`` (default) keeps the md5-chain stub payload for
    opaque bytes — there the real parts are the Arrow batch shape, the
    size arithmetic, and the metadata rewrite.
    Map-only (mapInPandas, no shuffle); output bytes are SMALLER than
    input for downscales, so the stage shrinks data early — the order a
    real pipeline wants at 100 TB (resize before shuffle/store)."""
    if width <= 0 or height <= 0:
        raise ValueError(f"target dims must be positive: {width}x{height}")

    def _stub_bytes(raw: bytes, n: int) -> bytes:
        out = bytearray()
        h = hashlib.md5(raw).digest()
        while len(out) < n:
            out.extend(h)
            h = hashlib.md5(h).digest()
        return bytes(out[:n])

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf["meta"]
            contents, ws, hs = [], [], []
            for content, meta in zip(pdf["content"], metas):
                raw = bytes(content)
                if not decode_stub:
                    if raw[:2] != b"P6":
                        raise ValueError(
                            "real resize supports PPM (P6) only in this "
                            "container; other codecs need PIL/ffmpeg — "
                            "pass decode_stub=True for opaque bytes"
                        )
                    contents.append(
                        encode_ppm(
                            resize_nearest(decode_ppm(raw), width, height)
                        )
                    )
                else:
                    src_area = max(
                        1, int(meta["width"]) * int(meta["height"])
                    )
                    n = max(1, len(raw) * width * height // src_area)
                    contents.append(_stub_bytes(raw, n))
                ws.append(width)
                hs.append(height)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": contents,
                    "meta": [
                        {
                            "width": w,
                            "height": h,
                            "sample_rate": m["sample_rate"],
                            "duration_ms": m["duration_ms"],
                        }
                        for w, h, m in zip(ws, hs, metas)
                    ],
                }
            )

    return media.mapInPandas(op, schema=MEDIA_SCHEMA)
