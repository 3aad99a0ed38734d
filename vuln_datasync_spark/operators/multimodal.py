"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` operators.

Decode support is two-tier:

* **Real decode for every uncompressed raster format** — pure-numpy
  codecs for PPM (P6) images (``decode_ppm``/``encode_ppm``), PCM WAV
  audio (``decode_wav``/``encode_wav``), and YUV4MPEG2 video
  (``decode_y4m``/``encode_y4m``), with honest nearest-neighbor resize
  / sample-pick resample / uniform frame sampling and real statistic
  features. No external library needed: an uncompressed raster is a
  header + raw bytes, so ``np.frombuffer`` IS the decoder.
* **Deterministic stub for compressed codecs** (JPEG/PNG/MP3/H.264
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


# ------------------------------------------------- Y4M (YUV4MPEG2) codec
#
# YUV4MPEG2 is ffmpeg's uncompressed video interchange format: one ASCII
# header line ("YUV4MPEG2 W.. H.. F<num>:<den> Ip A1:1 C444\n"), then per
# frame a "FRAME\n" marker followed by raw Y, U, V planes. Like PPM and
# WAV, np.frombuffer IS the decoder — no ffmpeg needed for the raw form.
# We encode C444 (full-res chroma); the decoder also accepts C420*
# (chroma at half resolution, nearest-upsampled to full res on read, the
# same thing a display path does).


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1)
) -> bytes:
    """Serialize an (n_frames, H, W, 3) uint8 YUV array as YUV4MPEG2
    (C444: three full-resolution planes per frame)."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(f"expected (n, H, W, 3) array, got {frames.shape}")
    n, h, w = frames.shape[:3]
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    out = [f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C444\n".encode()]
    for i in range(n):
        out.append(b"FRAME\n")
        # plane-major: all Y, then all U, then all V
        out.append(np.ascontiguousarray(f[i].transpose(2, 0, 1)).tobytes())
    return b"".join(out)


def decode_y4m(raw: bytes) -> tuple[np.ndarray, int, int]:
    """Parse YUV4MPEG2 into ((n_frames, H, W, 3) uint8 YUV, fps_num,
    fps_den). C444 reads exactly; C420* chroma planes are nearest-
    upsampled (pixel-doubled) to full resolution."""
    if not raw.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = raw.index(0x0A)
    w = h = None
    fps_num, fps_den, c444 = 25, 1, True
    for tok in raw[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            fps_num, fps_den = (int(x) for x in t[1:].split(":"))
        elif t[0] == "C":
            if t[1:].startswith("444"):
                c444 = True
            elif t[1:].startswith("420"):
                c444 = False
            else:
                raise ValueError(f"unsupported colorspace {t}")
    if w is None or h is None:
        raise ValueError("missing W/H in stream header")
    if not c444 and (w % 2 or h % 2):
        # the 2x pixel-double upsample of w//2 x h//2 chroma can never
        # reach odd luma dimensions — fail with a clear message instead
        # of an opaque numpy shape mismatch at np.stack
        raise ValueError(
            f"C420 requires even dimensions, got {w}x{h}"
        )
    cw, ch_ = (w, h) if c444 else (w // 2, h // 2)
    fsize = w * h + 2 * cw * ch_
    frames = []
    pos = nl + 1
    while pos < len(raw):
        fnl = raw.index(0x0A, pos)
        if raw[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        pos = fnl + 1
        if len(raw) - pos < fsize:
            raise ValueError(f"truncated frame: need {fsize} bytes")
        y = np.frombuffer(raw, np.uint8, w * h, pos).reshape(h, w)
        u = np.frombuffer(
            raw, np.uint8, cw * ch_, pos + w * h
        ).reshape(ch_, cw)
        v = np.frombuffer(
            raw, np.uint8, cw * ch_, pos + w * h + cw * ch_
        ).reshape(ch_, cw)
        if not c444:  # nearest (pixel-double) chroma upsample
            u = u.repeat(2, 0)[:h].repeat(2, 1)[:, :w]
            v = v.repeat(2, 0)[:h].repeat(2, 1)[:, :w]
        frames.append(np.stack([y, u, v], axis=-1))
        pos += fsize
    return (
        np.stack(frames) if frames else np.empty((0, h, w, 3), np.uint8),
        fps_num,
        fps_den,
    )


def _y4m_pixel_features(frames: np.ndarray) -> np.ndarray:
    """Real decoded-video features as exactly-float32-representable small
    integers: per-plane sums, global min/max, frame count, dimensions."""
    n, h, w = frames.shape[:3]
    px = frames.astype(np.int64)
    return np.array(
        [
            px[..., 0].sum(),
            px[..., 1].sum(),
            px[..., 2].sum(),
            px.min(),
            px.max(),
            n,
            w,
            h,
        ],
        dtype=np.float32,
    )


def planted_y4m_table(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic real-Y4M fixture: tiny C444 clips with
    ``pixel(f, y, x, plane) = (f*41 + y*13 + x*7 + id*3 + plane*29) % 256``
    and ``w = id%4 + 2``, ``h = id%3 + 2``, ``n_frames = id%6 + 2`` —
    analytic in the id, so SQL oracles recompute any frame statistic.
    Payloads are REAL YUV4MPEG2 streams (pipeable into ffmpeg)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, contents, metas = [], [], []
            for mid in pdf["_id"]:
                mid = int(mid)
                w, h, n = mid % 4 + 2, mid % 3 + 2, mid % 6 + 2
                f = np.arange(n)[:, None, None, None]
                y = np.arange(h)[None, :, None, None]
                x = np.arange(w)[None, None, :, None]
                p = np.arange(3)[None, None, None, :]
                clip = (
                    (f * 41 + y * 13 + x * 7 + mid * 3 + p * 29) % 256
                ).astype(np.uint8)
                ids.append(mid)
                contents.append(encode_y4m(clip))
                metas.append(
                    {
                        "width": w,
                        "height": h,
                        "sample_rate": 25,  # fps for video payloads
                        "duration_ms": n * 1000 // 25,
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "video/y4m",
                    "content": contents,
                    "meta": metas,
                }
            )

    return df.select(F.col(id_col).alias("_id")).mapInPandas(
        op, schema=MEDIA_SCHEMA
    )


FRAME_STATS_SCHEMA = (
    "media_id long, frame_idx int, src_frame int, "
    "y_sum long, u_sum long, v_sum long, px_min int, px_max int"
)


def sample_frames_y4m(media: DataFrame, max_frames: int = 3) -> DataFrame:
    """REAL video frame sampling over Arrow batches: decode YUV4MPEG2,
    pick ``n_out = min(max_frames, n_src)`` frames on the uniform floor
    grid ``src = i * n_src // n_out`` (the temporal analog of
    ``resize_nearest``'s spatial grid), and emit exact per-frame plane
    statistics — one output row per sampled frame (1:N mapInPandas).
    Map-only: decode + reduce happen inside the scan partition; only the
    tiny stat rows ever shuffle — at 100 TB the video bytes never move.
    Non-Y4M payloads raise ValueError (compressed codecs need ffmpeg)."""
    if max_frames <= 0:
        raise ValueError(f"max_frames must be positive: {max_frames}")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "media_id", "frame_idx", "src_frame",
                    "y_sum", "u_sum", "v_sum", "px_min", "px_max",
                )
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                if not raw.startswith(b"YUV4MPEG2"):
                    raise ValueError(
                        "sample_frames_y4m supports YUV4MPEG2 only; "
                        "compressed video needs ffmpeg — use "
                        "sample_frames for opaque bytes"
                    )
                frames, _fn, _fd = decode_y4m(raw)
                n_src = frames.shape[0]
                n_out = min(max_frames, n_src)
                for i in range(n_out):
                    src = i * n_src // n_out
                    px = frames[src].astype(np.int64)
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["src_frame"].append(src)
                    rows["y_sum"].append(int(px[..., 0].sum()))
                    rows["u_sum"].append(int(px[..., 1].sum()))
                    rows["v_sum"].append(int(px[..., 2].sum()))
                    rows["px_min"].append(int(px.min()))
                    rows["px_max"].append(int(px.max()))
            yield pd.DataFrame(rows)

    return media.mapInPandas(op, schema=FRAME_STATS_SCHEMA)


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
                    elif raw[:9] == b"YUV4MPEG2":
                        feats.append(_y4m_pixel_features(decode_y4m(raw)[0]))
                    else:
                        raise ValueError(
                            "real decode supports PPM (P6) images, PCM "
                            "WAV audio, and YUV4MPEG2 video in this "
                            "container; other codecs need PIL/ffmpeg — "
                            "pass decode_stub=True for opaque bytes"
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
