"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` operators.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_stub=True`` (default) produces deterministic fake
features from the bytes; ``decode_stub=False`` raises NotImplementedError
where a real decoder (PIL/ffmpeg/torchaudio) would plug in. Everything
around the stub — schema, Arrow batch shape, partitioning, UDF signatures —
is real and tested.

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
    """Per-item feature extraction over Arrow batches (mapInPandas)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this "
                    "container; pass decode_stub=True"
                )
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": content.str.len().astype("int64"),
                    "content_md5": [
                        hashlib.md5(c).hexdigest() for c in content
                    ],
                    "feat": [
                        _fake_decode_features(bytes(c), n_dims) for c in content
                    ],
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

    The actual resample is STUBBED like the decoder (``decode_stub=True``
    derives the new payload deterministically from an md5 chain over the
    original bytes; ``False`` raises where PIL/ffmpeg would plug in) —
    the real parts are the Arrow batch shape, the size arithmetic, and
    the metadata rewrite, all of which survive a swap to a real codec.
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
            if not decode_stub:
                raise NotImplementedError(
                    "real media resize requires PIL/ffmpeg — not in this "
                    "container; pass decode_stub=True"
                )
            metas = pdf["meta"]
            contents, ws, hs = [], [], []
            for content, meta in zip(pdf["content"], metas):
                raw = bytes(content)
                src_area = max(1, int(meta["width"]) * int(meta["height"]))
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
