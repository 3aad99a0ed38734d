"""Similarity search over embedding columns (array<float>).

* cosine_topk           — brute-force exact top-k: one pass, pure column
                          expressions (zip_with dot product), broadcast
                          query vector. The correctness baseline; O(n·d).
* hyperplane_signature  — random-hyperplane LSH bit signature (seeded,
                          deterministic) via a vectorized pandas UDF
                          (numpy matmul over Arrow batches).
* ann_lsh_topk          — bucketed ANN: probe only vectors sharing a band
                          with the query, exact-rank the candidates.
                          At 10^10 vectors: signatures are precomputed and
                          bucket-partitioned, so a query touches only its
                          buckets (partition pruning), not the full table.
* ivf_assign/ivf_topk   — IVF-style coarse quantization: assign vectors to
                          nearest of C deterministic centroids (broadcast
                          join, no shuffle of the big side), probe the top-p
                          centroid cells at query time.
* embedding_neardup_pairs — cosine near-dup candidates via shared LSH band
                          + exact cosine verify (dedup use-case).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

logger = logging.getLogger("vuln_datasync_spark.similarity")


def _dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )


def _to_double(a: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double"))


def cosine_sim(a: Column, b: Column) -> Column:
    ad, bd = _to_double(a), _to_double(b)
    return _dot(ad, bd) / (F.sqrt(_dot(ad, ad)) * F.sqrt(_dot(bd, bd)))


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), id_col).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic hyperplanes derived from md5, NOT an RNG: entry
    (i, j) = uniform(-1, 1) from the top 8 bytes of md5('hp:seed:i:j').
    Uniform (instead of gaussian) components still give unbiased random
    hyperplane directions for sign-LSH purposes, and the construction is
    reproducible in ANY engine (the DuckDB oracle recomputes the exact
    same matrix), so the whole ANN path is value-checkable end-to-end."""
    import hashlib

    m = np.empty((dim, n_planes), dtype=np.float64)
    for i in range(dim):
        for j in range(n_planes):
            h = hashlib.md5(f"hp:{seed}:{i}:{j}".encode()).hexdigest()
            m[i, j] = (int(h[:16], 16) / 2.0**64) * 2.0 - 1.0
    return m


def make_signature_udf(dim: int, n_planes: int = 16, seed: int = 42):
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(T.LongType())
    def signature(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())  # (batch, dim) — one matmul per batch
        bits = (m @ planes) > 0
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series(bits @ weights)

    return signature


def hyperplane_signature(
    df: DataFrame, vec_col: str, dim: int, n_planes: int = 16, seed: int = 42
) -> DataFrame:
    sig = make_signature_udf(dim, n_planes, seed)
    return df.withColumn("lsh_sig", sig(F.col(vec_col)))


def _band_cols(sig_col: str, n_planes: int, bands: int) -> list[Column]:
    r = n_planes // bands
    mask = (1 << r) - 1
    return [
        F.shiftright(F.col(sig_col), b * r).bitwiseAND(F.lit(mask)).alias(f"_band{b}")
        for b in range(bands)
    ]


def ann_lsh_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: rank only vectors sharing >=1 LSH band with the
    query. Recall grows with bands; candidates shrink with rows/band."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    qbits = (np.asarray(query_vec) @ planes) > 0
    qsig = int((qbits * (1 << np.arange(n_planes, dtype=np.int64))).sum())
    r = n_planes // bands
    mask = (1 << r) - 1
    with_sig = hyperplane_signature(df, vec_col, dim, n_planes, seed)
    cond = None
    for b in range(bands):
        qband = (qsig >> (b * r)) & mask
        c = (
            F.shiftright(F.col("lsh_sig"), b * r).bitwiseAND(F.lit(mask))
            == F.lit(qband)
        )
        cond = c if cond is None else (cond | c)
    cands = with_sig.filter(cond)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cands.select(
            F.col(id_col), F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine")
        )
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    max_bucket_size: int | None = 2000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-band candidate join +
    exact cosine verification. Never a cross join. ``max_bucket_size``
    bounds hot-bucket fanout (e.g. a mass of zero/constant embeddings
    landing in one sign bucket) exactly like the text dedup operators —
    bounded by default, ``None`` opts out; drops are logged, never
    silent."""
    with_sig = hyperplane_signature(df, vec_col, dim, n_planes, seed).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), "lsh_sig"
    )
    bandcols = _band_cols("lsh_sig", n_planes, bands)
    rows = with_sig.select(
        "_id", "_v", F.posexplode(F.array(*bandcols)).alias("band", "bucket")
    )
    if max_bucket_size is not None:
        from .dedup import _cap_hot_groups

        rows = _cap_hot_groups(
            rows, ["band", "bucket"], max_bucket_size, "embedding_neardup"
        )
    a, b = rows.alias("a"), rows.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._v").alias("va"),
            F.col("b._v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.withColumn("cosine", F.round(cosine_sim("va", "vb"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def query_signature(
    query_vec: list[float], n_planes: int = 16, seed: int = 42
) -> int:
    planes = _hyperplanes(len(query_vec), n_planes, seed)
    qbits = (np.asarray(query_vec, dtype=np.float64) @ planes) > 0
    return int((qbits * (1 << np.arange(n_planes, dtype=np.int64))).sum())


def build_ann_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    out_path: str,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> None:
    """Materialize the LSH signature table, PARTITIONED BY (band, bucket).

    This is the 10^10-vector path: signatures are computed once at ingest
    (one pass over the vectors), and a query then touches only its own
    ``band=*/bucket=*`` directories via partition pruning — file I/O ∝
    candidate count, not table size. Without this, every query recomputes
    signatures over the full table (the r01 ann_lsh_topk weakness).

    A sidecar ``_ids/`` dataset (id, lsh_sig), hash-partitioned on the id
    into ``_N_ID_BUCKETS`` cells, records every id's CURRENT signature —
    ``upsert_ann_index`` reads only the delta's id-hash cells from it to
    locate (and clear) the old copies of re-published ids whose vectors
    changed. The underscore prefix keeps Spark's main-index reads from
    seeing it."""
    with_sig = _with_sig(df, vec_col, id_col, dim, n_planes, seed)
    rows = _index_rows(with_sig, n_planes, bands)
    # one file per (band, bucket) cell at this scale; at 10^10 rows the
    # same layout just has more files per cell
    rows.repartition("band", "bucket").write.partitionBy(
        "band", "bucket"
    ).mode("overwrite").parquet(out_path)
    _sidecar_rows(with_sig).repartition("id_bucket").write.partitionBy(
        "id_bucket"
    ).mode("overwrite").parquet(_sidecar_path(out_path))


_N_ID_BUCKETS = 256


def _sidecar_path(out_path: str) -> str:
    import os

    return os.path.join(out_path, "_ids")


def _with_sig(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    n_planes: int,
    seed: int,
) -> DataFrame:
    return hyperplane_signature(df, vec_col, dim, n_planes, seed).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        "lsh_sig",
    )


def _index_rows(with_sig: DataFrame, n_planes: int, bands: int) -> DataFrame:
    return with_sig.select(
        "id",
        "vec",
        F.posexplode(
            F.array(*_band_cols("lsh_sig", n_planes, bands))
        ).alias("band", "bucket"),
    )


def _sidecar_rows(with_sig: DataFrame) -> DataFrame:
    return with_sig.select(
        "id",
        "lsh_sig",
        F.pmod(F.xxhash64("id"), F.lit(_N_ID_BUCKETS)).alias("id_bucket"),
    )


def upsert_ann_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    out_path: str,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    max_static_filter: int = 100_000,
    delete_ids: DataFrame | None = None,
) -> dict:
    """Incremental index maintenance: fold a delta of vectors into an
    existing index by rewriting ONLY the (band, bucket) partitions the
    delta touches — a streaming corpus never pays a full rebuild
    (reference analog: incremental sync since-watermark,
    /root/reference/sql/vulnerabilities.sql:128-132). Re-published ids
    are replaced within their touched partitions (upsert, not append).

    Plan: signature the delta once (same construction as
    ``build_ann_index``); look up the delta ids' PREVIOUS signatures in
    the ``_ids/`` sidecar reading only their id-hash partitions (a
    re-published vector whose signature changed has stale copies in its
    OLD (band, bucket) cells — cells the new signature alone would never
    visit); take touched = new cells ∪ old cells; read back only those
    partitions (static per-band bucket-IN filters while the touched set
    is collectable, a broadcast join on the partition columns past
    ``max_static_filter`` — runtime DPP prunes directories there);
    anti-join out every copy of the delta's ids; union the delta; write
    with DYNAMIC partition overwrite so untouched partitions' files are
    never rewritten (their bytes stay identical). The sidecar's touched
    id-hash partitions are upserted the same way. The rewrite
    re-coalesces each touched cell — upsert is self-compacting, no
    separate small-file hook needed. I/O ∝ touched-partition volume,
    never table size.

    ``delete_ids`` (a frame whose first column holds ids, e.g. the
    ``delete`` rows of a :meth:`ManifestTable.read_changes` feed)
    removes those ids from the index entirely — their cells are found
    via the sidecar (never a scan) and rewritten without them. Requires
    the sidecar (raises otherwise: without stored signatures a delete
    would need a full index scan)."""
    import glob as _glob

    spark = df.sparkSession
    existing = spark.read.parquet(out_path)
    # a delta with a different element type (float vs double vectors)
    # must not corrupt the index with mixed parquet schemas
    vec_type = existing.schema["vec"].dataType.simpleString()
    with_sig = (
        _with_sig(df, vec_col, id_col, dim, n_planes, seed)
        .withColumn("vec", F.col("vec").cast(vec_type))
        .localCheckpoint(eager=True)
    )  # delta signatures computed once: index rows, sidecar, old-sig probe
    new_rows = _index_rows(with_sig, n_planes, bands)
    new_sidecar = _sidecar_rows(with_sig)
    delta_ids = with_sig.select("id").distinct()

    side_path = _sidecar_path(out_path)
    have_sidecar = bool(_glob.glob(f"{side_path}/id_bucket=*"))
    drop_ids = None
    if delete_ids is not None:
        if not have_sidecar:
            raise ValueError(
                "upsert_ann_index: delete_ids requires the _ids sidecar "
                "(rebuild the index to get one) — without stored "
                "signatures a delete would need a full index scan"
            )
        id_type = existing.schema["id"].dataType
        drop_ids = (
            delete_ids.select(
                F.col(delete_ids.columns[0]).cast(id_type).alias("id")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
    # every id being replaced OR removed must vanish from its old cells
    all_ids = (
        delta_ids
        if drop_ids is None
        else delta_ids.unionByName(drop_ids).distinct()
    )

    # previous signatures of re-published/deleted ids — read ONLY those
    # ids' id-hash cells of the sidecar
    old_cells = None
    touched_id_buckets: list[int] = []
    if have_sidecar:
        bucket_src = new_sidecar.select("id_bucket")
        if drop_ids is not None:
            bucket_src = bucket_src.unionByName(
                drop_ids.select(
                    F.pmod(F.xxhash64("id"), F.lit(_N_ID_BUCKETS)).alias(
                        "id_bucket"
                    )
                )
            )
        touched_id_buckets = sorted(
            r["id_bucket"] for r in bucket_src.distinct().collect()
        )
        side = spark.read.parquet(side_path).filter(
            F.col("id_bucket").isin(touched_id_buckets)
        )
        old_sigs = side.join(all_ids, "id", "left_semi")
        old_cells = old_sigs.select(
            F.posexplode(
                F.array(*_band_cols("lsh_sig", n_planes, bands))
            ).alias("band", "bucket")
        )
    else:
        logger.warning(
            "upsert_ann_index: %s has no _ids sidecar (pre-sidecar build?) "
            "— re-published ids with changed vectors may leave stale "
            "copies in their old cells; rebuild to get full upsert "
            "semantics",
            out_path,
        )

    cells = new_rows.select("band", "bucket")
    if old_cells is not None:
        cells = cells.unionByName(old_cells)
    touched = [
        (r["band"], r["bucket"]) for r in cells.distinct().collect()
    ]
    if len(touched) <= max_static_filter:
        by_band: dict[int, list[int]] = {}
        for band, bucket in touched:
            by_band.setdefault(band, []).append(bucket)
        cond = None
        for band, buckets in sorted(by_band.items()):
            c = (F.col("band") == band) & F.col("bucket").isin(buckets)
            cond = c if cond is None else (cond | c)
        existing = existing.filter(cond)
    else:
        tdf = cells.distinct()
        existing = existing.join(F.broadcast(tdf), ["band", "bucket"])
    kept = existing.join(all_ids, "id", "left_anti").select(
        "id", "vec", "band", "bucket"
    )
    merged = (
        kept.unionByName(new_rows.select("id", "vec", "band", "bucket"))
        # break the read-path dependency: the write below overwrites
        # partitions this plan reads
        .localCheckpoint(eager=True)
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.repartition("band", "bucket").write.partitionBy(
            "band", "bucket"
        ).mode("overwrite").parquet(out_path)
        # dynamic overwrite only replaces partitions PRESENT in the written
        # data: a touched cell whose only rows belonged to re-published ids
        # ends up with zero merged rows and its old file would survive,
        # leaving a stale copy. Clear those cells explicitly. Cell count is
        # structurally bounded (bands × 2^(n_planes/bands)), so collecting
        # the present set is always driver-safe.
        import glob as _g
        import os as _os
        import shutil as _sh

        present = {
            (r["band"], r["bucket"])
            for r in merged.select("band", "bucket").distinct().collect()
        }
        for band, bucket in set(touched) - present:
            cell = _os.path.join(out_path, f"band={band}", f"bucket={bucket}")
            if _g.glob(_os.path.join(cell, "*")):
                _sh.rmtree(cell, ignore_errors=True)
        if have_sidecar:
            side_kept = (
                spark.read.parquet(side_path)
                .filter(F.col("id_bucket").isin(touched_id_buckets))
                .join(all_ids, "id", "left_anti")
            )
            side_merged = side_kept.unionByName(
                new_sidecar
            ).localCheckpoint(eager=True)
            side_merged.repartition("id_bucket").write.partitionBy(
                "id_bucket"
            ).mode("overwrite").parquet(side_path)
            # same vacated-partition rule as the index cells: dynamic
            # overwrite skips an id_bucket whose rows all belonged to
            # deleted ids — clear it so their sidecar entries don't
            # survive (bounded: <= _N_ID_BUCKETS dirs)
            present_sb = {
                r["id_bucket"]
                for r in side_merged.select("id_bucket").distinct().collect()
            }
            for sb in set(touched_id_buckets) - present_sb:
                cell = _os.path.join(side_path, f"id_bucket={sb}")
                if _g.glob(_os.path.join(cell, "*")):
                    _sh.rmtree(cell, ignore_errors=True)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {
        "touched_partitions": len(touched),
        "touched_id_buckets": len(touched_id_buckets),
        "deleted_ids": drop_ids.count() if drop_ids is not None else 0,
    }


def ann_index_topk(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k against a prebuilt index: read ONLY the query's
    band/bucket partitions (pushed partition filters -> directory pruning),
    dedup candidates, exact-rank by cosine."""
    qsig = query_signature(query_vec, n_planes, seed)
    r = n_planes // bands
    mask = (1 << r) - 1
    cond = None
    for b in range(bands):
        c = (F.col("band") == b) & (F.col("bucket") == ((qsig >> (b * r)) & mask))
        cond = c if cond is None else (cond | c)
    idx = spark.read.parquet(index_path).filter(cond)
    cands = idx.select("id", "vec").dropDuplicates(["id"])
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cands.select(
            F.col("id"), F.round(cosine_sim(F.col("vec"), q), 6).alias("cosine")
        )
        .orderBy(F.desc("cosine"), "id")
        .limit(k)
    )


def ivf_assign(
    df: DataFrame, vec_col: str, id_col: str, centroids: list[list[float]]
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse cell) via a
    broadcast of the (tiny) centroid table — big side never shuffles."""
    cent = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    best = F.array_position(
        F.transform(cent, lambda c: F.round(cosine_sim(F.col(vec_col), c), 9)),
        F.array_max(
            F.transform(cent, lambda c: F.round(cosine_sim(F.col(vec_col), c), 9))
        ),
    )
    return df.withColumn("ivf_cell", (best - 1).cast("int"))


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """Probe the n_probe nearest centroid cells only, exact-rank inside."""
    qv = np.asarray(query_vec, dtype=np.float64)
    cents = np.asarray(centroids, dtype=np.float64)
    sims = (cents @ qv) / (
        np.linalg.norm(cents, axis=1) * np.linalg.norm(qv) + 1e-12
    )
    probe = [int(i) for i in np.argsort(-sims)[:n_probe]]
    assigned = ivf_assign(df, vec_col, id_col, centroids)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.filter(F.col("ivf_cell").isin(probe))
        .select(
            F.col(id_col), F.round(cosine_sim(F.col(vec_col), q), 6).alias("cosine")
        )
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Symmetric int8 quantization per vector: scale = max|v| / 127,
    q_i = floor(v_i / scale + 0.5) — shrinks ANN index storage ~4x
    (float32 -> int8 + one double scale) with cosine rank preserved to
    ~1e-2, the standard payload trim before a 10^10-vector index.

    Returns (id_col, *keep_cols, scale double, qvec array<int>). An
    all-zero (or null) vector gets scale 0.0 / null qvec.

    The rounding is spelled floor(x + 0.5) rather than round() and the
    arithmetic runs in a fixed order (cast to double, divide by the
    precomputed scale) so the result is bit-identical in any IEEE-754
    engine — this keeps the op value-checkable against a SQL oracle.
    Plan: pure per-row array exprs (transform/array_max) — map-only,
    whole-stage codegen, no shuffle, no Python."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, F.abs))
    scale = (maxabs / F.lit(127.0)).alias("scale")
    qvec = F.when(
        maxabs > 0,
        F.transform(
            v,
            lambda x: F.floor(x / (maxabs / F.lit(127.0)) + F.lit(0.5)).cast(
                "int"
            ),
        ),
    ).alias("qvec")
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.coalesce(scale, F.lit(0.0)).alias("scale"),
        qvec,
    )


def dequantize_embeddings(
    df: DataFrame, qvec_col: str = "qvec", scale_col: str = "scale"
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: v_i ≈ q_i * scale, as
    array<double> in a ``vec`` column (max abs error ≤ scale / 2)."""
    return df.withColumn(
        "vec",
        F.transform(
            F.col(qvec_col),
            lambda q: q.cast("double") * F.col(scale_col),
        ),
    )
