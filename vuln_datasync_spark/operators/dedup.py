"""Deduplication operators for training-data pipelines.

All distributed-first: candidate generation is always a bucket/band
equi-join (shuffle on small keys), never an O(n²) cross join; exact
verification runs only on candidate pairs. Scale notes per operator.

* exact_dedup        — hash-groupBy on sha256(content); map-side combine,
                       one shuffle on the hash.
* minhash_signature / minhash_lsh_candidates — shingle -> k minhashes ->
  band buckets -> self-join on (band, bucket). md5-based hashes so the
  result is bit-reproducible in any engine (oracle-checkable).
* ngram_jaccard_pairs — exact Jaccard via shingle explode + equi-join on
  shingle + count agg (the scalable set-similarity join), NOT pairwise.
* simhash_pairs      — 64-bit simhash via a vectorized pandas UDF (numpy
  bit ops over Arrow batches), banded into 4x16-bit chunks for candidate
  join, verified with bit_count(xor) <= k.
* embedding_neardup_pairs — cosine near-duplicates via random-hyperplane
  LSH signs (see similarity.py) + exact cosine verify on candidates.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import shingles_of_lowered

logger = logging.getLogger("vuln_datasync_spark.dedup")

# hot-group key sets up to this size are collected + broadcast as a
# literal frame; beyond it the anti-join stays distributed (a shingle-df
# cap on a web corpus flags millions of common n-grams — never driver-safe)
_COLLECT_LIMIT = 20_000


def _cap_hot_groups(
    rows: DataFrame, group_cols: list[str], cap: int, what: str
) -> DataFrame:
    """Drop entire groups whose row count exceeds ``cap`` before any
    pairwise join — the ONE quadratic term in banded dedup is a hot
    bucket/shingle (boilerplate shared by 10^6 docs makes its band-join
    quadratic in that frequency). Whole-group drop keeps the result
    deterministic (no sampling), and the drop volume is logged — never a
    silent truncation.

    Cost shape: the hot-group keys are fetched in ONE driver action —
    ``hot.limit(_COLLECT_LIMIT + 1).collect()`` — which doubles as the
    stats source (group count + dropped-row volume derive from the
    collected rows), so honest accounting costs exactly one upstream
    execution, the documented price of the default-on caps. When nothing
    exceeds the cap (the common case) the input is returned untouched with
    NO extra join in the plan. A SMALL hot set (LSH band buckets — only
    boilerplate families overflow) is anti-joined back as a broadcast
    LITERAL frame, so no cached DataFrame lingers in the session. A LARGE
    hot set (shingle document frequency on a web corpus: every common
    n-gram can exceed the cap, millions of keys) must never be collected —
    past ``_COLLECT_LIMIT`` hot keys the anti-join stays DISTRIBUTED
    (shuffle on the same group keys the caller's own join uses) and only
    then does an aggregate-only stats action pay a second execution. The
    ok-side group counts (∝ vocabulary) are never materialized."""
    hot = (
        rows.groupBy(*group_cols)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > cap)
    )
    hot_rows = hot.limit(_COLLECT_LIMIT + 1).collect()
    if not hot_rows:
        return rows
    if len(hot_rows) <= _COLLECT_LIMIT:
        groups = len(hot_rows)
        dropped = sum(r["_n"] for r in hot_rows)
    else:
        stats = hot.agg(
            F.count("*").alias("groups"),
            F.coalesce(F.sum("_n"), F.lit(0)).alias("rows"),
        ).head()
        groups, dropped = stats["groups"], stats["rows"]
    logger.warning(
        "%s: dropping %d hot %s groups (%d member rows) over cap %d "
        "— near-dup pairs inside them are NOT reported",
        what,
        groups,
        "/".join(group_cols),
        dropped,
        cap,
    )
    if groups <= _COLLECT_LIMIT:
        hot_df = rows.sparkSession.createDataFrame(
            [[r[c] for c in group_cols] for r in hot_rows],
            rows.select(*group_cols).schema,
        )
        return rows.join(F.broadcast(hot_df), group_cols, "left_anti")
    return rows.join(hot.drop("_n"), group_cols, "left_anti")


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep one row (min id) per exact content hash — hash-groupBy, one
    shuffle (reference analog: data_hash probe J4,
    /root/reference/sql/vulnerabilities.sql:34-35)."""
    h = F.sha2(F.col(content_col), 256)
    keep = (
        df.withColumn("_h", h)
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col))
        .drop("_h")
    )
    return df.join(keep, id_col, "left_semi")


def minhash_expr(shingles: Column, i: int) -> Column:
    """Minhash #i = min md5 over salted shingles (hex-string min — totally
    ordered, engine-portable)."""
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(s, F.lit(f":{i}"))))
    )


def minhash_signature(
    df: DataFrame, text_col: str, k: int = 8, shingle_k: int = 5
) -> DataFrame:
    # Materialize lower(text) and then the shingle array in their OWN
    # projections before the k minhash lanes reference them. Inlining
    # char_shingles into each lane duplicates the whole shingle
    # construction k times in the generated code (Catalyst does not
    # subexpression-eliminate across the array() elements), and a
    # lower() captured inside the transform lambda is re-evaluated per
    # shingle position. Measured (5k docs, local[32]): 0.24s inlined vs
    # 0.15s projected steady-state, ~2s vs 0.2s on a cold JVM where
    # janino also compiles the k copies.
    return (
        df.withColumn("_sh_low", F.lower(F.col(text_col)))
        .withColumn("_sh", shingles_of_lowered(F.col("_sh_low"), shingle_k))
        .withColumn(
            "minhash",
            F.array(*[minhash_expr(F.col("_sh"), i) for i in range(k)]),
        )
        .drop("_sh_low", "_sh")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    bands: int = 4,
    shingle_k: int = 5,
    max_bucket_size: int | None = 2000,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band bucket.
    Returns (id_a, id_b, est_jaccard) with id_a < id_b.

    Scale: explode to (band, bucket) rows -> shuffle on the bucket key ->
    within-bucket pairing. Hot buckets (boilerplate text) are the skew
    risk — ``max_bucket_size`` drops whole buckets above the cap BEFORE
    pairing (bounding the join at cap² per bucket) and logs the dropped
    volume. Bounded is the DEFAULT (a bucket of thousands is boilerplate,
    not near-duplication worth pairing); pass ``None`` to explicitly opt
    out of the cap.
    """
    r = k // bands
    # The signature frame (k md5s over every shingle — the expensive part
    # of this operator) feeds FOUR separately-compiled plan branches: the
    # band join's two sides, the hot-group cap action, and est_jaccard's
    # sa/sb lookups. localCheckpoint materializes it ONCE (narrow: id +
    # k 32-char hashes, ∝ doc count not text bytes) so no branch replays
    # the shingle/md5 work; blocks are reclaimed by the ContextCleaner
    # when the caller drops the result (unlike persist(), nothing stays
    # pinned in the cache manager).
    sig = (
        minhash_signature(df, text_col, k, shingle_k)
        .select(F.col(id_col).alias("_id"), "minhash")
        .localCheckpoint(eager=True)
    )
    band_rows = sig.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|", *[F.col("minhash")[b * r + j] for j in range(r)]
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    if max_bucket_size is not None:
        band_rows = _cap_hot_groups(
            band_rows, ["band", "bucket"], max_bucket_size, "minhash_lsh"
        )
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    # estimated Jaccard = fraction of matching minhashes
    sa = sig.select(F.col("_id").alias("id_a"), F.col("minhash").alias("mh_a"))
    sb = sig.select(F.col("_id").alias("id_b"), F.col("minhash").alias("mh_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(
                    F.filter(
                        F.zip_with("mh_a", "mh_b", lambda x, y: x == y),
                        lambda m: m,
                    )
                )
                / F.lit(float(k)),
                4,
            ).alias("est_jaccard"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 5,
    threshold: float = 0.5,
    max_shingle_df: int | None = 2000,
) -> DataFrame:
    """EXACT Jaccard similarity join: explode distinct shingles, equi-join
    on shingle, |A∩B| via count, |A∪B| = |A|+|B|-|A∩B|. One shuffle on the
    shingle key + one on the pair key — no cross join anywhere.

    ``max_shingle_df`` caps shingle document frequency: a 5-gram shared by
    10^6 docs would make the self-join quadratic in that frequency. Capped
    shingles are removed from the JOIN only — set sizes |A|,|B| still count
    them, so reported Jaccard becomes a LOWER bound for pairs whose overlap
    leaned on boilerplate (the right direction for dedup precision); pairs
    that only share capped shingles are not reported, and the dropped
    volume is logged. Bounded is the DEFAULT; pass ``None`` to opt out.
    """
    # The exploded shingle frame feeds THREE separately-compiled plan
    # branches: the hot-shingle cap action and both self-join sides. Same
    # fix as minhash_lsh_candidates' signature frame above: materialize it
    # ONCE with localCheckpoint so the shingle explode doesn't replay ~3x.
    # lower(text) projected before the shingle transform references it —
    # a captured lower() re-evaluates per shingle position (see
    # shingles_of_lowered)
    low = df.select(
        F.col(id_col).alias("_id"),
        F.lower(F.col(text_col)).alias("_low"),
    )
    sh = low.select(
        "_id",
        F.explode(shingles_of_lowered(F.col("_low"), shingle_k)).alias("s"),
    ).localCheckpoint(eager=True)
    # |A| per doc straight off the (distinct-element) shingle array — no
    # explode, no groupBy shuffle, one fewer execution of the upstream
    sizes = low.select(
        "_id",
        F.size(shingles_of_lowered(F.col("_low"), shingle_k)).alias("n"),
    )
    if max_shingle_df is not None:
        sh = _cap_hot_groups(sh, ["s"], max_shingle_df, "ngram_jaccard")
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    na = sizes.select(F.col("_id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("_id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        common.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def verify_pairs_editdist(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str,
    id_col: str,
    max_ratio: float = 0.2,
    max_chars: int = 2000,
) -> DataFrame:
    """EXACT verification of near-dup candidate pairs by normalized
    Levenshtein distance — the precision gate after a banded recall pass
    (minhash/simhash/ngram candidates chain templated docs; edit distance
    is the classic final verdict a takedown/dedup pipeline wants).

    Returns (id_a, id_b, edit_dist, edit_ratio) for pairs with
    ``edit_ratio = dist / max(len_a, len_b) <= max_ratio``. Runs on the
    JVM built-in ``levenshtein`` (whole-stage codegen, no Python).

    Scale: cost is O(len_a * len_b) PER PAIR — quadratic in text length,
    linear in pair count. ``max_chars`` truncates both sides first (a
    2000-char prefix decides near-duplication for real documents at a
    bounded cost; pass None only for short-text corpora). The join
    fetches each side's text by id (shuffle ∝ pairs + docs), never a
    cross join — candidates must come from a banded pass, not from
    pairing everything."""
    t = F.col(text_col)
    if max_chars is not None:
        t = F.substring(t, 1, max_chars)
    a = docs.select(F.col(id_col).alias("id_a"), t.alias("_ta"))
    b = docs.select(F.col(id_col).alias("id_b"), t.alias("_tb"))
    j = pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
    if max_chars is not None:
        # banded DP early-exit: any pair that can pass the ratio filter
        # has dist <= max_ratio * max(len) <= max_ratio * max_chars, so
        # a threshold at that bound (+ rounding slack: the filter is on
        # round(ratio, 4), which admits dist/mx up to max_ratio + 5e-5)
        # changes NO retained row while cutting the per-pair cost from
        # O(len^2) to O(threshold * len). levenshtein returns -1 past
        # the threshold — those pairs must be dropped explicitly, else
        # -1 <= max_ratio would wrongly admit them.
        import math

        thresh = int(math.ceil((max_ratio + 1e-4) * max_chars))
        dist = F.levenshtein("_ta", "_tb", max(thresh, 1))
        keep = F.col("edit_dist") >= 0
    else:
        dist = F.levenshtein("_ta", "_tb")
        keep = F.lit(True)
    ratio = dist / F.greatest(
        F.greatest(F.length("_ta"), F.length("_tb")), F.lit(1)
    )
    return (
        j.select(
            "id_a",
            "id_b",
            dist.alias("edit_dist"),
            F.round(ratio, 4).alias("edit_ratio"),
        )
        .filter(keep & (F.col("edit_ratio") <= max_ratio))
    )


@F.pandas_udf(T.LongType())
def simhash64_udf(text: pd.Series) -> pd.Series:
    """64-bit simhash over whitespace tokens; md5-derived token hashes so
    the result is deterministic everywhere. Vectorized numpy bit-count per
    Arrow batch (no per-row Python beyond the tokenizer)."""
    out = np.zeros(len(text), dtype=np.int64)
    for row_i, t in enumerate(text.fillna("")):
        toks = t.lower().split()
        if not toks:
            continue
        hashes = np.fromiter(
            (
                int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
                for tok in toks
            ),
            dtype=np.uint64,
            count=len(toks),
        )
        bits = (hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1
        maj = (bits.sum(axis=0) * 2 >= len(toks)).astype(np.uint64)
        out[row_i] = (maj << np.arange(64, dtype=np.uint64)).sum().astype(np.int64)
    return pd.Series(out)


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    max_bucket_size: int | None = 2000,
) -> DataFrame:
    """Near-dup pairs by simhash: band the 64-bit hash into 4x16-bit chunks
    (pigeonhole: hamming<=3 pairs share at least one chunk), join on
    (chunk_idx, chunk), verify with bit_count(xor). ``max_bucket_size``
    bounds hot-chunk fanout exactly like minhash_lsh_candidates (bounded
    by default; ``None`` opts out)."""
    # the pandas-UDF hash feeds the cap action and both join sides —
    # materialize once (narrow: id + one long per doc)
    sig = df.select(
        F.col(id_col).alias("_id"), simhash64_udf(F.col(text_col)).alias("sh")
    ).localCheckpoint(eager=True)
    chunks = sig.select(
        "_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("sh", i * 16).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    if max_bucket_size is not None:
        chunks = _cap_hot_groups(
            chunks, ["chunk_idx", "chunk"], max_bucket_size, "simhash"
        )
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    all_ids: DataFrame | None = None,
    id_col: str = "id",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over near-dup candidate pairs — the step that
    turns pairwise candidates (minhash_lsh_candidates / simhash_pairs /
    ngram_jaccard_pairs / embedding_neardup_pairs output) into actionable
    dedup CLUSTERS: every transitively-connected group gets one
    ``cluster_id`` (the min member id) and one canonical keeper
    (``is_keeper`` = the member equal to the cluster id). Near-duplication
    is not transitive, but dedup policy must be — A~B and B~C means
    keeping one of {A, B, C} (the reference's serial alias-closure has the
    same shape for advisories, /root/reference/internal/merger/
    merger.go:74-105; this is its similarity-pairs analog).

    ``all_ids`` (a frame bearing ``id_col``) adds unpaired docs as
    singleton clusters so the output is a complete keep/drop verdict per
    document, not just for paired ones.

    Plan: min-label propagation over the symmetric pair graph — per
    iteration ONE equi-join (neighbor labels, shuffle on the id key) +
    one groupBy min + the convergence count folded into the action that
    materializes the iteration's cache (same construction as
    merge.alias_components). State is O(#docs) labels, never O(pairs²);
    converges in component-diameter iterations (near-dup families are
    dense — 1-2 in practice), ``max_iters`` bounds the worst case.
    Returns (``id_col``, cluster_id, is_keeper), localCheckpoint-ed so
    downstream consumers replay nothing of the loop."""
    edges = pairs.select(
        F.col(id_a).alias("_src"), F.col(id_b).alias("_dst")
    )
    edges = (
        edges.unionByName(
            edges.select(
                F.col("_dst").alias("_src"), F.col("_src").alias("_dst")
            )
        )
        .dropDuplicates(["_src", "_dst"])
        .persist()
    )
    nodes = edges.select(F.col("_src").alias("_id"))
    if all_ids is not None:
        nodes = nodes.unionByName(
            all_ids.select(F.col(id_col).alias("_id"))
        )
    labels = (
        nodes.distinct().select("_id", F.col("_id").alias("_lbl")).persist()
    )
    iters = 0
    for iters in range(1, max_iters + 1):
        neigh = (
            edges.join(labels, edges["_dst"] == labels["_id"])
            .groupBy("_src")
            .agg(F.min("_lbl").alias("_nlbl"))
        )
        new_labels = (
            labels.join(neigh, labels["_id"] == neigh["_src"], "left")
            .select(
                "_id",
                F.least("_lbl", "_nlbl").alias("_lbl"),
                (F.col("_nlbl") < F.col("_lbl")).alias("_chg"),
            )
            .persist()
        )
        changed = new_labels.filter(F.col("_chg")).count()
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        logger.warning(
            "dedup_clusters: did not converge in %d iterations — "
            "components deeper than that remain split",
            max_iters,
        )
    logger.info("dedup_clusters: converged after %d iterations", iters)
    out = labels.select(
        F.col("_id").alias(id_col),
        F.col("_lbl").alias("cluster_id"),
        (F.col("_id") == F.col("_lbl")).alias("is_keeper"),
    ).localCheckpoint(eager=True)
    labels.unpersist()
    edges.unpersist()
    return out
