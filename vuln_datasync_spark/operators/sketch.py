"""Bounded-state sketch operators: deterministic distinct-count (KMV)
and exact heavy hitters (Misra-Gries candidates + exact recount).

Both implement the same 100 TB pattern the rest of the engine leans on:
a per-partition pass with O(k) state (Arrow-batched ``mapInPandas``, so
the Python side sees columnar batches, never rows) followed by a global
phase whose input is ∝ partitions x k — NOT ∝ rows or ∝ distinct keys.
A plain ``groupBy(key).count()`` shuffles one record per distinct key;
when the key space is the row space (tokens, n-grams, URLs across a
100 TB corpus) that shuffle is the job. These operators bound it.

* kmv_distinct     — K-minimum-values distinct-count estimate per group.
                     Hashes are md5-derived (deterministic, engine-
                     portable: the SQL oracle reproduces the estimate
                     bit-for-bit), per-partition state is the k smallest
                     distinct hashes per group, the global merge ranks
                     <= partitions*k candidate rows. Relative error
                     ~ 1/sqrt(k-2). Exact (not estimated) whenever the
                     true distinct count < k. Mergeable by construction:
                     unioning candidate sets of two runs and re-ranking
                     is the sketch union, so incremental maintenance
                     from a CDC feed needs no rescan.
                     Reference analog: the per-source distinct-vuln
                     dashboards (sql/vulnerabilities.sql:105-126) that a
                     full GROUP BY could not serve at log scale.
* frequent_items   — EXACT frequent keys (count >= min_count) in two
                     bounded passes: per-partition Misra-Gries summaries
                     of ``capacity`` counters emit a candidate superset
                     (guaranteed complete when min_count > N/(capacity+1)
                     — the guard is enforced IN-PLAN via assert_true, so
                     an under-provisioned capacity fails loudly instead
                     of silently dropping keys), then a semi-join +
                     exact recount of candidates only. Output is exact
                     and deterministic even though the candidate sets
                     are partitioning-dependent.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# 15 hex chars of md5 -> 60-bit non-negative int; fits a BIGINT in every
# engine and survives exact double conversion checks (2^60 scale factor
# is a power of two, so (k-1)*SCALE is exact in IEEE double for k <= 2^6)
_HEX_CHARS = 15
_SCALE = float(16 ** _HEX_CHARS)  # 2^60


def _h60(col) -> F.Column:
    """md5-derived 60-bit hash, identical to the SQL idiom
    CAST(concat('0x', substring(md5(v),1,15)) AS UBIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, _HEX_CHARS), 16, 10).cast(
        "long"
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Distinct-count estimate of ``value_col`` per ``group_cols``.

    Returns one row per group: group_cols + ``est_distinct`` (BIGINT).
    Estimate = floor((k-1) * 2^60 / h_k) where h_k is the k-th smallest
    distinct 60-bit hash; exact count when fewer than k distinct values
    exist. NULL values are ignored (COUNT(DISTINCT ...) semantics).

    Plan: hash JVM-side (md5 + conv, codegen), one Arrow mapInPandas
    pass holding k smallest distinct hashes per group per partition,
    then a global rank over <= partitions*k*groups candidate rows. The
    only shuffle is the candidate frame — bytes ∝ k, never ∝ distinct.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    gc = list(group_cols)
    ranked = _kmv_ranked(kmv_candidates(df, gc, value_col, k), gc)
    return (
        ranked.filter(F.col("_rn") == F.least(F.col("_nd"), F.lit(k)))
        .select(*gc, _kmv_est_col(k).alias("est_distinct"))
    )


def _kmv_ranked(cand: DataFrame, gc: list[str]) -> DataFrame:
    """Global rank of the distinct candidate hashes per group (candidate
    frame only — bytes ∝ partitions*k, never ∝ distinct)."""
    distinct = cand.groupBy(*gc, "_h").agg(F.lit(1).alias("_one")).drop(
        "_one"
    )
    w = W.partitionBy(*gc).orderBy("_h")
    return distinct.select(
        *gc,
        "_h",
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(W.partitionBy(*gc)).alias("_nd"),
    )


def _kmv_est_col(k: int) -> F.Column:
    """Estimate from the row holding the least(nd, k)-th smallest hash."""
    return (
        F.when(F.col("_nd") < k, F.col("_nd"))
        .otherwise(
            F.floor(
                F.lit(float(k - 1) * _SCALE) / F.col("_h").cast("double")
            )
        )
        .cast("long")
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Materialized MERGEABLE sketch: one row per group with ``hashes`` =
    the sorted k smallest distinct 60-bit hashes (array<long>, shorter
    when the group has fewer distinct values) and ``k``.

    This is the segment-sketch half of the 100 TB pattern: compute one
    sketch per partition/day/source ONCE, persist the tiny rows, and
    answer distinct-count questions over ANY union of segments later
    via :func:`kmv_merge_estimate` — no rescan of the data. Merge is
    EXACT sketch algebra, not an approximation of an approximation: a
    hash among the k smallest of a union is necessarily among the k
    smallest of its own segment, so re-ranking the unioned sketch arrays
    reproduces the sketch of the unioned DATA bit-for-bit.

    ``group_cols=[]`` produces a single global sketch row.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    gc = list(group_cols)
    ranked = _kmv_ranked(
        kmv_candidates(df, gc, value_col, k), gc
    ).filter(F.col("_rn") <= k)
    return ranked.groupBy(*gc).agg(
        F.array_sort(F.collect_list("_h")).alias("hashes"),
        F.lit(k).alias("k"),
    )


def kmv_candidates(
    df: DataFrame, gc: list[str], value_col: str, k: int
) -> DataFrame:
    """Internal: the bounded per-partition candidate pass shared by
    kmv_distinct and kmv_sketch (k smallest distinct hashes per group
    per partition)."""
    # route through kmv_distinct's generator by rebuilding its inputs —
    # kept as a thin seam so both public ops stay plan-identical
    hashed = df.select(
        *gc, _h60(F.col(value_col).cast("string")).alias("_h")
    ).filter(F.col("_h").isNotNull())
    fields = [hashed.schema[c] for c in gc]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in fields]
        + ["_h long"]
    )
    kk = k

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        state: dict[tuple, "np.ndarray"] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            # global sketch (no group cols): the whole batch is one group
            groups = (
                pdf.groupby(gc, dropna=False, sort=False)
                if gc
                else [((), pdf)]
            )
            for key, g in groups:
                key = key if isinstance(key, tuple) else (key,)
                hs = g["_h"].to_numpy(dtype="int64")
                cur = state.get(key)
                merged = np.unique(
                    hs if cur is None else np.concatenate([cur, hs])
                )
                state[key] = merged[:kk]
        if not state:
            return
        keys = list(state)
        yield pd.DataFrame(
            [k_ + (int(h),) for k_ in keys for h in state[k_]],
            columns=gc + ["_h"],
        )

    return hashed.mapInPandas(gen, out_schema)


def kmv_merge_estimate(
    sketches: DataFrame,
    k: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Distinct-count estimate over a UNION of segments from their
    persisted sketches alone (``hashes`` array rows from
    :func:`kmv_sketch`) — zero data rescan, input bytes ∝ segments*k.

    ``group_cols=None`` merges everything into one global row
    (``est_distinct`` only); otherwise one row per residual group (e.g.
    sketches per (day, event_type) merged over days -> per event_type).
    Intersection estimates follow by inclusion-exclusion on these
    outputs: |A ∩ B| ≈ est(A) + est(B) - est(A ∪ B)."""
    gc = list(group_cols or [])
    exploded = sketches.select(
        *gc, F.explode("hashes").alias("_h")
    )
    ranked = _kmv_ranked(exploded, gc)
    out = ranked.filter(
        F.col("_rn") == F.least(F.col("_nd"), F.lit(k))
    ).select(*gc, _kmv_est_col(k).alias("est_distinct"))
    return out


def frequent_items(
    df: DataFrame,
    key_col: str,
    min_count: int,
    capacity: int = 4096,
) -> DataFrame:
    """EXACT keys with count >= ``min_count`` as (key, cnt).

    Two passes over ``df``: (1) per-partition Misra-Gries summaries with
    ``capacity`` counters emit a candidate superset plus the partition's
    row count; (2) candidates are exactly recounted via a semi-join.
    Completeness holds iff min_count > N/(capacity+1); the inequality is
    checked IN the plan (assert_true over the phase-1 row totals), so an
    undersized capacity aborts the job rather than silently truncating.

    Shuffles: candidates (<= partitions*capacity rows) + the recount of
    candidate-key rows only (map-side combined). Never ∝ distinct keys.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    keyed = df.select(F.col(key_col).cast("string").alias("_key")).filter(
        F.col("_key").isNotNull()
    )
    cap = capacity

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: "pd.Series | None" = None
        n_rows = 0
        for pdf in batches:
            if pdf.empty:
                continue
            n_rows += len(pdf)
            vc = pdf["_key"].value_counts()
            counters = vc if counters is None else counters.add(
                vc, fill_value=0
            )
            if len(counters) > cap:
                # batched Misra-Gries: subtract the (cap+1)-th largest
                # count from everyone, drop the non-positive. Each unit
                # subtracted from a key is matched by >= cap other
                # decrements, so total per-key error <= N_p/(cap+1).
                thresh = counters.nlargest(cap + 1).iloc[-1]
                counters = counters - thresh
                counters = counters[counters > 0]
        out = pd.DataFrame(
            {
                "_key": ([] if counters is None else list(counters.index))
                + [None],
                "_pn": ([0] * (0 if counters is None else len(counters)))
                + [n_rows],
            }
        )
        yield out

    phase1 = keyed.mapInPandas(gen, "_key string, _pn long")
    # in-plan completeness guard: min_count > N/(capacity+1). It rides
    # the CANDIDATE union (a 0-row branch whose filter must evaluate
    # assert_true to learn its cardinality), NOT a crossJoin against the
    # output — an adversarially uniform key distribution can leave the
    # candidate set (and hence the output) EMPTY, and AQE's
    # empty-relation propagation would eliminate a join against it
    # without ever evaluating the guard: a silent wrong answer in
    # exactly the under-capacity regime the guard exists to catch.
    # Careful construction — two optimizer rules can silently DELETE a
    # side-effecting check: (a) assert_true is NullType-typed, so
    # IsNull/IsNotNull over it folds statically without evaluation;
    # (b) a union branch whose key is a null/constant literal gets the
    # join-inferred isnotnull(_key) filter constant-folded to false and
    # the whole branch (raise_error included) pruned. So the guard
    # emits ONE candidate row whose VALUE is computed from the check
    # (non-foldable), and a capacity violation raises while computing
    # it. The sentinel key matches no input row in the semi-join (and
    # if a pathological corpus does contain it, counting that key is
    # simply correct), so results are unchanged.
    total = phase1.agg(F.sum("_pn").alias("_n"))
    guard_rows = total.select(
        F.concat(
            F.lit("__vds_capacity_guard__"),
            F.when(
                F.lit(float(min_count)) * (cap + 1) > F.col("_n"),
                F.lit(1),
            )
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"frequent_items: capacity {cap} cannot "
                            "guarantee completeness for min_count "
                            f"{min_count} at N="
                        ),
                        F.col("_n").cast("string"),
                        F.lit(" (need capacity >= N/min_count)"),
                    )
                ).cast("int")
            )
            .cast("string"),
        ).alias("_key")
    )
    # phase1 feeds both the guard aggregate and the candidate branch:
    # one extra map-only pass over the summaries (<= partitions*cap
    # rows), not over the input
    cands = (
        phase1.filter(F.col("_key").isNotNull())
        .select("_key")
        .union(guard_rows)
        .distinct()
    )
    return (
        keyed.join(cands, "_key", "left_semi")
        .groupBy("_key")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select(F.col("_key").alias("key"), "cnt")
    )
