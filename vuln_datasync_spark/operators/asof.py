"""AS-OF join — the point-in-time lookup a CDC/changelog engine owes its
users: for every left row, the LATEST right row whose order value is <=
the left row's, within the same key (e.g. "the dimension row in effect
when this change event happened", "the last click before this view").

Spark has no native as-of join; the naive restatement is a range
non-equi-join (quadratic per key) or a per-key sort-merge UDF. This one
is a composition of built-ins with ONE shuffle and O(1) per-row state:

    tag both sides, union them on a (key, ord, side) spine,
    window per key ordered by (ord, side) carrying the most recent right
    payload forward with last(ignorenulls) over an unbounded-preceding
    frame, then keep only left rows.

At equal order values the right row sorts BEFORE the left row (side 0 <
1), so `<=` semantics hold; ``strict=True`` flips the tie so only
strictly earlier right rows match. Skew = a hot key, same unit as every
keyed op here; the window is a single running carry, never a buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


_RESERVED = ("_ord", "_side", "_rv", "_lv", "_carry")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ord: str,
    right_ord: str,
    right_cols: list[str],
    suffix: str = "_asof",
    strict: bool = False,
    dedupe_right: bool = False,
) -> DataFrame:
    """Left as-of join: every ``left`` row plus the payload of the latest
    ``right`` row with ``right_ord <= left_ord`` (``<`` when ``strict``)
    sharing the ``on`` key; nulls when no such right row exists. Output =
    all left columns + one ``{col}{suffix}`` per ``right_cols``.

    ``(on, right_ord)`` should uniquely identify right rows: duplicates at
    the same key and order value tie in the window sort, and which of them
    is carried is unspecified. ``dedupe_right=True`` applies the
    deterministic resolution first — keep the max ``right_cols`` payload
    per (key, order) — so callers get a defined carry without pre-cleaning
    (one extra window over the right side, same (key) partitioning).

    The internal spine columns are reserved: inputs using one of
    ``_ord/_side/_rv/_lv/_carry``, or whose output names would collide
    (a left column equal to some ``{right_col}{suffix}``), raise
    ``ValueError`` up front instead of producing ambiguous or silently
    wrong carries."""
    clash_l = sorted(set(left.columns) & set(_RESERVED))
    clash_r = sorted(set(right.columns) & set(_RESERVED))
    if clash_l or clash_r:
        raise ValueError(
            f"asof_join reserved column names in input: "
            f"left={clash_l} right={clash_r} (reserved: {list(_RESERVED)})"
        )
    out_clash = sorted(
        {f"{c}{suffix}" for c in right_cols} & set(left.columns)
    )
    if out_clash:
        raise ValueError(
            f"asof_join output name collision: {out_clash} already exist "
            f"in left (pick a different suffix)"
        )
    if dedupe_right:
        wd = W.partitionBy(*on, right_ord).orderBy(
            F.desc(F.struct(*[F.col(c) for c in right_cols]))
        )
        right = (
            right.withColumn("_rn_dedupe", F.row_number().over(wd))
            .filter(F.col("_rn_dedupe") == 1)
            .drop("_rn_dedupe")
        )
    lv = F.struct(*[F.col(c) for c in left.columns]).alias("_lv")
    rv = F.struct(*[F.col(c) for c in right_cols]).alias("_rv")
    right_side, left_side = (1, 0) if strict else (0, 1)
    l2 = left.select(
        *on,
        F.col(left_ord).alias("_ord"),
        F.lit(left_side).alias("_side"),
        F.lit(None).cast(
            right.select(rv).schema["_rv"].dataType.simpleString()
        ).alias("_rv"),
        lv,
    )
    r2 = right.select(
        *on,
        F.col(right_ord).alias("_ord"),
        F.lit(right_side).alias("_side"),
        rv,
        F.lit(None).cast(
            left.select(lv).schema["_lv"].dataType.simpleString()
        ).alias("_lv"),
    )
    w = (
        W.partitionBy(*on)
        .orderBy("_ord", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    spine = l2.unionByName(r2).withColumn(
        "_carry", F.last("_rv", ignorenulls=True).over(w)
    )
    out_cols = [F.col("_lv")[c].alias(c) for c in left.columns]
    out_cols += [
        F.col("_carry")[c].alias(f"{c}{suffix}") for c in right_cols
    ]
    return spine.filter(F.col("_side") == left_side).select(*out_cols)
