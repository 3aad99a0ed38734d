"""Interval (range-containment) join: points joined to the intervals
that contain them — the operator behind "which maintenance window /
validity period / shipment span covers this event".

Spark has no native range join; the naive spelling
``points.join(intervals, p BETWEEN s AND e)`` compiles to
BroadcastNestedLoopJoin (or a cartesian product when neither side
broadcasts) — an O(|P| x |I|) plan that is the canonical 100 TB
scale-killer. This operator rewrites it as a bucketed EQUI-join:

    bucket(point)    = floor(p / width)
    interval rows    explode to every bucket they overlap
                       (sequence(floor(s/w), floor(e/w)))
    join on bucket, then re-check p BETWEEN s AND e exactly

Each matching (point, interval) pair meets in exactly ONE bucket (the
point's), so no dedup is needed. Shuffle is ∝ rows x (span/width + 1):
pick ``bucket_width`` near the typical span and the blow-up factor is
~2. The per-row expansion is guarded in-plan — an interval wider than
``max_expansion`` buckets raises instead of silently exploding the
stage. DuckDB's IEJoin spelling of the same query is the catalog
oracle (plans/queries.py j9_interval_join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_RESERVED = ("_vds_bucket", "_vds_nb")


def _numeric(col: Column, dt: T.DataType) -> Column:
    """Timestamps -> microseconds; dates -> days; numerics pass through."""
    if isinstance(dt, T.TimestampType) or isinstance(dt, T.TimestampNTZType):
        return F.unix_micros(col.cast("timestamp"))
    if isinstance(dt, T.DateType):
        return F.datediff(col, F.lit("1970-01-01").cast("date")).cast("long")
    return col.cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    max_expansion: int = 10_000,
) -> DataFrame:
    """Inner join of ``points`` rows with every ``intervals`` row whose
    [start_col, end_col] (inclusive both ends) contains point_col.

    ``bucket_width`` is in the column's native resolution after
    normalization: MICROSECONDS for timestamps, DAYS for dates, the raw
    value for numerics. Intervals with end < start are dropped (an
    inclusive containment join cannot match them); NULL bounds/points
    are dropped likewise. Output columns: all of points', then all of
    intervals' (names must not collide; reserved internals rejected).
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"points/intervals column collision: {sorted(overlap)}; "
            "rename before joining"
        )
    for c in _RESERVED:
        if c in points.columns or c in intervals.columns:
            raise ValueError(f"column name {c!r} is reserved by interval_join")

    p_num = _numeric(F.col(point_col), points.schema[point_col].dataType)
    s_num = _numeric(F.col(start_col), intervals.schema[start_col].dataType)
    e_num = _numeric(F.col(end_col), intervals.schema[end_col].dataType)
    w = int(bucket_width)

    pts = points.filter(F.col(point_col).isNotNull()).withColumn(
        "_vds_bucket", F.floor(p_num / w)
    )
    iv = (
        intervals.filter(
            F.col(start_col).isNotNull()
            & F.col(end_col).isNotNull()
            & (e_num >= s_num)
        )
        .withColumn("_vds_nb", F.floor(e_num / w) - F.floor(s_num / w) + 1)
        .withColumn(
            "_vds_bucket",
            F.explode(
                F.when(
                    F.col("_vds_nb") <= max_expansion,
                    F.sequence(F.floor(s_num / w), F.floor(e_num / w)),
                ).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "interval_join: interval spans "
                            ),
                            F.col("_vds_nb").cast("string"),
                            F.lit(
                                f" buckets > max_expansion={max_expansion}; "
                                "raise bucket_width or max_expansion"
                            ),
                        )
                    )
                )
            ),
        )
        .drop("_vds_nb")
    )
    # equi-join on the bucket carries the hash-partitioned plan; the
    # exact BETWEEN re-check trims bucket-grain false positives
    cond = (
        (pts["_vds_bucket"] == iv["_vds_bucket"])
        & (p_num >= s_num)
        & (p_num <= e_num)
    )
    return pts.join(iv, cond, "inner").select(
        *[pts[c] for c in points.columns],
        *[iv[c] for c in intervals.columns],
    )
