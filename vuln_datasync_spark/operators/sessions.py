"""Event-stream sessionization, funnel analysis, and SCD2 history.

Reference analog: the sync scheduler's per-run activity windows
(internal/jobs/server.go:315-372 groups log events per run to compute
per-run durations and outcome counts); these operators generalize that
to arbitrary keyed event streams, the standard shapes a CDC/analytics
engine must provide over its change history.

Scale notes (100 TB):
  * ``sessionize`` is ONE shuffle on the session key followed by two
    window passes over the SAME partitioning/sort (Catalyst plans a
    single Exchange + Sort; the second Window reuses it) — no
    self-join, no collect, state O(1) per row.
  * ``funnel_steps`` chains k window expressions over one
    partitioning: one Exchange + one Sort total regardless of k
    (all windows share the spec), then a single hash aggregate with
    map-side combine. Never materializes per-user event arrays.
  * ``scd2_from_changelog`` is one shuffle + one LEAD window — the
    history fan-out is row-for-row with the changelog, never a
    range join against the existing dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _us(col: F.Column) -> F.Column:
    """Epoch micros as BIGINT (NTZ-safe; integer arithmetic keeps
    gap/duration comparisons bit-exact across engines)."""
    return F.unix_micros(col.cast("timestamp"))


def sessionize(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Tag each event with a per-key session ordinal (1-based).

    A new session starts at the first event of a key and whenever the
    gap to the previous event exceeds ``gap_seconds`` (strictly).
    Classic gaps-and-islands: LAG to flag breaks, running SUM to
    number the islands. Deterministic under timestamp ties when
    ``tiebreak_col`` (a unique column) is given.
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = W.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    brk = F.when(
        prev.isNull()
        | (
            _us(F.col(ts_col)) - _us(prev)
            > F.lit(int(gap_seconds) * 1_000_000)
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = W.partitionBy(key_col).orderBy(*order).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return events.withColumn("session_idx", F.sum(brk).over(run))


def session_stats(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-session summary: event count, start/end (epoch micros),
    duration in seconds. One shuffle (the sessionize window) + one
    map-side-combined aggregate on (key, session_idx) — Catalyst
    reuses the window's hash partitioning for the groupBy."""
    s = sessionize(events, key_col, ts_col, gap_seconds, tiebreak_col)
    return s.groupBy(key_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        _us(F.min(ts_col)).alias("start_us"),
        _us(F.max(ts_col)).alias("end_us"),
        (_us(F.max(ts_col)) - _us(F.min(ts_col))).alias("duration_us"),
    )


def funnel_steps(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key earliest completion time of each funnel step.

    Step i+1 counts only when it occurs AFTER (in (ts, tiebreak)
    event order — strictly later rows) an already-completed step i;
    greedy earliest-completion matching, which is optimal for
    subsequence funnels. Returns one row per key with
    ``step{i}_us`` (epoch micros, null = never reached).

    All k step columns ride ONE window spec (same partition + sort),
    so the physical plan has a single Exchange/Sort however long the
    funnel is, followed by one aggregate.
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = (
        W.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    df = events
    cols = []
    for i, s in enumerate(steps):
        if i == 0:
            hit = F.when(F.col(type_col) == s, F.col(ts_col))
        else:
            prev_done = F.min(F.col(cols[-1])).over(w)
            hit = F.when(
                (F.col(type_col) == s) & prev_done.isNotNull(),
                F.col(ts_col),
            )
        c = f"_step{i}"
        df = df.withColumn(c, hit)
        cols.append(c)
    return df.groupBy(key_col).agg(
        *[
            _us(F.min(c)).alias(f"step{i + 1}_us")
            for i, c in enumerate(cols)
        ]
    )


def funnel_counts(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Funnel summary: one row per step with how many keys reached it
    and the conversion rate vs step 1. Tiny result (k rows) produced
    by a second map-side-combined aggregate over funnel_steps."""
    per_key = funnel_steps(
        events, key_col, ts_col, type_col, steps, tiebreak_col
    )
    agg = per_key.agg(
        *[
            F.count(F.col(f"step{i + 1}_us")).alias(f"_n{i}")
            for i in range(len(steps))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_idx"),
                F.lit(s).alias("step_name"),
                F.col(f"_n{i}").alias("n_keys"),
            )
            for i, s in enumerate(steps)
        ]
    )
    e = agg.select(F.explode(rows).alias("r")).select("r.*")
    first = F.first("n_keys").over(
        W.orderBy("step_idx").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return e.withColumn(
        "conversion",
        F.round(
            F.when(first > 0, F.col("n_keys") / first).otherwise(F.lit(0.0)),
            9,
        ),
    ).orderBy("step_idx")


def retention_cohorts(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    period_seconds: int = 3600,
) -> DataFrame:
    """Cohort retention: keys grouped by their first-seen period, then
    per (cohort, periods-since-cohort) distinct-key activity counts —
    the classic retention triangle over any keyed event stream.

    Integer period indexes (``unix_micros div period``) keep the
    bucketing bit-exact across engines. Two shuffles total, both on
    ``key_col`` (the cohort agg and the join are co-partitioned;
    Catalyst reuses the exchange), then one map-side-combined
    count-distinct per (cohort, offset) — never a per-pair blowup.
    """
    pus = int(period_seconds) * 1_000_000
    p = (_us(F.col(ts_col)) / F.lit(pus)).cast("long")  # floor: positive
    e = events.select(F.col(key_col).alias("_k"), p.alias("_p"))
    cohort = e.groupBy("_k").agg(F.min("_p").alias("_c"))
    return (
        e.join(cohort, on="_k")
        .groupBy(
            F.col("_c").alias("cohort_period"),
            (F.col("_p") - F.col("_c")).alias("period_n"),
        )
        .agg(F.count_distinct("_k").alias("n_keys"))
        .orderBy("cohort_period", "period_n")
    )


def scd2_from_changelog(
    changelog: DataFrame,
    key_cols: list[str],
    seq_col: str,
    val_cols: list[str],
    delete_col=None,
) -> DataFrame:
    """Build a Type-2 slowly-changing-dimension history from a keyed
    changelog: each non-delete change opens a version valid over
    [its seq, next change's seq); the latest version of a key is
    current unless the key's last change was a delete.

    ``delete_col``: optional boolean Column marking delete rows —
    they CLOSE the previous version (their seq becomes its
    valid_to_seq) but emit no version themselves.

    Output: key_cols + val_cols + valid_from_seq, valid_to_seq
    (null = open), is_current. Reference analog: the vulnerability
    modification history the reference keeps only implicitly via
    updated_at overwrites (migrations/001_initial_schema.up.sql:18);
    this materializes the full history so point-in-time queries
    become a range predicate instead of a snapshot restore.

    ``seq_col`` must be unique per key (a change sequence); ties
    would make version boundaries ambiguous — pre-dedupe with the
    LWW operator if the source can emit same-seq duplicates.
    """
    w = W.partitionBy(*key_cols).orderBy(F.col(seq_col))
    nxt = F.lead(F.col(seq_col)).over(w)
    df = changelog.withColumn("_vto", nxt)
    if delete_col is not None:
        df = df.filter(~F.coalesce(delete_col, F.lit(False)))
    return df.select(
        *key_cols,
        *val_cols,
        F.col(seq_col).alias("valid_from_seq"),
        F.col("_vto").alias("valid_to_seq"),
        F.col("_vto").isNull().alias("is_current"),
    )
