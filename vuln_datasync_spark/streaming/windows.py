"""Watermarked windowed aggregation over the change stream (SURVEY §2.10).

The reference tracks per-sync processing stats in a table
(/root/reference/migrations/001_initial_schema.up.sql:75-88) and its
"vulnerabilities by recency" views bucket by time
(/root/reference/migrations/001_initial_schema.up.sql:147-159). The
streaming-native restatement: event-time tumbling windows with a watermark —
late events inside the lateness bound still update their window; events
later than the watermark are dropped, and closed windows emit exactly once
in append mode (bounded state, the only formulation that survives an
unbounded 10^10-event stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_change_stats(
    stream: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    group_col: str = "op",
) -> DataFrame:
    """Per-(window, op) change counts + byte volume over an event-time
    tumbling window. Works on a streaming OR batch frame (the batch plan is
    the oracle for the streaming one — same expressions, no watermark).

    State bound: #open windows x #ops — independent of stream length;
    the watermark lets Spark evict closed windows from the state store.
    """
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark(ts_col, watermark)
    aggs = [F.count("*").alias("n_events")]
    out_cols = ["n_events"]
    if "content" in src.columns:
        aggs.append(
            F.sum(F.coalesce(F.length("content"), F.lit(0))).alias("bytes")
        )
        out_cols.append("bytes")
    if "repo" in src.columns:
        aggs.append(F.approx_count_distinct("repo").alias("n_repos"))
        out_cols.append("n_repos")
    return (
        src.groupBy(F.window(ts_col, window_duration).alias("w"), F.col(group_col))
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(group_col),
            *out_cols,
        )
    )


def session_change_stats(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "repo",
) -> DataFrame:
    """Per-key SESSION windows over the change stream (streaming
    counterpart of ``operators.sessions.sessionize``): consecutive
    events of a key closer than ``gap`` merge into one session;
    Spark's native session_window state-merges fragments across
    micro-batches, and the watermark closes sessions exactly once in
    append mode.

    State bound: #OPEN sessions (keys active within the lateness
    bound) — independent of stream length; a key quiet past
    watermark+gap holds no state. Works on a batch frame too (no
    watermark) — the batch plan is the oracle for the streaming one.
    """
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"),
            F.col(key_col),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col(key_col),
            "n_events",
            "first_ts",
            "last_ts",
        )
    )


def run_session_stats_stream(
    spark,
    changelog_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
):
    """Tail the changelog into an append-mode per-key session-stats
    sink: sessions emit exactly once, after the watermark passes their
    (gap-extended) end; fragments split across micro-batches are merged
    by the session-window state store before emission."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(changelog_dir)
    q = (
        session_change_stats(stream, gap, watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_windowed_stats_stream(
    spark,
    changelog_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    window_duration: str = "10 minutes",
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
):
    """Tail the changelog and append closed windows to a parquet stats sink.

    Append output mode + watermark = each window is written exactly once,
    AFTER the watermark passes its end — the streaming contract that makes
    the stats table idempotently consumable downstream.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(changelog_dir)
    q = (
        windowed_change_stats(stream, window_duration, watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
