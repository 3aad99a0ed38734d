"""Debezium / Maxwell CDC envelope parsers — the WAL/binlog wire formats.

The reference tails HTTP sources and normalizes per-fetcher
(/root/reference/internal/fetchers/*); a production CDC pipeline tails a
message bus carrying one of the two de-facto open changelog envelopes:

* **Debezium**: ``{"payload": {"before": .., "after": .., "source":
  {"ts_ms", "lsn"|"pos", "db", "table"}, "op": "c|r|u|d", "ts_ms": ..}}``
  — op ``c``/``r`` (create/snapshot-read) and ``u`` carry the row in
  ``after``; ``d`` carries it in ``before`` with ``after = null``.
* **Maxwell**: ``{"database", "table", "type": "insert|update|delete|
  bootstrap-insert", "ts" (SECONDS), "xid", "data": {..}, "old": {..}}``
  — every type including delete carries the full row in ``data``.

Both parse with ``from_json`` against an EXPLICIT schema (no inference,
pure JVM expressions — zero Python in the path), map onto the engine's
canonical changelog schema (sources/changelog.py CHANGELOG_DDL), and
surface malformed input as a ``_parse_error`` column instead of dropping
it silently: unparseable JSON, an envelope without a payload/op, an
unknown op code, and a missing row image each get a distinct reason, so
callers can route bad rows to a DLQ (operators/quality_rules.py) with
full counts. At 100 TB the parse is map-only — it fans out with the
scan partitions and nothing shuffles until the canonical events hit the
LWW resolver.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the row image inside an envelope = the canonical changelog payload
# minus the transport fields (seq/op/ts live on the envelope itself)
ROW_IMAGE_DDL = (
    "repo string, path string, commit string, lang string, "
    "content string, size_bytes long"
)

PARSED_DDL = (
    "commit_seq long, op string, repo string, path string, commit string, "
    "lang string, content string, ts timestamp, size_bytes long, "
    "_parse_error string"
)


def _row_image_type() -> T.StructType:
    return T.StructType.fromDDL(ROW_IMAGE_DDL)


def debezium_value_schema() -> T.StructType:
    """Schema of one Debezium envelope (built programmatically — the
    ``table`` field name trips DDL parsing)."""
    img = _row_image_type()
    source = T.StructType(
        [
            T.StructField("ts_ms", T.LongType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("pos", T.LongType()),
            T.StructField("db", T.StringType()),
            T.StructField("table", T.StringType()),
        ]
    )
    payload = T.StructType(
        [
            T.StructField("before", img),
            T.StructField("after", img),
            T.StructField("source", source),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )
    return T.StructType([T.StructField("payload", payload)])


def maxwell_value_schema() -> T.StructType:
    img = _row_image_type()
    return T.StructType(
        [
            T.StructField("database", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("ts", T.LongType()),
            T.StructField("xid", T.LongType()),
            T.StructField("position", T.StringType()),
            T.StructField("data", img),
            T.StructField("old", img),
        ]
    )


def _canonical(
    seq: Column, op: Column, img: Column, ts: Column, bad: Column
) -> list[Column]:
    return [
        seq.cast("long").alias("commit_seq"),
        op.alias("op"),
        img["repo"].alias("repo"),
        img["path"].alias("path"),
        img["commit"].alias("commit"),
        img["lang"].alias("lang"),
        img["content"].alias("content"),
        ts.alias("ts"),
        img["size_bytes"].cast("long").alias("size_bytes"),
        bad.alias("_parse_error"),
    ]


def parse_debezium(
    df: DataFrame, value_col: str = "value", keep_raw: bool = False
) -> DataFrame:
    """Parse Debezium envelopes into the canonical changelog schema plus
    ``_parse_error`` (null = good row). ``commit_seq`` prefers the WAL
    position (``source.lsn``, then ``source.pos``) and falls back to the
    connector timestamp ``payload.ts_ms`` — the same total-order contract
    the changelog scan's ``commit_seq`` carries. Event time is
    ``source.ts_ms`` (database commit time), millisecond precision."""
    j = F.from_json(F.col(value_col), debezium_value_schema())
    p = j["payload"]
    op = (
        F.when(p["op"].isin("c", "r"), F.lit("insert"))
        .when(p["op"] == "u", F.lit("update"))
        .when(p["op"] == "d", F.lit("delete"))
    )
    img = F.when(p["op"] == "d", p["before"]).otherwise(p["after"])
    bad = (
        F.when(p.isNull() | p["op"].isNull(), F.lit("malformed envelope"))
        .when(op.isNull(), F.concat(F.lit("unknown op: "), p["op"]))
        .when(img.isNull(), F.lit("missing row image"))
    )
    seq = F.coalesce(p["source"]["lsn"], p["source"]["pos"], p["ts_ms"])
    ts = F.timestamp_millis(p["source"]["ts_ms"])
    cols = _canonical(seq, op, img, ts, bad)
    if keep_raw:
        cols.append(F.col(value_col).alias("_raw"))
    return df.select(*cols)


def parse_maxwell(
    df: DataFrame, value_col: str = "value", keep_raw: bool = False
) -> DataFrame:
    """Parse Maxwell envelopes into the canonical changelog schema plus
    ``_parse_error``. ``commit_seq`` is the transaction id ``xid``;
    Maxwell's ``ts`` is SECONDS (second precision); every op type carries
    the row in ``data`` (deletes included — no before/after split)."""
    j = F.from_json(F.col(value_col), maxwell_value_schema())
    op = (
        F.when(j["type"].isin("insert", "bootstrap-insert"), F.lit("insert"))
        .when(j["type"] == "update", F.lit("update"))
        .when(j["type"] == "delete", F.lit("delete"))
    )
    img = j["data"]
    bad = (
        F.when(
            j.isNull() | j["type"].isNull(), F.lit("malformed envelope")
        )
        .when(op.isNull(), F.concat(F.lit("unknown op: "), j["type"]))
        .when(img.isNull(), F.lit("missing row image"))
    )
    ts = F.timestamp_seconds(j["ts"])
    cols = _canonical(j["xid"], op, img, ts, bad)
    if keep_raw:
        cols.append(F.col(value_col).alias("_raw"))
    return df.select(*cols)


def envelope_to_changelog(
    df: DataFrame,
    fmt: str = "debezium",
    value_col: str = "value",
    dlq_path: str | None = None,
) -> DataFrame:
    """Convenience ingress: parse + split. Good rows come back in the
    canonical changelog shape ready for the LWW resolver / apply_batch;
    malformed rows are APPENDED to ``dlq_path`` as parquet (original
    envelope text + reason) when given, else silently filtered — pass a
    DLQ in production so bad input is never invisible."""
    keep_raw = dlq_path is not None
    if fmt == "debezium":
        parsed = parse_debezium(df, value_col, keep_raw=keep_raw)
    elif fmt == "maxwell":
        parsed = parse_maxwell(df, value_col, keep_raw=keep_raw)
    else:
        raise ValueError(f"unknown envelope format: {fmt}")
    if dlq_path:
        bad = parsed.filter(F.col("_parse_error").isNotNull()).select(
            F.col("_raw").alias("value"), "_parse_error"
        )
        bad.write.mode("append").parquet(dlq_path)
        parsed = parsed.drop("_raw")
    return parsed.filter(F.col("_parse_error").isNull()).drop("_parse_error")


def feed_to_debezium(
    feed: DataFrame,
    db: str = "app",
    table_name: str = "files",
    seq_col: str = "commit_seq",
    ts_col: str = "ts",
) -> DataFrame:
    """CDC EGRESS (outbox pattern): render a change feed
    (``ManifestTable.read_changes`` rows, ``_change_type`` in
    {insert, update, delete}) as Debezium envelope JSON lines — the
    mirror of :func:`parse_debezium`, so downstream consumers that speak
    the de-facto wire format can tail this engine's tables. Inserts emit
    op ``c`` with the row in ``after``; updates op ``u`` with ``after``
    only (the post-image feed form — same contract as a source without
    REPLICA IDENTITY FULL); deletes op ``d`` with the last-seen row in
    ``before``. Map-only ``to_json``; round-trips through
    :func:`parse_debezium` bit-exactly (tested).

    Sequence contract: feed delete rows carry the LAST-SEEN OLD values
    (Delta-CDF convention), including the old row's ``seq_col`` — a
    replayed delete at that seq would TIE with the row it retracts and
    lose the LWW tiebreak. Deletes are therefore emitted with
    ``lsn = old_seq + 1``, the same synthesized-tombstone convention as
    ``delete_where``: safe per key, because between the old row's seq
    and the true delete there is by definition no other live event for
    that key (the feed would have surfaced it as the last-seen state).

    Returns a one-column ``value`` frame ready for ``df.write.text`` /
    a Kafka sink."""
    img_cols = [
        c for c in feed.columns if c not in ("_change_type", "_bucket")
    ]
    img = F.struct(*[F.col(c) for c in img_cols])
    is_del = F.col("_change_type") == "delete"
    op = (
        F.when(F.col("_change_type") == "insert", F.lit("c"))
        .when(F.col("_change_type") == "update", F.lit("u"))
        .when(is_del, F.lit("d"))
    )
    payload = F.struct(
        F.when(is_del, img).alias("before"),
        F.when(~is_del, img).alias("after"),
        F.struct(
            F.unix_millis(F.col(ts_col).cast("timestamp")).alias("ts_ms"),
            F.when(is_del, F.col(seq_col).cast("long") + 1)
            .otherwise(F.col(seq_col).cast("long"))
            .alias("lsn"),
            F.lit(None).cast("long").alias("pos"),
            F.lit(db).alias("db"),
            F.lit(table_name).alias("table"),
        ).alias("source"),
        op.alias("op"),
        F.unix_millis(F.col(ts_col).cast("timestamp")).alias("ts_ms"),
    )
    return feed.select(
        F.to_json(F.struct(payload.alias("payload"))).alias("value")
    )


def sync_envelope_outbox(
    table,
    out_dir: str,
    consumer_id: str = "envelope-outbox",
    db: str = "app",
    table_name: str = "files",
    reset_on_missing_base: bool = False,
) -> dict | None:
    """Resumable CDC outbox: tail the table's change feed with a
    per-consumer cursor (``consume_changes``) and publish each advance
    as Debezium envelope JSON lines under
    ``{out_dir}/snap={to_snapshot_id}/`` — the file-system stand-in for
    a Kafka topic partition, consumable by :func:`parse_debezium`, this
    engine's own ``run_stream(envelope_format='debezium')``, or any
    Debezium-speaking system.

    Idempotence matches the feed contract: delivery is at-least-once on
    a (from, to) window, and the snapshot-named directory is written
    with overwrite — a crash between publish and cursor advance replays
    the SAME window into the SAME directory. Work per sync ∝ touched
    buckets in the delta, never table size; the render is map-only
    ``to_json``. Returns the advance record (from/to snapshot, rows
    published) or None when current."""
    stats: dict = {}

    def handler(feed, frm, to):
        env = feed_to_debezium(feed, db=db, table_name=table_name)
        dest = os.path.join(out_dir, f"snap={to}")
        env.write.mode("overwrite").text(dest)
        stats["rows_published"] = table.spark.read.text(dest).count()
        stats["dir"] = dest

    rec = table.consume_changes(
        consumer_id, handler, reset_on_missing_base=reset_on_missing_base
    )
    if rec is None:
        return None
    rec.update(stats)
    return rec


def feed_to_maxwell(
    feed: DataFrame,
    db: str = "app",
    table_name: str = "files",
    seq_col: str = "commit_seq",
    ts_col: str = "ts",
) -> DataFrame:
    """Maxwell-format egress (the mirror of :func:`parse_maxwell`):
    every op type carries the row in ``data`` (Maxwell deletes included),
    ``ts`` is SECONDS, ``xid`` is the sequence. Deletes emit
    ``xid = old_seq + 1`` for the same per-key LWW-tiebreak reason as
    :func:`feed_to_debezium`. Round-trips through :func:`parse_maxwell`
    (tested)."""
    img_cols = [
        c for c in feed.columns if c not in ("_change_type", "_bucket")
    ]
    img = F.struct(*[F.col(c) for c in img_cols])
    is_del = F.col("_change_type") == "delete"
    return feed.select(
        F.to_json(
            F.struct(
                F.lit(db).alias("database"),
                F.lit(table_name).alias("table"),
                F.col("_change_type").alias("type"),
                F.unix_timestamp(F.col(ts_col).cast("timestamp")).alias(
                    "ts"
                ),
                F.when(is_del, F.col(seq_col).cast("long") + 1)
                .otherwise(F.col(seq_col).cast("long"))
                .alias("xid"),
                img.alias("data"),
            )
        ).alias("value")
    )
