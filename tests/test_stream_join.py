"""Watermarked stream-stream interval join (streaming/stream_join.py):
streamed result == the identical batch join, and watermark-expired state
actually drops late matches (bounded state, not best-effort)."""

import os

import pytest
from pyspark.sql import functions as F

from vuln_datasync_spark.streaming.stream_join import stream_interval_join

PUSH_SCHEMA = "repo string, ts timestamp, commit string"
REVIEW_SCHEMA = "repo string, review_ts timestamp, score int"


def _write_one(spark, rows, schema, path):
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)


def _drain(spark, out, ckpt):
    collected = []
    q = (
        out.writeStream.foreachBatch(
            lambda df, _bid: collected.extend(df.collect())
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return collected


def _ts(minute):
    import datetime as dt

    return dt.datetime(2024, 1, 1, 12, minute)


def test_stream_join_matches_batch_join(spark, tmp_path):
    pushes = [
        ("r1", _ts(0), "c1"),
        ("r1", _ts(30), "c2"),
        ("r2", _ts(5), "c3"),
    ]
    reviews = [
        ("r1", _ts(4), 10),   # joins c1 (within 15m after push)
        ("r1", _ts(31), 20),  # joins c2
        ("r1", _ts(20), 30),  # joins nothing (c1+15m < 20m < c2)
        ("r2", _ts(4), 40),   # r2: review BEFORE push -> lower bound 0 => no
    ]
    pdir, rdir = str(tmp_path / "p"), str(tmp_path / "r")
    _write_one(spark, pushes, PUSH_SCHEMA, pdir)
    _write_one(spark, reviews, REVIEW_SCHEMA, rdir)

    def _join(l, r):
        return stream_interval_join(
            l, r, on=["repo"], left_ts="ts", right_ts="review_ts",
            lower="0 seconds", upper="15 minutes", watermark="1 hour",
        )

    got = _drain(
        spark,
        _join(
            spark.readStream.schema(PUSH_SCHEMA).parquet(pdir),
            spark.readStream.schema(REVIEW_SCHEMA).parquet(rdir),
        ),
        str(tmp_path / "ckpt"),
    )
    batch = _join(
        spark.read.schema(PUSH_SCHEMA).parquet(pdir),
        spark.read.schema(REVIEW_SCHEMA).parquet(rdir),
    ).collect()
    key = lambda rows: sorted(  # noqa: E731
        (r["repo"], r["commit"], r["score"]) for r in rows
    )
    assert key(got) == key(batch) == [("r1", "c1", 10), ("r1", "c2", 20)]


def test_stream_join_drops_state_behind_watermark(spark, tmp_path):
    """Bounded state, demonstrated end-to-end: trigger 1 advances the
    watermark far past a buffered review; trigger 2's end-of-batch
    cleanup evicts that review's state (watermark updates take effect
    one batch after the data that moved them); trigger 3 delivers a
    late push that WOULD match the evicted review — and gets no join.
    That miss is the price of bounded state; the assertion locks it in."""
    pdir, rdir = str(tmp_path / "p"), str(tmp_path / "r")
    os.makedirs(pdir)
    # reviews: one at 12:04 and a watermark-driver at 14:04
    _write_one(
        spark,
        [("r1", _ts(4), 10), ("r9", _ts(4).replace(hour=14), 1)],
        REVIEW_SCHEMA,
        rdir,
    )

    def _push_file(rows, name, mtime):
        src = str(tmp_path / ("stage_" + name))
        _write_one(spark, rows, PUSH_SCHEMA, src)
        dst = os.path.join(pdir, name)
        os.rename(
            next(
                os.path.join(src, f)
                for f in os.listdir(src)
                if f.endswith(".parquet")
            ),
            dst,
        )
        os.utime(dst, (mtime, mtime))  # file-source order = mtime

    # trigger 1: push at 14:00 -> joins, and moves the watermark to 13:50
    _push_file([("r9", _ts(0).replace(hour=14), "cw")], "a-0.parquet", 1e9)
    # trigger 2: harmless filler; its end-of-batch cleanup (now running
    # with watermark 13:50) evicts the 12:04 review from state
    _push_file(
        [("r8", _ts(1).replace(hour=14), "mid")], "b-1.parquet", 1e9 + 60
    )
    # trigger 3: LATE push at 12:00 whose review (12:04) WAS in range
    _push_file([("r1", _ts(0), "late")], "c-2.parquet", 1e9 + 120)
    out = stream_interval_join(
        spark.readStream.schema(PUSH_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(pdir),
        spark.readStream.schema(REVIEW_SCHEMA).parquet(rdir),
        on=["repo"],
        left_ts="ts",
        right_ts="review_ts",
        lower="0 seconds",
        upper="15 minutes",
        watermark="10 minutes",
    )
    got = _drain(spark, out, str(tmp_path / "ckpt"))
    joined = {(r["repo"], r["commit"]) for r in got}
    # the in-time pair joined; the late push (1h51m behind the watermark)
    # did NOT, even though a matching review exists
    assert ("r9", "cw") in joined
    assert ("r1", "late") not in joined


def test_stream_join_rejects_collisions_and_bad_keys(spark):
    l = spark.createDataFrame([], "repo string, ts timestamp, v int")
    r = spark.createDataFrame([], "repo string, ts timestamp, v int")
    with pytest.raises(ValueError, match="collision"):
        stream_interval_join(l, r, on=["repo"], right_ts="ts")
    with pytest.raises(ValueError, match="missing"):
        stream_interval_join(l, r.drop("v"), on=["nope"])
