"""applyInPandasWithState: per-repo running counters across micro-batches,
state carried between triggers and across query restarts (checkpoint)."""

from pyspark.sql import functions as F

from vuln_datasync_spark.datagen import generate_changelog_pandas, write_changelog
from vuln_datasync_spark.sources.changelog import read_changelog_stream
from vuln_datasync_spark.streaming.stateful import repo_stats_stream


def _run(spark, log_dir, ckpt, name, max_files=2):
    stream = read_changelog_stream(
        spark, str(log_dir), max_files_per_trigger=max_files
    )
    latest = {}

    def sink(df, _bid):  # update mode: keep the newest row per repo
        for r in df.collect():
            cur = latest.get(r["repo"])
            if cur is None or r["n_events"] >= cur["n_events"]:
                latest[r["repo"]] = r

    q = (
        repo_stats_stream(stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return latest


def test_stateful_counters_match_batch_truth(spark, tmp_path):
    ev = generate_changelog_pandas(3000, seed=51)
    write_changelog(ev, str(tmp_path / "log"), n_files=4)
    got = _run(spark, tmp_path / "log", tmp_path / "ckpt", "repostats1")

    truth = (
        ev.groupby("repo")
        .agg(
            n_events=("op", "size"),
            n_insert=("op", lambda s: (s == "insert").sum()),
            n_delete=("op", lambda s: (s == "delete").sum()),
            max_seq=("commit_seq", "max"),
        )
        .reset_index()
    )
    assert len(got) == truth.shape[0]
    for _, row in truth.iterrows():
        g = got[row.repo]
        assert g["n_events"] == row.n_events, row.repo
        assert g["n_insert"] == row.n_insert
        assert g["n_delete"] == row.n_delete
        assert g["max_seq"] == row.max_seq


def test_state_survives_restart(spark, tmp_path):
    ev = generate_changelog_pandas(2000, seed=52)
    half = len(ev) // 2
    import os

    log_dir = tmp_path / "log"
    write_changelog(ev.iloc[:half], str(log_dir), n_files=1)
    first = _run(spark, log_dir, tmp_path / "ckpt", "repostats2")

    files = write_changelog(ev.iloc[half:], str(tmp_path / "more"), n_files=1)
    os.rename(files[0], str(log_dir / "late-0.parquet"))
    second = _run(spark, log_dir, tmp_path / "ckpt", "repostats3")

    # update mode only re-emits keys touched in run 2; merge both runs
    got = {**first, **second}
    total = sum(r["n_events"] for r in got.values())
    assert total == len(ev)  # counters resumed from checkpointed state
    # a key updated in run 2 must carry its run-1 history forward
    resumed = [
        r for k, r in second.items()
        if k in first and r["n_events"] > first[k]["n_events"]
    ]
    assert resumed, "no key demonstrates cross-restart state carry-over"
    assert max(r["max_seq"] for r in got.values()) == ev.commit_seq.max()

def test_idle_timeout_retires_cold_state(spark, tmp_path):
    """With idle_timeout_ms, a repo that goes quiet is retired: its next
    event restarts counters from ZERO instead of carrying history (state
    size bounded by the active working set, not ever-seen keys)."""
    import time as _t

    import pandas as pd

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    ckpt = tmp_path / "ckpt"

    def drop(seq, repo, name):
        pd.DataFrame(
            {"commit_seq": [seq], "op": ["insert"], "repo": [repo],
             "path": ["f.py"], "commit": [f"c{seq}"], "lang": ["python"],
             "content": [f"v{seq}"],
             "ts": [pd.Timestamp("2026-01-01", tz="UTC")],
             "size_bytes": [10]}
        ).to_parquet(str(log_dir / name), coerce_timestamps="us")

    drop(1, "hot", "b0.parquet")
    stream = read_changelog_stream(spark, str(log_dir), max_files_per_trigger=1)
    rows = []
    q = (
        repo_stats_stream(stream, idle_timeout_ms=1500)
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: rows.extend(
            (bid, r["repo"], r["n_events"]) for r in df.collect()
        ))
        .option("checkpointLocation", str(ckpt))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = _t.time() + 60
        while not rows and _t.time() < deadline:
            _t.sleep(0.3)
        assert rows, "first batch never arrived"
        # let 'hot' go idle past the timeout; keep the stream triggering
        # with a different key so timeout processing actually runs
        _t.sleep(2.5)
        drop(2, "other", "b1.parquet")
        deadline = _t.time() + 60
        while not any(r[1] == "other" for r in rows) and _t.time() < deadline:
            _t.sleep(0.3)
        # 'hot' returns AFTER being retired: counters restart at 1
        drop(3, "hot", "b2.parquet")
        deadline = _t.time() + 60
        while len([r for r in rows if r[1] == "hot"]) < 2 and _t.time() < deadline:
            _t.sleep(0.3)
    finally:
        q.stop()
    hot_counts = [n for _, repo, n in rows if repo == "hot"]
    assert hot_counts[0] == 1
    assert hot_counts[-1] == 1, (
        f"cold state not retired: {hot_counts}"
    )


def _run_kmv(spark, log_dir, ckpt, max_files=2, k=16):
    from vuln_datasync_spark.streaming.stateful import kmv_distinct_stream

    stream = read_changelog_stream(
        spark, str(log_dir), max_files_per_trigger=max_files
    )
    latest = {}

    def sink(df, _bid):
        for r in df.collect():
            latest[r["key"]] = r["est_distinct"]

    q = (
        kmv_distinct_stream(stream, "lang", "path", k=k)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return latest


def test_kmv_stream_equals_batch_sketch(spark, tmp_path):
    """Deterministic hashes + order-free union: the streamed per-key
    estimate must EQUAL batch kmv_distinct over the whole log, however
    the stream was micro-batched."""
    from vuln_datasync_spark.operators.sketch import kmv_distinct

    ev = generate_changelog_pandas(4000, seed=53)
    write_changelog(ev, str(tmp_path / "log"), n_files=5)
    got = _run_kmv(spark, tmp_path / "log", tmp_path / "ckpt", max_files=1)

    batch = {
        r["lang"]: r["est_distinct"]
        for r in kmv_distinct(
            spark.createDataFrame(ev), ["lang"], "path", k=16
        ).collect()
    }
    assert got == batch
    # sanity: at least one lang is over k (estimate branch exercised)
    true_distinct = ev.groupby("lang")["path"].nunique()
    assert (true_distinct > 16).any()


def test_kmv_stream_state_survives_restart(spark, tmp_path):
    import os

    ev = generate_changelog_pandas(3000, seed=54)
    half = len(ev) // 2
    log_dir = tmp_path / "log"
    write_changelog(ev.iloc[:half], str(log_dir), n_files=1)
    _run_kmv(spark, log_dir, tmp_path / "ckpt")

    files = write_changelog(ev.iloc[half:], str(tmp_path / "more"), n_files=1)
    os.rename(files[0], str(log_dir / "late-0.parquet"))
    second = _run_kmv(spark, log_dir, tmp_path / "ckpt")

    from vuln_datasync_spark.operators.sketch import kmv_distinct

    batch = {
        r["lang"]: r["est_distinct"]
        for r in kmv_distinct(
            spark.createDataFrame(ev), ["lang"], "path", k=16
        ).collect()
    }
    # every key re-emitted in run 2 must reflect run-1 state merged in
    assert second and all(batch[k] == v for k, v in second.items())
