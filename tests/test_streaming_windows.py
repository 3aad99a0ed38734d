"""Watermarked windowed aggregation over the change stream (SURVEY §2.10):
closed windows emit exactly once in append mode; events later than the
watermark are dropped; state is bounded by open windows."""

from datetime import datetime

from vuln_datasync_spark.sources.changelog import CHANGELOG_DDL, changelog_schema
from vuln_datasync_spark.streaming.windows import (
    run_windowed_stats_stream,
    windowed_change_stats,
)


def _ev(seq, op, ts, content="x" * 10):
    return (seq, op, "r1", f"p{seq}", f"c{seq}", "python", content, ts, 10)


def _write(spark, rows, path):
    spark.createDataFrame(rows, CHANGELOG_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_windowed_stats_watermark_append(spark, tmp_path):
    log, out, ck = (str(tmp_path / d) for d in ("log", "out", "ck"))
    t = lambda h, m: datetime(2024, 1, 1, h, m, 0)  # noqa: E731

    # batch 1: 3 events in window [00:00,00:10) + 1 at 01:00; watermark
    # after the batch = 01:00 - 30min = 00:30 -> the 00:00 window closes
    _write(
        spark,
        [
            _ev(1, "insert", t(0, 1)),
            _ev(2, "insert", t(0, 5)),
            _ev(3, "update", t(0, 5)),
            _ev(4, "insert", t(1, 0)),
        ],
        log,
    )
    run_windowed_stats_stream(
        spark, log, out, ck, changelog_schema(), "10 minutes", "30 minutes"
    )
    got1 = {
        (r["window_start"], r["op"]): r["n_events"]
        for r in spark.read.parquet(out).collect()
    }
    # only the CLOSED window emitted; the 01:00 window is still open
    assert got1 == {(t(0, 0), "insert"): 2, (t(0, 0), "update"): 1}

    # batch 2: one LATE event at 00:05 (older than the 00:30 watermark ->
    # dropped) + one at 02:00 (advances watermark to 01:30 -> closes the
    # 01:00 window WITHOUT the late event)
    _write(spark, [_ev(5, "insert", t(0, 5)), _ev(6, "delete", t(2, 0))], log)
    run_windowed_stats_stream(
        spark, log, out, ck, changelog_schema(), "10 minutes", "30 minutes"
    )
    rows = spark.read.parquet(out).collect()
    got2 = {(r["window_start"], r["op"]): r["n_events"] for r in rows}
    # 00:00 windows NOT re-emitted (append-once), late event NOT counted,
    # 01:00 window now closed with its original single event
    assert got2 == {
        (t(0, 0), "insert"): 2,
        (t(0, 0), "update"): 1,
        (t(1, 0), "insert"): 1,
    }
    assert len(rows) == 3  # exactly-once per closed window


def test_windowed_stats_batch_matches_manual(spark):
    """The same expression tree over a batch frame is the oracle for the
    streaming plan (no watermark in batch mode)."""
    t = lambda m: datetime(2024, 1, 1, 0, m, 0)  # noqa: E731
    df = spark.createDataFrame(
        [_ev(1, "insert", t(1), "abc"), _ev(2, "insert", t(4), "de"),
         _ev(3, "delete", t(15), "")],
        CHANGELOG_DDL,
    )
    got = {
        (r["window_start"], r["op"]): (r["n_events"], r["bytes"])
        for r in windowed_change_stats(df, "10 minutes").collect()
    }
    assert got == {
        (t(0), "insert"): (2, 5),
        (t(10), "delete"): (1, 0),
    }


def test_session_stats_merges_fragments_across_batches(spark, tmp_path):
    """Session windows: events of one key closer than the gap merge into
    ONE session even when they arrive in different micro-batches; a key
    quiet past the gap starts a new session; closed sessions emit once."""
    from vuln_datasync_spark.streaming.windows import (
        run_session_stats_stream,
        session_change_stats,
    )

    log, out, ck = (str(tmp_path / d) for d in ("slog", "sout", "sck"))
    t = lambda h, m: datetime(2024, 1, 1, h, m, 0)  # noqa: E731

    def ev(seq, repo, ts):
        return (seq, "insert", repo, f"p{seq}", f"c{seq}", "python", "x", ts, 1)

    # batch 1: r1 session fragment (00:00, 00:10), r2 single event
    _write(spark, [ev(1, "r1", t(0, 0)), ev(2, "r1", t(0, 10)),
                   ev(3, "r2", t(0, 0))], log)
    run_session_stats_stream(
        spark, log, out, ck, changelog_schema(), "30 minutes", "10 minutes"
    )
    # batch 2: r1 continues at 00:30 (within gap of 00:10+30m -> SAME
    # session), then a far event at 05:00 advances the watermark and
    # closes everything open
    _write(spark, [ev(4, "r1", t(0, 30)), ev(5, "r2", t(5, 0))], log)
    run_session_stats_stream(
        spark, log, out, ck, changelog_schema(), "30 minutes", "10 minutes"
    )
    rows = spark.read.parquet(out).collect()
    got = {
        (r["repo"], r["session_start"]): (r["n_events"], r["last_ts"])
        for r in rows
    }
    # r1: ONE merged 3-event session despite arriving in two batches
    assert got[("r1", t(0, 0))] == (3, t(0, 30))
    # r2: its 00:00 single-event session closed
    assert got[("r2", t(0, 0))] == (1, t(0, 0))
    # no duplicate emissions
    assert len(rows) == len(got)

    # batch oracle: same expressions on a static frame
    df = spark.createDataFrame(
        [ev(1, "r1", t(0, 0)), ev(2, "r1", t(0, 10)), ev(4, "r1", t(0, 30))],
        CHANGELOG_DDL,
    )
    b = session_change_stats(df, "30 minutes").collect()
    assert len(b) == 1 and b[0]["n_events"] == 3
