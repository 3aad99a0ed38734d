"""Long-lived processingTime trigger: events arriving while the query runs
are picked up in later micro-batches; graceful stop mid-stream, resume."""

import os
import time

from vuln_datasync_spark.datagen import generate_changelog_pandas, write_changelog
from vuln_datasync_spark.streaming.pipeline import run_stream

from .test_cdc_e2e import CHANGELOG_SCHEMA, assert_state_matches


def test_processing_time_tail_and_graceful_stop(spark, tmp_path):
    ev = generate_changelog_pandas(3000, seed=41)
    half = len(ev) // 2
    log_dir = tmp_path / "log"
    write_changelog(ev.iloc[:half], str(log_dir), n_files=2)

    seen = []
    table, query = run_stream(
        spark,
        str(log_dir),
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
        CHANGELOG_SCHEMA,
        processing_time="1 seconds",
        await_termination=False,
        on_batch=lambda b, lin: seen.append(b),
    )
    try:
        deadline = time.time() + 60
        while not seen and time.time() < deadline:
            time.sleep(0.5)
        assert seen, "first tranche never processed"

        # drop late files into the tailed directory while the query runs
        more_dir = tmp_path / "more"
        files = write_changelog(ev.iloc[half:], str(more_dir), n_files=1)
        os.rename(files[0], str(log_dir / "late-00000.parquet"))
        n_before = len(seen)
        deadline = time.time() + 60
        while len(seen) <= n_before and time.time() < deadline:
            time.sleep(0.5)
        assert len(seen) > n_before, "late file never picked up"
        query.processAllAvailable()
    finally:
        query.stop()  # graceful stop (reference analog: SIGTERM drain,
        # /root/reference/cmd/vuln-datasync/main.go:101-120)
    assert_state_matches(table, ev)


def test_sigterm_graceful_stop_subprocess(tmp_path):
    """SIGTERM to the CLI `stream` command must drain and exit 0 with a
    clean checkpoint (reference: signal.Notify + shutdown window,
    /root/reference/cmd/vuln-datasync/main.go:101-120); a later
    availableNow run over the same checkpoint resumes without
    re-applying (exactly-once)."""
    import signal
    import subprocess
    import sys

    ev = generate_changelog_pandas(2000, seed=43)
    log_dir = tmp_path / "log"
    write_changelog(ev, str(log_dir), n_files=4)
    tbl = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    # stdout to a FILE, not a PIPE: an undrained pipe fills at ~64 KB of
    # Spark log output and BLOCKS the child mid-write, stalling the stream
    out_path = tmp_path / "stream.out"
    with open(out_path, "wb") as out_f:
        proc = subprocess.Popen(
            [sys.executable, "-m", "vuln_datasync_spark.cli",
             "--master", "local[2]",
             "stream", "--changelog", str(log_dir), "--table", tbl,
             "--checkpoint", ckpt, "--processing-time", "1 seconds",
             "--max-files-per-trigger", "1"],
            cwd="/root/repo",
            stdout=out_f, stderr=subprocess.STDOUT,
        )
    try:
        # wait for the first commit (the _current pointer appears)
        deadline = time.time() + 240
        cur = os.path.join(tbl, "_current")
        while not os.path.exists(cur) and time.time() < deadline:
            if proc.poll() is not None:
                out = out_path.read_bytes().decode(errors="replace")
                raise AssertionError(f"stream died early:\n{out[-3000:]}")
            time.sleep(0.5)
        assert os.path.exists(cur), "no commit within deadline"

        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=120)
        assert proc.returncode == 0, (
            out_path.read_bytes().decode(errors="replace")[-3000:]
        )
    finally:
        if proc.poll() is None:
            proc.kill()

    # resume from the same checkpoint in-process: must finish the rest
    # and land exactly on the oracle state (no double-apply, no gap)
    from vuln_datasync_spark.session import get_spark

    spark = get_spark("vds-tests", master="local[4]", shuffle_partitions=8)
    table = run_stream(
        spark, str(log_dir), tbl, ckpt, CHANGELOG_SCHEMA,
        max_files_per_trigger=1,
    )
    assert_state_matches(table, ev)
