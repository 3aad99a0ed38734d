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
