"""Log compaction: replay(compact(log, S) ++ tail(seq > S)) must equal
replay(full log) — the bootstrap-from-compacted-prefix contract."""

import json
import os

from vuln_datasync_spark.datagen import (
    generate_changelog_pandas,
    write_changelog,
)
from vuln_datasync_spark.sinks.manifest_table import ManifestTable
from vuln_datasync_spark.sources.changelog import (
    compact_changelog,
    read_changelog_batch,
)
from vuln_datasync_spark.streaming.pipeline import apply_batch

from .test_cdc_e2e import assert_state_matches


def test_compact_plus_tail_equals_full_replay(spark, tmp_path):
    ev = generate_changelog_pandas(6000, seed=77)
    log_dir = str(tmp_path / "log")
    write_changelog(ev, log_dir, n_files=4)
    mid = int(ev["commit_seq"].median())

    marker = compact_changelog(
        spark, log_dir, str(tmp_path / "compacted"), upto_seq=mid
    )
    assert marker["upto_seq"] == mid
    # compaction shrank the prefix to <= one event per key
    prefix_keys = ev[ev.commit_seq <= mid][["repo", "path"]].drop_duplicates()
    assert marker["rows"] == len(prefix_keys)

    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=8)
    compacted = read_changelog_batch(spark, str(tmp_path / "compacted"))
    apply_batch(compacted, table, "boot", 0)
    tail = read_changelog_batch(spark, log_dir, since_seq=mid)
    apply_batch(tail, table, "boot", 1)
    assert_state_matches(table, ev)


def test_compact_whole_log_replays_to_same_state(spark, tmp_path):
    ev = generate_changelog_pandas(4000, seed=78)
    log_dir = str(tmp_path / "log")
    write_changelog(ev, log_dir, n_files=3)

    marker = compact_changelog(spark, log_dir, str(tmp_path / "c"))
    assert marker["upto_seq"] == int(ev["commit_seq"].max())

    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=8)
    apply_batch(
        read_changelog_batch(spark, str(tmp_path / "c")), table, "boot", 0
    )
    assert_state_matches(table, ev)


def test_drop_tombstones_valid_from_empty_state(spark, tmp_path):
    ev = generate_changelog_pandas(4000, seed=79)
    log_dir = str(tmp_path / "log")
    write_changelog(ev, log_dir, n_files=3)

    kept = compact_changelog(
        spark, log_dir, str(tmp_path / "keep"), retain_tombstones=True
    )
    dropped = compact_changelog(
        spark, log_dir, str(tmp_path / "drop"), retain_tombstones=False
    )
    assert dropped["tombstones"] == 0
    assert dropped["rows"] == kept["rows"] - kept["tombstones"]
    assert kept["tombstones"] > 0  # fixture contains delete-winners

    # bootstrapping from EMPTY, the tombstone-free log yields the same
    # live state
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=8)
    apply_batch(
        read_changelog_batch(spark, str(tmp_path / "drop")), table, "boot", 0
    )
    assert_state_matches(table, ev)

    marker = json.load(open(os.path.join(str(tmp_path / "drop"),
                                         "_COMPACT.json")))
    assert marker["retain_tombstones"] is False
