"""Bloom-filter sidecar: no false negatives ever, real file skipping on
point probes, incremental (delta-only) builds, compaction, and the
eq_filters read path end-to-end."""

import pytest
from pyspark.sql import functions as F

from vuln_datasync_spark.sinks.bloom import (
    bloom_excluded_rels,
    build_bloom,
    compact_bloom,
)
from vuln_datasync_spark.sinks.manifest_table import ManifestTable

from .test_change_feed import CHANGELOG_SCHEMA, _batch


def _rows(lo, hi, op="insert"):
    return [
        (
            i,
            op,
            f"r{i % 7}",
            f"f{i}.py",
            f"c{i:04d}",
            "python",
            f"v{i}",
            None,
            i,
        )
        for i in range(lo, hi)
    ]


def _n_files(table):
    return sum(len(p) for p in table.manifest()["files"].values())


@pytest.fixture()
def table(spark, tmp_path):
    t = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=8)
    _batch(spark, t, _rows(0, 120), 0)
    return t


def test_bloom_no_false_negatives_and_skipping(table):
    rec = build_bloom(table, ["commit"])
    assert rec["files_built"] == _n_files(table) and rec["cells"] > 0
    # present value: its file must never be excluded, and the probe
    # result equals a full-scan filter
    for i in (0, 42, 77, 119):
        got = {
            (r["repo"], r["path"])
            for r in table.read(eq_filters={"commit": f"c{i:04d}"}).collect()
        }
        exp = {
            (r["repo"], r["path"])
            for r in table.read()
            .filter(F.col("commit") == f"c{i:04d}")
            .collect()
        }
        assert got == exp and len(got) == 1
    # absent value: with 10 bits/key, k=5, the fpp over 8 files is tiny;
    # require that MOST files are proven absent and the read is empty
    excl = bloom_excluded_rels(table, "commit", "not-a-commit")
    assert len(excl) >= _n_files(table) - 1
    assert table.read(eq_filters={"commit": "zzz"}).count() == 0


def test_bloom_incremental_delta_build(table):
    build_bloom(table, ["commit"])
    n0 = _n_files(table)
    _batch(table.spark, table, _rows(120, 160), 1)
    rec = build_bloom(table, ["commit"])
    # only the files the second commit produced get new entries; COW
    # rewrites touched buckets so this is the new snapshot's file count
    # minus the UNTOUCHED survivors already covered
    assert 0 < rec["files_built"] <= _n_files(table)
    assert rec["files_built"] < n0 + _n_files(table)  # not a full rebuild
    # values from both eras resolve
    assert table.read(eq_filters={"commit": "c0005"}).count() == 1
    assert table.read(eq_filters={"commit": "c0150"}).count() == 1
    # second call with nothing new: no work
    assert build_bloom(table, ["commit"]) == {"files_built": 0, "cells": 0}


def test_bloom_none_and_uncovered_files_kept(table):
    # no sidecar yet: eq_filters must still work (no pruning, correct rows)
    assert table.read(eq_filters={"commit": "c0007"}).count() == 1
    assert bloom_excluded_rels(table, "commit", "c0007") == set()
    # None value: bloom never applies; residual keeps IS NULL semantics
    assert table.read(eq_filters={"lang": None}).count() == 0


def test_bloom_rejects_unportable_types(spark, tmp_path):
    t = ManifestTable.create(spark, str(tmp_path / "t2"), n_buckets=2)
    _batch(spark, t, _rows(0, 10), 0)
    with pytest.raises(ValueError, match="unknown column"):
        build_bloom(t, ["nope"])
    with pytest.raises(ValueError, match="canonicalize"):
        build_bloom(t, ["ts"])


def test_bloom_integer_column_and_compaction(table):
    build_bloom(table, ["size_bytes"])
    assert table.read(eq_filters={"size_bytes": 42}).count() == 1
    # several delta builds -> compact folds them; probes still correct
    for b in range(1, 4):
        _batch(table.spark, table, _rows(120 + b * 10, 130 + b * 10), b)
        build_bloom(table, ["size_bytes"])
    rec = compact_bloom(table, max_files=2)
    assert rec["compacted"] is True
    assert table.read(eq_filters={"size_bytes": 135}).count() == 1
    excl = bloom_excluded_rels(table, "size_bytes", 10 ** 9)
    assert len(excl) >= _n_files(table) - 1
