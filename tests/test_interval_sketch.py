"""interval_join (bucketed range-containment) and the bounded-state
sketches (kmv_distinct, frequent_items) against brute-force references."""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vuln_datasync_spark.operators.interval import interval_join
from vuln_datasync_spark.operators.sketch import kmv_distinct, frequent_items


# ---------------------------------------------------------------- interval

def _brute(points, intervals):
    out = set()
    for pid, p in points:
        for iid, s, e in intervals:
            if s <= p <= e:
                out.add((pid, iid))
    return out


@pytest.mark.parametrize("width", [1, 7, 64, 1000])
def test_interval_join_matches_bruteforce(spark, width):
    rng = random.Random(17)
    points = [(i, rng.randint(0, 500)) for i in range(200)]
    intervals = []
    for i in range(60):
        s = rng.randint(-20, 520)
        e = s + rng.randint(0, 40)
        intervals.append((i, s, e))
    # planted degenerates: zero-width, end<start (dropped), null bounds
    intervals += [(100, 250, 250), (101, 300, 290)]
    p = spark.createDataFrame(points, "pid long, p long")
    iv = spark.createDataFrame(intervals, "iid long, s long, e long")
    iv = iv.unionByName(
        spark.createDataFrame([(102, None, 10), (103, 5, None)],
                              "iid long, s long, e long")
    )
    got = {
        (r.pid, r.iid)
        for r in interval_join(p, iv, "p", "s", "e", width).collect()
    }
    assert got == _brute(points, intervals)


def test_interval_join_timestamps(spark):
    p = spark.createDataFrame(
        [(1, "2024-01-01 00:00:05"), (2, "2024-01-01 00:01:00")],
        "pid long, p string",
    ).select("pid", F.col("p").cast("timestamp").alias("p"))
    iv = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", "2024-01-01 00:00:30")],
        "iid long, s string, e string",
    ).select(
        "iid",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    rows = interval_join(
        p, iv, "p", "s", "e", bucket_width=10_000_000  # 10s in micros
    ).collect()
    assert [(r.pid, r.iid) for r in rows] == [(1, 10)]


def test_interval_join_validations(spark):
    p = spark.createDataFrame([(1, 1)], "pid long, p long")
    iv = spark.createDataFrame([(1, 0, 5)], "iid long, s long, e long")
    with pytest.raises(ValueError, match="positive"):
        interval_join(p, iv, "p", "s", "e", 0)
    with pytest.raises(ValueError, match="collision"):
        interval_join(p, iv.withColumnRenamed("iid", "pid"), "p", "s", "e", 4)
    with pytest.raises(ValueError, match="reserved"):
        interval_join(
            p.withColumn("_vds_bucket", F.lit(1)), iv, "p", "s", "e", 4
        )


def test_interval_join_max_expansion_guard(spark):
    p = spark.createDataFrame([(1, 5)], "pid long, p long")
    iv = spark.createDataFrame([(1, 0, 10_000)], "iid long, s long, e long")
    with pytest.raises(Exception, match="max_expansion"):
        interval_join(p, iv, "p", "s", "e", 1, max_expansion=100).collect()


# ----------------------------------------------------------------- sketch

def test_kmv_exact_below_k(spark):
    rows = [(g, v) for g in ("a", "b") for v in range(10) for _ in range(3)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r.g: r.est_distinct for r in
           kmv_distinct(df, ["g"], "v", k=64).collect()}
    assert got == {"a": 10, "b": 10}


def test_kmv_estimate_accuracy_and_partition_invariance(spark):
    rows = [("g", v) for v in range(5000)]
    df = spark.createDataFrame(rows, "g string, v long")
    est1 = kmv_distinct(df.repartition(1), ["g"], "v", k=256).collect()
    est8 = kmv_distinct(df.repartition(8), ["g"], "v", k=256).collect()
    # deterministic hash -> global k-th smallest identical however the
    # rows were partitioned
    assert est1[0].est_distinct == est8[0].est_distinct
    assert abs(est1[0].est_distinct - 5000) / 5000 < 0.25


def test_kmv_ignores_nulls_and_validates(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2)], "g string, v long"
    )
    [r] = kmv_distinct(df, ["g"], "v", k=8).collect()
    assert r.est_distinct == 2
    with pytest.raises(ValueError, match="k must be"):
        kmv_distinct(df, ["g"], "v", k=1)


def test_kmv_global_no_group_cols(spark):
    """group_cols=[] is the CLI's global-distinct path: one row out, and
    the global sketch must equal merging per-segment sketches."""
    from vuln_datasync_spark.operators.sketch import (
        kmv_merge_estimate,
        kmv_sketch,
    )

    df = spark.range(6000).selectExpr(
        "id % 5 as seg", "id % 997 as v"
    ).repartition(8)
    [d] = kmv_distinct(df, [], "v", k=64).collect()
    [g] = kmv_sketch(df, [], "v", k=64).collect()
    [m] = kmv_merge_estimate(
        kmv_sketch(df, ["seg"], "v", k=64), k=64
    ).collect()
    assert d.est_distinct == m.est_distinct
    assert list(g.hashes) == sorted(g.hashes) and len(g.hashes) == 64


def test_frequent_items_exact(spark):
    rows = (["hot"] * 50 + ["warm"] * 10 + [f"u{i}" for i in range(400)])
    df = spark.createDataFrame([(k,) for k in rows], "k string")
    got = {(r.key, r.cnt) for r in
           frequent_items(df.repartition(8), "k", min_count=10,
                          capacity=64).collect()}
    assert got == {("hot", 50), ("warm", 10)}


def test_frequent_items_capacity_guard_aborts(spark):
    # min_count <= N/(capacity+1): completeness not guaranteed -> the
    # in-plan assert_true must abort rather than silently truncate
    df = spark.createDataFrame([(f"u{i % 7}",) for i in range(300)],
                               "k string")
    with pytest.raises(Exception, match="capacity"):
        frequent_items(df, "k", min_count=2, capacity=3).collect()


def test_frequent_items_misra_gries_superset_under_adversarial_skew(spark):
    # one partition, many near-threshold keys: candidates must still
    # contain every key whose TRUE count clears min_count
    rows = []
    for i in range(40):
        rows += [f"k{i}"] * (20 + (i % 3))
    random.Random(3).shuffle(rows)
    df = spark.createDataFrame([(k,) for k in rows], "k string").coalesce(1)
    got = {r.key: r.cnt for r in
           frequent_items(df, "k", min_count=21, capacity=64).collect()}
    want = {}
    for i in range(40):
        c = 20 + (i % 3)
        if c >= 21:
            want[f"k{i}"] = c
    assert got == want


def test_kmv_sketch_merge_equals_direct(spark):
    """Sketch algebra is EXACT: merging per-segment sketches must equal
    sketching the unioned data bit-for-bit, and residual-group merges
    must equal direct per-group estimates."""
    from pyspark.sql import functions as F

    from vuln_datasync_spark.operators.sketch import (
        kmv_distinct,
        kmv_merge_estimate,
        kmv_sketch,
    )

    df = spark.range(30000).select(
        (F.col("id") % 7).alias("seg"),
        (F.col("id") % 2).alias("side"),
        (F.col("id") % 4111).alias("v"),
    )
    k = 64
    # global: merge 7 segment sketches == direct estimate over the union
    sk = kmv_sketch(df, ["seg"], "v", k=k)
    merged = kmv_merge_estimate(sk, k=k).collect()
    direct = kmv_distinct(df.select(F.lit(1).alias("g"), "v"), ["g"], "v", k=k).collect()
    assert len(merged) == 1
    assert merged[0]["est_distinct"] == direct[0]["est_distinct"]

    # residual group: (seg, side) sketches merged over seg == per-side direct
    sk2 = kmv_sketch(df, ["seg", "side"], "v", k=k)
    merged2 = {
        r["side"]: r["est_distinct"]
        for r in kmv_merge_estimate(sk2, k=k, group_cols=["side"]).collect()
    }
    direct2 = {
        r["side"]: r["est_distinct"]
        for r in kmv_distinct(df, ["side"], "v", k=k).collect()
    }
    assert merged2 == direct2

    # sketch arrays are sorted, bounded by k, and exact below k
    small = kmv_sketch(df.filter(F.col("v") < 10), ["side"], "v", k=k)
    for r in small.collect():
        hs = list(r["hashes"])
        assert hs == sorted(hs) and len(hs) <= 10
