"""Sessionization, funnel, and SCD2 history: planted fixtures with
hand-computed expectations, a randomized funnel brute-force check, and
the incremental SCD2 sync vs the table's own snapshot history."""

import datetime as dt
import json
import os
import random

from pyspark.sql import types as T

from vuln_datasync_spark.operators.sessions import (
    funnel_counts,
    funnel_steps,
    scd2_from_changelog,
    session_stats,
    sessionize,
)
from vuln_datasync_spark.pipelines.scd_sync import (
    read_scd2,
    scd2_as_of,
    sync_scd2,
)
from vuln_datasync_spark.sinks.manifest_table import ManifestTable

from .test_change_feed import CHANGELOG_SCHEMA, _batch

EV = T.StructType(
    [
        T.StructField("u", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("eid", T.LongType()),
        T.StructField("et", T.StringType()),
    ]
)


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, _ts(s), eid, et) for (u, s, eid, et) in rows], EV
    )


def test_sessionize_gaps_and_tiebreak(spark):
    df = _ev(
        spark,
        [
            (1, 0, 1, "a"),
            (1, 100, 2, "a"),   # gap 100 <= 100 -> same session
            (1, 201, 3, "a"),   # gap 101 > 100 -> new session
            (1, 201, 4, "a"),   # tie ts, eid orders it; gap 0 -> same
            (2, 0, 5, "a"),     # other key restarts numbering
        ],
    )
    got = {
        r["eid"]: r["session_idx"]
        for r in sessionize(df, "u", "ts", 100, "eid").collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_session_stats_counts_and_duration(spark):
    df = _ev(
        spark,
        [(1, 0, 1, "a"), (1, 50, 2, "a"), (1, 500, 3, "a")],
    )
    rows = {
        (r["u"], r["session_idx"]): (r["n_events"], r["duration_us"])
        for r in session_stats(df, "u", "ts", 100, "eid").collect()
    }
    assert rows == {(1, 1): (2, 50_000_000), (1, 2): (1, 0)}


def test_funnel_requires_order(spark):
    df = _ev(
        spark,
        [
            # u1 completes in order
            (1, 0, 1, "view"),
            (1, 10, 2, "click"),
            (1, 20, 3, "purchase"),
            # u2: click BEFORE view -> never reaches step 2
            (2, 0, 4, "click"),
            (2, 10, 5, "view"),
            (2, 20, 6, "purchase"),  # purchase needs a qualifying click
            # u3: only view
            (3, 0, 7, "view"),
        ],
    )
    per = {
        r["u"]: (r["step1_us"], r["step2_us"], r["step3_us"])
        for r in funnel_steps(
            df, "u", "ts", "et", ["view", "click", "purchase"], "eid"
        ).collect()
    }
    assert per[1][0] is not None and per[1][2] is not None
    assert per[2][0] is not None and per[2][1] is None and per[2][2] is None
    assert per[3] == (per[3][0], None, None)
    counts = {
        r["step_idx"]: (r["n_keys"], r["conversion"])
        for r in funnel_counts(
            df, "u", "ts", "et", ["view", "click", "purchase"], "eid"
        ).collect()
    }
    assert counts[1] == (3, 1.0)
    assert counts[2][0] == 1
    assert counts[3][0] == 1


def test_funnel_same_ts_uses_tiebreak_strictly_after(spark):
    # view and click at the SAME ts: click (higher eid) follows view in
    # event order, so it counts; a click with LOWER eid would not
    df = _ev(spark, [(1, 0, 1, "view"), (1, 0, 2, "click")])
    r = funnel_steps(df, "u", "ts", "et", ["view", "click"], "eid").collect()[0]
    assert r["step2_us"] is not None
    df2 = _ev(spark, [(1, 0, 2, "view"), (1, 0, 1, "click")])
    r2 = funnel_steps(df2, "u", "ts", "et", ["view", "click"], "eid").collect()[0]
    assert r2["step2_us"] is None


def _brute_funnel(events, steps):
    # greedy earliest-completion subsequence match per key
    done = {}
    for u in {e[0] for e in events}:
        evs = sorted(
            [e for e in events if e[0] == u], key=lambda e: (e[1], e[2])
        )
        ts = []
        for s in steps:
            start = ts[-1] if ts else -1
            hit = next(
                (
                    i
                    for i, e in enumerate(evs)
                    if e[3] == s and i > start
                ),
                None,
            )
            if hit is None:
                break
            ts.append(hit)
        done[u] = len(ts)
    return done


def test_funnel_randomized_vs_bruteforce(spark):
    rng = random.Random(7)
    types = ["view", "click", "purchase", "other"]
    events = [
        (rng.randrange(8), rng.randrange(50), i, rng.choice(types))
        for i in range(300)
    ]
    steps = ["view", "click", "purchase"]
    got = {
        r["u"]: sum(
            r[f"step{i + 1}_us"] is not None for i in range(len(steps))
        )
        for r in funnel_steps(
            _ev(spark, events), "u", "ts", "et", steps, "eid"
        ).collect()
    }
    exp = _brute_funnel(events, steps)
    # greedy earliest matching reaches the deepest reachable step
    assert got == exp


def test_scd2_from_changelog_versions_and_deletes(spark):
    df = _ev(
        spark,
        [
            (1, 0, 10, "a"),
            (1, 10, 20, "b"),
            (1, 20, 30, "DEL"),   # closes version b, opens nothing
            (1, 30, 40, "c"),     # re-insert after delete
            (2, 0, 50, "x"),
            (2, 10, 60, "DEL"),   # key 2 ends deleted: no current row
        ],
    )
    from pyspark.sql import functions as F

    out = scd2_from_changelog(
        df, ["u"], "eid", ["et"], delete_col=F.col("et") == "DEL"
    ).collect()
    rows = {
        (r["u"], r["valid_from_seq"]): (
            r["et"],
            r["valid_to_seq"],
            r["is_current"],
        )
        for r in out
    }
    assert rows == {
        (1, 10): ("a", 20, False),
        (1, 20): ("b", 30, False),
        (1, 40): ("c", None, True),
        (2, 50): ("x", 60, False),
    }


def _history(spark, root):
    return {
        (r["repo"], r["path"], r["valid_from_ms"]): (
            r["content"],
            r["valid_to_ms"] is None,
        )
        for r in read_scd2(spark, root).collect()
    }


def test_sync_scd2_incremental_history(spark, tmp_path):
    table = ManifestTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    root = str(tmp_path / "scd")

    _batch(
        spark, table,
        [
            (1, "insert", "r1", "a.py", "c1", "python", "v1", None, 10),
            (2, "insert", "r2", "b.go", "c2", "go", "v2", None, 20),
        ],
        0,
    )
    rec = sync_scd2(table, root)
    s1 = table.current_snapshot_id()
    assert rec["current_rows"] == 2 and rec["closed_rows"] == 0
    assert sync_scd2(table, root) is None  # already current

    _batch(
        spark, table,
        [
            (3, "update", "r1", "a.py", "c3", "python", "v3", None, 11),
            (4, "delete", "r2", "b.go", "c4", None, None, None, None),
            (5, "insert", "r3", "c.rs", "c5", "rust", "v5", None, 7),
        ],
        1,
    )
    rec2 = sync_scd2(table, root)
    assert rec2["current_rows"] == 2  # a.py v3 + c.rs; b.go closed
    assert rec2["closed_rows"] == 2   # old a.py + deleted b.go

    h = _history(spark, root)
    opens = {k[:2] for k, v in h.items() if v[1]}
    assert opens == {("r1", "a.py"), ("r3", "c.rs")}
    # full history: 2 original versions + 2 new opens
    assert len(h) == 4
    # current content matches the live table
    cur = {
        (r["repo"], r["path"]): r["content"]
        for r in read_scd2(spark, root, current_only=True).collect()
    }
    live = {
        (r["repo"], r["path"]): r["content"] for r in table.read().collect()
    }
    assert cur == live

    # point-in-time: as of snapshot-1's commit instant the dimension
    # equals the table AT that snapshot
    ms1 = int(s1.split("-", 1)[0])
    asof = {
        (r["repo"], r["path"]): r["content"]
        for r in scd2_as_of(spark, root, ms1).collect()
    }
    old = {
        (r["repo"], r["path"]): r["content"]
        for r in table.read(snapshot_id=s1).collect()
    }
    assert asof == old

    # at-least-once replay: reset the cursor only — state must not
    # double-close or duplicate versions
    cpath = os.path.join(str(tmp_path / "t"), "_feeds", "scd2.json")
    cur_js = json.load(open(cpath))
    cur_js["snapshot_id"] = cur_js["from_snapshot_id"]
    json.dump(cur_js, open(cpath, "w"))
    rec3 = sync_scd2(table, root)
    assert rec3 is not None and rec3.get("replayed_noop") is True
    assert _history(spark, root) == h


def test_retention_cohorts_triangle(spark):
    from vuln_datasync_spark.operators.sessions import retention_cohorts

    # periods of 100s; u1 first at p0, active p0+p2; u2 first at p2 only
    df = _ev(
        spark,
        [
            (1, 10, 1, "a"),
            (1, 20, 2, "a"),    # same period as first -> offset 0
            (1, 250, 3, "a"),   # period 2 -> offset 2
            (2, 210, 4, "a"),   # cohort p2, offset 0
        ],
    )
    got = {
        (r["cohort_period"], r["period_n"]): r["n_keys"]
        for r in retention_cohorts(df, "u", "ts", 100).collect()
    }
    base = dt.datetime(2024, 1, 1).timestamp()
    p0 = int((base * 1_000_000) // 100_000_000)
    assert got == {(p0, 0): 1, (p0, 2): 1, (p0 + 2, 0): 1}
