"""AS-OF join: <= / strict < semantics, ties, and no-match nulls."""

from vuln_datasync_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [("k1", 5, "L5"), ("k1", 10, "L10"), ("k1", 20, "L20"),
         ("k2", 7, "L7")],
        "k string, seq long, lbl string",
    )
    right = spark.createDataFrame(
        [("k1", 10, "R10"), ("k1", 15, "R15"), ("k3", 1, "R1")],
        "k string, seq long, rlbl string",
    )
    return left, right


def test_asof_latest_at_or_before(spark):
    left, right = _frames(spark)
    got = {
        (r["k"], r["seq"]): r["rlbl_asof"]
        for r in asof_join(
            left, right, on=["k"], left_ord="seq", right_ord="seq",
            right_cols=["rlbl"],
        ).collect()
    }
    assert got[("k1", 5)] is None          # nothing at or before 5
    assert got[("k1", 10)] == "R10"        # tie: <= includes equal seq
    assert got[("k1", 20)] == "R15"        # latest of {10, 15}
    assert got[("k2", 7)] is None          # key with no right rows
    assert len(got) == 4                   # every left row survives


def test_asof_strict_excludes_equal(spark):
    left, right = _frames(spark)
    got = {
        (r["k"], r["seq"]): r["rlbl_asof"]
        for r in asof_join(
            left, right, on=["k"], left_ord="seq", right_ord="seq",
            right_cols=["rlbl"], strict=True,
        ).collect()
    }
    assert got[("k1", 10)] is None         # strict: equal seq no longer matches
    assert got[("k1", 20)] == "R15"
