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


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized parity with pandas.merge_asof (backward direction) —
    independent reference implementation, both tie modes."""
    import random

    import pandas as pd

    for seed, strict in [(11, False), (12, True)]:
        rng = random.Random(seed)
        lrows = [
            (f"k{rng.randrange(6)}", rng.randrange(100), f"L{i}")
            for i in range(120)
        ]
        rrows = [
            (f"k{rng.randrange(6)}", rng.randrange(100), f"R{i}")
            for i in range(80)
        ]
        # merge_asof needs unique, sorted ordering; dedupe (k, seq) keeping
        # the last so "latest right at each seq" is well-defined
        rdict = {}
        for k, seq, lbl in rrows:
            rdict[(k, seq)] = lbl
        rrows = [(k, s, v) for (k, s), v in rdict.items()]

        left = spark.createDataFrame(lrows, "k string, seq long, lbl string")
        right = spark.createDataFrame(rrows, "k string, seq long, rlbl string")
        got = {
            (r["k"], r["seq"], r["lbl"]): r["rlbl_asof"]
            for r in asof_join(
                left, right, on=["k"], left_ord="seq", right_ord="seq",
                right_cols=["rlbl"], strict=strict,
            ).collect()
        }

        lp = pd.DataFrame(lrows, columns=["k", "seq", "lbl"]).sort_values(
            "seq", kind="stable"
        )
        rp = pd.DataFrame(rrows, columns=["k", "seq", "rlbl"]).sort_values(
            "seq", kind="stable"
        )
        want_df = pd.merge_asof(
            lp, rp, on="seq", by="k", direction="backward",
            allow_exact_matches=not strict,
        )
        want = {
            (r.k, r.seq, r.lbl): (None if pd.isna(r.rlbl) else r.rlbl)
            for r in want_df.itertuples()
        }
        assert got == want, f"seed {seed} strict={strict}"


def test_asof_reserved_and_collision_names_raise(spark):
    import pytest

    left, right = _frames(spark)
    with pytest.raises(ValueError, match="reserved column"):
        asof_join(
            left.withColumnRenamed("lbl", "_carry"), right, on=["k"],
            left_ord="seq", right_ord="seq", right_cols=["rlbl"],
        )
    with pytest.raises(ValueError, match="reserved column"):
        asof_join(
            left, right.withColumnRenamed("rlbl", "_rv"), on=["k"],
            left_ord="seq", right_ord="seq", right_cols=["_rv"],
        )
    with pytest.raises(ValueError, match="output name collision"):
        asof_join(
            left.withColumnRenamed("lbl", "rlbl_asof"), right, on=["k"],
            left_ord="seq", right_ord="seq", right_cols=["rlbl"],
        )


def test_asof_dedupe_right_matches_pandas_with_planted_dups(spark):
    """Planted right-side duplicates at the same (key, order): with
    dedupe_right=True the carry is the max payload per (key, order) —
    the documented deterministic resolution — verified against
    pandas.merge_asof over the pre-deduped right side."""
    import random

    import pandas as pd

    for seed, strict in [(21, False), (22, True)]:
        rng = random.Random(seed)
        lrows = [
            (f"k{rng.randrange(5)}", rng.randrange(60), f"L{i}")
            for i in range(100)
        ]
        # ~half the right rows collide on (k, seq) with different payloads
        rrows = [
            (f"k{rng.randrange(5)}", rng.randrange(30), f"R{i}")
            for i in range(90)
        ]
        left = spark.createDataFrame(lrows, "k string, seq long, lbl string")
        right = spark.createDataFrame(rrows, "k string, seq long, rlbl string")
        got = {
            (r["k"], r["seq"], r["lbl"]): r["rlbl_asof"]
            for r in asof_join(
                left, right, on=["k"], left_ord="seq", right_ord="seq",
                right_cols=["rlbl"], strict=strict, dedupe_right=True,
            ).collect()
        }

        rdict = {}
        for k, seq, lbl in rrows:  # max payload per (k, seq)
            rdict[(k, seq)] = max(rdict.get((k, seq), lbl), lbl)
        lp = pd.DataFrame(lrows, columns=["k", "seq", "lbl"]).sort_values(
            "seq", kind="stable"
        )
        rp = pd.DataFrame(
            [(k, s, v) for (k, s), v in rdict.items()],
            columns=["k", "seq", "rlbl"],
        ).sort_values("seq", kind="stable")
        want_df = pd.merge_asof(
            lp, rp, on="seq", by="k", direction="backward",
            allow_exact_matches=not strict,
        )
        want = {
            (r.k, r.seq, r.lbl): (None if pd.isna(r.rlbl) else r.rlbl)
            for r in want_df.itertuples()
        }
        assert got == want, f"seed {seed} strict={strict}"
