"""LWW resolution: both strategies agree, ties are deterministic at any
parallelism, duplicates collapse (SURVEY.md §2.6 / §7.3 #2-3)."""

from pyspark.sql import functions as F

from vuln_datasync_spark.datagen import generate_changelog_pandas
from vuln_datasync_spark.operators.lww import lww_resolve


def _fingerprint(df):
    return (
        df.select(
            F.sha2(
                F.concat_ws(
                    "|", "repo", "path", "commit", F.col("commit_seq").cast("string")
                ),
                256,
            ).alias("h")
        )
        .agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")))
        .first()[0]
    )


def test_all_modes_agree(spark):
    ev = generate_changelog_pandas(4000, seed=7)
    df = spark.createDataFrame(ev)
    prints = {
        mode: _fingerprint(lww_resolve(df, mode=mode, n_salts=8))
        for mode in ("maxby", "salted", "ordkey", "window")
    }
    assert len(set(prints.values())) == 1, prints
    # ordkey must also agree without the broadcast fast path
    assert (
        _fingerprint(lww_resolve(df, mode="ordkey", broadcast_winners=False))
        == prints["ordkey"]
    )


def test_parallelism_invariance(spark):
    ev = generate_changelog_pandas(3000, seed=11)
    df = spark.createDataFrame(ev)
    a = _fingerprint(lww_resolve(df.repartition(1)))
    b = _fingerprint(lww_resolve(df.repartition(17)))
    assert a == b


def test_duplicates_collapse_and_one_row_per_key(spark):
    ev = generate_changelog_pandas(3000, seed=13)
    df = spark.createDataFrame(ev)
    won = lww_resolve(df).cache()
    n_keys = df.select("repo", "path").distinct().count()
    assert won.count() == n_keys
    # winner per key == max (commit_seq, commit, op) among that key's events
    expected = (
        ev.sort_values(["commit_seq", "commit", "op"], kind="stable")
        .groupby(["repo", "path"], sort=False)
        .tail(1)
    )
    got = {(r["repo"], r["path"]): r["commit_seq"] for r in won.collect()}
    for _, row in expected.iterrows():
        assert got[(row.repo, row.path)] == row.commit_seq
    won.unpersist()
