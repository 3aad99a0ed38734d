"""Composed corpus-prep pipeline: stage semantics on a planted fixture."""

from pyspark.sql import functions as F

from vuln_datasync_spark.pipelines import prepare_training_corpus

GOOD_EN = (
    "the quick brown fox jumps over the lazy dog and then the dog "
    "sleeps in the warm sun for a while with the happy fox nearby. "
) * 4


def test_prepare_training_corpus_stages(spark):
    rows = [
        (1, GOOD_EN),                       # kept
        (2, GOOD_EN),                       # exact dup of 1 -> dropped
        (3, GOOD_EN + "tiny tail change"),  # near-dup of 1 -> dropped
        (4, "der hund und die katze sind mit dem ball im garten und "
            "das ist ein gutes spiel von der gruppe zu sehen " * 3),
        # ^ German -> dropped by language filter
        (5, "x! y! z!"),                    # low quality -> dropped
        (6, "the cat walks along the fence with a calm look and the "
            "birds watch from the tree while the wind moves softly " * 3),
        # ^ kept (distinct content, en, good quality)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_training_corpus(df, min_quality=0.4, languages=("en",))
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1, 6}
    assert all(r["pred_lang"] == "en" for r in got.values())
    assert all(r["quality"] >= 0.4 for r in got.values())
    assert all(r["split"] in ("train", "val", "test") for r in got.values())


def test_prepare_training_corpus_split_stability(spark):
    """Adding documents must not move existing docs between splits."""
    base = spark.createDataFrame(
        [(i, GOOD_EN + f" variant {i} " + "unique words "
          + " ".join(f"tok{i}x{j}" for j in range(30)))
         for i in range(20)],
        "doc_id long, text string",
    )
    first = {
        r["doc_id"]: r["split"]
        for r in prepare_training_corpus(
            base, neardup=False, languages=("en", "und")
        ).collect()
    }
    grown = base.unionByName(
        spark.createDataFrame(
            [(100 + i, GOOD_EN + f" fresh {i} "
              + " ".join(f"new{i}y{j}" for j in range(30)))
             for i in range(10)],
            "doc_id long, text string",
        )
    )
    second = {
        r["doc_id"]: r["split"]
        for r in prepare_training_corpus(
            grown, neardup=False, languages=("en", "und")
        ).collect()
    }
    for doc_id, split in first.items():
        assert second[doc_id] == split
