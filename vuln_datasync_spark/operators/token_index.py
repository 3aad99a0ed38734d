"""Persisted inverted token index: term → posting list, for O(terms)
retrieval and benchmark-decontamination probes over an unbounded corpus.

``contamination_report`` (operators/corpus.py) answers "how much of this
benchmark leaked into the corpus" with a vocabulary semi-join — right for
a one-shot audit, wrong for the interactive flows a 100 TB corpus needs
daily: "which documents contain this exact prompt/phrase" (takedowns,
eval-leak triage, attribution queries). A full-corpus scan per question
is the scale-killer; the inverted index answers from the posting lists
alone.

Layout mirrors the MinHash index (operators/dedup_index.py): rows
``(term, id, tf)`` partitioned by ``pfx`` = first two hex chars of
``md5(term)`` — a FIXED 256-directory fan-out whatever the corpus size,
with the "x" type-inference guard on the partition values. A probe
computes its terms' prefixes driver-side (same md5, via hashlib) and
reads ONLY those partitions: I/O ∝ the probed terms' posting lists,
never the corpus. Terms are maximal ``[a-z0-9]+`` runs of the lowercased
text, so punctuation cannot split a phrase differently at build and
probe time.

Reference analog: the reference answers "is this alias known" with a
Postgres b-tree probe (sql/vulnerabilities.sql:96-101 GetVulnByAlias);
this is the same index-not-scan move for document content.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"


def _terms(text_col: str):
    return F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(TOKEN_RE), F.lit(0)
    )


def build_token_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    out_path: str,
    mode: str = "overwrite",
) -> None:
    """Materialize the inverted index for ``df``. One explode + one
    (term, id) agg — shuffle ∝ corpus token volume, map-side combined;
    the write fans into at most 256 ``pfx`` directories."""
    rows = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(_terms(text_col)).alias("term"),
        )
        .groupBy("term", "id")
        .agg(F.count("*").cast("long").alias("tf"))
        .withColumn("pfx", F.concat(F.lit("x"), F.substring(F.md5("term"), 1, 2)))
    )
    rows.write.mode(mode).partitionBy("pfx").parquet(out_path)


def _probe_terms(phrase: str, relax_edges: bool = False) -> list[str]:
    """Terms a candidate document must contain. With ``relax_edges`` (the
    verbatim-recheck path, >=3-token phrases) the FIRST and LAST phrase
    tokens are dropped from the requirement: in the text they may be
    embedded in a longer ``[a-z0-9]`` run (text 'rehash joins' contains
    the verbatim substring 'hash join' but tokenizes to rehash/joins), so
    requiring them would miss true verbatim occurrences. Interior tokens
    are safe to require — inside the phrase they are flanked by
    non-alphanumeric characters on both sides, so any verbatim occurrence
    yields them as complete tokens."""
    import re

    toks = re.findall(TOKEN_RE, phrase.lower())
    if not toks:
        raise ValueError(f"phrase has no indexable terms: {phrase!r}")
    if relax_edges and len(toks) >= 3:
        return sorted(set(toks[1:-1]))
    return sorted(set(toks))


def load_postings(
    spark: SparkSession, index_path: str, terms: list[str]
) -> DataFrame:
    """Posting lists for ``terms``: reads only the md5-prefix partitions
    the terms hash into (directory pruning — guarded by a plan test)."""
    pfxs = sorted(
        {"x" + hashlib.md5(t.encode()).hexdigest()[:2] for t in terms}
    )
    return (
        spark.read.parquet(index_path)
        .filter(F.col("pfx").isin(pfxs))
        .filter(F.col("term").isin(list(terms)))
    )


def search_token_index(
    spark: SparkSession,
    index_path: str,
    phrase: str,
    docs: DataFrame | None = None,
    text_col: str | None = None,
    id_col: str = "id",
) -> DataFrame:
    """Ids of documents whose token set contains EVERY term of ``phrase``
    (AND-of-terms retrieval), as a one-column ``id`` frame.

    When ``docs``/``text_col`` are given, candidates are additionally
    rechecked for the exact (lowercased) substring — the decontamination
    question "does the corpus contain this eval prompt verbatim". The
    recheck joins the candidate ids (broadcast — posting-list sized)
    back to the corpus, so the full text is read only for candidate
    rows; the corpus is never scanned for the search itself.

    BOUNDARY SEMANTICS. Phrase-EDGE tokens can be embedded in a longer
    alphanumeric run in the text ('rehash joins' contains the verbatim
    substring 'hash join' but tokenizes to rehash/joins), which the
    token index cannot see. On the verbatim-recheck path with a phrase
    of >=3 tokens this is handled exactly: the edge tokens are dropped
    from the candidate AND (interior tokens alone are required — they
    are guaranteed complete tokens in any verbatim occurrence) and the
    substring recheck restores precision, so the result is EXACTLY the
    verbatim-substring match set. For 1-2-token phrases every token is
    an edge and no interior anchor exists, so candidates require all
    tokens and a run-embedded occurrence is NOT reported — the result
    is "verbatim substring AND every phrase token present as a complete
    token" (the documented, oracle-encoded form). Index-only retrieval
    (``docs=None``) always uses token-containment semantics.
    """
    terms = _probe_terms(phrase, relax_edges=docs is not None)
    cand = (
        load_postings(spark, index_path, terms)
        .groupBy("id")
        .agg(F.count_distinct("term").alias("_nt"))
        .filter(F.col("_nt") == len(terms))
        .select("id")
    )
    if docs is None:
        return cand
    if text_col is None:
        raise ValueError("text_col required when docs is given")
    return (
        docs.join(F.broadcast(cand), docs[id_col] == cand["id"], "inner")
        .filter(
            F.contains(F.lower(F.col(text_col)), F.lit(phrase.lower()))
        )
        .select(docs[id_col].alias("id"))
    )


def _batch_rows(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(_terms(text_col)).alias("term"),
        )
        .groupBy("term", "id")
        .agg(F.count("*").cast("long").alias("tf"))
        .withColumn(
            "pfx", F.concat(F.lit("x"), F.substring(F.md5("term"), 1, 2))
        )
    )


def upsert_token_index(
    spark: SparkSession,
    index_path: str,
    new_docs: DataFrame,
    text_col: str,
    id_col: str,
    old_docs: DataFrame | None = None,
) -> int:
    """Fold a micro-batch into the index by rewriting ONLY the ``pfx``
    partitions its terms hash into (dynamic partition overwrite):
    existing rows in touched partitions are unioned in with the batch's
    ids replaced, so replaying a batch is idempotent. Returns the number
    of partitions rewritten. Untouched partition files stay byte
    identical — I/O ∝ the batch's term spread, never index size.

    For CONTENT-CHANGED ids pass ``old_docs`` (the change feed's
    preimage rows, e.g. ``read_changes(include_preimage=True)``): the
    old text's partitions join the touched set, so the id's stale
    postings there are cleared in the same rewrite. Without a preimage a
    changed id's postings under terms it no longer contains survive in
    partitions this batch doesn't touch — that flow needs the preimage
    or a rebuild (same contract as upsert_minhash_index)."""
    batch = _batch_rows(new_docs, text_col, id_col).localCheckpoint()
    touch_src = batch.select("pfx", "id")
    if old_docs is not None:
        touch_src = touch_src.unionByName(
            _batch_rows(old_docs, text_col, id_col).select("pfx", "id")
        )
    touch_src = touch_src.localCheckpoint()
    touched = [
        r["pfx"] for r in touch_src.select("pfx").distinct().collect()
    ]
    ids = [r["id"] for r in touch_src.select("id").distinct().collect()]
    existing = (
        spark.read.parquet(index_path)
        .filter(F.col("pfx").isin(touched))
        .filter(~F.col("id").isin(ids))
        .select("term", "id", "tf", "pfx")
    )
    # materialize before writing: `out` reads the partitions the write
    # below replaces — a lazy plan would race its own overwrite
    out = existing.unionByName(
        batch.select("term", "id", "tf", "pfx")
    ).localCheckpoint()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.mode("overwrite").partitionBy("pfx").parquet(index_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # dynamic overwrite only replaces partitions PRESENT in the written
    # data — a touched partition whose every row was cleared (preimage
    # terms nobody else uses) is vacated and must be removed explicitly
    import shutil

    kept = {r["pfx"] for r in out.select("pfx").distinct().collect()}
    for p in set(touched) - kept:
        shutil.rmtree(
            os.path.join(_strip_scheme(index_path), f"pfx={p}"),
            ignore_errors=True,
        )
    return len(touched)


def _strip_scheme(path: str) -> str:
    return path[len("file:"):] if path.startswith("file:") else path
