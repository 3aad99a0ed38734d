"""Corpus-preparation operators for training-data pipelines.

Complements dedup/similarity/text: deterministic dataset splitting,
document chunking, and benchmark-contamination measurement. All pure
column expressions (whole-stage codegen, no Python), all reproducible in
any engine via the md5-fraction idiom, so every operator is
value-checkable against a SQL oracle.

* hash_split            — stable train/val/test assignment from
                          md5(id || salt); adding data never reshuffles
                          existing assignments (the property random()
                          splits lack), and the split survives reruns,
                          engines, and partitioning.
* chunk_documents       — fixed-width character chunks with overlap via
                          sequence + posexplode; 1:N fan-out with no
                          shuffle, chunk provenance (doc, idx, offset)
                          preserved.
* contamination_report  — per-benchmark-document fraction of shingles
                          present anywhere in the training corpus
                          (n-gram overlap contamination, the
                          train/test-leak check): distinct-shingle semi
                          join, shuffle ∝ vocabulary, never pairwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles_of_lowered


def _md5_fraction(col: Column, salt: str) -> Column:
    """Deterministic uniform [0,1) from md5(col || salt): top 15 hex
    digits -> integer / 16^15. 16^15 = 2^60 is a power of two, so the
    only rounding is the IEEE double conversion of the numerator —
    identical in every engine (DuckDB: CAST(concat('0x', substring(
    md5(x||salt),1,15)) AS UBIGINT) / POWER(16,15))."""
    return (
        F.conv(F.substring(F.md5(F.concat(col, F.lit(salt))), 1, 15), 16, 10)
        .cast("double")
        / F.lit(float(16**15))
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "v1",
) -> DataFrame:
    """Assign each row a stable split label. ``weights`` maps label ->
    fraction (must sum to ~1; dict order defines the cumulative
    intervals). Rows hash on (id, salt) only — new data never moves old
    rows between splits, and bumping ``salt`` is an explicit resplit."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    frac = _md5_fraction(F.col(id_col).cast("string"), salt)
    labels = list(weights)
    # null ids hash to null -> every threshold comparison is null-false;
    # route them to the FIRST (largest) split explicitly so they can never
    # silently contaminate the eval/test splits at the tail
    expr = F.when(frac.isNull(), labels[0])
    cum = 0.0
    last = None
    for label, w in weights.items():
        cum += w
        expr = expr.when(frac < F.lit(cum), label)
        last = label
    # float-edge rows (frac == 1.0 cannot happen; frac >= last cum due to
    # weight rounding can) land in the final split
    return df.withColumn("split", expr.otherwise(F.lit(last)))


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_chars: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split each document into fixed-width character chunks with
    ``overlap`` characters of context carried between neighbors.
    Returns (id_col, chunk_idx, chunk_start, chunk_text); empty/null
    documents produce no chunks. Pure fan-out: sequence + posexplode,
    no shuffle, no Python."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    step = chunk_chars - overlap
    # bound = len - overlap - 1: a start inside the previous chunk's
    # overlap region would emit a chunk with ZERO new characters (pure
    # duplicated text — poison for a training corpus)
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.length(F.col(text_col)) - F.lit(overlap) - 1, F.lit(0)
        ),
        F.lit(step),
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
        F.col(text_col).alias("_t"),
    )
    return (
        out.filter(F.length("_t") > 0)
        .select(
            id_col,
            "chunk_idx",
            "chunk_start",
            F.substring(
                F.col("_t"), F.col("chunk_start") + 1, chunk_chars
            ).alias("chunk_text"),
        )
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 8,
) -> DataFrame:
    """For every benchmark document: how much of it already appears in the
    training corpus? Returns (id, n_shingles, n_contaminated,
    contamination) where contamination = fraction of the benchmark doc's
    DISTINCT ``shingle_k``-grams found anywhere in the corpus.

    Plan: explode distinct shingles on both sides, reduce the corpus side
    to its distinct shingle vocabulary (map-side combine), LEFT SEMI join
    the benchmark shingles against it, count per doc. Shuffle is ∝
    vocabulary size; no document ever pairs with another document."""
    # lower(text) projected before the shingle transform references it
    # (a captured lower() re-evaluates per shingle position — see
    # functions/text.py shingles_of_lowered)
    bench_sh = (
        benchmark.select(
            F.col(id_col), F.lower(F.col(text_col)).alias("_low")
        )
        .select(
            F.col(id_col),
            F.explode(shingles_of_lowered(F.col("_low"), shingle_k)).alias(
                "_s"
            ),
        )
        .dropDuplicates([id_col, "_s"])
    )
    corpus_sh = (
        corpus.select(F.lower(F.col(text_col)).alias("_low"))
        .select(
            F.explode(shingles_of_lowered(F.col("_low"), shingle_k)).alias(
                "_s"
            )
        )
        .distinct()
    )
    totals = bench_sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    hits = (
        bench_sh.join(corpus_sh, "_s", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        totals.join(hits, id_col, "left")
        .select(
            id_col,
            "n_shingles",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.round(
                F.coalesce("n_contaminated", F.lit(0))
                / F.col("n_shingles"),
                4,
            ).alias("contamination"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    n_docs: int | None = None,
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf (smoothed:
    idf = ln((N+1)/(df+1)) + 1). Returns (id, term, tf, doc_freq, score)
    with score rounded to 4 decimals and deterministic (score desc, term)
    ordering.

    Plan: whitespace tokenize (pure column exprs), explode, one groupBy
    for term frequencies, one for document frequencies (both map-side
    combined, shuffle ∝ vocabulary), broadcast-joined idf, window top-k.
    No Python anywhere, and no driver-side action: when ``n_docs`` is not
    supplied, N rides the plan as a broadcast one-row crossJoin instead of
    a blocking ``df.count()``."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != "",
            )
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = (
        toks.dropDuplicates([id_col, "term"])
        .groupBy("term")
        .agg(F.count("*").alias("doc_freq"))
    )
    if n_docs is not None:
        n_plus_1 = F.lit(float(n_docs + 1))
        joined = tf.join(dfreq, "term")
    else:
        nd = df.agg(F.count("*").alias("_n_docs"))
        n_plus_1 = (F.col("_n_docs") + 1).cast("double")
        joined = tf.join(dfreq, "term").crossJoin(F.broadcast(nd))
    scored = joined.select(
        id_col,
        "term",
        "tf",
        "doc_freq",
        F.round(
            F.col("tf")
            * (F.log(n_plus_1 / (F.col("doc_freq") + 1)) + F.lit(1.0)),
            4,
        ).alias("score"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its md5-fraction
    of (id, salt) falls below its stratum's target fraction. The standard
    training-data rebalancing move (downsample boilerplate languages /
    sources, keep rare strata whole) with hash_split's stability
    properties: adding data never changes which EXISTING rows are kept,
    reruns and engines agree bit-for-bit, and no shuffle or count pass is
    needed — unlike ``df.sampleBy``, which draws per-task pseudo-random
    numbers that change with partitioning.

    ``fractions`` maps stratum value -> keep fraction in [0, 1]; strata
    not listed keep ``default_fraction`` (0 = drop, 1 = keep all). The
    per-row decision is a pure column expression (whole-stage codegen);
    at 100 TB this is a scan with a predicate, nothing more."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} out of [0,1]: {v}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction out of [0,1]: {default_fraction}")
    frac = _md5_fraction(F.col(id_col).cast("string"), salt)
    target = F.lit(float(default_fraction))
    for value, keep in fractions.items():
        target = F.when(
            F.col(strata_col) == value, F.lit(float(keep))
        ).otherwise(target)
    return df.filter(frac < target)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    budget: int,
    shard_col: str | None = None,
    n_shards: int = 1024,
) -> DataFrame:
    """Assign every item (document/chunk) its position in a stream of
    fixed-``budget`` training sequences — the concatenate-then-cut packing
    GPT-style pipelines use: items are laid end-to-end in ``id_col`` order
    and cut every ``budget`` tokens, so an item may straddle a boundary
    (its tail flows into the next sequence). Returns the input plus
    ``pack_shard``, ``seq_id`` (the sequence its first token lands in,
    0-based within the shard) and ``seq_offset`` (token offset inside
    that sequence).

    ``weight_col`` is the item's token count (any integer weight).
    Packing is per-shard: ``shard_col`` if given, else a deterministic
    md5 hash of the id into ``n_shards`` buckets — a SINGLE global
    ordering would serialize the whole corpus through one partition,
    while per-shard running sums shuffle once on the shard key and keep
    O(1) state per row (a running-total window, the same construction as
    the CDC running aggregates). Deterministic: same inputs, same
    packing, any partitioning."""
    from pyspark.sql import Window as W

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if shard_col is None:
        shard = F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col(id_col).cast("string"), F.lit("shard"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long"),
            F.lit(n_shards),
        )
    else:
        shard = F.col(shard_col)
    w = W.partitionBy("pack_shard").orderBy(id_col)
    cum = F.sum(weight_col).over(w)
    start = cum - F.col(weight_col)
    return (
        df.withColumn("pack_shard", shard.cast("long"))
        .withColumn("seq_id", F.floor(start / F.lit(budget)))
        .withColumn("seq_offset", (start % F.lit(budget)).cast("long"))
    )


def repetition_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Gopher-style repetition quality signals per document: the fraction
    of non-empty lines that are duplicates of another line in the same
    doc, and the share of the doc's word 2-grams / 3-grams taken by the
    single most frequent one (templated/boilerplate text scores high on
    both; Rae et al. 2021 §A1.1 uses these as corpus drop rules).

    Returns (id_col, n_lines, dup_line_frac, top2_frac, top3_frac),
    fractions rounded to 4 places (cross-engine parity).

    Plan shape: line stats are pure per-row column expressions (no
    shuffle); n-gram mode requires a (doc, n, gram) count — ONE explode +
    two map-side-combined aggregations, shuffle ∝ token count with the
    (id, n, gram) key, never pairwise. At 100 TB this is the same cost
    class as tokenization itself; no driver-side action anywhere."""
    lines = F.filter(
        F.split(F.col(text_col), "\n"),
        lambda s: F.length(F.trim(s)) > 0,
    )
    n_lines = F.size(lines)
    line_stats = df.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        F.when(n_lines <= 0, F.lit(0.0))
        .otherwise(
            F.round(
                1.0
                - F.size(F.array_distinct(lines))
                / n_lines.cast("double"),
                4,
            )
        )
        .alias("dup_line_frac"),
    )

    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    wdf = df.select(F.col(id_col), words.alias("_ws"))

    def _grams(n: int) -> Column:
        return F.when(
            F.size("_ws") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("_ws") - n),
                lambda i: F.concat_ws(
                    " ", *[F.col("_ws")[i + j] for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    # both gram sizes tagged in ONE array -> one explode pass
    both = F.flatten(
        F.array(
            F.transform(
                _grams(2),
                lambda g: F.struct(F.lit(2).alias("n"), g.alias("g")),
            ),
            F.transform(
                _grams(3),
                lambda g: F.struct(F.lit(3).alias("n"), g.alias("g")),
            ),
        )
    )
    tagged = wdf.select(id_col, F.explode(both).alias("_s")).select(
        id_col, F.col("_s.n").alias("_n"), F.col("_s.g").alias("_g")
    )
    # pivot the two gram sizes in the same aggregation tree so the plan
    # ends in ONE join, not one per n (both aggs are map-side combined,
    # and the (id, n) -> id regroup is partition-local after the first
    # shuffle's hash on id-prefixed keys)
    fr = (
        tagged.groupBy(id_col, "_n", "_g")
        .agg(F.count("*").alias("_c"))
        .groupBy(id_col, "_n")
        .agg(
            F.round(F.max("_c") / F.sum("_c").cast("double"), 4).alias(
                "_frac"
            )
        )
        .groupBy(id_col)
        .agg(
            F.max(F.when(F.col("_n") == 2, F.col("_frac"))).alias(
                "top2_frac"
            ),
            F.max(F.when(F.col("_n") == 3, F.col("_frac"))).alias(
                "top3_frac"
            ),
        )
    )
    return (
        line_stats.join(fr, id_col, "left")
        .select(
            id_col,
            "n_lines",
            "dup_line_frac",
            F.coalesce("top2_frac", F.lit(0.0)).alias("top2_frac"),
            F.coalesce("top3_frac", F.lit(0.0)).alias("top3_frac"),
        )
    )


# PII patterns: the common Java-regex/RE2 subset (no lookarounds, no
# backreferences) so Spark and any SQL oracle match byte-for-byte.
_PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}


def duplicate_ngram_coverage(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ngram: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """CROSS-document duplicate-span signal: for each document, the
    fraction of its DISTINCT word ``ngram``-grams that also occur in at
    least ``min_docs - 1`` OTHER documents. Long spans repeated across a
    corpus are the strongest memorization/boilerplate predictor (Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models Better");
    :func:`repetition_stats` is the WITHIN-doc analog, and docs scoring
    high here are the removal candidates minhash banding then pairs up.

    Returns (``id_col``, n_grams, n_dup_grams, dup_frac) — every input
    doc appears; docs shorter than ``ngram`` words report (0, 0, 0.0);
    dup_frac rounded to 4 places for cross-engine checks.

    Plan shape: tokenize + sliding-window gram arrays are pure column
    expressions; ``array_distinct`` dedups per doc BEFORE the explode
    (no shuffle spent on within-doc repeats). One groupBy counts docs
    per gram, then the gram frame joins that count back and re-groups
    by doc. Both the aggregate and the probe side hash-partition the
    SAME gram frame on the SAME key, so Catalyst reuses the exchange —
    the gram explode is computed once and shuffled once. The gram join
    is 1:1 enrichment (per-gram counts, never doc×doc pairs); hot
    boilerplate grams skew partition sizes only, which AQE skew-split
    handles. Shuffle ∝ distinct (doc, gram) rows — the same cost class
    as :func:`contamination_report`'s vocabulary join."""
    if ngram <= 0:
        raise ValueError(f"ngram must be positive, got {ngram}")
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    grams = F.when(
        F.size("_ws") >= ngram,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("_ws") - ngram),
                lambda i: F.concat_ws(
                    " ", F.slice("_ws", i + 1, ngram)
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    gr = (
        df.select(F.col(id_col), words.alias("_ws"))
        .select(F.col(id_col), F.explode(grams).alias("_g"))
    )
    per_gram = gr.groupBy("_g").agg(F.count("*").alias("_nd"))
    cov = (
        gr.join(per_gram, "_g")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("_nd") >= min_docs, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("n_dup_grams"),
        )
    )
    return df.select(F.col(id_col)).join(cov, id_col, "left").select(
        id_col,
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("n_dup_grams", F.lit(0))
        .cast("long")
        .alias("n_dup_grams"),
        F.coalesce(
            F.round(F.col("n_dup_grams") / F.col("n_grams"), 4),
            F.lit(0.0),
        ).alias("dup_frac"),
    )


def pii_scrub(
    df: DataFrame,
    text_col: str,
    id_col: str,
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
) -> DataFrame:
    """Redact PII from a text column and report per-kind hit counts —
    the pre-training scrub pass (emails, IPv4 addresses, US-style phone
    numbers -> ``[KIND]`` placeholders).

    Returns (id_col, text_clean, n_email, n_ipv4, n_phone, n_pii).
    Counts are measured on the ORIGINAL text (so overlapping patterns
    report what was present, not what survived an earlier replacement);
    replacements apply in ``kinds`` order, which is part of the
    operator's contract.

    Plan shape: pure per-row ``regexp_replace`` / ``regexp_extract_all``
    column expressions — whole-stage codegen, zero shuffle, zero Python;
    at 100 TB this is a map-only pass that pipelines into whatever scan
    feeds it. Patterns deliberately stay in the Java-regex/RE2 common
    subset so the op is value-checkable cross-engine."""
    unknown = [k for k in kinds if k not in _PII_PATTERNS]
    if unknown:
        raise ValueError(f"unknown PII kinds: {unknown}")
    clean = F.col(text_col)
    counts = []
    for k in kinds:
        pat = _PII_PATTERNS[k]
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{k}")
        )
        clean = F.regexp_replace(clean, pat, f"[{k.upper()}]")
    out = df.select(F.col(id_col), clean.alias("text_clean"), *counts)
    total = sum((F.col(f"n_{k}") for k in kinds[1:]), F.col(f"n_{kinds[0]}"))
    return out.withColumn("n_pii", total.cast("long"))


def length_quantiles(
    df: DataFrame,
    text_col: str,
    group_cols: list[str],
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    exact: bool = True,
) -> DataFrame:
    """Per-group document-length distribution: doc count, mean token
    count, and token-count quantiles (one ``q<pp>_tokens`` column per
    requested probability, type-7 linear interpolation) — the corpus
    profiling pass that drives truncation budgets and length filters.

    ``exact=True`` uses Spark's exact ``percentile``: its partial
    aggregate is a per-group value->count map, so memory is bounded by
    DISTINCT lengths per group (small — lengths are integers bounded by
    the longest doc), not rows; safe at 100 TB for length-like columns
    and bit-identical to SQL quantile_cont for oracle checks. For
    unbounded-cardinality columns set ``exact=False`` to switch to
    ``percentile_approx`` (t-digest, fixed memory) — approximate, so no
    value oracle applies."""
    from ..functions.text import token_count

    tc = token_count(text_col).cast("double")
    fn = "percentile" if exact else "percentile_approx"
    qs = [
        F.round(
            F.expr(f"{fn}(_tc, {p!r})"),
            4,
        ).alias(f"q{int(round(p * 100)):02d}_tokens")
        for p in probs
    ]
    return (
        df.select(*group_cols, tc.alias("_tc"))
        .groupBy(*group_cols)
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("_tc"), 4).alias("avg_tokens"),
            *qs,
        )
    )


def shuffle_corpus(
    df: DataFrame,
    id_col: str,
    salt: str = "v1",
    n_shards: int = 1024,
) -> DataFrame:
    """Deterministic pseudo-random training order: every row gets a
    ``shuffle_shard`` and a dense ``shuffle_rank`` within it, derived
    from md5(id || salt) — the global-shuffle pass that precedes
    sequence packing (read shards in order, rows by rank inside each).
    Same salt -> same order on any engine, any partitioning, any run;
    bumping the salt is an explicit reshuffle (epoch reordering).

    Shard = floor(frac * n_shards) from the SAME hash fraction that
    orders rows, so one md5 per row covers both. A single global
    row_number would serialize 100 TB through one partition; per-shard
    ranks shuffle once on the shard key and window with O(1) state —
    the same construction as :func:`pack_sequences`, and the two
    compose (pass ``shard_col="shuffle_shard"``)."""
    from pyspark.sql import Window as W

    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    frac = _md5_fraction(F.col(id_col).cast("string"), salt)
    w = W.partitionBy("shuffle_shard").orderBy("_frac", id_col)
    return (
        df.withColumn("_frac", frac)
        .withColumn(
            "shuffle_shard",
            F.floor(F.col("_frac") * F.lit(float(n_shards))).cast("long"),
        )
        .withColumn("shuffle_rank", F.row_number().over(w).cast("long"))
        .drop("_frac")
    )


def mix_domains(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    weights: dict[str, float],
    scale: float = 1.0,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic domain-mixture resampling: reshape a corpus so each
    domain holds a TARGET share of the output (the Pile/DoReMi-style
    reweighting step between dedup and packing). Domains absent from
    ``weights`` are dropped; output size ≈ ``scale`` × the kept rows.

    Per domain d: ``epochs_d = w_d · (N·scale) / n_d`` (w normalized,
    n_d = input rows of d, N = total kept input rows). Every row emits
    ``floor(epochs_d)`` full copies plus one more iff its md5-fraction
    < ``frac(epochs_d)`` — so up-weighted domains repeat (epoch column
    says which pass) and down-weighted domains subsample, both stable
    under reruns, engines, and partitioning; bumping ``salt`` is an
    explicit remix. Rows with a null id never win the fractional copy
    (null hash -> comparison false) — they get exactly floor(epochs)
    copies, deterministically.

    Plan shape: one map-side-combined count per domain (result rows ∝
    domains), its one-row total cross-joined back, and the per-domain
    epochs broadcast-joined onto the corpus — the big side never
    shuffles; the copy fan-out is an in-partition sequence+explode.
    IEEE note: the epochs expression is written ``w · (N·scale) / n``
    in this exact association so a SQL oracle reproduces it bit-for-bit
    (double ops are order-sensitive)."""
    if not weights:
        raise ValueError("weights must name at least one domain")
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    wsum = float(sum(weights.values()))
    wmap = F.create_map(
        *[
            x
            for k, v in weights.items()
            for x in (F.lit(k), F.lit(float(v) / wsum))
        ]
    )
    counts = (
        df.groupBy(F.col(domain_col).alias("_dom"))
        .agg(F.count("*").alias("_nd"))
        .where(F.col("_dom").isin(list(weights)))
    )
    total = counts.agg(F.sum("_nd").alias("_ntot"))
    dims = counts.crossJoin(F.broadcast(total)).select(
        "_dom",
        (
            wmap[F.col("_dom")]
            * (F.col("_ntot") * F.lit(float(scale)))
            / F.col("_nd")
        ).alias("_epochs"),
    )
    frac = _md5_fraction(F.col(id_col).cast("string"), salt)
    return (
        df.join(F.broadcast(dims), F.col(domain_col) == F.col("_dom"))
        .withColumn(
            "_n_copies",
            (
                F.floor("_epochs")
                + F.when(
                    frac < F.col("_epochs") - F.floor("_epochs"), 1
                ).otherwise(0)
            ).cast("int"),
        )
        .where(F.col("_n_copies") > 0)
        .select(
            *df.columns,
            F.explode(
                F.sequence(F.lit(0), F.col("_n_copies") - 1)
            ).alias("epoch"),
        )
    )


# Java and RE2 both accept \x{...} codepoint escapes and \x00-style byte
# escapes inside classes, so ONE pattern text serves Spark and the SQL
# oracle. Zero-width: ZWSP/ZWNJ/ZWJ/BOM; controls: C0 minus \t\n\r, plus
# DEL.
ZERO_WIDTH_RE = r"[\x{200B}\x{200C}\x{200D}\x{FEFF}]"
CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def normalize_text(
    df: DataFrame,
    text_col: str,
    nfc: bool = True,
    out_col: str = "text_norm",
) -> DataFrame:
    """Web-scrape text hygiene: strip zero-width characters (ZWSP/ZWNJ/
    ZWJ/BOM — invisible tokens that split words and poison dedup hashes),
    strip C0 control characters (except tab/newline/CR) and DEL, then
    Unicode-NFC compose (``e`` + combining accent -> ``é``, so the same
    visible text always byte-compares and hashes equal — the prerequisite
    for every exact-dedup / shingle / fingerprint operator upstream).

    Adds ``out_col`` and ``n_chars_removed`` (original minus normalized
    length — NFC composition also shrinks it; a negative value is
    impossible for the strip steps and rare-but-legal for NFC
    decompositions). Null text passes through as null.

    The strip steps are JVM regexes (whole-stage codegen); NFC is the
    one step Spark SQL lacks, done as an Arrow-batched pandas UDF
    (``unicodedata.normalize`` — map-only, no shuffle, memory ∝ batch).
    ``nfc=False`` keeps the whole operator JVM-side."""
    cleaned = F.regexp_replace(
        F.regexp_replace(F.col(text_col), ZERO_WIDTH_RE, ""),
        CONTROL_RE,
        "",
    )
    if nfc:
        import pandas as pd  # noqa: F401 (pandas_udf requirement)

        @F.pandas_udf("string")
        def _nfc_udf(s):
            import unicodedata

            return s.map(
                lambda x: None
                if x is None
                else unicodedata.normalize("NFC", x)
            )

        norm = _nfc_udf(cleaned)
    else:
        norm = cleaned
    return df.withColumn(out_col, norm).withColumn(
        "n_chars_removed",
        (F.length(F.col(text_col)) - F.length(F.col(out_col))).cast(
            "long"
        ),
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    min_docs: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level line deduplication (the C4 / CCNet boilerplate pass):
    drop every line that occurs in >= ``min_docs`` DISTINCT documents —
    navigation bars, cookie banners, license headers, "subscribe" footers.
    Unlike per-document repetition stats this needs global line frequency,
    which is exactly a distinct-count aggregation.

    Returns one row per input document: ``clean_text`` (surviving lines
    joined in original order), ``n_lines`` (before), ``n_removed``.
    Documents whose every line was boilerplate come back with an empty
    string, not a dropped row — the caller decides the keep threshold.

    Scale: the explode fans out ∝ total corpus lines; the frequency agg
    shuffles (line, doc) pairs once with map-side combine after an
    in-partition distinct; the boilerplate set (lines with df >=
    min_docs) is tiny by construction, so AQE turns the anti-join into a
    broadcast — the corpus itself is never re-shuffled by the join. Line
    matching is exact (byte equality); normalize with
    ``normalize_text`` first when near-identical banners should collapse.
    Beyond the reference (training-corpus prep; reference analog in
    spirit: alias sanitation filters, internal/merger/normalizer.go)."""
    lines = docs.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    )
    boiler = (
        lines.select("_line", id_col)
        .distinct()
        .groupBy("_line")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") >= F.lit(min_docs))
        .select("_line")
    )
    kept = lines.join(boiler, "_line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda x: x["_line"],
            ),
        ).alias("clean_text"),
        F.count("*").alias("_kept"),
    )
    return (
        docs.select(
            id_col,
            F.size(F.split(F.col(text_col), "\n")).cast("long").alias(
                "n_lines"
            ),
        )
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            "n_lines",
            (F.col("n_lines") - F.coalesce(F.col("_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def source_quota_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    quota: int,
    salt: str = "v1",
) -> DataFrame:
    """Cap every group (domain / source / language) at ``quota`` rows,
    chosen deterministically — the per-domain quota pass web-corpus
    pipelines run so one crawled host cannot dominate the training mix
    (C4 caps URLs per domain the same way).

    Selection order inside a group is md5(id || salt): uniform, stable
    under data growth for the rows it keeps or evicts near the boundary
    only (a new row displaces at most one old row), engine-portable, and
    reproducible — unlike ``ORDER BY random()``. Plan: one shuffle on
    ``group_col`` + a bounded per-group window. Hot groups are bounded by
    the window's streaming evaluation (row_number needs no buffer beyond
    the frame row); a group with billions of rows still sorts within its
    partition, so for pathological skew pre-filter with
    ``stratified_sample`` to a few× quota first, then apply the exact cap.
    """
    from pyspark.sql import Window

    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    w = (
        Window.partitionBy(group_col)
        .orderBy(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
            id_col,
        )
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota)
        .drop("_rn")
    )


def unigram_quality(
    df: DataFrame,
    text_col: str,
    id_col: str,
    vocab_top_k: int = 1000,
) -> DataFrame:
    """Corpus-frequency quality signals per document — the engine-portable
    core of a CCNet-style LM quality filter. For every document:

    * ``n_tokens``       — whitespace token count (BIGINT, exact)
    * ``avg_token_freq`` — mean corpus frequency of the document's tokens
      (sum of each token's corpus count / n_tokens). Gibberish and
      boilerplate-free natural text separate cleanly on this axis.
    * ``common_frac``    — fraction of tokens inside the corpus's
      ``vocab_top_k`` most frequent terms (ties at the boundary broken by
      term text, so the vocabulary is a total order in any engine).

    Both ratios are one IEEE division of two exactly-computed integers, so
    results are bit-identical across engines — no ``ln()`` in sight (a
    true perplexity needs an LM; these are the distribution-shape signals
    that correlate with it and stay value-checkable).

    Plan at 100 TB: tokenize/explode (no shuffle), one vocabulary-keyed
    count agg with map-side combine, a ``TakeOrdered`` top-k for the
    vocabulary (never a global sort), a broadcast of the k vocab terms,
    and one doc-keyed agg. Shuffles ∝ vocabulary + documents, never
    pairwise.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    cnt = toks.groupBy("term").agg(F.count("*").alias("_c"))
    vocab = (
        cnt.orderBy(F.col("_c").desc(), "term")
        .limit(vocab_top_k)
        .select("term", F.lit(1).alias("_v"))
    )
    scored = (
        toks.join(cnt, "term")
        .join(F.broadcast(vocab), "term", "left")
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        (
            F.sum("_c").cast("double") / F.count("*").cast("double")
        ).alias("avg_token_freq"),
        (
            F.sum(F.coalesce(F.col("_v"), F.lit(0))).cast("double")
            / F.count("*").cast("double")
        ).alias("common_frac"),
    )
