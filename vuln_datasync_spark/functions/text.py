"""Text-analysis functions for large-scale training-data pipelines:
tokenization stats, quality scoring, language-ID heuristic, document
fingerprinting. All pure column expressions (JVM-side, codegen) so they
survive 100 TB; nothing here drops to Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword banks for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "es": ["el", "la", "de", "que", "los", "por", "con", "una", "para", "es"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour", "qui", "pas"],
}

PUNCT_CLASS = "[.,;:!?]"
# BPE-ish word/piece regex: words, numbers, or single non-space symbols
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (keeps empty-string artifacts out)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, "\\s+"), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Token count under a BPE-like segmentation (regex pieces)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0))


def punct_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))


def quality_score(text: Column | str) -> Column:
    """Heuristic document quality in [0,1]: length band + punctuation
    density + mean token length band (reference analog of record validation
    filters; designed for training-data curation)."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(c)
    len_score = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    punct_ratio = punct_count(c) / (F.length(c) + F.lit(1.0))
    punct_score = F.when(punct_ratio <= 0.1, 1.0).otherwise(
        F.greatest(F.lit(0.0), 1.0 - (punct_ratio - 0.1) * 5.0)
    )
    avg_tok = F.length(c) / (n_tok + F.lit(1.0))
    tok_score = F.when((avg_tok >= 3.0) & (avg_tok <= 12.0), 1.0).otherwise(0.5)
    return F.round((len_score + punct_score + tok_score) / 3.0, 4)


def stopword_hits(text: Column | str, lang: str) -> Column:
    """Count of distinct stopwords of ``lang`` present in the text."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.array_distinct(tokens(F.lower(c)))
    bank = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(toks, bank))


def stopword_hits_from_tokens(toks: Column, lang: str) -> Column:
    """Count of distinct stopwords of ``lang`` present in a pre-computed
    DISTINCT token array (see :func:`distinct_tokens`). Take this form
    when the token array lives in its own projection — referencing a
    derived token expression from several bank counts re-evaluates the
    whole split per bank (Catalyst does not subexpression-eliminate
    across them)."""
    bank = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(toks, bank))


def distinct_tokens(text: Column | str) -> Column:
    """Distinct lowercase whitespace tokens — the stopword-bank basis."""
    c = F.col(text) if isinstance(text, str) else text
    return F.array_distinct(tokens(F.lower(c)))


def lang_id_from_hits(hits: dict[str, Column]) -> Column:
    """Argmax pick over per-bank hit-count COLUMNS (one per language, in
    STOPWORDS bank order); 'und' when no bank hits. Materialize the hit
    counts in a projection first so the when-chain compares cheap
    attributes instead of re-evaluating each bank count ~3x."""
    scores = [(lang, hits[lang]) for lang in STOPWORDS]
    best = scores[0][1]
    for _, s in scores[1:]:
        best = F.greatest(best, s)
    expr = F.lit("und")
    for lang, s in reversed(scores):  # earlier banks win ties
        expr = F.when((s == best) & (best > 0), lang).otherwise(expr)
    return expr


def lang_id(text: Column | str) -> Column:
    """Stopword-ratio language ID over {en,de,es,fr}; 'und' when no bank
    hits. Deterministic tie-break by bank order.

    Single-expression form (recomputes the token split per bank — fine
    for occasional use); hot paths should project
    :func:`distinct_tokens` then the per-bank
    :func:`stopword_hits_from_tokens` columns and finish with
    :func:`lang_id_from_hits`."""
    c = F.col(text) if isinstance(text, str) else text
    return lang_id_from_hits(
        {lang: stopword_hits(c, lang) for lang in STOPWORDS}
    )


def word_ngrams_of_tokens(toks: Column, n: int = 5) -> Column:
    """Array of word n-grams over a PRE-COMPUTED token array column.
    ``toks`` should be a plain attribute (projected first): an expression
    captured inside the transform lambda is re-evaluated once per n-gram
    position — O(len²) token splitting per row otherwise."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def word_ngrams(text: Column | str, n: int = 5) -> Column:
    """Array of word n-grams (space-joined) — fingerprint/shingle basis.
    Single-expression form; hot paths should project :func:`tokens` and
    call :func:`word_ngrams_of_tokens` (see its note)."""
    c = F.col(text) if isinstance(text, str) else text
    return word_ngrams_of_tokens(tokens(c), n)


def doc_fingerprint(text: Column | str, n: int = 5) -> Column:
    """Rolling-hash document fingerprint: min md5 over word n-grams
    (winnowing-style representative hash; stable under small edits at the
    ends of the document)."""
    return F.array_min(F.transform(word_ngrams(text, n), F.md5))


def shingles_of_lowered(lowered: Column, k: int = 5) -> Column:
    """Distinct character k-shingles over an ALREADY-LOWERED column.
    ``lowered`` should be a plain attribute (projected first): an
    expression captured inside the transform lambda is re-evaluated once
    per shingle position — O(len²) lowering per row otherwise."""
    return F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.length(lowered) - (k - 1), F.lit(1))
            ),
            lambda i: F.substring(lowered, i, k),
        )
    )


def char_shingles(text: Column | str, k: int = 5) -> Column:
    """Distinct lowercase character k-shingles (minhash/Jaccard basis).
    Single-expression form; hot paths should project ``lower(text)`` and
    call :func:`shingles_of_lowered` (see its note)."""
    c = F.col(text) if isinstance(text, str) else text
    return shingles_of_lowered(F.lower(c), k)
