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


def lang_id(text: Column | str) -> Column:
    """Stopword-ratio language ID over {en,de,es,fr}; 'und' when no bank
    hits. Deterministic tie-break by bank order."""
    c = F.col(text) if isinstance(text, str) else text
    scores = [(lang, stopword_hits(c, lang)) for lang in STOPWORDS]
    best = scores[0][1]
    for _, s in scores[1:]:
        best = F.greatest(best, s)
    expr = F.lit("und")
    for lang, s in reversed(scores):  # earlier banks win ties
        expr = F.when((s == best) & (best > 0), lang).otherwise(expr)
    return expr


def word_ngrams(text: Column | str, n: int = 5) -> Column:
    """Array of word n-grams (space-joined) — fingerprint/shingle basis."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def doc_fingerprint(text: Column | str, n: int = 5) -> Column:
    """Rolling-hash document fingerprint: min md5 over word n-grams
    (winnowing-style representative hash; stable under small edits at the
    ends of the document)."""
    return F.array_min(F.transform(word_ngrams(text, n), F.md5))


def char_shingles(text: Column | str, k: int = 5) -> Column:
    """Distinct lowercase character k-shingles (minhash/Jaccard basis)."""
    c = F.col(text) if isinstance(text, str) else text
    lowered = F.lower(c)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(lowered) - (k - 1), F.lit(1))),
            lambda i: F.substring(lowered, i, k),
        )
    )
