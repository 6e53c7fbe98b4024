"""Text-analysis operators for training-data curation, all JVM-side.

Every function here returns Column expressions built from
``pyspark.sql.functions`` — no Python UDFs — so they stay inside
whole-stage codegen and scale linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the heuristic language-ID.
# Deliberately deterministic + oracle-expressible (same lists in SQL).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "los", "que", "una", "por"),
}

STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
)


def tokens(text: Column) -> Column:
    """Whitespace tokenization, lowercased, empty tokens removed."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != F.lit(""))


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish token count: runs of letters, runs of digits, and single
    non-space symbols each count as one token."""
    return F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def quality_score(text: Column) -> dict[str, Column]:
    """Quality-signal columns: length, token count, punctuation ratio,
    stopword ratio, mean word length. Combine/threshold downstream."""
    toks = tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_punct = F.length(F.regexp_replace(text, r"[^!?.,;:]", ""))
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS)))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": n_punct / F.greatest(n_chars, F.lit(1)),
        "stopword_ratio": n_stop / F.greatest(n_tokens, F.lit(1)),
        "mean_word_len": (n_chars - (n_tokens - 1)) / F.greatest(n_tokens, F.lit(1)),
    }


def lang_id(text: Column) -> Column:
    """Heuristic language ID: vote by per-language marker-word hits,
    ties broken by fixed language order (en, fr, de, es), 'und' if no
    marker hits at all."""
    toks = tokens(text)

    def marker_hits(markers: tuple[str, ...]) -> Column:
        return F.size(F.filter(toks, lambda w: w.isin(*markers)))

    hits = {lang: marker_hits(markers) for lang, markers in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    # Built innermost-out over reversed order so the earliest language in
    # LANG_MARKERS is the outermost when() and wins ties.
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when(
            (hits[lang] > 0) & (hits[lang] == best), F.lit(lang)
        ).otherwise(expr)
    return expr


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the whitespace-normalized
    lowercased text (rolling-hash analog, oracle-expressible)."""
    normalized = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.md5(normalized)
