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
        # exact mean token length (sum of token chars / tokens) — the
        # old (n_chars - (n_tokens-1))/n_tokens shortcut assumed exactly
        # one single-space separator and no padding, so double spaces /
        # newlines / leading whitespace inflated the metric (review r5);
        # same formulation as gopher_quality_flags below
        "mean_word_len": F.aggregate(
            toks, F.lit(0), lambda acc, w: acc + F.length(w)
        )
        / F.greatest(n_tokens, F.lit(1)),
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


def gopher_quality_flags(
    text: Column,
    min_words: int = 30,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> dict[str, Column]:
    """Gopher-style heuristic quality rules (Rae et al. 2021, §A1.1.1),
    as boolean flag columns plus the conjunction:

    - ``flag_n_words``: word count within [min_words, max_words];
    - ``flag_mean_word_len``: mean token length within bounds;
    - ``flag_alpha``: ≥ ``min_alpha_frac`` of words contain a letter;
    - ``flag_stop``: at least ``min_stop_hits`` stopword occurrences
      (the "ellipsis page" / navigation-chrome detector);
    - ``passes``: all of the above.

    Pure per-row Catalyst expressions (array HOFs) — one corpus scan,
    zero shuffle, survives any scale.
    """
    toks = tokens(text)
    n_words = F.size(toks)
    tok_chars = F.aggregate(
        toks, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mean_wl = tok_chars / F.greatest(n_words, F.lit(1))
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[a-z]")))
    alpha_frac = n_alpha / F.greatest(n_words, F.lit(1))
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS)))
    flags = {
        "flag_n_words": (n_words >= min_words) & (n_words <= max_words),
        "flag_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "flag_alpha": alpha_frac >= min_alpha_frac,
        "flag_stop": n_stop >= min_stop_hits,
    }
    out: dict[str, Column] = dict(flags)
    passes = F.lit(True)
    for c in flags.values():
        passes = passes & c
    out["passes"] = passes
    return out


# PII patterns: deliberately simple, anchor-free regexes that both Spark
# (Java regex) and DuckDB (RE2) interpret identically.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ssn": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    "phone": (r"\+?[0-9][0-9()\-. ]{7,}[0-9]\b", "<PHONE>"),
}


def redact_pii(text: Column) -> dict[str, Column]:
    """PII scrubbing for training corpora: emails, SSNs, IPv4 addresses
    and phone-number-shaped digit runs replaced by typed placeholders,
    plus per-category match counts.

    Counts follow the REDACTION order (each category counted on the
    text with all earlier categories already replaced): counting every
    category on the raw text double-counted overlapping spans — the
    broad phone pattern also matches every SSN and most IPv4s, so
    n_phone over-reported while zero phone redactions happened (review
    r5). Now Σ n_* == the number of replaced spans. Pattern order:
    email before phone (an address's digits can't be half-eaten),
    narrow before broad (ssn/ipv4 before phone). Pure
    ``regexp_replace``/``regexp_count`` chain — JVM regex inside
    codegen, one scan, no shuffle, no UDF.
    """
    out: dict[str, Column] = {}
    redacted = text
    for name, (pat, repl) in PII_PATTERNS.items():
        out[f"n_{name}"] = F.regexp_count(redacted, F.lit(pat))
        redacted = F.regexp_replace(redacted, pat, repl)
    out["redacted"] = redacted
    return out
