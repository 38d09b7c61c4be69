"""Text-analysis Column functions for large-scale document pipelines.

Beyond-reference operators (BASELINE.json north star): language ID,
quality scoring, token counting, fingerprinting, shingling — all as
built-in Spark SQL expressions (codegen'd, no Python in the hot
path) so they hold up on a 100 TB documents table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram-free heuristic
# language detector. Deliberately small: the detector is a cheap
# first-pass filter, not a classifier.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "se", "del", "las"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"),
}
# Deterministic tie-break order for argmax over languages.
LANG_ORDER: tuple[str, ...] = ("en", "es", "fr", "de")


def _tokens(col: Column) -> Column:
    return F.split(F.trim(F.lower(col)), r"\s+")


def token_count(col: str | Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(_tokens(c)))


def stopword_hits(col: str | Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    c = F.col(col) if isinstance(col, str) else col
    words = LANG_STOPWORDS[lang]
    # strip trailing punctuation off each token before matching
    cleaned = F.transform(_tokens(c), lambda t: F.regexp_replace(t, r"[^a-z]", ""))
    return F.size(F.filter(cleaned, lambda t: t.isin(*words)))


def detect_language(col: str | Column) -> Column:
    """Heuristic language ID: argmax stopword-hit count.

    Returns the 2-letter code with the most stopword hits, with a
    deterministic preference order on ties, or 'und' when no
    stopword of any language occurs.
    """
    c = F.col(col) if isinstance(col, str) else col
    hits = {lang: stopword_hits(c, lang) for lang in LANG_ORDER}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # build WHEN chain in reverse so earlier languages win ties
    for lang in reversed(LANG_ORDER):
        expr = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def quality_score(col: str | Column) -> Column:
    """Cheap document-quality score in [0, 1].

    Mean of three ratios: alphabetic-char ratio, non-punctuation
    ratio, and a length factor (saturating at 200 chars). Designed
    so every component is exact integer arithmetic over ``length``
    and ``regexp_replace`` — reproducible in any SQL engine.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", ""))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    punct_ok = F.when(n > 0, 1.0 - punct / n).otherwise(F.lit(0.0))
    len_factor = F.least(n / F.lit(200.0), F.lit(1.0))
    score = (alpha_ratio + punct_ok + len_factor) / 3.0
    # floor(x*1e6+0.5)/1e6: engine-portable rounding (pure IEEE ops,
    # identical in any engine — ROUND() tie-breaking is not)
    return F.floor(score * 1000000 + 0.5) / 1000000


def document_fingerprint(col: str | Column) -> Column:
    """Deterministic content fingerprint: md5 of the
    lowercased, whitespace-collapsed text. Stable across engines —
    usable as an exact-dedup key.
    """
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return F.md5(normalized)


def char_shingles(col: str | Column, n: int = 5) -> Column:
    """Distinct character n-grams of the normalized text, as an array.

    Built with ``sequence`` + ``transform`` (JVM-side higher-order
    functions) — no UDF, no explode until the caller chooses to.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    idx = F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(s, i, n)))


def word_shingles(col: str | Column, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined) of the normalized text."""
    c = F.col(col) if isinstance(col, str) else col
    toks = _tokens(c)
    count = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), count - 1)
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def word_shingles_py(text: str | None, n: int = 3) -> set:
    """Python twin of :func:`word_shingles` for Arrow batch kernels.

    Identical output on ASCII text: ``re.ASCII`` pins ``\\s`` to the
    same ASCII class Java regex uses by default, ``lower``/``strip``
    coincide on ASCII, and the short-document edge (fewer than ``n``
    tokens -> ONE shingle of whatever tokens exist) replays
    ``greatest(size - (n-1), 1)``. The Catalyst version's
    ``transform``/``slice``/``concat_ws`` chain is CodegenFallback
    (interpreted per element) — batch kernels built on this twin cut
    the shingling cost ~10x (guide §4.2)."""
    import re

    if text is None:
        return set()
    toks = re.split(r"\s+", text.strip().lower(), flags=re.ASCII)
    cnt = max(len(toks) - (n - 1), 1)
    return {" ".join(toks[i : i + n]) for i in range(cnt)}


# PII patterns chosen for regex-dialect portability: the same
# pattern string compiles identically under Java regex (Spark) and
# RE2 (DuckDB/Go) — no lookaround, no backreferences.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}"


def redact_pii(col: str | Column) -> Column:
    """Mask emails then phone numbers with <EMAIL>/<PHONE> tokens.

    Email first: its replacement token contains no digit runs, so
    the phone pass cannot re-match inside an already-redacted span.
    Pure ``regexp_replace`` — codegen'd, zero Python, safe on a
    100 TB documents table.
    """
    c = F.col(col) if isinstance(col, str) else col
    no_email = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_email, PII_PHONE_RE, "<PHONE>")


def pii_counts(col: str | Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in the text — audit companion to
    :func:`redact_pii` so a pipeline can log what it masked."""
    c = F.col(col) if isinstance(col, str) else col
    emails = F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), F.lit(0)))
    no_email = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    phones = F.size(F.regexp_extract_all(no_email, F.lit(PII_PHONE_RE), F.lit(0)))
    return emails, phones
