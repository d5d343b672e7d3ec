"""Text analysis operators: tokenization, quality scoring, language ID,
document fingerprinting.

All Column-expression builders (JVM-side, codegen-friendly). At 100 TB
these run as a single narrow projection over the scan — no shuffle, no
Python. The DuckDB-portable formulations (same md5/regex semantics)
make them oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# stopword lists used by quality scoring + language ID; deliberately
# small and embedded so engine and oracle share one definition
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]
DE_STOPWORDS = ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"]
FR_STOPWORDS = ["le", "la", "les", "et", "est", "un", "une", "de", "dans", "pour"]
ES_STOPWORDS = ["el", "la", "los", "las", "y", "es", "un", "una", "de", "en"]

CJK_RANGE = f"{chr(0x4E00)}-{chr(0x9FFF)}"


def tokens(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish proxy: alphanumeric runs plus one extra split per
    letter→digit transition (no lookaround — portable to RE2 engines).
    """
    base = F.size(
        F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != "")
    )
    # non-overlapping [a-z][0-9] occurrence count
    transitions = (
        F.length(F.lower(text))
        - F.length(F.regexp_replace(F.lower(text), "[a-z][0-9]", ""))
    ) / 2
    return (base + transitions).cast("int")


def _stopword_hits(text: Column, words: list[str]) -> Column:
    return F.size(F.filter(tokens(text), lambda t: t.isin(words)))


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword / alpha ratios (classic quality
    filters for pretraining corpora)."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    alpha_chars = F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
    punct_chars = F.length(
        F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]", "")
    )
    stop_hits = _stopword_hits(text, EN_STOPWORDS)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": F.round(alpha_chars / F.greatest(n_chars, F.lit(1)), 6),
        "punct_ratio": F.round(punct_chars / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(
            stop_hits / F.greatest(n_tokens, F.lit(1)), 6
        ),
        "avg_token_len": F.round(
            F.length(F.regexp_replace(text, r"\s+", ""))
            / F.greatest(n_tokens, F.lit(1)),
            6,
        ),
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score (monotone in signals a curation
    pipeline keys on; fixed weights so it is reproducible).

    Built from UNROUNDED ratios: combining pre-rounded 6-decimal terms
    puts ~10% of values exactly on a .xxxxxx5 boundary where engines'
    round() algorithms (HALF_UP vs nearest-double) disagree."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", "")) / F.greatest(
        n_chars, F.lit(1)
    )
    stop = _stopword_hits(text, EN_STOPWORDS) / F.greatest(n_tokens, F.lit(1))
    length_term = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    return F.round(0.4 * length_term + 0.3 * alpha + 0.3 * stop, 6)


def lang_id(text: Column) -> Column:
    """Heuristic language ID: CJK character share, else stopword-hit
    argmax with fixed tie order en > de > fr > es."""
    cjk = F.length(F.regexp_replace(text, f"[^{CJK_RANGE}]", ""))
    n_chars = F.greatest(F.length(text), F.lit(1))
    en = _stopword_hits(text, EN_STOPWORDS)
    de = _stopword_hits(text, DE_STOPWORDS)
    fr = _stopword_hits(text, FR_STOPWORDS)
    es = _stopword_hits(text, ES_STOPWORDS)
    return (
        F.when(cjk / n_chars > 0.3, "zh")
        .when((en >= de) & (en >= fr) & (en >= es), "en")
        .when((de >= fr) & (de >= es), "de")
        .when(fr >= es, "fr")
        .otherwise("es")
    )


def fingerprint(text: Column) -> Column:
    """Whitespace-normalized md5 document fingerprint (rolling-hash
    class of dedup keys)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))
