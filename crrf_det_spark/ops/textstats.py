"""Text analysis columns: language-ID, quality scoring, token counting,
document fingerprinting.  All pure Catalyst expressions (JVM, codegen) --
these run in the same scan as any other projection, no extra pass."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny stopword profiles for an n-gram/stopword-ratio language heuristic
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "that", "with", "on"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "pour", "que", "dans", "une"],
    "es": ["el", "la", "los", "las", "es", "por", "que", "una", "para", "con"],
}


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def language_id(text: Column) -> Column:
    """Best stopword-profile language, 'und' (undetermined) when no profile
    scores > 0.  Deterministic tie-break by profile order."""
    toks = _tokens(text)
    n = F.greatest(F.size(toks), F.lit(1))
    scores = [
        (
            lang,
            F.size(F.filter(toks, lambda t: t.isin(words))) / n,
        )
        for lang, words in _STOPWORDS.items()
    ]
    # argmax via greatest over (score, index) structs
    packed = F.greatest(
        *[F.struct(score.alias("s"), F.lit(i).alias("i")) for i, (l, score) in enumerate(scores)]
    )
    langs = list(_STOPWORDS)
    out = F.lit("und")
    for i, lang in enumerate(langs):
        out = F.when(
            (packed["i"] == i) & (packed["s"] > 0), F.lit(lang)
        ).otherwise(out)
    return out


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality: length band, alpha ratio, punctuation ratio,
    mean word length band, stopword presence.  Mirrors common training-data
    quality filters (length/punct/stopword ratios)."""
    toks = _tokens(text)
    n_toks = F.size(toks)
    n_chars = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(0.0)
    mean_word = F.when(n_toks > 0, (n_chars - n_toks + 1) / n_toks).otherwise(0.0)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(_STOPWORDS["en"])))
    score = (
        F.when((n_toks >= 10) & (n_toks <= 10000), 0.25).otherwise(0.0)
        + F.when(alpha_ratio >= 0.6, 0.25).otherwise(alpha_ratio * 0.25 / 0.6)
        + F.when(punct_ratio <= 0.1, 0.25).otherwise(
            F.greatest(F.lit(0.0), 0.25 - (punct_ratio - 0.1))
        )
        + F.when((mean_word >= 3) & (mean_word <= 12), 0.15).otherwise(0.0)
        + F.when(stop_hits > 0, 0.10).otherwise(0.0)
    )
    return F.round(score, 6)


def token_counts(text: Column) -> dict[str, Column]:
    """Whitespace tokens and a BPE-ish subword proxy count
    (words + standalone punctuation + digit runs).

    The boundary split isolates every ``\\W`` char as its own piece;
    keeping only pieces with a non-whitespace char makes the count
    exactly (word runs) + (non-whitespace non-word chars) — the closed
    form the ``text_tokens`` SQL oracle recomputes.  (``trim`` was the
    old filter; it only strips spaces, so bare newline/tab pieces
    wrongly counted as tokens.)"""
    ws = F.size(_tokens(text))
    bpe_ish = F.size(
        F.filter(
            F.split(text, r"(?<=\W)|(?=\W)"),
            lambda t: t.rlike(r"\S"),
        )
    )
    return {"n_tokens_ws": ws, "n_tokens_bpe": bpe_ish}


def fingerprint(text: Column) -> Column:
    """64-bit document fingerprint: xxhash of the whitespace-normalized,
    lowercased text (rolling-hash analogue, stable across runs)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.xxhash64(norm)


def document_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One projection with all text-analysis columns."""
    t = F.col(text_col)
    counts = token_counts(t)
    return docs.select(
        "*",
        language_id(t).alias("lang_id"),
        quality_score(t).alias("quality"),
        counts["n_tokens_ws"].alias("n_tokens_ws"),
        counts["n_tokens_bpe"].alias("n_tokens_bpe"),
        fingerprint(t).alias("fingerprint"),
    )
