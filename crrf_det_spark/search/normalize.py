"""Token/number normalization and ngram generation as Column expressions.

Re-expresses the reference's ``processNumbers``
(/root/reference/src/search/index.js:9-21) and search-index ngram config
(lengths [1,2,3], join ' ', index.js:50-55) as pure Catalyst expressions --
JVM-side, whole-stage-codegen, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# JS parseFloat semantics: longest numeric prefix (after stripping , $ EUR GBP)
_FLOAT_PREFIX = r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?"


def _parsefloat(token: Column) -> Column:
    """parseFloat(token with [,$€£] stripped) -> double or null
    (index.js:12)."""
    stripped = F.regexp_replace(token, r"[,$€£]", "")
    prefix = F.regexp_extract(stripped, _FLOAT_PREFIX, 0)
    return F.when(prefix == "", F.lit(None).cast("double")).otherwise(
        prefix.cast("double")
    )


def normalize_numbers_col(text: Column) -> Column:
    """Replace numeric tokens with NUMERICVALUE, keeping NaN, small ints
    0<=i<5, and years 1900-2100 (index.js:13-19)."""
    def one(tok: Column) -> Column:
        p = _parsefloat(tok)
        is_int = p == F.floor(p)
        keep = (
            p.isNull()
            | ((p < 5) & (p >= 0) & is_int)
            | ((p >= 1900) & (p <= 2100) & is_int)
        )
        return F.when(keep, tok).otherwise(F.lit("NUMERICVALUE"))

    return F.array_join(F.transform(F.split(text, " "), one), " ")


def tokens_col(text: Column) -> Column:
    """Whitespace tokens, empties removed (search-index default tokenizer
    over the space-joined page text)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def ngrams_col(tokens: Column, lengths: tuple[int, ...] = (1, 2, 3)) -> Column:
    """Space-joined n-grams of the given lengths (index.js:50-55).

    Pure Catalyst: an n-gram array is the element-wise join of n shifted
    copies of the token array (chained zip_with).  zip_with pads the
    shorter side with null, so the tail entries null out and one final
    not-null filter trims the array to size-n+1 -- this avoids the
    per-index slice + array_join expression, which rebuilt an n-slice per
    position and dominated index-build time.
    """
    grams = []
    for n in lengths:
        if n == 1:
            grams.append(tokens)
            continue
        g = tokens
        for k in range(1, n):
            shifted = F.slice(tokens, k + 1, F.size(tokens) - F.lit(k))
            g = F.zip_with(
                # concat (not concat_ws) so a null shifted entry nulls the
                # whole gram and the tail filter below can trim it
                g, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
            )
        grams.append(
            F.when(
                F.size(tokens) >= n,
                F.filter(g, lambda x: x.isNotNull()),
            ).otherwise(F.array().cast("array<string>"))
        )
    out = grams[0]
    for g in grams[1:]:
        out = F.concat(out, g)
    return out
