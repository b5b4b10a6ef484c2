"""End-to-end training-data corpus curation.

Composes the text-analysis columns (ops/textstats.py) with quality
filtering and whitespace-insensitive exact deduplication into the single
pass every LLM-data pipeline runs first: annotate -> drop low-quality ->
keep one representative per duplicate group.

Scale shape (the whole point): ONE corpus scan evaluates every
annotation column and the quality predicate inside the same
whole-stage-codegen projection (all pure Catalyst — language_id /
quality_score / token_counts are expression trees, no Python), then ONE
partial+final hash aggregation on the 64-hex normalized-text digest
keeps the min-id row per group via ``min(struct(...))`` — no Window, no
join, no second scan.  Only survivors' digests + a few small columns
ever shuffle, so a 100 TB corpus moves O(kept_docs x ~100 bytes) over
the network regardless of document sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import language_id, quality_score, token_counts


def normalized_digest(text_col: Column) -> Column:
    """sha256 of the whitespace-normalized, lowercased text — the
    whitespace-insensitive exact-duplicate key (a cross-engine-
    reproducible digest).  Collapse runs of whitespace FIRST, then trim:
    trimming first leaves a trailing space when the text ends in
    non-space whitespace (e.g. ``"x  \\n"``)."""
    norm = F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " "))
    return F.sha2(norm, 256)


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
) -> DataFrame:
    """Curated corpus: (id, lang, quality, n_tokens_ws) for every kept doc.

    Kept = quality_score >= ``min_quality`` AND the doc is the smallest-id
    member of its normalized-text duplicate group.  The quality threshold
    applies BEFORE dedup, so a duplicate group whose members straddle the
    threshold keeps its smallest-id member that passes (group membership
    is by identical normalized text, so in practice members share scores).

    Reference parity note: the reference has no curation stage (its unit
    is one PDF); this operator is part of the additive LLM-training-data
    surface, composing textstats + exact dedup the way project filter
    batches compose search filters (reference src/task/project.py).
    """
    t = F.col(text_col)
    counts = token_counts(t)
    annotated = docs.select(
        F.col(id_col),
        language_id(t).alias("lang"),
        quality_score(t).alias("quality"),
        counts["n_tokens_ws"].alias("n_tokens_ws"),
        normalized_digest(t).alias("_digest"),
    ).filter(F.col("quality") >= F.lit(min_quality))
    # min over a struct is lexicographic by field order; id_col is unique,
    # so this keeps exactly the smallest-id row per digest in one agg.
    return (
        annotated.groupBy("_digest")
        .agg(
            F.min(
                F.struct(id_col, "lang", "quality", "n_tokens_ws")
            ).alias("_keep")
        )
        .select("_keep.*")
    )


def curation_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
) -> DataFrame:
    """Per-language curation summary over the curated corpus:
    (lang, n_docs, total_tokens_ws, avg_quality).  One extra hash agg over
    the (already tiny relative to the corpus) curated set."""
    kept = curate_corpus(
        docs, text_col=text_col, id_col=id_col, min_quality=min_quality
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens_ws").alias("total_tokens_ws"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )
