"""Regex batch search over extracted segments.

Re-expresses /root/reference/src/s-pdf:22-60: each term is a regex with an
optional 'table:'/'text:' field prefix; tables are matched against their
tab/newline flattening (s-pdf:49-52); the result counts matching terms per
(turn, cindex).

Spark-first: one F.rlike predicate per term (JVM regex, codegen), summed as
int conditions -- no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _parse_terms(terms: list[str]) -> list[tuple[str, str]]:
    import re

    out = []
    for term in terms:
        if not term.strip():
            continue
        match_field = "any"
        if term.startswith("table:"):
            match_field, term = "table", term[6:]
        elif term.startswith("text:"):
            match_field, term = "text", term[5:]
        # fail fast on malformed patterns (otherwise they explode as raw
        # Py4J errors at action time, deep inside a running job)
        try:
            re.compile(term)
        except re.error as e:
            raise ValueError(f"invalid regex {term!r}: {e}") from e
        out.append((match_field, term))
    return out


def regex_search(segments: DataFrame, terms: list[str]) -> DataFrame:
    """segments (conv_id, turn_idx, cindex, type, content) -> rows with
    n_matches >= 1, one per hit segment (conv_id, turn_idx, cindex,
    n_matches), mirroring s-pdf's {page: {idx: count}} result."""
    parsed = _parse_terms(terms)
    if not parsed:
        return segments.sparkSession.createDataFrame(
            [], "conv_id string, turn_idx int, cindex int, n_matches int"
        )
    hits = None
    for match_field, pattern in parsed:
        cond = F.col("content").rlike(pattern)
        if match_field != "any":
            cond = cond & (F.col("type") == match_field)
        term_hit = F.when(cond, 1).otherwise(0)
        hits = term_hit if hits is None else (hits + term_hit)
    return (
        segments.withColumn("n_matches", hits)
        .filter(F.col("n_matches") > 0)
        .select("conv_id", "turn_idx", "cindex", "n_matches")
    )
