"""Explicit cache lifecycle for operators that must persist an
intermediate (fan-out subsets referenced several times in one plan).

Spark DataFrames are lazy, so an operator cannot know when its caller is
done with the result — unpersisting inside the operator would silently
re-run the whole upstream pipeline per downstream reference.  The
convention here (addressing the persist-leak findings of round 1):

* an operator that persists an intermediate registers it on the DataFrame
  it returns (``register``);
* a caller that wants eager semantics calls ``materialize`` — the result
  is persisted, computed once, and every registered upstream intermediate
  is unpersisted immediately;
* when the caller is done with the result it calls ``release`` — the
  result and any still-registered intermediates are unpersisted, leaving
  zero lingering cached RDDs (asserted in tests/test_search.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_crrf_cached"


def register(df: DataFrame, *cached: DataFrame) -> DataFrame:
    """Record persisted upstream intermediates on the returned DataFrame."""
    existing = list(getattr(df, _ATTR, []))
    setattr(df, _ATTR, existing + list(cached))
    return df


def registered(df: DataFrame) -> list[DataFrame]:
    """The intermediates registered on ``df`` (for operators that compose
    another operator's result and must carry its caches forward)."""
    return list(getattr(df, _ATTR, []))


def materialize(df: DataFrame) -> DataFrame:
    """Persist + compute ``df`` once, then drop its registered upstream
    caches (they were only needed while the plan could still re-run)."""
    out = df.persist()
    out.count()
    for c in getattr(df, _ATTR, []):
        c.unpersist()
    setattr(out, _ATTR, [])
    return out


def release(df: DataFrame) -> None:
    """Unpersist ``df`` and any registered intermediates."""
    for c in getattr(df, _ATTR, []):
        c.unpersist()
    setattr(df, _ATTR, [])
    df.unpersist()
