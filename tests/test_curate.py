"""End-to-end corpus curation (ops/curate.py): quality filter +
whitespace-insensitive exact dedup keep-min-id, single-agg plan."""

import pytest
from pyspark.sql import functions as F

from crrf_det_spark.ops import curate_corpus, curation_report
from crrf_det_spark.ops.textstats import quality_score

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs far away today"
)
DOCS = [
    (1, GOOD),
    (2, GOOD),  # exact dup of 1 -> dropped (1 is the min-id rep)
    (3, "  " + GOOD.upper() + "  \n"),  # ws/case variant -> same digest, dropped
    (4, "the steady green train rolls past the old station and waits for one signal"),
    (5, "!!! ??? ... ;;; :::"),  # punctuation soup -> low quality, dropped
    (6, ""),  # empty -> low quality, dropped
    (7, "der schnelle braune fuchs springt und die hunde sind nicht ganz da"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_curate_keeps_min_id_rep_and_drops_low_quality(corpus):
    kept = {r.doc_id: r for r in curate_corpus(corpus).collect()}
    assert set(kept) == {1, 4, 7}
    assert kept[1].lang == "en"
    assert kept[7].lang == "de"
    assert kept[1].n_tokens_ws == len(GOOD.split())


def test_curate_threshold_is_parametric(corpus, spark):
    # min_quality=0 keeps every duplicate-group representative, even junk
    kept = {r.doc_id for r in curate_corpus(corpus, min_quality=0.0).collect()}
    assert kept == {1, 4, 5, 6, 7}
    # the dropped docs are exactly the below-threshold ones at the default
    q = {
        r.doc_id: r.q
        for r in corpus.select(
            "doc_id", quality_score(F.col("text")).alias("q")
        ).collect()
    }
    assert q[5] < 0.5 and q[6] < 0.5 and q[1] >= 0.5


def test_curation_report_sums_kept_docs(corpus):
    rep = {r.lang: r for r in curation_report(corpus).collect()}
    assert rep["en"].n_docs == 2  # docs 1 and 4
    assert rep["de"].n_docs == 1
    assert rep["en"].total_tokens_ws == len(GOOD.split()) + len(DOCS[3][1].split())


def test_curate_plan_single_agg_no_window_no_join(corpus):
    plan = curate_corpus(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Join" not in plan
    # exactly one shuffle: the partial+final hash agg on the digest
    assert plan.count("Exchange") == 1
