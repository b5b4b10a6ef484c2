"""End-to-end per-turn equality against generator goldens (the oracle of
FIXTURES.md section 2): extraction output must equal the embedded blocks
exactly -- type, content, table grids, boxes, and reading order -- under
stable (conv_id, turn_idx) ordering."""

from collections import defaultdict

import pytest

from crrf_det_spark import synth
from crrf_det_spark.extract import extract_turn_auto, extracted_text


def _check_corpus(n_convs, seed, skew_convs=0):
    transcripts, goldens = synth.generate(
        n_convs=n_convs, seed=seed, skew_convs=skew_convs, skew_factor=20
    )
    gold_by_turn = defaultdict(list)
    for g in goldens:
        gold_by_turn[(g["conv_id"], g["turn_idx"])].append(g)
    for t in transcripts:
        key = (t["conv_id"], t["turn_idx"])
        segs = extract_turn_auto(t["text"])
        gold = sorted(gold_by_turn[key], key=lambda g: g["cindex"])
        got = [(s["type"], s["content"], s["rows"], s["box"]) for s in segs]
        want = [(g["type"], g["content"], g["rows"], g["box"]) for g in gold]
        assert got == want, f"turn {key} mismatch:\n{t['text']}\n{got}\n{want}"
        # the per-turn text-equality invariant
        assert extracted_text(segs) == "\n".join(g["content"] for g in gold)


@pytest.mark.parametrize("seed", [7, 42, 99])
def test_golden_equality(seed):
    _check_corpus(n_convs=40, seed=seed)


def test_golden_equality_skewed():
    _check_corpus(n_convs=20, seed=13, skew_convs=2)


def test_generator_deterministic():
    a = synth.generate(n_convs=5, seed=3)
    b = synth.generate(n_convs=5, seed=3)
    assert a == b
