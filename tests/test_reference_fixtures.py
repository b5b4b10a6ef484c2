"""Kernel fidelity against the reference's OWN golden test pages.

Round-3 verification gap closure (VERDICT.md "Next round" #1): the synth
generator produces both inputs and expected spans, so a heuristic
divergence mirrored in the generator would be invisible.  These fixtures
are transcriptions of five REAL pages from the reference's pixel-golden
corpus (/root/reference/src/tests/src_imgs), with expectations extracted
from the reference's own painted stage goldens (ref_imgs) — inputs the
generator did NOT produce, expectations the engine did NOT compute.

Provenance (scripts/transcribe_reference.py regenerates everything):

* fixture text  <- source PNG decoded (scripts/refpng.py), binarized with
  the reference's exact semantics (rgb2gray -> 4.5%/3.5% margin clear ->
  threshold 0.87843..., pseg.py:186-199; verified pixel-identical to the
  ink recoverable from the stage-01 golden on all five pages:
  manifest "binarize_mismatch_px" == 0), then transcribed per column
  region at the engine's documented scale (5 px/char, ~10.8 px/line).
* expectations  <- stage-01 columns/spacings, stage-02 row groups,
  tablevspan-05 surviving rects and stage-06 table grid lines, decoded
  from the debug_painter overlays (pseg.py:1188-1301).

Scale quantization, documented:

* columns: +-1 char (5 px) boundary tolerance.
* rows: per-column ink-row runs map 1:1 to text lines -> exact.
* row GROUPS: pixel gaps below the hard-split threshold quantize to
  either 0 or 1 blank text line, and a blank line always splits in text
  space (grid.py MIN_BLOCK_SPLIT — the blur-connector analogue), so the
  engine may split one reference group in two (never merge across a
  reference boundary on these pages).  Group counts are asserted +-1 with
  the exact per-page partitions pinned below.
* table column lines: a reference gutter narrower than 2 chars (10 px)
  folds into content (MIN_SPACING_SPAN, mirroring the reference's own
  5 px fold, pseg.py:641), so the resolvable count is the number of
  stage-05 rects >= 10 px wide — asserted exactly against that derivation.

Pages: tsla2021.14 (two-col + sidebar table), de2021.64 (portrait,
three stacked tables), cargill2022.73 (single-col wide table),
x2021.87 (two-col, table + degenerate 1-line grid), adbe2021.28
(multi-col text page, no tablevspan goldens).

Round-3 expansion: the ENTIRE reference golden corpus (all 30 pages of
/root/reference/src/tests/test_pseg.py:16) is transcribed.  Beyond the
curated 8 above, 18 more pages carry full assertions (R3_PAGES) and 4
are pinned as documented quantization limits (QUANT_LIMIT_PAGES below).
Two more quantization mechanisms show up at corpus scale, both direction-
preserving on row TOTALS (conserved on every page):

* a reference group boundary whose pixel gap is sub-10px produces 0
  blank lines in text space, where it can fall below the soft-split
  spacing rule -> two reference groups MERGE (cargill2022.97,
  eog2021.19, eog2021.70).  Only 0-blank-gap boundaries ever merge:
  every >=1-blank-line boundary still splits (MIN_BLOCK_SPLIT).
* >=10px leading BETWEEN rows of one reference group produces blank
  lines INSIDE the group -> extra splits (eni2021.9's airy table).
* table grids can also GAIN column lines: uniform 'x' char fill squares
  up ragged text edges into clean full-height gutters the real pixels
  don't have (bp2021.21 3->6 col lines).
"""

from __future__ import annotations

import json
import os

import pytest

from crrf_det_spark.grid import occupancy_from_text, parse_grid

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "reference")
PAGES = [
    "tsla2021.14",
    "de2021.64",
    "cargill2022.73",
    "x2021.87",
    "adbe2021.28",
    "cargill2022.83",
    "tsla2021.123",
    "tsla2021.36",
]

# pages whose table-column-line count follows the 2-char-gutter
# quantization derivation exactly (single table region per column); the
# multi-table pages below instead assert bounded quantization loss
DERIVED_COL_PAGES = ["tsla2021.14", "de2021.64", "cargill2022.73", "x2021.87"]

# Exact group partitions: (page, column) -> (ref groups, engine groups).
# Where they differ, the engine's partition refines or shifts a reference
# boundary by one row for the documented quantization reason.
GROUP_PARTITIONS = {
    ("tsla2021.14", 0): ([2, 9, 1], [2, 9, 1]),          # exact
    # 12px intra-group gap quantizes to a blank line -> extra split
    ("tsla2021.14", 1): ([1, 9, 5], [1, 9, 1, 4]),
    # 12px gap inside the reference's 39-row group -> extra split
    ("de2021.64", 0): ([1, 39], [1, 15, 24]),
    ("cargill2022.73", 0): ([1, 4, 10, 3], [1, 4, 10, 3]),  # exact
    # 5px title gap quantizes to adjacency -> boundary shifts one row
    ("x2021.87", 0): ([1, 1, 2], [2, 1, 1]),
    ("x2021.87", 1): ([1, 4, 13, 1], [1, 4, 13, 1]),     # exact
    # same title-gap shift as x2021.87 col0
    ("adbe2021.28", 0): ([1, 1, 18], [2, 1, 17]),
    ("cargill2022.83", 0): ([3, 12], [3, 12]),           # exact
    ("tsla2021.123", 0): ([8, 5, 3, 3, 3, 2], [8, 5, 3, 3, 3, 2]),  # exact
    ("tsla2021.36", 0): ([5, 6, 14], [5, 6, 14]),        # exact
}

# ---------------------------------------------------------------------------
# round-3 corpus expansion: the remaining 22 reference golden pages
# ---------------------------------------------------------------------------

# 18 pages with full column/row/group assertions.  Partition divergences
# are pinned (ref, ours) with the quantization mechanism tagged:
#   refine = >=10px intra-group leading adds blank lines -> extra splits
#   merge  = sub-10px ref gap -> 0 blank lines -> boundary vanishes
# Totals are conserved on every page (asserted separately).
R3_PAGES = [
    "bp2021.21",
    "bp2021.24",
    "bp2021.25",
    "bp2021.3",
    "cargill2022.15",
    "cargill2022.97",
    "de2021.63",
    "eni2021.49",
    "eni2021.9",
    "eog2021.16",
    "eog2021.19",
    "eog2021.28",
    "eog2021.70",
    "tsla2021.122",
    "tsla2021.141",
    "tsla2021.2",
    "tsla2021.68",
    "tsla2021.73",
    # round-4: the rogue-spacing branch (grid.py _column_heuristics,
    # pseg.py:311-335, previously simplified away) resolves this page's
    # column flip even in quantized mode — promoted out of
    # QUANT_LIMIT_COLUMNS with full assertions
    "x2021.27",
]

R3_GROUP_PARTITIONS = {
    ("bp2021.21", 0): ([1, 2, 8], [1, 2, 7, 1]),                  # refine
    ("bp2021.24", 0): ([2, 1, 8], [1, 1, 1, 7, 1]),               # refine
    ("bp2021.25", 0): ([1, 5, 3], [1, 1, 4, 2, 1]),               # refine
    ("bp2021.3", 0): ([1, 4, 1, 1], [1, 1, 3, 1, 1]),             # refine
    ("cargill2022.15", 0): ([4, 7, 5, 4, 4], [4, 1, 6, 5, 4, 4]),  # refine
    # two 0-blank-gap boundaries vanish (manifest first/last_line shows
    # gap_before=0 for groups 1 and 2)
    ("cargill2022.97", 0): ([3, 7, 8, 3, 2, 3], [18, 3, 2, 3]),   # merge
    ("de2021.63", 0): ([1, 3, 15], [1, 3, 1, 14]),                # refine
    ("eni2021.49", 0): ([2, 15, 2, 5, 19, 1], [2, 15, 2, 5, 19, 1]),
    # airy table: >=10px leading between every ref row -> singletons
    ("eni2021.9", 0): (
        [3, 9, 6, 2],
        [2, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 1, 1, 1, 1, 1, 1],
    ),  # refine
    ("eog2021.16", 0): ([1, 32, 1], [1, 32, 1]),
    ("eog2021.19", 0): ([1, 18, 7], [1, 24, 1]),       # merge + refine
    ("eog2021.19", 1): ([3, 7, 11, 7], [3, 7, 11, 7]),
    ("eog2021.28", 0): (
        [1, 2, 6, 5, 6, 7], [1, 2, 6, 4, 1, 6, 6, 1],
    ),  # refine
    ("eog2021.28", 1): ([6, 7, 7, 7], [6, 7, 7, 7]),
    # groups 3/4 join group 2 across 0-blank-gap boundaries; both real
    # blank-line boundaries (gaps 2 and 1) still split
    ("eog2021.70", 0): ([1, 33, 1], [1, 33, 1]),
    ("eog2021.70", 1): ([8, 16, 3, 3, 2], [8, 16, 8]),            # merge
    ("tsla2021.141", 0): ([3, 12, 13, 1], [3, 12, 13, 1]),
    ("tsla2021.141", 1): ([32], [32]),
    ("tsla2021.2", 0): ([1, 7, 1], [1, 7, 1]),
    ("tsla2021.2", 1): ([1, 4, 4, 7, 4, 2, 5], [1, 4, 4, 7, 4, 2, 4, 1]),
    ("tsla2021.2", 2): ([1, 4, 9, 5, 4, 5], [1, 4, 9, 5, 4, 5]),
    ("tsla2021.68", 0): ([2, 1], [2, 1]),
    ("tsla2021.68", 1): ([5, 4, 5, 7], [5, 4, 5, 1, 1, 1, 4]),    # refine
    ("tsla2021.73", 0): ([2, 1], [2, 1]),
    ("tsla2021.73", 1): (
        [1, 16, 8], [1, 8, 1, 5, 1, 1, 1, 1, 1, 5],
    ),  # refine
    ("x2021.27", 0): ([4], [4]),
    ("x2021.27", 1): ([7, 8, 13, 4], [7, 8, 13, 4]),
    ("x2021.27", 2): ([1, 2, 3], [1, 2, 3]),
    # airy right column: >=10px leading quantizes to blank lines
    ("x2021.27", 3): ([1, 5, 5, 3], [1, 1, 2, 1, 1, 5, 1, 1, 1]),  # refine
}

# Nondegenerate (>=2x2) table grids, (ref, ours) sorted tuples of
# (column, n_row_lines, n_col_lines).  Divergences follow from the
# pinned group partitions (a split group ends the table's row span) and
# from char-fill gutter squaring (bp2021.21 gains col lines).
R3_TABLES = {
    "bp2021.21": ([(0, 7, 3)], [(0, 6, 6)]),
    "bp2021.24": ([], []),
    "bp2021.25": ([(0, 4, 7)], [(0, 3, 9)]),
    "bp2021.3": ([(0, 3, 2)], []),
    "eog2021.70": (
        [(0, 32, 2), (1, 2, 2), (1, 2, 2), (1, 7, 2), (1, 15, 2)],
        [(0, 27, 2), (1, 15, 2)],
    ),
    "tsla2021.73": ([(1, 5, 11)], [(1, 2, 6)]),
}

# 3 pages where 5px/char quantization flips a COLUMN-stage threshold
# decision; the engine output is pinned so any kernel change surfaces.
# (Round 4: x2021.27 resolved by the rogue-spacing branch and moved to
# R3_PAGES; ALL of these — and every pinned group divergence above —
# resolve under true-geometry hints, see TestHintedParity below.)
# Causes (verified against the binarized pixels, see git history):
# * eog2021.68 / eog2021.9: table-heavy pages whose true sub-15px gutter
#   widths decide the narrow-spacing merge; 5px cells quantize a 15px
#   spacing to 3 chars (kept) where the reference merges it, cascading
#   into a different collapse path.
# * x2021.64: ref's max interior spacing 172px sits 3% under the
#   width/4=177.75 collapse gate (-> single column); in char space the
#   bottom-anchored footer makes the trailing spacing 55 chars >= 34.5
#   -> no collapse (and the footer row itself quantizes to spacing).
QUANT_LIMIT_COLUMNS = {
    "eog2021.68": ([[7, 58], [63, 115]], [[6, 115]]),
    "eog2021.9": ([[6, 58], [63, 115]], [[6, 115]]),
    "x2021.64": ([[4, 138]], [[4, 71], [74, 83]]),
}
QUANT_LIMIT_PAGES = sorted(QUANT_LIMIT_COLUMNS)


@pytest.fixture(scope="module")
def manifest():
    with open(os.path.join(FIXTURE_DIR, "manifest.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def results(manifest):
    out = {}
    for page in PAGES + R3_PAGES + QUANT_LIMIT_PAGES:
        with open(os.path.join(FIXTURE_DIR, page + ".txt")) as f:
            text = f.read()
        grid, _ = occupancy_from_text(text)
        out[page] = parse_grid(grid)
    return out


def _nondegenerate_tables(result):
    """(col_idx -> [(n_row_lines, n_col_lines)]) for built tables with a
    real grid (>= 2 lines both ways; 1-line 'grids' intersect into zero
    cells in both engines)."""
    out = {}
    for ci, d in result["column_row_grp_build_table"].items():
        for _gi, (trows, tcols) in d.items():
            if len(trows) >= 2 and len(tcols) >= 2:
                out.setdefault(ci, []).append((len(trows), len(tcols)))
    return out


@pytest.mark.parametrize("page", PAGES)
def test_binarize_parity(manifest, page):
    # generation-time proof: our P1/P2 reproduction of the reference's
    # margin-clear + threshold is pixel-identical to the ink recovered
    # from the reference's own stage-01 golden
    assert manifest[page]["binarize_mismatch_px"] == 0


@pytest.mark.parametrize("page", PAGES)
def test_columns_match_reference(manifest, results, page):
    ref = manifest[page]["columns_char"]
    ours = results[page]["columns"]
    assert len(ours) == len(ref), (ref, ours)
    for (rl, rr), (ol, orr) in zip(ref, ours):
        assert abs(ol - rl) <= 2 and abs(orr - rr) <= 2, (ref, ours)


@pytest.mark.parametrize("page", PAGES)
def test_row_totals_exact(manifest, results, page):
    for cg in manifest[page]["row_groups"]:
        ci = cg["column"]
        ours = sum(len(rows) for rows in results[page]["column_row_groups"][ci])
        assert ours == cg["n_rows_total"], (page, ci, ours, cg["n_rows_total"])


@pytest.mark.parametrize("page", PAGES)
def test_group_partitions(manifest, results, page):
    for cg in manifest[page]["row_groups"]:
        ci = cg["column"]
        ref_sizes = [g["n_rows"] for g in cg["groups"]]
        our_sizes = [
            len(rows) for rows in results[page]["column_row_groups"][ci]
        ]
        exp_ref, exp_ours = GROUP_PARTITIONS[(page, ci)]
        # the manifest must still say what it said at transcription time
        assert ref_sizes == exp_ref, (page, ci, ref_sizes)
        assert our_sizes == exp_ours, (page, ci, our_sizes)
        # quantization may add at most one split and never changes totals
        assert abs(len(our_sizes) - len(ref_sizes)) <= 1


@pytest.mark.parametrize(
    "page", ["cargill2022.83", "tsla2021.123", "tsla2021.36"]
)
def test_table_grids_multitable_pages(manifest, results, page):
    """Row-line parity is EXACT on these pages; column lines lose at most
    a few sub-2-char gutters to quantization and never gain."""
    m = manifest[page]
    ours = _nondegenerate_tables(results[page])
    ref = [
        (t["n_row_lines"], t["n_col_lines"])
        for t in m["tables"]
        if t["n_row_lines"] >= 2 and t["n_col_lines"] >= 2
    ]
    our_flat = [t for ts in ours.values() for t in ts]
    assert len(our_flat) == len(ref), (page, ref, our_flat)
    # per-table row-line multiset identical
    assert sorted(t[0] for t in our_flat) == sorted(t[0] for t in ref)
    ref_cols = sum(t[1] for t in ref)
    our_cols = sum(t[1] for t in our_flat)
    assert 0 <= ref_cols - our_cols <= 4, (page, ref_cols, our_cols)


@pytest.mark.parametrize("page", DERIVED_COL_PAGES)
def test_table_grids(manifest, results, page):
    m = manifest[page]
    ours = _nondegenerate_tables(results[page])
    ref_by_col = {}
    for t in m["tables"]:
        if t["n_row_lines"] >= 2 and t["n_col_lines"] >= 2:
            ref_by_col.setdefault(t["column"], []).append(
                (t["n_row_lines"], t["n_col_lines"])
            )
    expected_cols = m["expected_col_lines_per_column"]
    for ci, ref_tables in ref_by_col.items():
        assert ci in ours, (page, ci, ours)
        # column lines: exactly the quantization-resolvable count derived
        # from the reference's surviving stage-05 rects
        our_col_lines = sum(t[1] for t in ours[ci])
        assert our_col_lines == expected_cols[ci], (
            page, ci, our_col_lines, expected_cols[ci],
        )
        # row lines: within 3 of the reference total (boundary rows merge
        # when the group partition differs by one split)
        ref_rows = sum(t[0] for t in ref_tables)
        our_rows = sum(t[0] for t in ours[ci])
        assert abs(our_rows - ref_rows) <= 3, (page, ci, our_rows, ref_rows)
    # no table in a column where the reference has none (degenerate
    # 1-line grids excluded on both sides)
    for ci in ours:
        assert ci in ref_by_col, (page, ci, ours)


def test_cargill_table_exact(manifest, results):
    # the page where quantization loses nothing: full grid parity
    ours = _nondegenerate_tables(results["cargill2022.73"])
    assert ours == {0: [(9, 5)]}
    ref = manifest["cargill2022.73"]["tables"][0]
    assert (ref["n_row_lines"], ref["n_col_lines"]) == (9, 5)


# ---------------------------------------------------------------------------
# round-3 corpus expansion
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("page", R3_PAGES + QUANT_LIMIT_PAGES)
def test_r3_binarize_parity(manifest, page):
    assert manifest[page]["binarize_mismatch_px"] == 0


@pytest.mark.parametrize("page", R3_PAGES)
def test_r3_columns_match_reference(manifest, results, page):
    ref = manifest[page]["columns_char"]
    ours = results[page]["columns"]
    assert len(ours) == len(ref), (ref, ours)
    for (rl, rr), (ol, orr) in zip(ref, ours):
        assert abs(ol - rl) <= 2 and abs(orr - rr) <= 2, (ref, ours)


@pytest.mark.parametrize("page", R3_PAGES)
def test_r3_row_totals_exact(manifest, results, page):
    # totals survive every quantization mechanism: merges and refines
    # repartition rows, never drop or invent them
    for cg in manifest[page].get("row_groups", []):
        ci = cg["column"]
        ours = sum(len(rows) for rows in results[page]["column_row_groups"][ci])
        assert ours == cg["n_rows_total"], (page, ci, ours, cg["n_rows_total"])


@pytest.mark.parametrize("page", R3_PAGES)
def test_r3_group_partitions(manifest, results, page):
    for cg in manifest[page].get("row_groups", []):
        ci = cg["column"]
        ref_sizes = [g["n_rows"] for g in cg["groups"]]
        our_sizes = [
            len(rows) for rows in results[page]["column_row_groups"][ci]
        ]
        exp_ref, exp_ours = R3_GROUP_PARTITIONS[(page, ci)]
        assert ref_sizes == exp_ref, (page, ci, ref_sizes)
        assert our_sizes == exp_ours, (page, ci, our_sizes)


@pytest.mark.parametrize("page", R3_PAGES)
def test_r3_merges_only_at_zero_blank_gaps(manifest, results, page):
    """A reference boundary may vanish ONLY when its pixel gap produced
    zero blank text lines; every >=1-blank-line boundary must split
    (MIN_BLOCK_SPLIT is unconditional in text space)."""
    for cg in manifest[page].get("row_groups", []):
        ci = cg["column"]
        exp_ref, exp_ours = R3_GROUP_PARTITIONS[(page, ci)]
        if len(exp_ours) >= len(exp_ref):
            continue  # no merge on this column
        groups = cg["groups"]
        # cumulative row counts of surviving engine boundaries
        our_cuts = set()
        acc = 0
        for n in exp_ours[:-1]:
            acc += n
            our_cuts.add(acc)
        acc = 0
        for prev, cur in zip(groups, groups[1:]):
            acc += prev["n_rows"]
            gap = cur["first_line"] - prev["last_line"] - 1
            if gap >= 1:
                assert acc in our_cuts, (page, ci, acc, gap)


@pytest.mark.parametrize("page", sorted(R3_TABLES))
def test_r3_table_grids(manifest, results, page):
    exp_ref, exp_ours = R3_TABLES[page]
    ref = sorted(
        (t["column"], t["n_row_lines"], t["n_col_lines"])
        for t in manifest[page]["tables"]
        if t["n_row_lines"] >= 2 and t["n_col_lines"] >= 2
    )
    ours = sorted(
        (ci, t[0], t[1])
        for ci, ts in _nondegenerate_tables(results[page]).items()
        for t in ts
    )
    assert ref == exp_ref, (page, ref)
    assert ours == exp_ours, (page, ours)


@pytest.mark.parametrize("page", QUANT_LIMIT_PAGES)
def test_quant_limit_columns_pinned(manifest, results, page):
    exp_ref, exp_ours = QUANT_LIMIT_COLUMNS[page]
    assert manifest[page]["columns_char"] == exp_ref, (
        page, manifest[page]["columns_char"],
    )
    ours = [list(c) for c in results[page]["columns"]]
    assert ours == exp_ours, (page, ours)


# ---------------------------------------------------------------------------
# round-4: true-geometry hinted parity — EVERY divergence pinned above is
# text-space quantization loss, not heuristic drift
# ---------------------------------------------------------------------------
#
# The transcriber knows each text line's real pixel extent and each pixel
# column's true Hough verdict; it emits both as a manifest side-channel
# (line_geometry, hough_px).  parse_grid threads them into the kernel,
# which then applies the REFERENCE'S OWN pixel thresholds (grid.py
# REF_*_PX; pseg.py:233-234,415-423) instead of the quantized v-unit/char
# ports — the same hook a PDF-path caller with true glyph coordinates
# would use.  Under hints, all 30 reference golden pages reproduce the
# reference's column sets and EXACT group partitions: the quantized
# divergence tables above shrink to zero here.

ALL_PAGES = PAGES + R3_PAGES + QUANT_LIMIT_PAGES


@pytest.fixture(scope="module")
def hinted_results(manifest):
    out = {}
    for page in ALL_PAGES:
        with open(os.path.join(FIXTURE_DIR, page + ".txt")) as f:
            text = f.read()
        grid, _ = occupancy_from_text(text)
        out[page] = parse_grid(
            grid,
            line_geometry=manifest[page]["line_geometry"],
            hough_px=manifest[page]["hough_px"],
        )
    return out


@pytest.mark.parametrize("page", sorted(ALL_PAGES))
def test_hinted_columns_match_reference(manifest, hinted_results, page):
    ref = manifest[page]["columns_char"]
    ours = hinted_results[page]["columns"]
    assert len(ours) == len(ref), (page, ref, ours)
    for (rl, rr), (ol, orr) in zip(ref, ours):
        assert abs(ol - rl) <= 2 and abs(orr - rr) <= 2, (page, ref, ours)


@pytest.mark.parametrize("page", sorted(ALL_PAGES))
def test_hinted_group_partitions_exact(manifest, hinted_results, page):
    for cg in manifest[page].get("row_groups", []):
        ci = cg["column"]
        ref_sizes = [g["n_rows"] for g in cg["groups"]]
        groups = hinted_results[page]["column_row_groups"]
        assert ci < len(groups), (page, ci)
        our_sizes = [len(rows) for rows in groups[ci]]
        assert our_sizes == ref_sizes, (page, ci, ref_sizes, our_sizes)
