"""Pure-numpy layout-analysis core (text-space analogue of the reference's
``pseg`` module, /root/reference/src/tpdf/pseg.py).

The reference operates on a binarized page raster (400px narrow side).  This
engine re-expresses the same projection-profile / grid-line heuristics over a
**line x char occupancy grid** derived from a transcript turn's text:

* grid cell value 1 = blank (the reference's white 255), 0 = content (ink).
* horizontal unit = one character column  (~5px at the reference's 400px/80col
  scale; px thresholds are divided by ~5 below).
* vertical unit   = 1/4 of a text line: line ``L`` occupies v-interval
  ``[4L, 4L+3]`` (content height 3) and the inter-line gap is 1 v-unit,
  mirroring the reference's ~8px glyph + ~3px leading at 400px scale
  (1 v-unit ~ 2.7px; px thresholds divided by ~2.7 below).

Every public function cites the reference routine it re-expresses.  All code
here is per-turn and vectorized numpy; it runs inside Arrow batches in the
Spark pipeline (crrf_det_spark.pipeline) with zero per-row Python at the
DataFrame level.
"""

from __future__ import annotations

import bisect
import re

import numpy as np

# ---------------------------------------------------------------------------
# constants (char/v-space ports of the reference's pixel constants)
# ---------------------------------------------------------------------------

V_UNIT = 4          # v-units per text line (content 3 + gap 1)
LINE_H = 3          # content height of one line in v-units

# columns_from_image (pseg.py:209-371)
MIN_COLUMN_SPACING = 3      # ref 15px  (pseg.py:233)
MIN_COLUMN_WIDTH = 20       # ref 100px (pseg.py:234)
COLUMN_BLANK_FRACTION = 0.95  # ref hough line_length=0.95*height (pseg.py:240)
REF_MIN_COLUMN_SPACING_PX = 15   # pseg.py:233, used verbatim in px mode
REF_MIN_COLUMN_WIDTH_PX = 100    # pseg.py:234
CHAR_W_PX = 5.0                  # documented transcription scale (px/char)

# row_groups_from_columns (pseg.py:389-609), v-units (~2.7px each)
MIN_SPACING_HARD_SPLIT = 9   # ref 25px  (pseg.py:419)
MIN_SPACING_SOFT_SPLIT = 4   # ref 10px  (pseg.py:418)
MIN_SPACING_MULTIPLE = 1.75  # ref       (pseg.py:422)
MIN_SINGLE_ROW_GROUP_HEIGHT = 28  # ref 75px (pseg.py:423)
TITLE_MIN_SPACING = 3        # ref 9px   (pseg.py:415)
TITLE_MIN_HEIGHT = 4         # ref 10px  (pseg.py:416)
# text-space addition: a blank text line (spacing 4k+1 >= 5 for k>=1 blank
# lines) always separates blocks -- the analogue of the reference's
# BLUR_SIGMA=4 paragraph connector (pseg.py:183): adjacent lines "touch",
# anything across a blank line does not.
MIN_BLOCK_SPLIT = 5

# Reference pixel thresholds, used VERBATIM when the caller supplies true
# per-line pixel geometry (row_groups_from_column line_px / parse_grid
# line_geometry): a PDF-path caller (pdfmini y-coordinates) or a fixture
# transcriber knows each line's real ink extent, so the sweep can run the
# reference's own pixel rules (pseg.py:415-423) instead of the quantized
# v-unit ports above — sub-char leading stops being information loss.
REF_TITLE_MIN_SPACING_PX = 9
REF_TITLE_MIN_HEIGHT_PX = 10
REF_MIN_SPACING_SOFT_SPLIT_PX = 10
REF_MIN_SPACING_HARD_SPLIT_PX = 25
REF_MIN_SINGLE_ROW_GROUP_HEIGHT_PX = 75
REF_OUTER_MERGE_MIN_SPACING_PX = 5   # pseg.py:508
REF_COMPACT_MIN_SPACING_PX = 2       # pseg.py:520
PX_PER_VUNIT = 2.7                   # documented transcription scale
REF_LINE_PITCH_PX = V_UNIT * PX_PER_VUNIT  # ~10.8 px per text line

# row_hspacings_from_row_groups (pseg.py:612-704)
MIN_SPACING_SPAN = 2        # ref 5px (pseg.py:641): 1-char gaps are content
BULLET_MAX_CONTENT = 1      # ref 2px bullet run (pseg.py:686)
BULLET_MAX_MERGE = 4        # ref 20px merge cap (pseg.py:693-695)

# tablevspan.remove_busy_column_rectangles (pseg.py:929-974)
BUSY_COLUMN_CONTENT_RUN_LENGTH = 14  # ref 70px portrait (pseg.py:934)
BUSY_COLUMN_ROW_COUNT = 10           # ref (pseg.py:935)

# margin boilerplate strip (prepare_images_for_segmentation clears the top
# 4.5% and 3.5% sides, pseg.py:190-197): first/last 2 lines matching this
# pattern are treated as header/footer chrome and blanked.
BOILERPLATE_MARGIN_LINES = 2
BOILERPLATE_RE = re.compile(
    r"^\s*(?:\[(?:HEADER|FOOTER)\b[^\]]*\].*"
    r"|Page \d+(?: of \d+)?"
    r"|[-=_~*]{4,})\s*$"
)


def v_start(line: int) -> int:
    return V_UNIT * line


def v_end(line: int) -> int:
    return V_UNIT * line + LINE_H


# ---------------------------------------------------------------------------
# stage 0: occupancy grid (analogue of prepare_images_for_segmentation,
# pseg.py:161-206)
# ---------------------------------------------------------------------------

# Per-turn occupancy-grid cell budget.  The reference is immune to
# degenerate page geometry BY CONSTRUCTION — it rasterizes every page at
# a fixed 400px narrow side (docmt -P 400, pseg.py:152) so its analysis
# buffers are bounded no matter what the PDF contains.  The text-space
# analogue has no such physical bound: the grid is O(lines x widest
# line), so one corrupt turn (a multi-megabyte minified-JSON line, a
# million-line log dump) could allocate gigabytes inside an executor.
# 16M cells (16 MB uint8; e.g. 4,000 lines x 4,000 cols — far beyond any
# real document layout) is the cutoff past which layout analysis is
# meaningless anyway; callers catch GridBudgetExceeded and fall back to
# paragraph-flow extraction (extract._flow_segments).
MAX_GRID_CELLS = 16_000_000


class GridBudgetExceeded(Exception):
    """Raised instead of allocating an occupancy grid whose lines x width
    footprint exceeds ``MAX_GRID_CELLS`` — one degenerate turn in a
    100 TB corpus must never OOM an executor."""


def strip_boilerplate(lines: list[str]) -> list[str]:
    """Blank header/footer chrome in the first/last margin lines.

    Analogue of the reference's margin clearing (pseg.py:190-197): the top
    4.5% of a 400px page (~2 text lines) is forced to white before analysis.
    """
    out = list(lines)
    n = len(out)
    for i in range(min(BOILERPLATE_MARGIN_LINES, n)):
        if out[i] and BOILERPLATE_RE.match(out[i]):
            out[i] = ""
    for i in range(max(0, n - BOILERPLATE_MARGIN_LINES), n):
        if out[i] and BOILERPLATE_RE.match(out[i]):
            out[i] = ""
    return out


def occupancy_from_text(text: str) -> tuple[np.ndarray, list[str]]:
    """text -> (grid, lines). grid[l, c] = 1 blank / 0 content.

    Analogue of binarization (pseg.py:199): ``im_bin_clear`` white=255 maps
    to blank=1 here.  Tabs are expanded to preserve column alignment.
    """
    lines = [ln.expandtabs(4).rstrip("\n") for ln in text.split("\n")]
    lines = strip_boilerplate(lines)
    width = max((len(ln) for ln in lines), default=0)
    if width == 0 or not lines:
        return np.ones((max(len(lines), 1), 1), dtype=np.uint8), lines
    if len(lines) * width > MAX_GRID_CELLS:
        raise GridBudgetExceeded(
            f"occupancy grid {len(lines)}x{width} exceeds "
            f"MAX_GRID_CELLS={MAX_GRID_CELLS}"
        )
    # single-buffer fast path: pad every line to `width` and decode one
    # blob; falls back per line only for multibyte (non-latin1) chars
    try:
        blob = "".join(ln.ljust(width) for ln in lines).encode("latin-1")
        grid = (
            np.frombuffer(blob, dtype=np.uint8).reshape(len(lines), width)
            == 0x20
        ).astype(np.uint8)
        return grid, lines
    except UnicodeEncodeError:
        pass
    grid = np.ones((len(lines), width), dtype=np.uint8)
    for i, ln in enumerate(lines):
        if not ln:
            continue
        grid[i, : len(ln)] = np.array(
            [1 if ch == " " else 0 for ch in ln], dtype=np.uint8
        )
    return grid, lines


# ---------------------------------------------------------------------------
# stage 1: column detection (analogue of columns_from_image, pseg.py:209-371)
# ---------------------------------------------------------------------------

def _column_heuristics(
    columns: list[list[int]],
    spacings: list[list[int]],
    width: float,
    min_spacing: float,
    min_width: float,
    portrait: bool = True,
) -> tuple[list[list[int]], list[list[int]]]:
    """The reference's column post-processing chain (pseg.py:262-369),
    unit-agnostic: chars with char constants on the quantized path, pixels
    with the reference's own constants when true geometry is supplied."""
    if not columns:
        return [], spacings

    # early single-column pass for busy portrait pages (pseg.py:263-272)
    spacing_widths = [s[1] - s[0] for s in spacings]
    large_spacing_count = sum(
        1 for w in spacing_widths[1:-1] if w > min_spacing
    )
    if portrait and large_spacing_count >= 3 and len(spacing_widths) >= 6:
        sl, sr = spacings[0], spacings[-1]
        return [[sl[1], sr[0]]], [sl, sr]

    # merge columns with very narrow spacing (pseg.py:275-287)
    merged: list[list[int]] = []
    for col in columns:
        if merged and col[0] - merged[-1][1] < min_spacing:
            merged[-1] = [merged[-1][0], col[1]]
        else:
            merged.append(list(col))
    columns = merged
    # eliminate narrow interior spacings (pseg.py:289)
    spacings = [
        s
        for i, s in enumerate(spacings)
        if (s[1] - s[0]) >= min_spacing or i == 0 or i == len(spacings) - 1
    ]

    if len(columns) > 3:
        # too many columns: either a two-column layout with wide table
        # spacings, or a single big table (pseg.py:291-349)
        middle_idx = -1
        for middle in (
            width / 2,
            spacings[-1][1] / 2,
            spacings[-1][0] / 2,
            (spacings[-1][0] + spacings[-1][1]) / 4,
            spacings[0][1] + width / 2,
        ):
            for spc_idx, s in enumerate(spacings):
                if s[1] >= middle and s[0] <= middle:
                    middle_idx = spc_idx
                    break
            if middle_idx != -1:
                break
        if middle_idx != -1 and spacings[middle_idx][1] > spacings[middle_idx][0]:
            if spacings[0][1] > width / 5:
                # unconventional layout (huge first spacing): merge away
                # only the ROGUE spacings — interior spacings wider than
                # the middle one — and keep the rest of the multi-column
                # structure (pseg.py:311-335)
                mid_w = spacings[middle_idx][1] - spacings[middle_idx][0]
                rogue = [
                    s
                    for i, s in enumerate(spacings[1:-1], start=1)
                    if i != middle_idx and s[1] - s[0] > mid_w
                ]
                for s in rogue:
                    ends = [c[1] for c in columns]
                    begins = [c[0] for c in columns]
                    if s[0] in ends and s[1] in begins:
                        ri = ends.index(s[0])
                        li = begins.index(s[1])
                        columns[ri][1] = columns[li][1]
                        del columns[li]
                        spacings.remove(s)
            else:
                # conventional two-column collapse (pseg.py:336-339)
                s0, sm, s1 = spacings[0], spacings[middle_idx], spacings[-1]
                columns = [[s0[1], sm[0]], [sm[1], s1[0]]]
                spacings = [s0, sm, s1]
        elif len(spacings) >= 2:
            # heuristic #2: likely one big table -> single column
            # (pseg.py:341-349)
            sl, sr = spacings[0], spacings[-1]
            columns = [[sl[1], sr[0]]]
            spacings = [sl, sr]

    # narrow column => whole page is a single table (pseg.py:351-369)
    spacing_widths = [s[1] - s[0] for s in spacings]
    if spacing_widths and max(spacing_widths) < width / 4 and len(columns) > 1:
        narrow = any(
            (col[1] - col[0]) < min_width for col in columns[1:]
        )
        if narrow:
            sl, sr = spacings[0], spacings[-1]
            columns = [[sl[1], sr[0]]]
            spacings = [sl, sr]

    return columns, spacings


def _columns_from_hough_px(hough_px: dict) -> tuple[list, list]:
    """Column detection in PIXEL space from true Hough verdicts.

    ``hough_px``: {"runs": [[x0, x1), ...] maximal runs of pixel columns
    carrying a >= 0.95-page-height contiguous blank vertical,
    "width_px": page width, "height_px": page height, "char_w": px/char
    (default 5.0)}.  Mirrors the reference's line->spacing->column
    construction (pseg.py:241-259: spacings span first..last line x
    INCLUSIVE, columns span between them sharing endpoints) and runs the
    shared heuristics with the reference's pixel constants, then converts
    to char ranges."""
    width = hough_px["width_px"]
    portrait = hough_px.get("height_px", width + 1) > width
    char_w = hough_px.get("char_w", CHAR_W_PX)
    spacings: list[list[int]] = []
    columns: list[list[int]] = []
    prev_end = 0  # ref: spacing = [0, 0] seed
    for a, b in sorted(hough_px["runs"]):
        last_x = b - 1  # runs are half-open; ref lines are inclusive xs
        if a != prev_end:
            # ref column = [prev_spacing_last_x, first_x] — endpoints
            # shared with the gutters (pseg.py:253)
            columns.append([prev_end, a])
        if last_x != a:
            # 1px-wide gutters split columns but are dropped from the
            # spacings list (ref appends only when spacing[0] !=
            # spacing[1], pseg.py:256)
            spacings.append([a, last_x])
        prev_end = last_x
    # ref emits no trailing column: the 3.5% side clearing guarantees the
    # rightmost qualifying run IS the right margin
    if spacings and spacings[0][0] != 0:
        spacings.insert(0, [0, 0])
    if not spacings:
        spacings = [[0, 0], [width, width]]
    columns, spacings = _column_heuristics(
        columns,
        spacings,
        width,
        REF_MIN_COLUMN_SPACING_PX,
        REF_MIN_COLUMN_WIDTH_PX,
        portrait=portrait,
    )
    to_char = lambda v: int(round(v / char_w))  # noqa: E731
    return (
        [[to_char(l), to_char(r)] for l, r in columns],
        [[to_char(l), to_char(r)] for l, r in spacings],
    )


def columns_from_grid(
    grid: np.ndarray, hough_px: dict | None = None
) -> tuple[list[list[int]], list[list[int]]]:
    """Detect page columns from near-full-height blank char-column runs.

    Returns (columns, spacings); both are ``[left, right)`` half-open char
    ranges (deviation from the reference's inclusive-right for clarity).

    The reference finds full-height white verticals with a probabilistic
    Hough transform at ``line_gap=0`` (pseg.py:240) — i.e. a CONTIGUOUS
    blank vertical run >= 0.95 of the page height.  On an axis-aligned char
    grid the same signal is the longest contiguous blank run per char
    column >= 0.95 of the line count.  (Total-blank-fraction is close but
    diverges on pages where a full-width title interrupts an otherwise
    blank gutter — verified against the reference's own golden pages in
    tests/test_reference_fixtures.py.)

    ``hough_px`` (optional): a caller with sub-char x-geometry (PDF
    coordinates, the fixture transcriber) passes the TRUE qualifying
    pixel-column runs; the whole stage then runs in pixel space with the
    reference's own constants (see _columns_from_hough_px) — spacing
    widths stop being quantized to 5px multiples, which is what decides
    the narrow-spacing merge and collapse gates on table-heavy pages.
    """
    if hough_px is not None:
        return _columns_from_hough_px(hough_px)
    n_lines, width = grid.shape
    # longest contiguous blank run per char column, fully vectorized (the
    # kernel runs per turn inside Arrow batches — a python loop over lines
    # would cost ~n_lines iterations per turn at corpus scale): with
    # s = cumsum(blank) down each column, the blank-run length ending at
    # line l is s[l] - s[last zero at or before l]; that last-zero value
    # is the running max of s masked to content lines (s is nondecreasing),
    # so three whole-grid ops give every run length at once.
    s = np.cumsum(grid, axis=0, dtype=np.int32)
    at_content = np.where(grid == 0, s, 0)
    last_zero = np.maximum.accumulate(at_content, axis=0)
    best = (s - last_zero).max(axis=0)
    is_space_col = best >= COLUMN_BLANK_FRACTION * n_lines

    # run-length the qualifying columns into spacings (pseg.py:244-259)
    spacings: list[list[int]] = []
    columns: list[list[int]] = []
    x = 0
    while x < width:
        if is_space_col[x]:
            x0 = x
            while x < width and is_space_col[x]:
                x += 1
            spacings.append([x0, x])
        else:
            x0 = x
            while x < width and not is_space_col[x]:
                x += 1
            columns.append([x0, x])

    # guarantee sentinel edge margins so downstream heuristics that
    # reference spacings[0]/spacings[-1] (page margins, always present in
    # the reference thanks to the 3.5% side clearing) stay well-defined.
    if not spacings or spacings[0][0] != 0:
        spacings.insert(0, [0, 0])
    if spacings[-1][1] != width:
        spacings.append([width, width])

    return _column_heuristics(
        columns, spacings, width, MIN_COLUMN_SPACING, MIN_COLUMN_WIDTH
    )


# ---------------------------------------------------------------------------
# stage 2: row groups (analogue of row_groups_from_columns, pseg.py:389-609)
# ---------------------------------------------------------------------------

def _row_pattern(crop_line: np.ndarray) -> int:
    """Content pattern of one line: 0=full 1=left 2=right 3=middle
    (pseg.py:456-467)."""
    w = crop_line.shape[0]
    half = w // 2
    quar = half // 2
    if half == 0:
        return 0
    if crop_line[:half].all():
        return 2
    if crop_line[w - half:].all():
        return 1
    if quar and crop_line[:quar].all() and crop_line[w - quar:].all():
        return 3
    return 0


def _row_patterns(crop: np.ndarray) -> np.ndarray:
    """Vectorized ``_row_pattern`` over every line of a column crop at once
    (same precedence: left-half white -> 2, right-half white -> 1, both
    quarters white -> 3)."""
    n_lines, w = crop.shape
    half = w // 2
    quar = half // 2
    pat = np.zeros(n_lines, dtype=np.int8)
    if half:
        if quar:
            pat[
                crop[:, :quar].all(axis=1) & crop[:, w - quar:].all(axis=1)
            ] = 3
        pat[crop[:, w - half:].all(axis=1)] = 1
        pat[crop[:, :half].all(axis=1)] = 2
    return pat


def row_groups_from_column(
    grid: np.ndarray,
    column: list[int],
    line_px: dict[int, tuple[float, float]] | None = None,
) -> tuple[list[list[list[int]]], np.ndarray]:
    """Rows (one per text line, in v-units) grouped by vertical spacing.

    Returns (row_groups, row_vspacings) for one column.  row_groups is a
    list of groups; each group is a list of ``[v_start, v_end]`` rows.
    row_vspacings mirrors the reference's per-line 0=text/1=spacing vector
    (pseg.py:443-447), indexed by text line.

    The grouping re-expresses the reference's bottom-up stateful sweep
    (pseg.py:487-570): hard split on tall spacing, compact-single-row split,
    title split, and soft split on spacing > 1.75x the running average, plus
    the text-space block rule (MIN_BLOCK_SPLIT: a blank line always splits,
    the analogue of the blur-connector, pseg.py:183).

    ``line_px`` (optional): true pixel ink extent ``{text_line: (y0, y1)}``
    (half-open ``[y0, y1)``) for this column's lines, from a caller that
    has sub-char geometry (PDF y-coordinates, the reference-fixture
    transcriber).  When given, every spacing/height DECISION runs in pixel
    space with the reference's own thresholds (pseg.py:415-423): the
    text-space block rule is dropped (a blank line is just a wide gap
    whose true size is now known) and the quantized v-unit thresholds are
    replaced by the REF_*_PX constants.  Output rows stay in v-units.
    Lines absent from ``line_px`` fall back to the documented scale
    (REF_LINE_PITCH_PX per line, LINE_H*PX_PER_VUNIT content).
    """
    crop = grid[:, column[0]: column[1]]
    n_lines = crop.shape[0]
    line_blank = crop.all(axis=1)
    row_vspacings = line_blank.astype(np.uint8)

    pat = _row_patterns(crop)
    nonblank = np.nonzero(~line_blank)[0]
    all_rows: list[list[int]] = [[v_start(i), v_end(i)] for i in nonblank]
    all_patterns: list[int] = [int(p) for p in pat[nonblank]]
    if not all_rows:
        return [], row_vspacings

    # px mode needs at least one TRUE band among this column's content
    # lines: with zero anchors every band would be synthetic and the px
    # thresholds meaningless — fall back to quantized mode instead
    # (round-4 ADVICE: never mix coordinate systems).
    anchors = (
        [int(i) for i in nonblank if line_px.get(int(i)) is not None]
        if line_px is not None else []
    )
    if not anchors:
        # quantized v-unit measurement space (inclusive row ends)
        meas = all_rows
        th_hard = MIN_SPACING_HARD_SPLIT
        th_soft = MIN_SPACING_SOFT_SPLIT
        th_single = MIN_SINGLE_ROW_GROUP_HEIGHT
        th_title_sp = TITLE_MIN_SPACING
        th_title_h = TITLE_MIN_HEIGHT
        th_outer_lo, th_outer_hi = 2, MIN_BLOCK_SPLIT
        th_compact = 1
        th_block = MIN_BLOCK_SPLIT
    else:
        # true pixel measurement space, reference thresholds verbatim.
        # [y0, y1) half-open extents convert to the reference's inclusive
        # row convention (rows[i] = [first_ink_row, last_ink_row]).
        # Lines WITHOUT true geometry (pdfmini emits meta=None when ty is
        # unknown) interpolate between their nearest true-geometry
        # neighbors — a raw line_index * pitch fallback would sit in a
        # different coordinate system than its neighbors' raster y's and
        # drive arbitrary split/merge decisions (round-4 ADVICE).
        meas = []
        for i in nonblank:
            ii = int(i)
            ext = line_px.get(ii)
            if ext is None:
                at = bisect.bisect_left(anchors, ii)
                p = anchors[at - 1] if at > 0 else None
                n = anchors[at] if at < len(anchors) else None
                if p is not None and n is not None:
                    t = (ii - p) / (n - p)
                    pe, ne = line_px[p], line_px[n]
                    ext = [
                        pe[0] + t * (ne[0] - pe[0]),
                        pe[1] + t * (ne[1] - pe[1]),
                    ]
                elif p is not None:
                    pe = line_px[p]
                    d = (ii - p) * REF_LINE_PITCH_PX
                    ext = [pe[0] + d, pe[1] + d]
                else:
                    ne = line_px[n]
                    d = (n - ii) * REF_LINE_PITCH_PX
                    ext = [ne[0] - d, ne[1] - d]
            meas.append([float(ext[0]), float(ext[1]) - 1.0])
        th_hard = REF_MIN_SPACING_HARD_SPLIT_PX
        th_soft = REF_MIN_SPACING_SOFT_SPLIT_PX
        th_single = REF_MIN_SINGLE_ROW_GROUP_HEIGHT_PX
        th_title_sp = REF_TITLE_MIN_SPACING_PX
        th_title_h = REF_TITLE_MIN_HEIGHT_PX
        th_outer_lo, th_outer_hi = REF_OUTER_MERGE_MIN_SPACING_PX, None
        th_compact = REF_COMPACT_MIN_SPACING_PX
        th_block = None  # no text-space block rule: true gaps are known

    # the sweep runs bottom-up, so rows/groups are accumulated in
    # DESCENDING order with O(1) appends (cur[-1] = row processed last,
    # physically lowest-index-so-far) and reversed once at the end --
    # a front-insert here would make one big group O(n^2) and stall on
    # degenerate 50k-line turns.  Groups hold INDICES into all_rows while
    # sweeping (decisions read the measurement space, output the v-rows).
    groups_desc: list[list[int]] = []
    cur: list[int] = []
    rows_spacings = 0.0
    last_spacing = 0.0
    last_row_height = 0.0
    row_patterns = [False, False, False, False]
    for i in reversed(range(len(all_rows))):
        row_patterns[all_patterns[i]] = True
        if not cur:
            cur.append(i)
            last_spacing = 0.0
        else:
            spacing = meas[cur[-1]][0] - meas[i][1]
            height = meas[i][1] - meas[i][0]
            prev0 = groups_desc[-1][-1] if groups_desc else None
            if (
                # hierarchical outer-row merge (pseg.py:508-516, ref >=5px);
                # in quantized mode gated below MIN_BLOCK_SPLIT so it never
                # crosses a blank text line (always a block boundary there);
                # the reference has no upper bound, so px mode has none
                spacing >= th_outer_lo
                and (th_outer_hi is None or spacing < th_outer_hi)
                and spacing >= last_spacing
                and len(cur) == 1
                and groups_desc
                and meas[prev0][1] - meas[prev0][0] < th_single
                and last_row_height < th_single
            ):
                # outer-level content row belongs to the group just formed
                # (pseg.py:508-516)
                groups_desc[-1].append(cur[-1])
                rows_spacings = 0.0
                cur = []
            elif (
                spacing >= th_hard
                # text-space block rule (quantized mode only)
                or (th_block is not None and spacing >= th_block)
                or (
                    len(cur) >= 1
                    and meas[cur[-1]][1] - meas[cur[-1]][0] >= th_single
                    and spacing > th_compact
                )
                or (
                    len(cur) >= 2
                    and row_patterns[0]
                    and row_patterns[1]
                    and row_patterns[2]
                    and all_patterns[i + 1] == 2
                    and all_patterns[i] == 1
                )
                or (
                    len(cur) >= 2
                    and row_patterns[0]
                    and row_patterns[1]
                    and all_patterns[i + 1] == 0
                    and all_patterns[i] == 1
                    and spacing
                    > rows_spacings / (len(cur) - 1) * MIN_SPACING_MULTIPLE
                )
                or (
                    len(cur) >= 2
                    and spacing
                    > rows_spacings / (len(cur) - 1) * MIN_SPACING_MULTIPLE
                    and spacing > th_soft
                )
                or (
                    i == 0
                    and all_patterns[i] != 0
                    and (
                        (height >= th_title_h and spacing >= th_title_sp)
                        or height <= spacing
                    )
                )
            ):
                groups_desc.append(cur)
                row_patterns = [False, False, False, False]
                rows_spacings = 0.0
                cur = []
            else:
                rows_spacings += spacing
            cur.append(i)
            last_spacing = spacing
            last_row_height = meas[i][1] - meas[i][0]
    if cur:
        groups_desc.append(cur)
    groups_desc.reverse()
    return (
        [[all_rows[j] for j in reversed(g)] for g in groups_desc],
        row_vspacings,
    )


# ---------------------------------------------------------------------------
# stage 3: per-row horizontal spacing profiles
# (analogue of row_hspacings_from_row_groups, pseg.py:612-704)
# ---------------------------------------------------------------------------

def row_hspacings_from_rows(
    grid: np.ndarray, column: list[int], rows: list[list[int]]
) -> np.ndarray:
    """2-D profile (n_rows x column_width), 1=spacing 0=content.

    Vectorized like the reference's diff/where idiom (pseg.py:662-669):
    spacing runs narrower than MIN_SPACING_SPAN are folded into content, and
    short left-edge bullets are merged rightward (pseg.py:677-698).
    """
    crop = grid[:, column[0]: column[1]]
    line_idx = [r0 // V_UNIT for (r0, _r1) in rows]
    out = crop[line_idx].copy()
    _eliminate_narrow_spacing_rows(out)
    _merge_bullets_matrix(out)
    return out


def row_hspacings_for_groups(
    grid: np.ndarray, column: list[int], groups: list[list[list[int]]]
) -> list[np.ndarray]:
    """Batched ``row_hspacings_from_rows`` for every group of one column.

    Both fold passes are strictly per-row (narrow-run elimination and
    bullet merging never read across rows), so running them ONCE over
    the column's concatenated row set is exactly equivalent to one pass
    per group — pinned by tests/test_grid.py::test_hspacings_batched
    — while paying the pad/diff/where fixed cost once per column
    instead of once per group (the hot path at corpus scale: a typical
    turn has several single-paragraph groups)."""
    crop = grid[:, column[0]: column[1]]
    line_idx = [r0 // V_UNIT for rows in groups for (r0, _r1) in rows]
    if line_idx:
        big = crop[line_idx].copy()
        _eliminate_narrow_spacing_rows(big)
        _merge_bullets_matrix(big)
    else:
        big = np.empty((0, crop.shape[1]), dtype=crop.dtype)
    out: list[np.ndarray] = []
    i = 0
    for rows in groups:
        out.append(big[i: i + len(rows)])
        i += len(rows)
    return out


def _eliminate_narrow_spacing_rows(m: np.ndarray) -> None:
    """Fold interior spacing runs narrower than MIN_SPACING_SPAN into
    content, whole matrix at once (leading runs -- the left margin -- are
    never narrowed, matching the reference where the crop starts inside the
    column)."""
    n_rows, width = m.shape
    # pad both sides with 0 so every run has exactly one start and one end,
    # keeping np.where's row-major starts/ends aligned 1:1
    padded = np.zeros((n_rows, width + 2), dtype=np.int8)
    padded[:, 1:-1] = m
    d = np.diff(padded, axis=1)
    sr, sc = np.where(d == 1)
    _er, ec = np.where(d == -1)
    narrow = (ec - sc < MIN_SPACING_SPAN) & (sc > 0)
    for ri, ci, ce in zip(sr[narrow], sc[narrow], ec[narrow]):
        m[ri, ci:ce] = 0


def _merge_bullets(sp: np.ndarray) -> None:
    quarter = len(sp) // 4
    # fast path: no spacing in the left quarter -> nothing to merge
    if quarter and not sp[:quarter].any():
        return
    c_len = 0
    merge_start = -1
    for i in range(min(len(sp), max(quarter, 1))):
        if sp[i] == 1:
            if 0 < c_len <= BULLET_MAX_CONTENT:
                merge_start = i
            c_len = 0
        else:
            if 0 <= merge_start and i - merge_start < BULLET_MAX_MERGE:
                sp[merge_start:i] = 0
            c_len += 1
            merge_start = -1


def _merge_bullets_matrix(m: np.ndarray) -> None:
    """Vectorized ``_merge_bullets`` over every row of the hspacings matrix
    at once.  Equivalent because each fold decision depends only on the
    run lengths of the UNMODIFIED row (a fold rewrites a spacing run the
    sweep has already passed, so later decisions never read it), so all
    candidate runs can be found in one diff pass and folded together:
    fold a spacing run when the content run before it is short
    (0 < len <= BULLET_MAX_CONTENT, a bullet glyph), the run starts and
    ends inside the left quarter, and it is narrower than
    BULLET_MAX_MERGE."""
    n_rows, width = m.shape
    quarter = width // 4
    maxi = max(quarter, 1)
    padded = np.zeros((n_rows, width + 2), dtype=np.int8)
    padded[:, 1:-1] = m
    d = np.diff(padded, axis=1)
    sr, sc = np.where(d == 1)      # spacing-run starts (row, col)
    _er, ec = np.where(d == -1)    # spacing-run ends (exclusive)
    if not len(sr):
        return
    # content-run length immediately before each spacing run: distance to
    # the previous spacing run's end in the same row (or to col 0)
    prev_ec = np.empty_like(ec)
    prev_ec[0] = 0
    prev_ec[1:] = ec[:-1]
    same_row = np.empty(len(sr), dtype=bool)
    same_row[0] = False
    same_row[1:] = sr[1:] == sr[:-1]
    clen = sc - np.where(same_row, prev_ec, 0)
    fold = (
        (clen > 0)
        & (clen <= BULLET_MAX_CONTENT)
        & (sc < maxi)
        & (ec < maxi)
        & (ec - sc < BULLET_MAX_MERGE)
    )
    for r, c0, c1 in zip(sr[fold], sc[fold], ec[fold]):
        m[r, c0:c1] = 0


# ---------------------------------------------------------------------------
# stage 4: vertical lines (analogue of vertical_lines_from_hspacings,
# pseg.py:707-752)
# ---------------------------------------------------------------------------

def vertical_lines_from_hspacings(
    row_hspacings: np.ndarray,
) -> list[tuple[tuple[int, int], tuple[int, int]]]:
    """Maximal all-spacing vertical runs >= 2 rows tall.

    Coordinates are ((x, y_top), (x, y_bottom)) in (column-crop char,
    group-row index) space, exactly as the reference.
    """
    n_rows, width = row_hspacings.shape
    # vectorized run-length per column: pad each column with 0s, diff along
    # the row axis of the transposed matrix; np.where's row-major order
    # keeps starts/ends aligned per column
    t = np.zeros((width, n_rows + 2), dtype=np.int8)
    t[:, 1:-1] = row_hspacings.T
    d = np.diff(t, axis=1)
    sx, sy = np.where(d == 1)      # run start: column x, y_top
    _ex, ey = np.where(d == -1)    # run end (exclusive): y_bottom + 1
    keep = (ey - sy) >= 2          # height >= 2 rows
    lines = [
        ((int(x), int(y0)), (int(x), int(y1)))
        for x, y0, y1 in zip(sx[keep], sy[keep], ey[keep] - 1)
    ]
    # sort tall-to-short weighted by top position (pseg.py:749-751)
    lines.sort(key=lambda ln: (ln[0][1] - ln[1][1]) * ln[0][1])
    return lines


# ---------------------------------------------------------------------------
# stage 5: tablevspan chain (analogue of class tablevspan, pseg.py:785-1185)
# ---------------------------------------------------------------------------

Rect = tuple[tuple[int, int], tuple[int, int]]


def group_adjacent_lines(lines: list) -> list[Rect]:
    """Adjacent same-height lines -> rectangles (pseg.py:795-815)."""
    rects: list[Rect] = []
    if not lines:
        return rects
    rect = lines[0]
    for line in lines[1:]:
        if (
            line[1][1] == rect[1][1]
            and line[0][1] == rect[0][1]
            and (rect[0][0] - line[0][0] == 1 or line[0][0] - rect[1][0] == 1)
        ):
            rect = (
                (min(line[0][0], rect[0][0]), rect[0][1]),
                (max(line[0][0], rect[1][0]), rect[1][1]),
            )
        else:
            rects.append(rect)
            rect = line
    rects.append(rect)
    return rects


def remove_smaller_adjacent_rectangles(rects: list[Rect]) -> list[Rect]:
    """Drop rects horizontally touching a taller-or-equal neighbour
    (pseg.py:817-844).

    The touch predicate needs exact x-adjacency (key.x1 + 1 == rect.x0 or
    key.x0 == rect.x1 + 1), so pairs are enumerated per x-boundary with
    numpy broadcasting instead of the reference's all-pairs Python scan --
    same pair set (a rect can never be value-equal to its cross-boundary
    key, so the reference's rect == key skip is vacuous here), but
    O(sum of boundary-bucket products) in C, which matters for degenerate
    multi-thousand-rect groups."""
    n = len(rects)
    if n < 2:
        return list(rects)
    if n <= 48:
        # typical pages have a handful of rects; the plain pair scan beats
        # numpy setup overhead there
        removed_l = [False] * n
        for key in rects:
            kh = key[1][1] - key[0][1]
            for j, rect in enumerate(rects):
                if rect == key:
                    continue
                if (
                    (key[1][0] + 1 == rect[0][0]
                     or key[0][0] == rect[1][0] + 1)
                    and min(key[1][1], rect[1][1])
                    - max(key[0][1], rect[0][1]) > 0
                    and rect[1][1] - rect[0][1] <= kh
                ):
                    removed_l[j] = True
        return [r for r, dead in zip(rects, removed_l) if not dead]
    # large groups: bucket candidate pairs by (x-boundary, y-band).  A
    # touching pair must share an x-boundary AND y-overlap, hence share at
    # least one y-band; repeated pair visits across bands are harmless
    # (the kill mark is idempotent).  Near-linear when rects are short
    # (the degenerate many-rect case), exact always.
    from collections import defaultdict

    band_h = 64
    removed = [False] * n
    right_at: dict[int, list[int]] = defaultdict(list)  # boundary x0 = b
    left_at: dict[int, list[int]] = defaultdict(list)   # boundary x1+1 = b
    for j, r in enumerate(rects):
        right_at[r[0][0]].append(j)
        left_at[r[1][0] + 1].append(j)
    for b, ri_list in right_at.items():
        li_list = left_at.get(b)
        if not li_list:
            continue
        bands_l: dict[int, list[int]] = defaultdict(list)
        for i in li_list:
            for band in range(
                rects[i][0][1] // band_h, rects[i][1][1] // band_h + 1
            ):
                bands_l[band].append(i)
        for j in ri_list:
            (_xj0, yj0), (_xj1, yj1) = rects[j]
            hj = yj1 - yj0
            seen: set[int] = set()
            for band in range(yj0 // band_h, yj1 // band_h + 1):
                for i in bands_l.get(band, ()):
                    if i in seen:
                        continue
                    seen.add(i)
                    (_xi0, yi0), (_xi1, yi1) = rects[i]
                    if min(yi1, yj1) - max(yi0, yj0) > 0:
                        hi = yi1 - yi0
                        if hj <= hi:
                            removed[j] = True
                        if hi <= hj:
                            removed[i] = True
    return [r for r, dead in zip(rects, removed) if not dead]


def remove_edge_rectangles(rects: list[Rect], row_hspacings: np.ndarray) -> list[Rect]:
    """Drop rects hugging the column edges, 1-char-wide rects, and rects
    whose entire left/right side is blank (pseg.py:846-878)."""
    width = row_hspacings.shape[1]
    out = [
        r
        for r in rects
        if not (r[0][0] == 0 or r[1][0] == width - 1 or r[1][0] - r[0][0] < 1)
    ]
    out.sort(key=lambda r: r[0][0])
    kept = []
    for (x0, y0), (x1, y1) in out:
        left = row_hspacings[y0: y1 + 1, 0: x0 + 1]
        right = row_hspacings[y0: y1 + 1, x1:width]
        if np.all(left == 1) or np.all(right == 1):
            continue
        kept.append(((x0, y0), (x1, y1)))
    return kept


def is_first_rectangle_column_valid(
    rects: list[Rect], row_hspacings: np.ndarray
) -> bool:
    """First table column must be >=60% filled and not anomalously short
    (pseg.py:880-927)."""
    if not rects:
        return False
    (x0, y0), (x1, y1) = rects[0]
    filled = sum(
        1
        for i in range(y0, y1 + 1)
        if row_hspacings[i, 0:x0].sum() < x0
    )
    height = 0.6 * (y1 - y0 + 1)
    filled2 = 0
    height2 = height
    if len(rects) > 1:
        (bx0, by0), (bx1, by1) = rects[1]
        height2 = 0.6 * (by1 - by0 + 1)
        filled2 = sum(
            1
            for i in range(by0, by1 + 1)
            if row_hspacings[i, 0:bx0].sum() < bx0
        )
    if filled < height and filled2 < height2:
        return False
    if len(rects) > 1:
        (x0, y0), (x1, y1) = rects[0]
        col_heights = [r[1][1] - r[0][1] for r in rects[1:]]
        thrs = float(np.median(col_heights))
        cmax = float(np.max(col_heights))
        bottoms = {r[1][1] for r in rects[1:]}
        if (
            y1 - y0 < thrs
            and y1 - y0 < cmax / 2
            and (y1 not in bottoms or y1 - y0 < 3)
        ):
            return False
    return True


def remove_busy_column_rectangles(
    rects: list[Rect], row_hspacings: np.ndarray
) -> list[Rect]:
    """Kill the table if the two leftmost regions are prose-busy
    (pseg.py:929-974), vectorized run-length instead of the reference's
    per-pixel loop."""
    if not rects:
        return rects
    width = row_hspacings.shape[1]
    r1 = (0, rects[0][0][0])
    r2 = (
        (rects[0][1][0], rects[1][0][0])
        if len(rects) >= 2
        else (rects[0][1][0], width)
    )

    def busy_rows(lo: int, hi: int) -> tuple[int, int]:
        if hi <= lo:
            return 0, 0
        content = row_hspacings[:, lo:hi] == 0
        # per-position current-run length via the cumsum-reset trick, whole
        # matrix at once; max over positions = longest content run per row
        c = content.astype(np.int32)
        s = c.cumsum(axis=1)
        reset = np.where(~content, s, 0)
        run_at = s - np.maximum.accumulate(reset, axis=1)
        longest = run_at.max(axis=1)
        has_any = content.any(axis=1)
        n_busy = int(
            ((longest >= BUSY_COLUMN_CONTENT_RUN_LENGTH) & has_any).sum()
        )
        return n_busy, int(has_any.sum())

    b1, a1 = busy_rows(*r1)
    b2, a2 = busy_rows(*r2)
    if (b1 >= BUSY_COLUMN_ROW_COUNT and b2 >= BUSY_COLUMN_ROW_COUNT) or (
        b1 >= a1 - 1 and b2 >= a2 - 1 and a1 >= 2 and a2 >= 2
    ):
        return []
    return rects


def build_table(
    column: list[int],
    rows: list[list[int]],
    rects: list[Rect],
) -> tuple[set, set]:
    """Rects -> table row/col separator lines in (v, char) page coordinates
    (pseg.py:976-1042).  Lines are 4-tuples (y, x0, y, x1) for rows and
    (y0, x, y1, x) for cols, matching the reference's skimage.draw.line
    argument order."""
    table_rows: set = set()
    for (x0, y0), (x1, y1) in rects:
        for i in range(y0, y1):
            row_y = (rows[i][1] + rows[i + 1][0]) // 2
            table_rows.add((row_y, column[0], row_y, column[1] - 1))
    # multiple tables in one group: shared tops/bottoms add rows
    # (pseg.py:1001-1023)
    rect_tops: dict[int, int] = {}
    rect_bottoms: dict[int, int] = {}
    for (x0, y0), (x1, y1) in rects:
        if y0 == 0 or rows[y1][1] >= rows[-1][1]:
            continue
        rect_tops[y0] = rect_tops.get(y0, 0) + 1
        rect_bottoms[y1] = rect_bottoms.get(y1, 0) + 1
    for i, count in rect_tops.items():
        if count >= 2 and i > 0:
            row_y = (rows[i][0] + rows[i - 1][1]) // 2
            table_rows.add((row_y, column[0], row_y, column[1] - 1))
    for i, count in rect_bottoms.items():
        if count >= 2 and i < len(rows) - 1:
            row_y = (rows[i][1] + rows[i + 1][0]) // 2
            table_rows.add((row_y, column[0], row_y, column[1] - 1))

    table_cols: set = set()
    for (x0, y0), (x1, y1) in rects:
        if y0 > 0:
            col_y_start = (rows[y0][0] + rows[y0 - 1][1]) // 2
        else:
            col_y_start = rows[y0][0]
        if y1 < len(rows) - 1:
            col_y_end = (rows[y1][1] + rows[y1 + 1][0]) // 2
        else:
            col_y_end = rows[y1][1]
        col_x = column[0] + x0 + (x1 - x0) // 2
        table_cols.add((col_y_start, col_x, col_y_end, col_x))
    return table_rows, table_cols


def find_intersections(
    column: list[int], rows: list[list[int]], table_cols: set, table_rows: set
) -> tuple[list, set, set]:
    """Raster the separator lines and detect cross intersections
    (pseg.py:1044-1126), restricted to known rows x cols like the
    reference's optimized lookup (pseg.py:1106-1119)."""
    col_shift = int(column[0])
    row_shift = int(rows[0][0])
    height = rows[-1][1] - rows[0][0]
    width = column[1] - 1 - column[0]
    img = np.ones((height + 1, width + 1), dtype=np.uint8)
    first_row, last_row = 10000, 0
    for r in table_rows:
        img[int(r[0]) - row_shift, int(r[1]) - col_shift: int(r[3]) - col_shift + 1] = 0
    for c in table_cols:
        first_row = min(first_row, int(c[0]))
        last_row = max(last_row, int(c[2]))
        img[int(c[0]) - row_shift: int(c[2]) - row_shift + 1, int(c[1]) - col_shift] = 0
    cross = np.array([[1, 0, 1], [0, 0, 0], [1, 0, 1]], dtype=np.uint8)
    cross_dw = np.array([[1, 1, 1], [0, 0, 0], [1, 0, 1]], dtype=np.uint8)
    cross_uw = np.array([[1, 0, 1], [0, 0, 0], [1, 1, 1]], dtype=np.uint8)
    intersections = [
        (first_row - row_shift, 0),
        (first_row - row_shift, img.shape[1] - 1),
        (last_row - row_shift, 0),
        (last_row - row_shift, img.shape[1] - 1),
    ]
    ups: set = set()
    downs: set = set()
    # vectorized [1,0,1] pattern match along the four border edges
    # (replaces the reference's per-pixel window compare, pseg.py:1064-1093)
    def _edge_hits(edge: np.ndarray) -> np.ndarray:
        return (
            np.nonzero(
                (edge[:-2] == 1) & (edge[1:-1] == 0) & (edge[2:] == 1)
            )[0]
            + 1
        )

    for r in _edge_hits(img[:, 0]):
        intersections.append((int(r), 0))
    for r in _edge_hits(img[:, img.shape[1] - 1]):
        intersections.append((int(r), img.shape[1] - 1))
    for c in _edge_hits(img[0, :]):
        intersections.append((0, int(c)))
    for c in _edge_hits(img[img.shape[0] - 1, :]):
        intersections.append((img.shape[0] - 1, int(c)))
    # vectorized cross-pattern match over the known rows x cols candidate
    # grid (the reference's optimized lookup, pseg.py:1106-1119, without
    # the per-candidate Python window compare)
    cand_r = np.array(
        sorted({int(t[0] - row_shift) for t in table_rows}), dtype=np.int64
    )
    cand_c = np.array(
        sorted({int(t[1] - col_shift) for t in table_cols}), dtype=np.int64
    )
    cand_r = cand_r[(cand_r >= 1) & (cand_r + 2 <= img.shape[0])]
    cand_c = cand_c[(cand_c >= 1) & (cand_c + 2 <= img.shape[1])]
    if len(cand_r) and len(cand_c):
        win = np.lib.stride_tricks.sliding_window_view(img, (3, 3))
        w = win[np.ix_(cand_r - 1, cand_c - 1)]  # (R, C, 3, 3)
        eq_plain = (w == cross).all(axis=(-1, -2))
        eq_dw = (w == cross_dw).all(axis=(-1, -2))
        eq_uw = (w == cross_uw).all(axis=(-1, -2))
        any_hit = eq_plain | eq_dw | eq_uw
        for ri, ci in zip(*np.nonzero(any_hit)):
            r, c = int(cand_r[ri]), int(cand_c[ci])
            intersections.append((r, c))
            if eq_dw[ri, ci]:
                downs.add((r, c))
            elif eq_uw[ri, ci]:
                ups.add((r, c))
    if len(intersections) == 4:
        intersections = []
    intersections.sort(key=lambda p: p[0] * 100000 + p[1])
    return intersections, ups, downs


def find_cells(intersections: list, ups: set, downs: set) -> list:
    """Pair top-left / bottom-right corners into cells with row/col spans
    (pseg.py:1128-1185)."""
    inter_set = set(intersections)
    cells = []
    for idx, (row, col) in enumerate(intersections):
        if (row, col) in ups:
            continue
        if idx >= len(intersections) - 1:
            continue
        col_span = 0
        row_span = 0
        next_col = None
        next_row = None
        while True:
            try:
                next_col = intersections[idx + 1 + col_span][1]
            except IndexError:
                next_col = None
                next_row = None
                break
            next_row = None
            for i in range(idx + 1 + row_span, len(intersections)):
                if intersections[i][1] == col:
                    next_row = intersections[i][0]
                    break
            if (next_row, next_col) in downs:
                col_span += 1
                continue
            if (next_row, next_col) not in inter_set:
                col_span += 1
                continue
            if next_col == col:
                col_span += 1
                continue
            if next_row == row:
                row_span += 1
                continue
            break
        if next_row is not None and next_row > row and next_col > col:
            cells.append((row, col, next_row, next_col))
    # row-major like the reference (pseg.py:1184) but with the full tuple
    # as tie-break so duplicate-start cells order deterministically
    cells = sorted(set(cells))
    return cells


# ---------------------------------------------------------------------------
# stage 6: text blocks (analogue of text_boxes_from_image, pseg.py:755-782)
# ---------------------------------------------------------------------------

def group_bboxes(
    grid: np.ndarray,
    columns: list[list[int]],
    column_row_groups: dict[int, list[list[list[int]]]],
) -> dict[tuple[int, int], tuple[int, int, int, int]]:
    """Content-tight bounding box per (column, row-group).

    The reference finds contours of the blur-connected ink
    (pseg.py:755-782); on a char grid the blur connects exactly the
    adjacent lines of a row group, so the group's content bbox is the
    contour bbox.  Boxes are (ymin, xmin, ymax, xmax) in (v, char) space.
    Used both for text boxes and for table segment boxes (deviation from
    aggr.py:125, which uses the column/group extent: content-tight is
    strictly more precise and preserves the reading-order sort).
    """
    boxes: dict[tuple[int, int], tuple[int, int, int, int]] = {}
    for col_idx, column in enumerate(columns):
        # bbox region extends into the neighbouring spacings (up to the
        # adjacent columns) so content-tight boxes keep the rare long-line
        # overflow chars that the 95% column rule assigns to the margin
        # neighbouring-column boundary = spacing midpoint, so one column's
        # overflow is never attributed to the other
        left = (
            (columns[col_idx - 1][1] + column[0]) // 2 if col_idx > 0 else 0
        )
        right = (
            (column[1] + columns[col_idx + 1][0] + 1) // 2
            if col_idx + 1 < len(columns)
            else grid.shape[1]
        )
        crop = grid[:, left:right]
        for grp_idx, group in enumerate(column_row_groups.get(col_idx, [])):
            l0 = group[0][0] // V_UNIT
            l1 = group[-1][0] // V_UNIT
            sub = crop[l0: l1 + 1]
            content_cols = np.where((sub == 0).any(axis=0))[0]
            if len(content_cols) == 0:
                continue
            xmin = left + int(content_cols[0])
            xmax = left + int(content_cols[-1]) + 1
            boxes[(col_idx, grp_idx)] = (group[0][0], xmin, group[-1][1], xmax)
    return boxes


# ---------------------------------------------------------------------------
# full per-turn parse (analogue of pseg.parse, pseg.py:17-111)
# ---------------------------------------------------------------------------

def _line_px_for_column(
    column: list[int], line_geometry: list[dict] | None
) -> dict[int, tuple[float, float]] | None:
    """Pick the geometry region with max char-range overlap for a detected
    column and return its {text_line: (y0_px, y1_px)} map (keys may arrive
    as strings from JSON manifests)."""
    if not line_geometry:
        return None
    best, besto = None, 0
    for region in line_geometry:
        o = min(column[1], region["x1"]) - max(column[0], region["x0"])
        if o > besto:
            best, besto = region, o
    if best is None:
        return None
    return {int(k): tuple(v) for k, v in best["lines"].items()}


def parse_grid(
    grid: np.ndarray,
    line_geometry: list[dict] | None = None,
    hough_px: dict | None = None,
) -> dict:
    """Run the full stage chain on an occupancy grid.

    ``line_geometry`` / ``hough_px`` (optional): true sub-char geometry
    from a caller that has it (PDF coordinates, the reference-fixture
    transcriber).  line_geometry is a list of regions
    ``{"x0": char, "x1": char, "lines": {line: [y0_px, y1_px]}}``; each
    detected column uses the region with max x-overlap for the reference-
    threshold pixel sweep (see row_groups_from_column).  hough_px feeds
    the pixel-space column stage (see columns_from_grid).  Both default
    to None = pure text-space quantized behavior."""
    columns, spacings = columns_from_grid(grid, hough_px=hough_px)
    column_row_groups: dict[int, list] = {}
    column_row_vspacings: dict[int, np.ndarray] = {}
    column_row_grp_row_spacings: dict[int, dict[int, np.ndarray]] = {}
    column_row_grp_build_table: dict[int, dict] = {}
    column_row_grp_cells: dict[int, dict] = {}

    for col_idx, column in enumerate(columns):
        groups, vspac = row_groups_from_column(
            grid, column, line_px=_line_px_for_column(column, line_geometry)
        )
        column_row_groups[col_idx] = groups
        column_row_vspacings[col_idx] = vspac
        column_row_grp_row_spacings[col_idx] = {}
        column_row_grp_build_table[col_idx] = {}
        column_row_grp_cells[col_idx] = {}
        hs_list = row_hspacings_for_groups(grid, column, groups)
        for grp_idx, rows in enumerate(groups):
            hs = hs_list[grp_idx]
            if hs.size == 0:
                continue
            column_row_grp_row_spacings[col_idx][grp_idx] = hs
            lines = vertical_lines_from_hspacings(hs)
            if not lines:
                continue
            rects = group_adjacent_lines(lines)
            rects = remove_smaller_adjacent_rectangles(rects)
            rects = remove_edge_rectangles(rects, hs)
            while rects:
                if not is_first_rectangle_column_valid(rects, hs):
                    rects = rects[1:]
                    continue
                break
            rects = remove_busy_column_rectangles(rects, hs)
            if not rects:
                continue
            table_rows, table_cols = build_table(column, rows, rects)
            column_row_grp_build_table[col_idx][grp_idx] = (table_rows, table_cols)
            inters, ups, downs = find_intersections(column, rows, table_cols, table_rows)
            cells = find_cells(inters, ups, downs)
            column_row_grp_cells[col_idx][grp_idx] = (inters, ups, downs, cells)

    bboxes = group_bboxes(grid, columns, column_row_groups)
    # a text box per group; groups that produced a table are consumed by the
    # used-token semi-join downstream and yield no text segment
    text_boxes = [bboxes[k] for k in sorted(bboxes)]
    return {
        "group_bboxes": bboxes,
        "columns": columns,
        "spacings": spacings,
        "column_row_groups": column_row_groups,
        "column_row_vspacings": column_row_vspacings,
        "column_row_grp_row_spacings": column_row_grp_row_spacings,
        "column_row_grp_build_table": column_row_grp_build_table,
        "column_row_grp_cells": column_row_grp_cells,
        "text_boxes": text_boxes,
        "height": grid.shape[0] * V_UNIT,
        "width": grid.shape[1],
    }
