"""Per-turn extraction: tokens + cell/box assignment + segment assembly.

Text-space analogue of the reference's word pipeline:

* tokenizer       ~ pdftotext -bbox word extraction
                    (/root/reference/src/tpdf/docmt.py:41-51,96-106)
* assignment      ~ aggr.collect_tables / collect_text with the half-area
                    coverage threshold and the used-words first-writer-wins
                    semi-join (/root/reference/src/tpdf/aggr.py:11-150),
                    vectorized: one numpy overlap test per cell over the
                    whole token array instead of a per-token Python loop
* reading order   ~ segments sorted by box[0]*10000+box[1]
                    (/root/reference/src/t-pdf:30)

Pure Python/numpy; runs inside Arrow batches (see pipeline.py).
"""

from __future__ import annotations

import re

import numpy as np

from . import grid as G
from .htmlx import html_segments, looks_like_html

_TOKEN_RE = re.compile(r"\S+")

# Cap on the boxes x candidate-tokens footprint of one batched-overlap
# matrix in Tokens.take_overlapping_many (8M cells ~ 64 MB per float64
# temporary).  Grid-budget-passing turns can still hold millions of
# tokens in one unbroken y-window (a single-paragraph log paste); the
# adaptive chunk halving keeps the join's peak memory bounded there.
MAX_JOIN_CELLS = 8_000_000


class Tokens:
    """Token texts + (ymin, xmin, ymax, xmax) boxes as numpy columns.

    ``thr`` is the per-token coverage threshold: half the token's area must
    sit inside a cell/box for assignment (aggr.py:29-32).
    """

    __slots__ = ("texts", "boxes", "thr", "used", "_y0", "_hmax")

    def __init__(self, texts: list[str], boxes: np.ndarray):
        self.texts = texts
        self.boxes = boxes  # (n, 4) float64
        if len(texts):
            w = boxes[:, 3] - boxes[:, 1]
            h = boxes[:, 2] - boxes[:, 0]
            self.thr = 0.5 * w * h
            # tokens are emitted line-by-line, so ymin is nondecreasing --
            # lets each containment probe binary-search its y-window
            self._y0 = boxes[:, 0]
            self._hmax = float(h.max())
        else:
            self.thr = np.empty(0)
            self._y0 = np.empty(0)
            self._hmax = 0.0
        self.used = np.zeros(len(texts), dtype=bool)

    def __len__(self):
        return len(self.texts)

    def take_overlapping(self, box) -> list[str]:
        """Consume and return (in reading order) all unused tokens whose
        overlap with ``box`` (ymin, xmin, ymax, xmax) exceeds their
        threshold -- the first-writer-wins semi-join (aggr.py:69-72).

        The scan is windowed to tokens whose y-extent can overlap the box
        (ymin sorted => searchsorted), turning the cells x tokens join from
        O(cells * tokens) into O(cells * log(tokens) + hits)."""
        if not len(self.texts):
            return []
        lo = int(np.searchsorted(self._y0, box[0] - self._hmax, side="left"))
        hi = int(np.searchsorted(self._y0, box[2], side="left"))
        if lo >= hi:
            return []
        b = self.boxes[lo:hi]
        x_ov = np.minimum(box[3], b[:, 3]) - np.maximum(box[1], b[:, 1])
        y_ov = np.minimum(box[2], b[:, 2]) - np.maximum(box[0], b[:, 0])
        hit = (
            (x_ov > 0)
            & (y_ov > 0)
            & (np.maximum(x_ov, 0) * np.maximum(y_ov, 0) > self.thr[lo:hi])
            & ~self.used[lo:hi]
        )
        idx = np.nonzero(hit)[0]
        if len(idx) == 0:
            return []
        idx = idx + lo
        self.used[idx] = True
        return [self.texts[i] for i in idx]

    def take_overlapping_many(self, boxes: list) -> list[list[str]]:
        """Batched first-writer-wins join: one call for ALL boxes (in
        priority order) of a turn instead of one scan per box.

        Sequentially taking boxes one at a time is equivalent to assigning
        each token to the FIRST box in the list whose overlap exceeds the
        token's threshold (thresholds are static per token), so the whole
        join collapses to one boxes x tokens overlap matrix + argmax per
        token.  Boxes are processed in chunks whose boxes x
        candidate-tokens footprint is capped at MAX_JOIN_CELLS: a chunk
        whose pooled y-window would cover too many tokens (one unbroken
        multi-thousand-line paragraph) is halved until it fits, so the
        temporary matrices stay bounded even for degenerate giant turns
        (chunk boundaries cannot change first-writer-wins semantics —
        the used mask is updated between chunks)."""
        out: list[list[str]] = [[] for _ in range(len(boxes))]
        if not len(self.texts) or not boxes:
            return out
        barr = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        c0 = 0
        while c0 < len(barr):
            n = min(64, len(barr) - c0)
            while True:
                bc = barr[c0: c0 + n]
                lo = int(
                    np.searchsorted(
                        self._y0, bc[:, 0].min() - self._hmax, side="left"
                    )
                )
                hi = int(
                    np.searchsorted(self._y0, bc[:, 2].max(), side="left")
                )
                if n == 1 or (hi - lo) * n <= MAX_JOIN_CELLS:
                    break
                n //= 2
            base = c0
            c0 += n
            if lo >= hi:
                continue
            t = self.boxes[lo:hi]
            x_ov = np.minimum(bc[:, None, 3], t[None, :, 3]) - np.maximum(
                bc[:, None, 1], t[None, :, 1]
            )
            y_ov = np.minimum(bc[:, None, 2], t[None, :, 2]) - np.maximum(
                bc[:, None, 0], t[None, :, 0]
            )
            hit = (
                (x_ov > 0)
                & (y_ov > 0)
                & (x_ov * y_ov > self.thr[None, lo:hi])
                & ~self.used[None, lo:hi]
            )
            any_hit = hit.any(axis=0)
            if not any_hit.any():
                continue
            first = hit.argmax(axis=0)
            taken = np.nonzero(any_hit)[0]
            self.used[taken + lo] = True
            for ti in taken:
                out[base + int(first[ti])].append(self.texts[ti + lo])
        return out


def tokenize_lines(lines: list[str]) -> Tokens:
    """Whitespace tokens with (line, char) boxes, reading order.

    One regex pass over the joined text (\\S+ never crosses a newline);
    line index and in-line char offsets are recovered vectorized from the
    cumulative line-start offsets."""
    text = "\n".join(lines)
    texts: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    for m in _TOKEN_RE.finditer(text):
        texts.append(m.group(0))
        starts.append(m.start())
        ends.append(m.end())
    if not texts:
        return Tokens([], np.empty((0, 4), dtype=np.float64))
    s = np.asarray(starts, dtype=np.int64)
    e = np.asarray(ends, dtype=np.int64)
    line_off = np.zeros(len(lines) + 1, dtype=np.int64)
    np.cumsum([len(ln) + 1 for ln in lines], out=line_off[1:])
    li = np.searchsorted(line_off, s, side="right") - 1
    off = line_off[li]
    boxes = np.empty((len(texts), 4), dtype=np.float64)
    boxes[:, 0] = li * G.V_UNIT               # v_start(line)
    boxes[:, 1] = s - off
    boxes[:, 2] = li * G.V_UNIT + G.LINE_H    # v_end(line)
    boxes[:, 3] = e - off
    return Tokens(texts, boxes)


def collect_tables(pseg_results: dict, tokens: Tokens) -> list[dict]:
    """Cells x tokens containment join -> 2-D table grids
    (aggr.py:51-127).  Iteration order (sorted col_idx, then row group,
    then row-major cells) is preserved so the used-token semantics match
    the reference."""
    columns = pseg_results["columns"]
    column_row_groups = pseg_results["column_row_groups"]
    build_tables = pseg_results["column_row_grp_build_table"]
    grp_cells = pseg_results["column_row_grp_cells"]
    bboxes = pseg_results.get("group_bboxes", {})

    # pass 1: gather every cell across every table in the reference's
    # deterministic order (sorted col_idx, sorted group, row-major cells) --
    # the batched join below preserves exactly the sequential
    # first-writer-wins semantics over this order
    tables = []
    all_cells: list[tuple] = []
    cell_meta: list[tuple[int, int, int]] = []  # (table_no, r, c)
    for col_idx in sorted(build_tables):
        column = columns[col_idx]
        for grp_idx in sorted(build_tables[col_idx]):
            table_rows, table_cols = build_tables[col_idx][grp_idx]
            if not table_rows and not table_cols:
                continue
            rows = column_row_groups[col_idx][grp_idx]
            col_shift = int(column[0])
            row_shift = int(rows[0][0])
            _inters, _u, _d, cells = grp_cells[col_idx][grp_idx]
            cells = [
                (y0 + row_shift, x0 + col_shift, y1 + row_shift, x1 + col_shift)
                for (y0, x0, y1, x1) in cells
            ]
            if not cells:
                continue
            cell_col_starts = sorted({x0 for (_y0, x0, _y1, _x1) in cells})
            cell_row_starts = sorted({y0 for (y0, _x0, _y1, _x1) in cells})
            col_pos = {x: i for i, x in enumerate(cell_col_starts)}
            row_pos = {y: i for i, y in enumerate(cell_row_starts)}
            table = [[""] * len(cell_col_starts) for _ in cell_row_starts]
            box = bboxes.get(
                (col_idx, grp_idx),
                (rows[0][0], column[0], rows[-1][1], column[1]),
            )
            tno = len(tables)
            tables.append({"type": "table", "content": table, "box": box})
            # cells are already in row-major order (find_cells sorts)
            for cell in cells:
                all_cells.append(cell)
                cell_meta.append((tno, row_pos[cell[0]], col_pos[cell[1]]))

    # pass 2: one batched cells x tokens containment join.
    # Divergence from aggr.py:120 (which overwrites on duplicate
    # (row, col) starts and silently drops the earlier words): append
    # instead, so token conservation holds even for the degenerate
    # overlapping-cell geometries find_cells can emit.
    for (tno, r, c), words in zip(
        cell_meta, tokens.take_overlapping_many(all_cells)
    ):
        if words:
            table = tables[tno]["content"]
            joined = " ".join(words)
            table[r][c] = (
                f"{table[r][c]} {joined}" if table[r][c] else joined
            )
    return tables


def collect_text(pseg_results: dict, tokens: Tokens) -> list[dict]:
    """Leftover tokens -> text boxes (aggr.py:130-150)."""
    boxes = pseg_results.get("text_boxes", [])
    out = []
    for box, words in zip(boxes, tokens.take_overlapping_many(list(boxes))):
        if not words:
            continue
        out.append({"type": "text", "content": " ".join(words), "box": box})
    return out


def flatten_table(rows: list[list[str]]) -> str:
    """Canonical table flattening: cells by tab, rows by newline
    (/root/reference/src/s-pdf:49-52)."""
    return "\n".join("\t".join(r) for r in rows)


def _flow_segments(lines: list[str]) -> list[dict]:
    """Budget-fallback extraction: one text segment per blank-line-
    separated paragraph, words space-joined — exactly the shape the grid
    kernel emits for simple single-column prose (row group -> text box),
    produced in O(chars) with no 2-D buffer.  Used when a degenerate
    turn's occupancy grid would exceed grid.MAX_GRID_CELLS (the
    reference never faces this: its 400px raster bounds analysis cost by
    construction, docmt -P 400)."""
    segs: list[dict] = []
    start = None
    words: list[str] = []
    width = 0
    for i, ln in enumerate(lines):
        w = ln.split()
        if w:
            if start is None:
                start = i
            words.extend(w)
            width = max(width, len(ln))
        elif start is not None:
            segs.append({
                "type": "text",
                "content": " ".join(words),
                "rows": None,
                "box": [start * G.V_UNIT, 0,
                        (i - 1) * G.V_UNIT + G.LINE_H, width],
            })
            start, words, width = None, [], 0
    if start is not None:
        segs.append({
            "type": "text",
            "content": " ".join(words),
            "rows": None,
            "box": [start * G.V_UNIT, 0,
                    (len(lines) - 1) * G.V_UNIT + G.LINE_H, width],
        })
    return segs


def extract_turn(
    text: str, line_px: dict[int, list[float]] | None = None
) -> list[dict]:
    """Full per-turn extraction -> ordered segment dicts.

    Segment: {type: 'text'|'table', content: str, rows: list[list[str]]|None,
    box: [ymin, xmin, ymax, xmax]} with cindex = list position (reading
    order, stable sort by (ymin, xmin) like the reference's
    box[0]*10000+box[1] key, /root/reference/src/t-pdf:30).

    ``line_px`` (optional): true per-line pixel ink bands ``{line_index:
    [y0_px, y1_px)}`` from a caller with sub-char geometry (a PDF payload
    with glyph coordinates, pdfmini.pdf_text_lines_geometry); the kernel's
    group sweep then runs the reference's own pixel thresholds (grid.py
    row_groups_from_column) instead of the quantized text analogues.

    Degenerate-geometry guard: a turn whose occupancy grid would exceed
    ``grid.MAX_GRID_CELLS`` (multi-megabyte single lines, million-line
    dumps — not document layouts) extracts via the O(chars)
    paragraph-flow fallback instead of allocating the 2-D grid.
    """
    if text is None or not text.strip():
        return []
    try:
        occupancy, lines = G.occupancy_from_text(text)
    except G.GridBudgetExceeded:
        flow_lines = G.strip_boilerplate(
            [ln.expandtabs(4).rstrip("\n") for ln in text.split("\n")]
        )
        return _flow_segments(flow_lines)
    tokens = tokenize_lines(lines)
    if not len(tokens):
        return []
    geometry = None
    if line_px:
        geometry = [
            {"x0": 0, "x1": occupancy.shape[1], "lines": line_px}
        ]
    results = G.parse_grid(occupancy, line_geometry=geometry)
    tables = collect_tables(results, tokens)
    texts = collect_text(results, tokens)
    segments = tables + texts
    segments.sort(key=lambda s: (s["box"][0], s["box"][1]))
    out = []
    for seg in segments:
        if seg["type"] == "table":
            rows = seg["content"]
            out.append(
                {
                    "type": "table",
                    "content": flatten_table(rows),
                    "rows": rows,
                    "box": [int(v) for v in seg["box"]],
                }
            )
        else:
            out.append(
                {
                    "type": "text",
                    "content": seg["content"],
                    "rows": None,
                    "box": [int(v) for v in seg["box"]],
                }
            )
    return out


def extract_turn_auto(
    text: str, line_px: dict[int, list[float]] | None = None
) -> list[dict]:
    """Payload-aware dispatch: HTML turns go through the DOM main-content
    extractor (structural boilerplate + link-density heuristics,
    htmlx.py); everything else through the text-grid kernel.  Both emit
    the same segment schema, so downstream cindex/ordering semantics are
    identical.  ``line_px`` (true pixel line bands, see extract_turn)
    applies to the grid path only.

    Mixed-prose guard: without a decisive document marker the dispatch
    heuristic can misfire on prose that quotes markup; in that ambiguous
    band the DOM result is accepted only if it keeps at least half of the
    turn's VISIBLE text (the input with tags stripped).  Comparing
    against visible text — not the raw parse — means a short tag-dense
    fragment like a bare ``<table>`` still takes the DOM path (its
    visible text is just the cell contents), while a turn whose payload
    the DOM parser discards (e.g. inside a skip-tag) falls back to the
    text grid.  The double parse is paid only for marker-less
    HTML-looking turns."""
    if not text:
        return extract_turn(text, line_px=line_px)
    from .htmlx import has_html_marker

    if has_html_marker(text):
        return html_segments(text)
    if looks_like_html(text):
        stripped = re.sub(r"<[^>]*>", " ", text)
        # markup share: a turn that is overwhelmingly plain text with one
        # tiny quoted tag is a TEXT turn — its grid layout (columns,
        # aligned tables) matters more than parsing the fragment, even
        # though the DOM parse would keep the characters.  (stripped
        # replaces each tag with one space, so the length difference
        # undercounts by one char per tag — immaterial at the 5% gate.)
        tag_chars = len(text) - len(stripped)
        if tag_chars * 20 < len(text):  # < 5% markup
            return extract_turn(text, line_px=line_px)
        dom = html_segments(text)
        dom_chars = sum(len(s["content"]) for s in dom)
        visible_chars = len("".join(stripped.split()))
        if dom_chars * 2 >= visible_chars:
            return dom
        return extract_turn(text, line_px=line_px)
    return extract_turn(text, line_px=line_px)


def extracted_text(segments: list[dict]) -> str:
    """Per-turn canonical extraction text: content joined over cindex asc
    (the per-turn text-equality invariant, FIXTURES.md section 2)."""
    return "\n".join(s["content"] for s in segments)
