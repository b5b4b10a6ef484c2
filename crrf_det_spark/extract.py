"""Per-turn extraction: tokens + cell/box assignment + segment assembly.

Text-space analogue of the reference's word pipeline:

* tokenizer       ~ pdftotext -bbox word extraction
                    (/root/reference/src/tpdf/docmt.py:41-51,96-106)
* assignment      ~ aggr.collect_tables / collect_text with the half-area
                    coverage threshold and the used-words first-writer-wins
                    semi-join (/root/reference/src/tpdf/aggr.py:11-150)
* reading order   ~ segments sorted by box[0]*10000+box[1]
                    (/root/reference/src/t-pdf:30)

Pure Python/numpy; runs inside Arrow batches (see pipeline.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from . import grid as G

_TOKEN_RE = re.compile(r"\S+")


@dataclass
class Token:
    text: str
    # box in (v, char) page coordinates: ymin, xmin, ymax, xmax
    ymin: int
    xmin: int
    ymax: int
    xmax: int
    coverage_threshold: float = field(init=False)

    def __post_init__(self):
        # half of the token's area must sit inside a cell/box for it to be
        # assigned (aggr.py:29-32)
        self.coverage_threshold = 0.5 * (self.xmax - self.xmin) * (self.ymax - self.ymin)


def tokenize_lines(lines: list[str]) -> list[Token]:
    """Whitespace tokens with (line, char) boxes, reading order."""
    tokens = []
    for li, line in enumerate(lines):
        for m in _TOKEN_RE.finditer(line):
            tokens.append(
                Token(m.group(0), G.v_start(li), m.start(), G.v_end(li), m.end())
            )
    return tokens


def _is_overlapped(box: tuple, tok: Token) -> bool:
    """Overlap area > coverage threshold (aggr.py:38-48)."""
    x_overlap = max(0, min(box[3], tok.xmax) - max(box[1], tok.xmin))
    y_overlap = max(0, min(box[2], tok.ymax) - max(box[0], tok.ymin))
    return x_overlap * y_overlap > tok.coverage_threshold


def collect_tables(pseg_results: dict, tokens: list[Token]) -> tuple[list[dict], set]:
    """Cells x tokens containment join -> 2-D table grids
    (aggr.py:51-127).  Iteration order (sorted col_idx, then row group) is
    preserved so the used-token semantics match the reference."""
    columns = pseg_results["columns"]
    column_row_groups = pseg_results["column_row_groups"]
    build_tables = pseg_results["column_row_grp_build_table"]
    grp_cells = pseg_results["column_row_grp_cells"]

    used: set[int] = set()
    tables = []
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
            table = [[""] * len(cell_col_starts) for _ in cell_row_starts]
            for tr_idx, tr_start in enumerate(cell_row_starts):
                row_cells = [c for c in cells if c[0] == tr_start]
                for row_cell in row_cells:
                    tc_idx = cell_col_starts.index(row_cell[1])
                    cell_words = []
                    for t_idx, tok in enumerate(tokens):
                        if t_idx in used:
                            continue
                        if _is_overlapped(row_cell, tok):
                            used.add(t_idx)
                            cell_words.append(tok.text)
                    if cell_words:
                        table[tr_idx][tc_idx] = " ".join(cell_words)
            if table:
                # content-tight bbox (see grid.group_bboxes); falls back to
                # the reference's column/group extent (aggr.py:125)
                box = pseg_results.get("group_bboxes", {}).get(
                    (col_idx, grp_idx),
                    (rows[0][0], column[0], rows[-1][1], column[1]),
                )
                tables.append({"type": "table", "content": table, "box": box})
    return tables, used


def collect_text(pseg_results: dict, tokens: list[Token], used: set) -> list[dict]:
    """Leftover tokens -> text boxes (aggr.py:130-150)."""
    out = []
    for box in pseg_results.get("text_boxes", []):
        words = []
        for t_idx, tok in enumerate(tokens):
            if t_idx in used:
                continue
            if _is_overlapped(box, tok):
                used.add(t_idx)
                words.append(tok.text)
        if not words:
            continue
        out.append({"type": "text", "content": " ".join(words), "box": box})
    return out


def flatten_table(rows: list[list[str]]) -> str:
    """Canonical table flattening: cells by tab, rows by newline
    (/root/reference/src/s-pdf:49-52)."""
    return "\n".join("\t".join(r) for r in rows)


def extract_turn(text: str) -> list[dict]:
    """Full per-turn extraction -> ordered segment dicts.

    Segment: {type: 'text'|'table', content: str, rows: list[list[str]]|None,
    box: [ymin, xmin, ymax, xmax]} with cindex = list position (reading
    order, stable sort by (ymin, xmin) like the reference's
    box[0]*10000+box[1] key, /root/reference/src/t-pdf:30).
    """
    if text is None or not text.strip():
        return []
    occupancy, lines = G.occupancy_from_text(text)
    tokens = tokenize_lines(lines)
    if not tokens:
        return []
    results = G.parse_grid(occupancy)
    tables, used = collect_tables(results, tokens)
    texts = collect_text(results, tokens, used)
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


def extracted_text(segments: list[dict]) -> str:
    """Per-turn canonical extraction text: content joined over cindex asc
    (the per-turn text-equality invariant, FIXTURES.md section 2)."""
    return "\n".join(s["content"] for s in segments)
