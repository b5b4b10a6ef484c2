"""Deterministic synthetic transcript generator with golden extraction
segments (FIXTURES.md sections 1-2, 5).

Mirrors the reference's fixed 30-page test corpus
(/root/reference/src/tests/test_pseg.py:16) at text level: each turn is
assembled from known content blocks (prose, monospace tables, boilerplate,
two-column layouts, numeric-heavy rows), and the golden segments are derived
*by construction* from the embedded blocks -- not by running the extractor --
so per-turn equality checks are a real oracle.

All randomness is a seeded ``random.Random``; output is stable across runs.
"""

from __future__ import annotations

import datetime
import random

from .grid import LINE_H, V_UNIT

WORDS = (
    "revenue margin growth capital asset liability equity operating income "
    "climate carbon emission scope target disclosure report segment region "
    "quarter annual fiscal total net gross cash flow statement balance sheet "
    "audit board committee risk policy strategy market supply chain energy "
    "renewable transition investment portfolio credit rating outlook guidance "
    "production facility plant site employee safety training program metric "
    "baseline reduction intensity efficiency water waste recycling materials "
    "customer supplier contract obligation lease amortization depreciation "
    "goodwill impairment valuation currency hedge derivative instrument note"
).split()

CELL_WORDS = (
    "steel copper zinc wheat cotton brent diesel naphtha urea ammonia "
    "q1 q2 q3 q4 fy22 fy23 europe asia americas total north south east west "
    "alpha beta gamma delta epsilon"
).split()

TOOLS = ["", "pdf_render", "search", "code_exec", "browser"]
ROLES = ["user", "assistant", "tool"]

HEADERS = [
    "[HEADER] acme corp internal transcript",
    "[HEADER] conversation export v2",
    "Page {page}",
    "Page {page} of {total}",
    "====",
    "--------",
]


def _v0(line: int) -> int:
    return V_UNIT * line


def _v1(line: int) -> int:
    return V_UNIT * line + LINE_H


class _Block:
    """One content block: lines plus its golden segment(s)."""

    def __init__(self, lines: list[str], kind: str, content: str,
                 rows: list[list[str]] | None, indent: int = 0):
        self.lines = lines
        self.kind = kind           # 'text' | 'table'
        self.content = content
        self.rows = rows
        self.indent = indent

    def golden(self, start_line: int, x_shift: int = 0) -> dict:
        xmin = x_shift + self.indent
        xmax = x_shift + max(len(ln) for ln in self.lines)
        return {
            "type": self.kind,
            "content": self.content,
            "rows": self.rows,
            "box": [
                _v0(start_line),
                xmin,
                _v1(start_line + len(self.lines) - 1),
                xmax,
            ],
        }


def _prose_block(rng: random.Random, min_lines: int = 2, width: int = 66,
                 numeric: bool = False) -> _Block:
    n_words = rng.randint(18, 60)
    words = []
    for _ in range(n_words):
        w = rng.choice(WORDS)
        if numeric and rng.random() < 0.35:
            w = rng.choice(
                [
                    f"${rng.randint(1, 999):,}",
                    f"{rng.randint(1000, 999999):,}",
                    f"{rng.uniform(0, 100):.1f}",
                    str(rng.randint(1900, 2100)),
                    str(rng.randint(0, 4)),
                ]
            )
        words.append(w)
    # greedy wrap at `width`, single spaces only
    lines: list[str] = []
    cur: list[str] = []
    cur_len = 0
    for w in words:
        add = len(w) + (1 if cur else 0)
        if cur_len + add > width and cur:
            lines.append(" ".join(cur))
            cur = [w]
            cur_len = len(w)
        else:
            cur.append(w)
            cur_len += add
    if cur:
        lines.append(" ".join(cur))
    while len(lines) < min_lines:
        extra = [rng.choice(WORDS) for _ in range(10)]
        lines.append(" ".join(extra))
        words += extra
    return _Block(lines, "text", " ".join(words), None)


def _table_block(rng: random.Random, max_cols: int = 4) -> _Block:
    n_rows = rng.randint(3, 7)
    n_cols = rng.randint(2, max_cols)
    cells: list[list[str]] = []
    for r in range(n_rows):
        row = []
        for c in range(n_cols):
            if c == 0:
                # first column always filled (>=60% rule, pseg.py:880-908)
                txt = rng.choice(CELL_WORDS)
                if rng.random() < 0.3:
                    txt += " " + rng.choice(CELL_WORDS)
            elif rng.random() < 0.12 and r > 0:
                txt = ""  # sparse numeric cells
            else:
                txt = rng.choice(
                    [
                        f"{rng.uniform(1, 9999):.1f}",
                        f"{rng.randint(10, 99999):,}",
                        rng.choice(CELL_WORDS),
                        f"({rng.randint(1, 999)})",
                    ]
                )
            row.append(txt[:12])
        cells.append(row)
    widths = [max(len(cells[r][c]) for r in range(n_rows)) for c in range(n_cols)]
    lines = []
    for row in cells:
        parts = [row[c].ljust(widths[c]) for c in range(n_cols)]
        # gap of exactly 2 spaces: survives as spacing at row level
        # (MIN_SPACING_SPAN=2) but is merged at page-column level
        # (< MIN_COLUMN_SPACING=3), mirroring the reference scale ratio
        lines.append("  ".join(parts).rstrip())
    return _Block(lines, "table", "\n".join("\t".join(r) for r in cells), cells)


def _html_turn(rng: random.Random) -> tuple[str, list[dict]]:
    """HTML turn: real markup with nav/header/footer chrome and a
    link-dense block, goldens = the main-content blocks only, with boxes
    matching htmlx.html_segments' synthesized v-unit bands."""
    content_blocks: list[_Block] = [_prose_block(rng)]
    if rng.random() < 0.5:
        content_blocks.append(_table_block(rng))
    if rng.random() < 0.6:
        content_blocks.append(_prose_block(rng, numeric=rng.random() < 0.4))

    nav_links = " ".join(
        f'<a href="/{w}">{w}</a>' for w in rng.sample(WORDS, 3)
    )
    parts = [
        "<!DOCTYPE html><html><head><title>export</title>",
        "<style>.m{color:#222}</style><script>var t=1;</script></head>",
        f"<body><nav>{nav_links}</nav>",
        f"<header>{rng.choice(HEADERS[:2])}</header>",
        # link-dense short div outside <nav>: culled by link density
        f'<div><a href="/a">{rng.choice(WORDS)}</a> '
        f'<a href="/b">{rng.choice(WORDS)}</a></div>',
        "<article>",
    ]
    golden: list[dict] = []
    v = 0
    for blk in content_blocks:
        if blk.kind == "table":
            cells = blk.rows
            rows_html = "".join(
                "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>"
                for row in cells
            )
            parts.append(f"<table>{rows_html}</table>")
            golden.append(
                {
                    "type": "table",
                    "content": blk.content,
                    "rows": cells,
                    "box": [v, 0, v + LINE_H, max(len(blk.content), 1)],
                }
            )
        else:
            parts.append(f"<p>{blk.content}</p>")
            golden.append(
                {
                    "type": "text",
                    "content": blk.content,
                    "rows": None,
                    "box": [v, 0, v + LINE_H, len(blk.content)],
                }
            )
        v += V_UNIT
    parts.append("</article><footer>generated export footer</footer>")
    parts.append("</body></html>")
    return "\n".join(parts), golden


def _compose_turn(rng: random.Random) -> tuple[str, list[dict]]:
    """Build one turn's text and its golden segments (reading order)."""
    cls = rng.choices(
        ["prose", "table", "mixed", "numeric", "twocol", "html"],
        weights=[0.30, 0.16, 0.20, 0.14, 0.08, 0.12],
    )[0]
    if cls == "html":
        return _html_turn(rng)

    blocks: list[_Block] = []
    if cls == "prose":
        for _ in range(rng.randint(1, 3)):
            blocks.append(_prose_block(rng))
    elif cls == "numeric":
        for _ in range(rng.randint(1, 2)):
            blocks.append(_prose_block(rng, numeric=True))
    elif cls == "table":
        # short intro keeps table gaps below the 95% page-column threshold
        blocks.append(_prose_block(rng, min_lines=2))
        blocks.append(_table_block(rng))
    elif cls == "mixed":
        blocks.append(_prose_block(rng, min_lines=3))
        blocks.append(_table_block(rng))
        if rng.random() < 0.5:
            blocks.append(_table_block(rng))
        blocks.append(_prose_block(rng, min_lines=2, numeric=rng.random() < 0.5))

    lines: list[str] = []
    golden: list[dict] = []

    if cls == "twocol":
        left = _prose_block(rng, width=30)
        right = _prose_block(rng, width=30)
        gutter_at = 34  # left col chars [0,30], gutter 6+ wide
        n = max(len(left.lines), len(right.lines))
        for i in range(n):
            l = left.lines[i] if i < len(left.lines) else ""
            r = right.lines[i] if i < len(right.lines) else ""
            lines.append((l.ljust(gutter_at + 6) + r).rstrip() if r else l)
        golden.append(left.golden(0))
        golden.append(
            {
                "type": "text",
                "content": right.content,
                "rows": None,
                "box": [
                    _v0(0),
                    gutter_at + 6,
                    _v1(len(right.lines) - 1),
                    gutter_at + 6 + max(len(ln) for ln in right.lines),
                ],
            }
        )
    else:
        cur = 0
        for bi, blk in enumerate(blocks):
            if bi > 0:
                lines.append("")
                cur += 1
            golden.append(blk.golden(cur))
            lines.extend(blk.lines)
            cur += len(blk.lines)

    # boilerplate chrome, stripped by the extractor's margin rule
    # (grid.strip_boilerplate ~ pseg.py:190-197)
    if rng.random() < 0.35:
        hdr = rng.choice(HEADERS).format(page=rng.randint(1, 99), total=99)
        lines = [hdr, ""] + lines
        for g in golden:
            g["box"][0] += 2 * V_UNIT
            g["box"][2] += 2 * V_UNIT
    if rng.random() < 0.25:
        ftr = rng.choice(HEADERS).format(page=rng.randint(1, 99), total=99)
        lines = lines + ["", ftr]

    golden.sort(key=lambda g: (g["box"][0], g["box"][1]))
    return "\n".join(lines), golden


def generate(
    n_convs: int = 20,
    seed: int = 42,
    median_turns: int = 8,
    skew_convs: int = 0,
    skew_factor: int = 50,
) -> tuple[list[dict], list[dict]]:
    """Returns (transcript_rows, golden_rows).

    transcript row: conv_id, turn_idx, role, text, tool, ts
    golden row:     conv_id, turn_idx, cindex, type, content, rows, box
    Skewed conversations (FIXTURES.md section 5) get ``skew_factor`` x the
    median turn count to exercise salting.
    """
    rng = random.Random(seed)
    t0 = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    transcripts: list[dict] = []
    goldens: list[dict] = []
    for ci in range(n_convs):
        conv_id = f"conv-{seed}-{ci:06d}"
        if ci < skew_convs:
            n_turns = median_turns * skew_factor
        else:
            n_turns = max(2, int(rng.gauss(median_turns, median_turns / 3)))
        ts = t0 + datetime.timedelta(days=ci % 365, hours=ci % 24)
        for ti in range(n_turns):
            role = ROLES[ti % 3] if ti else "user"
            tool = rng.choice(TOOLS[1:]) if role == "tool" else ""
            text, golden = _compose_turn(rng)
            ts = ts + datetime.timedelta(seconds=rng.randint(5, 600))
            transcripts.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": ti,
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": ts,
                }
            )
            for cindex, g in enumerate(golden):
                goldens.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": ti,
                        "cindex": cindex,
                        "type": g["type"],
                        "content": g["content"],
                        "rows": g["rows"],
                        "box": g["box"],
                    }
                )
    return transcripts, goldens
