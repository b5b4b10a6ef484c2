"""Transcribe reference golden test pages into text-grid fixtures.

Offline tool (run once, outputs committed).  For each selected page of the
reference's pixel-golden corpus (/root/reference/src/tests):

1. decode the SOURCE page PNG (scripts/refpng.py) and reproduce the
   reference's binarization exactly (rgb2gray -> margin clear -> threshold,
   pseg.py:186-199) — `im_bin_clear`;
2. decode the per-stage DEBUG goldens in ref_imgs/ and recover the
   reference's actual stage DECISIONS from the painted overlays
   (debug_painter palette, pseg.py:1188-1301):
     stage 01  columns/spacings     yellow/green half-alpha rectangles
     stage 02  row groups + rows    yellow group rect + green row rects
     stage 06  build_table grid     orange table_rows / red table_cols, alpha 1
3. transcribe `im_bin_clear` into a monospace text grid (the input format of
   crrf_det_spark.grid) at the engine's documented scale: 1 char ~ 5 px
   horizontally, 1 text line ~ 10.8 px vertically (grid.py module header);
4. emit tests/fixtures/reference/<page>.txt plus a manifest JSON holding the
   reference's decisions converted to char/line units.

tests/test_reference_fixtures.py then asserts the engine's kernel
reproduces those decisions on inputs the synth generator did NOT produce
(SURVEY §7 risk #1, heuristic fidelity).

The alpha-0.5 blends are exact integer halves because the base image is
pure black/white, so every overlay color is a small closed palette:
  white+yellow (255,255,127)   ink+yellow (127,127,0)
  white+green  (127,255,127)   ink+green  (0,127,0)
  green-over-yellow: white (127,255,63)  ink (63,191,0)
  red half-alpha:    white (255,127,127) ink (127,0,0)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.refpng import read_png_rgb  # noqa: E402

REF_TESTS = "/root/reference/src/tests"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "reference",
)

# engine scale (crrf_det_spark/grid.py module header): 400px narrow side,
# ~80 char columns -> 5 px/char; 4 v-units/line at ~2.7 px/v-unit.
CHAR_W = 5.0
PX_PER_VUNIT = 2.7
LINE_PITCH = 4 * PX_PER_VUNIT  # ~10.8 px per text line


# ---------------------------------------------------------------------------
# reference binarization (pseg.py:186-199), exact
# ---------------------------------------------------------------------------

def im_bin_clear_from_source(src: np.ndarray) -> np.ndarray:
    """uint8 0/255 image, white=255.  Mirrors prepare_images_for_segmentation
    minus the blurred variant (which the clear-path stages don't consume)."""
    img = src.astype(np.float64) / 255.0
    gray = img[..., 0] * 0.2125 + img[..., 1] * 0.7154 + img[..., 2] * 0.0721
    h, w = gray.shape
    ref_side = min(w, h)
    gray[0 : int(ref_side * 0.045), :] = 1.0
    gray[:, 0 : int(ref_side * 0.035)] = 1.0
    gray[:, w - int(ref_side * 0.035) :] = 1.0
    return np.where(gray >= 0.87843137254902, 255, 0).astype(np.uint8)


# ---------------------------------------------------------------------------
# stage decision extraction from debug goldens
# ---------------------------------------------------------------------------

def _runs(mask: np.ndarray) -> list[list[int]]:
    """[start, end) runs of True in a 1-D bool array."""
    d = np.diff(np.concatenate(([0], mask.astype(np.int8), [0])))
    starts = np.nonzero(d == 1)[0]
    ends = np.nonzero(d == -1)[0]
    return [[int(a), int(b)] for a, b in zip(starts, ends)]


def extract_columns(ref01: np.ndarray) -> tuple[list[list[int]], list[list[int]]]:
    """Stage-01 overlay -> (columns, spacings) as [left, right) px runs.

    Painter fills column rects yellow and spacing rects green at alpha 0.5
    over the full height; a pixel column's dominant tint classifies it.
    Overlap pixels (green painted over yellow at inclusive-right bounds)
    count as green, matching the painter's draw order.
    """
    r = ref01[..., 0].astype(np.int16)
    g = ref01[..., 1].astype(np.int16)
    b = ref01[..., 2].astype(np.int16)
    # yellow tints: (255,255,127)/(127,127,0)  -> r==g, b < r
    yellow = (r == g) & (b < r)
    # green tints incl. over-yellow: (127,255,127)/(0,127,0)/(127,255,63)/(63,191,0)
    green = (g > r) & (g > b)
    col_y = yellow.sum(axis=0)
    col_g = green.sum(axis=0)
    h = ref01.shape[0]
    is_col = col_y > h // 2
    is_spc = (col_g > h // 2) & ~is_col
    return _runs(is_col), _runs(is_spc)


def extract_row_groups(
    ref02: np.ndarray, columns_px: list[list[int]]
) -> list[list[list[list[int]]]]:
    """Stage-02 overlay -> per column, list of groups, each a list of
    [y_top, y_bottom) pixel-row bands (the reference's rows).

    Painter: group rect yellow, then each row green on top.
    """
    out = []
    r = ref02[..., 0].astype(np.int16)
    g = ref02[..., 1].astype(np.int16)
    b = ref02[..., 2].astype(np.int16)
    green_over_yellow = (g > r) & (b < g)  # (127,255,63)/(63,191,0)
    yellowish = (r == g) & (b < r)         # yellow only (group, not row)
    for left, right in columns_px:
        w = max(1, right - left)
        row_frac = green_over_yellow[:, left:right].sum(axis=1) / w
        grp_frac = (
            yellowish[:, left:right].sum(axis=1)
            + green_over_yellow[:, left:right].sum(axis=1)
        ) / w
        in_row = row_frac > 0.5
        in_grp = grp_frac > 0.5
        groups = []
        for g0, g1 in _runs(in_grp):
            rows = _runs(in_row[g0:g1])
            groups.append([[g0 + a, g0 + b_] for a, b_ in rows])
        out.append(groups)
    return out


_CYCLE = [
    "1f77b4", "ff7f0e", "2ca02c", "d62728", "9467bd",
    "8c564b", "e377c2", "7f7f7f", "bcbd22", "17becf",
]


def extract_stage_rects(img: np.ndarray) -> list[dict]:
    """tablevspan stage overlay -> list of rect extents.

    The painter cycles 10 fixed colors at alpha 0.5 (helper.py:1-27,
    pseg.py:1248-1259) over the pure black/white base, so each rect's
    pixels are exactly blend(color, 255) or blend(color, 0).  Distinct
    x-runs of one cycle color are distinct rects (the goldens' surviving
    rect sets are small and non-adjacent after stage 02, so color reuse
    across x-disjoint rects stays separable).
    """
    pal = {}
    for k, s in enumerate(_CYCLE):
        c = np.array([int(s[i : i + 2], 16) for i in (0, 2, 4)])
        pal[tuple((c + 255) // 2)] = k
        pal[tuple(c // 2)] = k
    rects = []
    colors, counts = np.unique(img.reshape(-1, 3), axis=0, return_counts=True)
    for col, cnt in zip(colors, counts):
        k = pal.get(tuple(int(v) for v in col))
        if k is None or cnt <= 20:
            continue
        mask = (
            (img[..., 0] == col[0])
            & (img[..., 1] == col[1])
            & (img[..., 2] == col[2])
        )
        xs = np.nonzero(mask.any(axis=0))[0]
        ys = np.nonzero(mask.any(axis=1))[0]
        rects.append(
            {
                "x0_px": int(xs.min()), "x1_px": int(xs.max()),
                "y0_px": int(ys.min()), "y1_px": int(ys.max()),
                "width_px": int(xs.max() - xs.min() + 1),
            }
        )
    # de-dup: one cycle color may cover two x-disjoint rects only if >10
    # rects survive (never the case after stage 02 on these pages)
    rects.sort(key=lambda r: (r["x0_px"], r["y0_px"]))
    return rects


def extract_build_table(ref06: np.ndarray) -> list[dict]:
    """Stage-06 overlay -> list of table grids.

    Painter draws table_rows as horizontal orange (255,192,0) alpha-1 lines
    and table_cols as vertical red (255,0,0) alpha-1 lines.  Returns one
    entry per connected table region: bounding box plus the distinct
    horizontal/vertical grid-line counts (n_rows+1 / n_cols+1 lines).
    """
    orange = (
        (ref06[..., 0] == 255) & (ref06[..., 1] == 192) & (ref06[..., 2] == 0)
    )
    red = (
        (ref06[..., 0] == 255) & (ref06[..., 1] == 0) & (ref06[..., 2] == 0)
    )
    any_line = orange | red
    if not any_line.any():
        return []
    # connected regions via bbox clustering on painted pixel extents: group
    # painted pixels into tables by x-overlap of their row extents.  The
    # golden pages have at most a couple of disjoint tables, so a simple
    # union over overlapping bounding boxes is enough.
    ys, xs = np.nonzero(any_line)
    boxes = [[y, x, y + 1, x + 1] for y, x in zip(ys.tolist(), xs.tolist())]
    # merge until fixpoint (tiny n after dedup to line segments -> cheap)
    def overlaps(a, b, pad=3):
        return not (
            a[2] + pad <= b[0] or b[2] + pad <= a[0]
            or a[3] + pad <= b[1] or b[3] + pad <= a[1]
        )

    merged = True
    while merged:
        merged = False
        out: list[list[int]] = []
        for bx in boxes:
            for ox in out:
                if overlaps(bx, ox):
                    ox[0] = min(ox[0], bx[0]); ox[1] = min(ox[1], bx[1])
                    ox[2] = max(ox[2], bx[2]); ox[3] = max(ox[3], bx[3])
                    merged = True
                    break
            else:
                out.append(list(bx))
        boxes = out
    tables = []
    for y0, x0, y1, x1 in boxes:
        sub_o = orange[y0:y1, x0:x1]
        sub_r = red[y0:y1, x0:x1]
        # distinct horizontal lines: rows where orange covers >50% of width
        hrows = _runs(sub_o.sum(axis=1) > (x1 - x0) * 0.5)
        vcols = _runs(sub_r.sum(axis=0) > (y1 - y0) * 0.5)
        tables.append(
            {
                "bbox_px": [int(y0), int(x0), int(y1), int(x1)],
                "n_row_lines": len(hrows),
                "n_col_lines": len(vcols),
                "row_line_y_px": [int((a + b) // 2) for a, b in hrows],
                "col_line_x_px": [int((a + b) // 2) for a, b in vcols],
            }
        )
    tables.sort(key=lambda t: (t["bbox_px"][0], t["bbox_px"][1]))
    return tables


# ---------------------------------------------------------------------------
# transcription: im_bin_clear -> monospace text grid
# ---------------------------------------------------------------------------

# gap mapping: the reference's row-group sweep keeps rows with gaps below
# ~10 px (its MIN_SPACING_SOFT_SPLIT, pseg.py:418) in the same block;
# larger gaps are split candidates.  In the engine's text space a blank
# line (spacing 4k+1 v-units, grid.py MIN_BLOCK_SPLIT) is a block split, so
# the faithful transcription maps sub-10px gaps to adjacent lines and
# >=10px gaps to k>=1 blank lines at the documented ~2.7 px/v-unit scale.
GAP_BLANK_THRESHOLD_PX = 10.0


def _gap_blank_lines(gap_px: float) -> int:
    if gap_px < GAP_BLANK_THRESHOLD_PX:
        return 0
    return max(1, round((gap_px / PX_PER_VUNIT - 1) / 4))


def _true_hough_runs(im_bin: np.ndarray) -> list[list[int]]:
    """Maximal [x0, x1) runs of PIXEL columns that pass the reference's
    vertical-line Hough test (pseg.py:240: a contiguous blank run >= 0.95
    page height, line_length=int(0.95*h)).  Feeds grid.py
    columns_from_grid(hough_px=...), which reruns the whole column stage
    in pixel space with the reference's own constants."""
    ink = im_bin == 0
    h, w = ink.shape
    blank = ~ink
    # longest contiguous blank run per PIXEL column (cumsum trick,
    # mirroring grid.py columns_from_grid)
    s = np.cumsum(blank, axis=0, dtype=np.int32)
    at_content = np.where(ink, s, 0)
    last_zero = np.maximum.accumulate(at_content, axis=0)
    best = (s - last_zero).max(axis=0)
    return _runs(best >= int(0.95 * h))


def transcribe(
    im_bin: np.ndarray, regions_px: list[list[int]], min_ink_px: int = 1
) -> tuple[str, list[list[dict]]]:
    """Binarized page -> monospace text, preserving per-column layout.

    The reference's "rows" are per-COLUMN ink-row runs (pseg.py:389-447),
    so banding must happen per column region: a global row projection
    merges offset rows of adjacent columns (and tall sidebar figures)
    into one band.  For each region (the stage-01 golden's columns):

    * ink-row runs within the region's x-range become text lines ('x'
      where the 5-px char cell holds >= min_ink_px ink pixels);
    * inter-band gaps become blank lines via _gap_blank_lines;
    * the region's first band anchors at round(y0 / LINE_PITCH) so
      cross-region vertical order stays roughly faithful (regions are
      independent for every per-column downstream decision).

    Returns (text, region_bands): per region, each band's source pixel
    range and assigned text line, for decision-space conversion.
    """
    ink = im_bin == 0
    h, w = ink.shape
    n_chars = int(np.ceil(w / CHAR_W))
    edges = (np.arange(n_chars + 1) * CHAR_W).astype(int)

    region_bands: list[list[dict]] = []
    placed: list[tuple[int, str]] = []  # (line, rendered chars)
    max_line = 0
    for left, right in regions_px:
        sub = ink[:, left:right]
        # every maximal ink-row run is one band == one reference "row"
        # (pseg.py:443-456 separates rows on fully-blank pixel rows, so a
        # single blank pixel row is a real row boundary — do NOT merge)
        merged = _runs(sub.sum(axis=1) >= 1)
        bands: list[dict] = []
        line = 0
        prev_end: int | None = None
        for b0, b1 in merged:
            if prev_end is None:
                line = int(round(b0 / LINE_PITCH))
            else:
                line += 1 + _gap_blank_lines(b0 - prev_end)
            counts = np.add.reduceat(
                ink[b0:b1].sum(axis=0), edges[:-1]
            )[:n_chars]
            # restrict to this region's chars so co-located bands of other
            # regions don't bleed into this line
            c0, c1 = int(left // CHAR_W), int(np.ceil(right / CHAR_W))
            chars = [
                "x" if (c0 <= i < c1 and counts[i] >= min_ink_px) else " "
                for i in range(n_chars)
            ]
            placed.append((line, "".join(chars)))
            bands.append({"line": line, "y0_px": int(b0), "y1_px": int(b1)})
            prev_end = b1
            max_line = max(max_line, line)
        region_bands.append(bands)

    lines = [[" "] * n_chars for _ in range(max_line + 1)]
    for line, chars in placed:
        row = lines[line]
        for i, ch in enumerate(chars):
            if ch != " ":
                row[i] = ch
    text = "\n".join("".join(row).rstrip() for row in lines)
    return text, region_bands


# ---------------------------------------------------------------------------
# per-page driver
# ---------------------------------------------------------------------------

PAGES = [
    # (page, has stage 02, has build_table stage 06)
    ("tsla2021.14", True, True),
    ("de2021.64", True, True),
    ("cargill2022.73", True, True),
    ("x2021.87", True, True),
    ("adbe2021.28", True, False),
    # round-3 expansion: pages whose group partitions transcribe exactly
    ("cargill2022.83", True, True),
    ("tsla2021.123", True, True),
    ("tsla2021.36", True, True),
    # round-3 full-corpus expansion: every remaining reference golden page
    ("bp2021.21", True, True),
    ("bp2021.24", True, True),
    ("bp2021.25", True, True),
    ("bp2021.3", True, True),
    ("eog2021.70", True, True),
    ("tsla2021.73", True, True),
    ("cargill2022.15", True, False),
    ("cargill2022.97", True, False),
    ("de2021.63", True, False),
    ("eni2021.49", True, False),
    ("eni2021.9", True, False),
    ("eog2021.16", True, False),
    ("eog2021.19", True, False),
    ("eog2021.28", True, False),
    ("eog2021.68", True, False),
    ("eog2021.9", True, False),
    ("tsla2021.141", True, False),
    ("tsla2021.2", True, False),
    ("tsla2021.68", True, False),
    ("x2021.27", True, False),
    ("x2021.64", False, False),
    ("tsla2021.122", False, False),
]


def px_to_char(x: float) -> int:
    return int(round(x / CHAR_W))


def band_line_for_y(band_info: list[dict], y: float) -> int:
    """Nearest text line for a pixel y (by band midpoint distance)."""
    best, bestd = 0, float("inf")
    for b in band_info:
        mid = (b["y0_px"] + b["y1_px"]) / 2
        d = abs(mid - y)
        if d < bestd:
            best, bestd = b["line"], d
    return best


def band_line_for_row(band_info: list[dict], row: list[int]) -> int | None:
    """Text line whose source band overlaps the reference row [y0, y1)."""
    best, besto = None, 0
    for b in band_info:
        o = min(b["y1_px"], row[1]) - max(b["y0_px"], row[0])
        if o > besto:
            best, besto = b["line"], o
    return best


def process_page(page: str) -> dict:
    src = read_png_rgb(os.path.join(REF_TESTS, "src_imgs", page + ".png"))
    im_bin = im_bin_clear_from_source(src)

    ref01 = read_png_rgb(
        os.path.join(REF_TESTS, "ref_imgs", page + "_01_columns_from_image.png")
    )
    # parity check: the reference's own binarized page is recoverable from
    # the stage-01 golden (ink under yellow=(127,127,0), under green=
    # (0,127,0), and — where a green spacing rect overlaps a yellow column
    # rect at a boundary — green-over-yellow ink (63,191,0))
    ink_ref = (ref01[..., 2] == 0) & (
        ((ref01[..., 0] <= 127) & (ref01[..., 1] <= 127))
        | ((ref01[..., 0] == 63) & (ref01[..., 1] == 191))
    )
    mismatch = int((ink_ref != (im_bin == 0)).sum())

    cols_px, spc_px = extract_columns(ref01)

    ref02_path = os.path.join(
        REF_TESTS, "ref_imgs", page + "_02_row_groups_from_columns.png"
    )
    groups_px = None
    if os.path.exists(ref02_path):
        groups_px = extract_row_groups(read_png_rgb(ref02_path), cols_px)

    ref06_path = os.path.join(
        REF_TESTS, "ref_imgs", page + "_05_tablevspan06_build_table.png"
    )
    tables = None
    if os.path.exists(ref06_path):
        tables = extract_build_table(read_png_rgb(ref06_path))

    ref05_path = os.path.join(
        REF_TESTS,
        "ref_imgs",
        page + "_05_tablevspan05_remove_busy_column_rectangles.png",
    )
    stage05_rects = None
    if os.path.exists(ref05_path):
        stage05_rects = extract_stage_rects(read_png_rgb(ref05_path))

    # band per stage-01 column region: the reference's rows are per-column
    # ink runs, so the golden columns are the faithful banding regions
    text, region_bands = transcribe(im_bin, cols_px)

    # true sub-char geometry side-channel (round-4): the transcriber KNOWS
    # every band's real pixel extent and every pixel column's true Hough
    # verdict; emit them so hinted engine runs (grid.py parse_grid
    # line_geometry/hough_px) can apply the reference's own pixel
    # thresholds instead of quantized analogues.
    line_geometry = [
        {
            "x0": px_to_char(left),
            "x1": px_to_char(right),
            "lines": {
                str(b["line"]): [b["y0_px"], b["y1_px"]] for b in bands
            },
        }
        for (left, right), bands in zip(cols_px, region_bands)
    ]
    hough_px = {
        "runs": _true_hough_runs(im_bin),
        "width_px": int(im_bin.shape[1]),
        "height_px": int(im_bin.shape[0]),
        "char_w": CHAR_W,
    }

    manifest: dict = {
        "page": page,
        "provenance": {
            "source": f"/root/reference/src/tests/src_imgs/{page}.png",
            "stage01": f"/root/reference/src/tests/ref_imgs/{page}_01_columns_from_image.png",
            "stage02": ref02_path.replace("/root/repo/", "") if groups_px is not None else None,
            "stage06": ref06_path if tables is not None else None,
        },
        "binarize_mismatch_px": mismatch,
        "page_px": [int(src.shape[0]), int(src.shape[1])],
        "columns_char": [[px_to_char(a), px_to_char(b)] for a, b in cols_px],
        "spacings_char": [[px_to_char(a), px_to_char(b)] for a, b in spc_px],
        "columns_px": cols_px,
        "n_text_lines": text.count("\n") + 1,
        "line_geometry": line_geometry,
        "hough_px": hough_px,
    }
    if groups_px is not None:
        manifest["row_groups"] = [
            {
                "column": ci,
                "n_rows_total": sum(len(rows) for rows in col_groups),
                "groups": [
                    {
                        "n_rows": len(rows),
                        "row_lines": [
                            band_line_for_row(region_bands[ci], r)
                            for r in rows
                        ],
                        "first_line": band_line_for_row(
                            region_bands[ci], rows[0]
                        ) if rows else None,
                        "last_line": band_line_for_row(
                            region_bands[ci], rows[-1]
                        ) if rows else None,
                    }
                    for rows in col_groups
                ],
            }
            for ci, col_groups in enumerate(groups_px)
        ]
    if tables is not None:
        def _col_of_table(t):
            x0, x1 = t["bbox_px"][1], t["bbox_px"][3]
            best, besto = 0, 0
            for ci, (left, right) in enumerate(cols_px):
                o = min(right, x1) - max(left, x0)
                if o > besto:
                    best, besto = ci, o
            return best

        manifest["tables"] = [
            {
                **t,
                "column": _col_of_table(t),
                "first_line": band_line_for_row(
                    region_bands[_col_of_table(t)],
                    [t["bbox_px"][0], t["bbox_px"][0] + 1],
                ),
                "last_line": band_line_for_row(
                    region_bands[_col_of_table(t)],
                    [t["bbox_px"][2] - 1, t["bbox_px"][2]],
                ),
                "col_line_x_char": [px_to_char(x) for x in t["col_line_x_px"]],
            }
            for t in tables
        ]
    if stage05_rects is not None:
        manifest["stage05_rects"] = stage05_rects
        # a reference gutter rect survives raster->char transcription only
        # when its pixel width quantizes to >= MIN_SPACING_SPAN (2 chars at
        # 5 px/char): narrower runs fold into content exactly as the
        # reference folds runs narrower than its 5px MIN (pseg.py:641) —
        # the engine's resolvable table-column-line count per page column
        # is therefore the count of reference rects at least 2 chars wide
        # whose center lies in that column.
        per_col = []
        for ci, (left, right) in enumerate(cols_px):
            n = sum(
                1
                for r in stage05_rects
                if r["width_px"] >= 2 * CHAR_W
                and left <= (r["x0_px"] + r["x1_px"]) / 2 < right
            )
            per_col.append(n)
        manifest["expected_col_lines_per_column"] = per_col
    return manifest, text


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    manifests = {}
    for page, _, _ in PAGES:
        manifest, text = process_page(page)
        with open(os.path.join(OUT_DIR, page + ".txt"), "w") as f:
            f.write(text)
        manifests[page] = manifest
        print(
            f"{page}: binarize_mismatch={manifest['binarize_mismatch_px']}px "
            f"columns={manifest['columns_char']} "
            f"lines={manifest['n_text_lines']} "
            f"tables={len(manifest.get('tables') or [])}"
        )
    with open(os.path.join(OUT_DIR, "manifest.json"), "w") as f:
        json.dump(manifests, f, indent=1)


if __name__ == "__main__":
    main()
