"""Triage helper for expanding the reference fixture corpus.

For each transcribed page, print the reference's stage decisions (from
tests/fixtures/reference/manifest.json) next to the engine's decisions on
the transcribed text grid, so new pages can be pinned into
tests/test_reference_fixtures.py GROUP_PARTITIONS with eyes on the
quantization class of every difference (extra split / one-row title
shift / sub-2-char gutter fold — see that test's module docstring).

Usage: PYTHONPATH=/root/repo python scripts/fixture_triage.py [page ...]
(default: every page in the manifest).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crrf_det_spark.grid import occupancy_from_text, parse_grid  # noqa: E402

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "reference",
)


def main() -> None:
    with open(os.path.join(FIXTURE_DIR, "manifest.json")) as f:
        manifest = json.load(f)
    pages = sys.argv[1:] or sorted(manifest)
    for page in pages:
        m = manifest[page]
        with open(os.path.join(FIXTURE_DIR, page + ".txt")) as f:
            text = f.read()
        grid, _ = occupancy_from_text(text)
        res = parse_grid(grid)
        print(f"== {page} (binarize_mismatch={m['binarize_mismatch_px']}px)")
        print(f"   ref columns : {m['columns_char']}")
        print(f"   our columns : {res['columns']}")
        for cg in m.get("row_groups", []):
            ci = cg["column"]
            ref_sizes = [g["n_rows"] for g in cg["groups"]]
            ours = res["column_row_groups"].get(ci, [])
            our_sizes = [len(rows) for rows in ours]
            tag = "EXACT" if ref_sizes == our_sizes else "DIFF "
            print(f"   {tag} col{ci} groups ref={ref_sizes} ours={our_sizes} "
                  f"rows ref={cg['n_rows_total']} "
                  f"ours={sum(our_sizes)}")
        if "tables" in m:
            ref_t = [
                (t["column"], t["n_row_lines"], t["n_col_lines"])
                for t in m["tables"]
            ]
            ours_t = []
            for ci, d in res["column_row_grp_build_table"].items():
                for _gi, (trows, tcols) in d.items():
                    ours_t.append((ci, len(trows), len(tcols)))
            print(f"   tables ref (col, rows, cols): {sorted(ref_t)}")
            print(f"   tables ours                : {sorted(ours_t)}")
            print(f"   expected_col_lines_per_column: "
                  f"{m.get('expected_col_lines_per_column')}")


if __name__ == "__main__":
    main()
