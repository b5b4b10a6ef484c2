#!/usr/bin/env python
"""s-search: regex batch search CLI over extraction output (analogue of
the reference's s-pdf, /root/reference/src/s-pdf:62-75).

    python scripts/s_search.py -i <extraction json/parquet dir> \
        'pattern1' 'table:pattern2' [-o results.json]

Terms are regular expressions with optional table:/text: field prefixes;
output is {"conv_id-turn_idx": {cindex: n_matching_terms}} like the
reference's {page: {idx: count}} dict.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("-i", "--input", required=True,
                   help="extraction output (parquet or json-lines dir)")
    p.add_argument("-o", "--output", default=None)
    p.add_argument("--master", default="local[8]")
    p.add_argument("terms", nargs="+")
    args = p.parse_args(argv)

    from crrf_det_spark.pipeline import build_session, read_segments_json, segments_view
    from crrf_det_spark.search import regex_search

    spark = build_session(app="s_search", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    has_parquet = any(
        f.endswith(".parquet")
        for _r, _d, fs in os.walk(args.input)
        for f in fs
    )
    ext = (
        spark.read.parquet(args.input)
        if has_parquet
        else read_segments_json(spark, args.input)
    )
    hits = regex_search(segments_view(ext), args.terms).collect()
    results: dict = {}
    for h in hits:
        key = f"{h.conv_id}-{h.turn_idx}"
        results.setdefault(key, {})[h.cindex] = h.n_matches
    payload = json.dumps(results, ensure_ascii=False)
    if args.output:
        with open(args.output, "w", encoding="utf-8") as f:
            f.write(payload)
    else:
        print(payload)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
