#!/usr/bin/env python
"""det-search: ngram/TFIDF index + boolean query CLI (analogue of the
reference's Node det-search, /root/reference/src/search/index.js).

    # build the inverted index from extraction output
    python scripts/det_search.py build <extraction dir> <index dir>

    # query it (shlex syntax: -term excludes, "quoted phrase", table:/text:)
    python scripts/det_search.py search <index dir> 'revenue -guidance'

Search prints a JSON list [{conv_id, turn_idx, cindex: [..], score}]
sorted by score desc, mirroring index.js:124-141.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    if len(argv) < 3 or argv[0] not in ("build", "search"):
        print(__doc__)
        return 2
    cmd = argv[0]

    from crrf_det_spark.pipeline import build_session, segments_view
    from crrf_det_spark.search import build_index, search

    spark = build_session(app="det_search", master=os.environ.get(
        "SPARK_MASTER", "local[8]"))
    spark.sparkContext.setLogLevel("ERROR")

    if cmd == "build":
        src, idx_dir = argv[1], argv[2]
        segs = segments_view(spark.read.parquet(src))
        n_docs = segs.count()
        build_index(segs).write.mode("overwrite").parquet(
            os.path.join(idx_dir, "postings")
        )
        with open(os.path.join(idx_dir, "meta.json"), "w") as f:
            json.dump({"n_docs": n_docs}, f)
        print(f"index built: {n_docs} segments -> {idx_dir}")
    else:
        idx_dir, terms = argv[1], " ".join(argv[2:])
        postings = spark.read.parquet(os.path.join(idx_dir, "postings"))
        n_docs = json.load(open(os.path.join(idx_dir, "meta.json")))["n_docs"]
        rows = search(postings, terms, n_docs=n_docs).collect()
        print(
            json.dumps(
                [
                    {
                        "conv_id": r.conv_id,
                        "turn_idx": r.turn_idx,
                        "cindex": list(r.cindex),
                        "score": round(r.score, 6),
                    }
                    for r in rows
                ]
            )
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
