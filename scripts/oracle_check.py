#!/usr/bin/env python
"""Value-level driver-contract check: run every __spark_entry__.queries()
entry AND its DuckDB oracle_sql() twin on the same parquet tables, then
compare full result values (columns sorted by name, doubles rounded to
6 dp, rows canonically sorted) — the same comparison shape the round
driver uses for CORRECTNESS_r{N}.json, but run locally on demand.

Usage:  PYTHONPATH=/root/repo python scripts/oracle_check.py [sf_dir] \
            [--only name1,name2]
Exit code 0 iff every oracle-paired query matches by value.
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

ONLY: set[str] | None = None
if "--only" in sys.argv:
    i = sys.argv.index("--only")
    if i + 1 >= len(sys.argv):
        sys.exit("usage: oracle_check.py [sf_dir] [--only name1,name2]")
    ONLY = set(sys.argv[i + 1].split(","))
    del sys.argv[i : i + 2]

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
        elif np.issubdtype(s.dtype, np.floating):
            df[c] = s.round(6)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if list(a.columns) != list(b.columns):
        return f"column mismatch: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"rowcount mismatch: {len(a)} vs {len(b)}"
    for c in a.columns:
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(
            b[c].dtype, np.floating
        ):
            if not np.allclose(
                pd.to_numeric(a[c]), pd.to_numeric(b[c]),
                rtol=0, atol=1e-6, equal_nan=True,
            ):
                return f"value mismatch in column {c}"
        elif not all(x == y for x, y in zip(a[c].values, b[c].values)):
            return f"value mismatch in column {c}"
    return None


def main() -> int:
    import __spark_entry__ as entry

    from crrf_det_spark.pipeline import build_session

    spark = build_session(master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY is not None and name not in ONLY:
            continue
        if name not in oracles:
            t0 = time.time()
            n = fn(spark, SF_DIR).count()
            print(f"{name}: rows-only ({n} rows) [{time.time() - t0:.1f}s]")
            continue
        t0 = time.time()
        spark_df = canon(fn(spark, SF_DIR).toPandas())
        t1 = time.time()
        oracle_df = canon(con.execute(oracles[name]).df())
        t2 = time.time()
        err = compare(spark_df, oracle_df)
        print(
            f"{name}: {'OK' if err is None else 'FAIL — ' + err} "
            f"[spark {t1 - t0:.1f}s, oracle {t2 - t1:.1f}s]"
        )
        failures += err is not None
    spark.stop()
    print(f"{failures} failures" if failures else "all value-checks OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
