#!/usr/bin/env python
"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
     "extraction": {"turns_per_sec_N": ..., "turns_per_sec_4N": ...,
                    "scaling_efficiency": ...}}

The extraction block evidences the north rule's two-cluster-size scaling
criterion in this sandbox: the same extraction job over the same synthetic
transcript input at two parallelism levels (cpus/4 vs cpus cores, i.e. N vs
4N), reporting throughput at both plus efficiency
throughput_4N / (4 * throughput_N).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# bench transcript corpus size (FIXTURES.md section 5 bench point, scaled
# down when benching small sf dirs to keep smoke runs fast)
N_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "12000"))
SEED = 424242

HEADLINE = [
    "a1_pricing_summary",
    "a9_revenue_by_nation",
    "w4_sessionize",
    "j1_interval_join",
    "a9_tfidf",
    "dedup_jaccard",
    "ann_topk",
    "extraction_segments",
    "search_tfidf_query",
]


def _session(cores: int):
    from crrf_det_spark.pipeline import build_session

    s = build_session(
        app=f"bench_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def bench_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
        _ = n
    return times


def bench_extraction(spark, transcripts_path: str) -> tuple[float, int]:
    """Return (seconds, n_turns) for one full extraction pass."""
    from crrf_det_spark.pipeline import extract_transcripts

    df = spark.read.parquet(transcripts_path)
    t0 = time.time()
    # count forces full materialization of every extracted row
    out = extract_transcripts(df)
    n = out.count()
    return time.time() - t0, n


def prepare_transcripts(path: str) -> None:
    if os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return
    from crrf_det_spark import synth
    from crrf_det_spark.schema import TRANSCRIPT_SCHEMA

    spark = _session(CPUS)
    rows, _ = synth.generate(
        n_convs=N_CONVS, seed=SEED, skew_convs=max(2, N_CONVS // 500),
        skew_factor=50,
    )
    spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA).repartition(
        CPUS
    ).write.mode("overwrite").parquet(path)
    spark.stop()


def main() -> None:
    transcripts_path = os.environ.get(
        "SPARK_GRAFT_BENCH_TRANSCRIPTS", "/tmp/crrf_bench_transcripts"
    )
    prepare_transcripts(transcripts_path)

    # --- N cores (N = CPUS/4), then 4N = CPUS: scaling evidence ---
    n_cores = max(1, CPUS // 4)
    s_small = _session(n_cores)
    sec_n, n_turns = bench_extraction(s_small, transcripts_path)
    s_small.stop()

    s_big = _session(CPUS)
    sec_4n, _ = bench_extraction(s_big, transcripts_path)

    tps_n = n_turns / sec_n
    tps_4n = n_turns / sec_4n
    efficiency = tps_4n / (4.0 * tps_n)

    # --- headline queries at full parallelism ---
    times = bench_queries(s_big)
    s_big.stop()

    total = round(sum(times.values()) + sec_4n, 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_extraction_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": SF_DIR,
                "extraction": {
                    "n_turns": n_turns,
                    "cores_N": n_cores,
                    "cores_4N": CPUS,
                    "sec_N": round(sec_n, 3),
                    "sec_4N": round(sec_4n, 3),
                    "turns_per_sec_N": round(tps_n, 1),
                    "turns_per_sec_4N": round(tps_4n, 1),
                    "scaling_efficiency": round(efficiency, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
