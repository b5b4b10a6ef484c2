#!/usr/bin/env python
"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].  Output protocol: the
LAST stdout line is a compact JSON summary (kept small so a bounded tail
capture can never truncate it — round-3 VERDICT #1):

    {"metric": "...", "value": N, "unit": "sec", "queries": {medians},
     "sf": ..., "extraction": {"north_rule_figure":
     "scaling_efficiency_linear", "cores_linear": [N, 4N],
     "turns_per_sec_linear": [...], "scaling_efficiency_linear": ...,
     "mp_control_efficiency_linear": ..., "cores_saturation": [...],
     "turns_per_sec_saturation": [...], "scaling_efficiency_saturation":
     ..., "mp_control_efficiency_saturation": ...}}

The full stats object (per-run arrays, interleaved mp controls, noise
note) is printed FIRST on its own stdout line ({"detail":
"bench_full_stats", ...}) and mirrored to stderr.

The extraction block evidences the north rule's two-cluster-size scaling
criterion in this sandbox: the same extraction job over the same synthetic
transcript input at two N-vs-4N parallelism windows — 4v16 cores inside
the box's linear-scaling region (`scaling_efficiency_linear`, the
north-rule figure) and cpus/4-vs-cpus (8v32) at full saturation — each
reporting throughput at both sizes plus efficiency
throughput_4N / (4 * throughput_N).  Each window interleaves an
engine-free multiprocessing control running the identical kernel on the
identical data at the same worker counts: the box's own scaling ceiling,
which a single machine's shared memory bus imposes on ANY engine (a real
4x cluster adds memory channels too).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# bench transcript corpus (FIXTURES.md section 5 bench point: ~1M turns).
# A seeded base corpus is generated driver-side once, then replicated
# Spark-side with distinct conv_ids -- same content distribution, zero
# generation cost, enough work that Python-worker fixed overhead (~8s) is
# <10% of the measured job at full parallelism.
N_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "3000"))
REPLICAS = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICAS", "40"))
SEED = 424242

HEADLINE = [
    "a1_pricing_summary",
    "a9_revenue_by_nation",
    "w4_sessionize",
    "j1_interval_join",
    "a9_tfidf",
    "dedup_minhash",
    "ann_topk",
    "extraction_segments",
    "extraction_html",
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


def _bench_dedup_minhash(spark, sf):
    # the SCALE path: char-shingle minhash signatures + multi-row-band LSH
    # with sig-jaccard verification -- the same algorithm family and
    # parameters round 1 benched under this key.  The round-2
    # implementation is optimized (identical-signature collapse,
    # star-edge output, explicit kernel spread, no driver size probe), so
    # absolute times compare an improved implementation of the same
    # operation, not byte-identical code -- BENCH.md records the change.
    # (The same-named CONTRACT query is the exact-verified variant, whose
    # one-row bands degrade to near-all-pairs on this synthetic dense
    # corpus -- an oracle-checking construction, not the 100TB shape, so
    # it is excluded from the bench like dedup_jaccard.)
    from pyspark.sql import functions as F  # noqa: F401

    from crrf_det_spark.ops import minhash_lsh_pairs, minhash_signatures

    d = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    sigs = minhash_signatures(d, num_hashes=32)
    return minhash_lsh_pairs(sigs, num_bands=8, threshold=0.5)


BENCH_ONLY = {"dedup_minhash": _bench_dedup_minhash}


def _warm_python_workers(spark) -> None:
    """One trivial Arrow stage before timing: spins up the Python worker
    pool + Arrow machinery so the first Python-kernel query isn't charged
    several seconds of interpreter cold start (JVM queries get the same
    courtesy from session creation).  Not counted in any query time."""
    spark.range(256).repartition(64).mapInPandas(
        lambda it: it, schema="id long"
    ).count()


N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def bench_queries(spark) -> tuple[dict[str, float], dict[str, dict]]:
    """Each headline query runs N_RUNS times; the reported figure is the
    MEDIAN (round-2 cross-round deltas were inside the single-run noise
    band of this shared box — 55.0-66.6s across identical runs — so
    single-run numbers are not decision-grade; VERDICT.md round 2 #3).
    Runs iterate round-robin (all queries, then all again) so one
    machine-wide stall inflates at most one run of each query, not all
    three runs of one query.  Returns (medians, per-query stats)."""
    import statistics

    import __spark_entry__ as entrymod

    _warm_python_workers(spark)
    qs = entrymod.queries()
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _run in range(N_RUNS):
        for name in HEADLINE:
            fn = BENCH_ONLY.get(name) or qs[name]
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.count()
            samples[name].append(round(time.time() - t0, 3))
    medians = {n: round(statistics.median(v), 3) for n, v in samples.items()}
    stats = {
        n: {
            "median": medians[n],
            "min": round(min(v), 3),
            "max": round(max(v), 3),
            "runs": v,
        }
        for n, v in samples.items()
    }
    return medians, stats


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
    from pyspark.sql import functions as F

    from crrf_det_spark import synth
    from crrf_det_spark.schema import TRANSCRIPT_SCHEMA

    spark = _session(CPUS)
    rows, _ = synth.generate(
        n_convs=N_CONVS, seed=SEED, skew_convs=max(2, N_CONVS // 500),
        skew_factor=50,
    )
    base = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    replicated = (
        base.crossJoin(
            spark.range(REPLICAS).select(F.col("id").alias("_replica"))
        )
        .withColumn(
            "conv_id", F.concat_ws("-r", F.col("conv_id"), F.col("_replica"))
        )
        .drop("_replica")
    )
    replicated.repartition(CPUS * 2).write.mode("overwrite").parquet(path)
    spark.stop()


def _extract_once(transcripts_path: str, cores: int, limit: int | None) -> None:
    """Subprocess entry: one extraction pass at one parallelism level,
    prints one JSON line {"sec":..,"n":..}."""
    s = _session(cores)
    from pyspark.sql import functions as F

    from crrf_det_spark.pipeline import extract_transcripts

    df = s.read.parquet(transcripts_path)
    total = df.count()
    if limit:
        # deterministic ~limit-row subset without a GlobalLimit (which
        # would gather to one partition): hash-sample conversations
        frac_denom = max(1, round(total / limit))
        df = df.filter(F.pmod(F.hash("conv_id"), F.lit(frac_denom)) == 0)
    # Warmup OUTSIDE the timed region: a ~10%-of-leg extraction pass
    # through the identical plan forks every Python worker, initializes
    # Arrow, and JITs the hot JVM paths.  A production extraction job
    # runs for hours, so per-process ramp amortizes to ~0; including it
    # in a 30-100s measured pass systematically biases the SHORT
    # (high-core) leg down and understates scaling efficiency.  Round-4's
    # ~3k-turn warmup was too small to finish C2 JIT of the hot
    # codegen/Arrow paths — measured directly in round 5: the same warm
    # 16-core 500k-turn pass runs 33s vs 40s behind a tiny warmup, a
    # ramp constant that read as ~0.08 of fake anti-scaling in the
    # linear window.  The warmup sample goes through the same salted
    # repartition, so all `cores` workers start (reuse is by worker
    # process, not by data).
    n_target = limit or total
    warm_denom = max(1, round(total / max(20_000, n_target // 10)))
    # pmod(x, 1) == 1 never holds, so a denom of 1 (tiny/smoke corpora,
    # exactly where startup bias is worst) must fall back to warming on
    # the whole corpus instead of a zero-row no-op (round-3 ADVICE).
    warm = (
        df if warm_denom == 1
        else df.filter(F.pmod(F.hash("conv_id"), F.lit(warm_denom)) == 1)
    )
    extract_transcripts(warm).count()
    t0 = time.time()
    n = extract_transcripts(df).count()
    print(json.dumps({"sec": round(time.time() - t0, 3), "n": n}))
    s.stop()


def _mp_worker(text):
    from crrf_det_spark.extract import extract_turn_auto

    return len(extract_turn_auto(text if isinstance(text, str) else ""))


def _pair_stats(runs: dict[int, list[float]], small: int, big: int,
                n_turns: int) -> dict:
    """min-of-k per leg -> throughputs + N->4N efficiency.  Min because
    this VM's noise is one-sided (host steal only ever ADDS time —
    identical 32-core passes measured 56-181s back-to-back): min-of-k
    estimates engine capability, mean/median mostly measure the
    neighbor's workload.  Raw runs reported alongside."""
    sec_s, sec_b = min(runs[small]), min(runs[big])
    tps_s, tps_b = n_turns / sec_s, n_turns / sec_b
    return {
        "n_turns": n_turns,
        "cores_N": small,
        "cores_4N": big,
        "sec_N": round(sec_s, 3),
        "sec_4N": round(sec_b, 3),
        "turns_per_sec_N": round(tps_s, 1),
        "turns_per_sec_4N": round(tps_b, 1),
        "scaling_efficiency": round(tps_b / ((big / small) * tps_s), 3),
        "runs_sec_N": [round(x, 3) for x in runs[small]],
        "runs_sec_4N": [round(x, 3) for x in runs[big]],
    }


def _scaling_window(
    transcripts_path: str,
    small: int,
    big: int,
    limit: int | None,
    k: int,
    mp_rows: int = 100_000,
) -> dict:
    """One N-vs-4N scaling window: k alternating rounds, each running the
    Spark leg at `small` then `big` cores WITH an engine-free
    multiprocessing.Pool control leg (identical kernel, identical data)
    at the same core count immediately after.

    * Each Spark leg runs in a FRESH subprocess (the spark-submit-per-
      cluster-size shape of the north rule): PySpark's stop() keeps the
      JVM gateway alive, so a second session in the same process inherits
      a churned JVM and the later (bigger) leg was systematically
      penalized — round-2 measured the same 32-core job 2-4x slower
      in-process than stand-alone.
    * The mp control is interleaved INSIDE the same window (round-3's ran
      once, minutes after the Spark legs, so control and measurement saw
      different neighbor load and the comparison drifted).  Both use
      min-of-k (see _pair_stats).  The control is the box's own scaling
      ceiling, which the shared memory bus imposes on ANY engine; judge
      Spark against it, not against a theoretical 1.0 (a real 4x-larger
      cluster adds memory channels too, which neither side can show).
    """
    import multiprocessing as mp

    import pyarrow.dataset as ds

    texts = (
        ds.dataset(transcripts_path)
        .head(mp_rows, columns=["text"])
        .column("text")
        .to_pylist()
    )
    spark_runs: dict[int, list[float]] = {small: [], big: []}
    mp_runs: dict[int, list[float]] = {small: [], big: []}
    n_turns = None
    for _ in range(k):
        for cores in (small, big):
            r = _run_sub(
                "--_extract", transcripts_path, str(cores), str(limit or 0)
            )
            spark_runs[cores].append(r["sec"])
            n_turns = r["n"]
            with mp.Pool(cores) as pool:
                # tiny untimed warmup: fork + import cost out of the leg,
                # mirroring the Spark legs' out-of-region warmup
                pool.map(_mp_worker, texts[: cores * 32], chunksize=32)
                t0 = time.time()
                pool.map(_mp_worker, texts, chunksize=256)
                mp_runs[cores].append(time.time() - t0)
    return {
        "spark": _pair_stats(spark_runs, small, big, n_turns),
        "mp_control": _pair_stats(mp_runs, small, big, len(texts)),
    }


def _run_sub(mode: str, *args: str) -> dict:
    """Spawn bench.py in a helper mode, return its JSON line.  Every
    Spark session the bench measures lives in its own subprocess: the
    parent stays JVM-free, because a stopped PySpark session leaves its
    gateway JVM alive in-process and measurably degrades every later
    measurement (round-3 A/B: the same 32-core extraction ran ~2x slower
    from a parent with a dead session's JVM than stand-alone)."""
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), mode, *args]
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    inherited = os.environ.get("PYTHONPATH", "")
    pythonpath = (
        repo_dir + os.pathsep + inherited if inherited else repo_dir
    )
    out = subprocess.run(
        cmd, capture_output=True, text=True, check=True,
        env={**os.environ, "PYTHONPATH": pythonpath},
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--_extract":
        _extract_once(
            sys.argv[2], int(sys.argv[3]), int(sys.argv[4]) or None
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--_queries":
        s = _session(CPUS)
        times, query_stats = bench_queries(s)
        print(json.dumps({"times": times, "stats": query_stats}))
        s.stop()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--_prepare":
        prepare_transcripts(sys.argv[2])
        print(json.dumps({"ok": True}))
        return
    transcripts_path = os.environ.get(
        "SPARK_GRAFT_BENCH_TRANSCRIPTS", "/tmp/crrf_bench_transcripts"
    )
    _run_sub("--_prepare", transcripts_path)

    # --- headline queries at full parallelism, in their own process ---
    q = _run_sub("--_queries")
    times, query_stats = q["times"], q["stats"]

    # --- scaling evidence: same job, same input, N vs 4N cores ---
    # window A (linear region, THE north-rule pair): 4 vs 16 cores on a
    # 500k-turn prefix.  Both sizes sit inside the machine's linear-
    # scaling region (the round-2/3 2v8 pair swung 0.59-1.16 run-to-run
    # because the 2-core leg rides per-core turbo/steal on this VM; 4
    # cores damps that, 16 stays below the bandwidth knee).  k=7
    # alternating rounds by default (round-3's k=3 let one neighbor-load
    # burst dominate a leg's min; round-4's k=5 still recorded 0.788 in
    # the driver window vs 0.943/0.835 unattended — on one-sided steal
    # noise, min-of-k needs more draws to converge; round-4 VERDICT #1).
    # window B (saturation context): 8 vs 32 cores on the full corpus --
    # 32 threads on this box hit the memory-bandwidth ceiling (plain
    # multiprocessing of the same kernel shows the same ceiling, see
    # BASELINE.md), so window B understates what a 4x-larger CLUSTER —
    # which adds memory channels, not just threads — would do.
    # Each window interleaves an engine-free multiprocessing control on
    # the identical kernel/data at the same core counts: judge Spark's
    # efficiency against the box's own ceiling, not a theoretical 1.0.
    k_linear = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE_RUNS_LINEAR", "7"))
    k_sat = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE_RUNS", "5"))
    small_a, big_a = max(1, CPUS // 8), max(1, CPUS // 2)
    # mp_rows=250k on BOTH windows (round 5): at 16 cores a 100k-row
    # control leg ran ~6-8s — short enough that one lucky burst-free
    # draw put the control's min 30% below its cluster and inflated its
    # efficiency artificially.
    # limit 250k -> 500k (round 5): even ramp-free, a 16-core 250k leg
    # carries ~5s of fixed job cost against ~12s of kernel; at 500k the
    # fixed share halves and the window measures the kernel's scaling,
    # not the scheduler's constant (production legs are hours long).
    win_a = _scaling_window(
        transcripts_path, small_a, big_a, limit=500_000, k=k_linear,
        mp_rows=250_000,
    )
    # saturation window gets the same min-of-k hardening as the linear
    # pair (round-4 VERDICT #1: its k=3 legs spread 61.6-134.6s, 2.2x)
    # and a 2.5x-longer mp control leg: at 32 cores the 100k-row control
    # finished in ~4s, small enough that Pool fixed overhead + one steal
    # burst dominated the leg.
    win_b = _scaling_window(
        transcripts_path, max(1, CPUS // 4), CPUS, limit=None, k=k_sat,
        mp_rows=250_000,
    )
    pair_a, mp_ctl_a = win_a["spark"], win_a["mp_control"]
    pair_b, mp_ctl = win_b["spark"], win_b["mp_control"]

    total = round(sum(times.values()) + pair_b["sec_4N"], 3)

    # Output protocol (round-3 VERDICT #1): the driver captures a bounded
    # TAIL of stdout, so the LAST line must stay compact and parseable —
    # the full stats object (per-run arrays, controls, noise note) goes
    # out FIRST, on its own stdout line and mirrored to stderr.
    details = {
        "detail": "bench_full_stats",
        "query_stats": query_stats,
        "n_runs_per_query": N_RUNS,
        "noise_note": (
            "per-query figures are medians of "
            f"{N_RUNS} round-robin in-process runs; single-run wall "
            "times on this shared box vary +-20% (BENCH.md round-2 "
            "spread 55.0-66.6s) — judge regressions on medians; "
            "scaling legs are min-of-k with the mp control interleaved "
            "in-window"
        ),
        "scaling_window_linear": win_a,
        "scaling_window_saturation": win_b,
    }
    print(json.dumps(details))
    print(json.dumps(details), file=sys.stderr)
    # Key naming (round 5): the north-rule figure is the LINEAR window
    # (4v16, both sizes inside the box's linear-scaling region).  The
    # 8v32 saturation window is explicitly context-only — at 32 threads
    # BOTH engines sit on this box's shared memory-bus ceiling (the mp
    # control shows the same knee), which a real 4x-larger cluster,
    # adding memory channels, does not reproduce — so its keys carry the
    # _saturation suffix instead of the bare headline name (round-4
    # VERDICT #1's sanctioned demotion).
    summary = {
        "metric": "headline_queries_plus_extraction_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
        "extraction": {
            "n_turns": pair_b["n_turns"],
            "north_rule_figure": "scaling_efficiency_linear",
            "cores_linear": [small_a, big_a],
            "turns_per_sec_linear": [
                pair_a["turns_per_sec_N"], pair_a["turns_per_sec_4N"]
            ],
            "scaling_efficiency_linear": pair_a["scaling_efficiency"],
            "mp_control_efficiency_linear": mp_ctl_a["scaling_efficiency"],
            "cores_saturation": [max(1, CPUS // 4), CPUS],
            "turns_per_sec_saturation": [
                pair_b["turns_per_sec_N"], pair_b["turns_per_sec_4N"]
            ],
            "scaling_efficiency_saturation": pair_b["scaling_efficiency"],
            "mp_control_efficiency_saturation": mp_ctl[
                "scaling_efficiency"
            ],
        },
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
