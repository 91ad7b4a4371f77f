"""Benchmark harness.

Default mode (what the round driver runs): times the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Scaling mode (north-rule evidence, run manually / by tests)::

    python bench.py --scaling [--turns 2000000]

runs the identical flagship job at local[8] and local[32] on the same
generated transcript parquet and reports throughput at both plus the
scaling efficiency (target >= 0.8), appending results to BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import SparkSession, functions as F


def _force(df) -> int:
    """Execute the full plan without driver-side collection."""
    return df.write.format("noop").mode("overwrite").save() or -1


def _flagship(spark: SparkSession, sf_dir: str):
    import __spark_entry__ as e  # local import: repo root on sys.path
    from mpower_feature_analysis_spark.plans.pipeline import (
        PipelineConfig, extract_turn_features)
    from mpower_feature_analysis_spark.transcripts import (
        load_states, load_transcripts)

    t = load_transcripts(spark, sf_dir)
    s = load_states(spark, sf_dir)
    cfg = PipelineConfig(roles=("click", "error", "purchase", "signup", "view"))
    return extract_turn_features(t, s, cfg)


HEADLINE = [
    # round-1 keys (kept stable for cross-round comparison)
    "dedup_last_wins",
    "asof_state_label",
    "sessionize",
    "rolling_gap_stats",
    "user_aggregate",
    "burst_membership",
    "lineitem_pricing",
    "pivot_role_counts",
    # round-2 additions: corpus dedup / similarity / signal families
    "doc_exact_dedup",
    "ngram_jaccard_exact",
    "simhash_near_dups",
    "knn_cosine",
    "signal_features",
    "freq_domain_features",
]


def run_default() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as e
    from mpower_feature_analysis_spark.operators import windowed_summary_features
    from mpower_feature_analysis_spark.session import get_spark
    from mpower_feature_analysis_spark.transcripts import load_transcripts

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark()

    queries = e.queries()
    timings: dict[str, float] = {}

    # flagship end-to-end (the BASELINE.json turns/sec metric)
    n_turns = load_transcripts(spark, sf_dir).count()
    # discarded warm pass: JIT + page cache + Python worker pool spin-up
    # dominate the first run on small data (BENCH_NOTES.md §5); report
    # steady state like --scaling mode does
    _force(_flagship(spark, sf_dir))
    t0 = time.time()
    _force(_flagship(spark, sf_dir))
    flagship_s = time.time() - t0
    timings["flagship_pipeline"] = round(flagship_s, 3)

    from mpower_feature_analysis_spark.transcripts import (
        events_df, transcripts_from_events)
    keyed = transcripts_from_events(events_df(spark, sf_dir), keep_key=True)
    _force(windowed_summary_features(keyed, shuffle_key="user_id"))  # warm
    t0 = time.time()
    _force(windowed_summary_features(keyed, shuffle_key="user_id"))
    timings["window_kernel"] = round(time.time() - t0, 3)

    for name in HEADLINE:
        _force(queries[name](spark, sf_dir))  # discarded warm pass (JIT/codegen)
        t0 = time.time()
        _force(queries[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "turns": n_turns,
        "flagship_turns_per_sec": round(n_turns / flagship_s, 1),
    }))
    spark.stop()


# ---------------------------------------------------------------------------
# scaling mode
# ---------------------------------------------------------------------------

def _gen_transcripts_distributed(spark: SparkSession, n_turns: int, n_convs: int):
    """Deterministic Spark-side transcript generator for bench-scale data
    (hash-derived, no wall clock / RNG): zipf-ish skew via squared hash."""
    df = spark.range(n_turns)
    h = F.xxhash64(F.col("id"))
    # skew: square a uniform hash → density near 0 → a few hot conv ids
    u = (F.pmod(h, F.lit(1_000_003)).cast("double") / F.lit(1_000_003.0))
    conv = (u * u * F.lit(n_convs)).cast("long")
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool"), F.lit("system")),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(4)) + 1).cast("int"),
    )
    gap_ms = F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(120_000))
    long_jump = F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(100)) < 3
    gap_ms = F.when(long_jump, gap_ms + F.lit(4 * 3600 * 1000)).otherwise(gap_ms)
    out = df.select(
        F.concat(F.lit("conv"), conv.cast("string")).alias("conv_id"),
        F.col("id").alias("seq"),
        role.alias("role"),
        F.concat(F.lit("text of turn "), F.col("id").cast("string")).alias("text"),
        F.when(
            F.pmod(F.xxhash64(F.col("id"), F.lit(4)), F.lit(10)) == 0,
            F.lit("tool_search"),
        ).alias("tool"),
        gap_ms.alias("gap_ms"),
    )
    from pyspark.sql import Window as W
    w = W.partitionBy("conv_id").orderBy("seq")
    return out.select(
        "conv_id",
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        "role", "text", "tool",
        F.timestamp_millis(
            F.lit(1_700_000_000_000)
            + F.sum("gap_ms").over(w.rowsBetween(W.unboundedPreceding, 0))
        ).alias("ts"),
    )


def _run_at(master: str, data_dir: str, shuffle_partitions: int,
            repeats: int = 3) -> tuple[float, float, int]:
    """Measure the full feature-extraction job (turn features + window
    kernel). One full warm pass is discarded (page cache + JIT), then
    best-of-``repeats`` is reported — steady-state throughput, which is what
    a long-running cluster job sees.

    The kernel runs the shuffle-free ``presorted`` mapInArrow path: the
    cache layout is bucketed by conv_id and sorted (conv_id, turn_idx, ts)
    within files — the production table layout ``write_stable_parquet``
    emits — so the kernel is a pure scan→Python map with NO exchange.
    ``maxPartitionBytes`` is raised above the largest file so parquet
    row-group splitting can never slice a conversation across tasks
    (equality vs the shuffled path is pinned by
    tests/test_kernels.py::test_presorted_layout_equals_default).
    """
    from mpower_feature_analysis_spark.operators.kernels import (
        windowed_summary_features_arrow,
    )
    from mpower_feature_analysis_spark.plans.pipeline import extract_turn_features
    from mpower_feature_analysis_spark.session import get_spark

    spark = get_spark(
        master, app_name=f"bench-{master}", shuffle_partitions=shuffle_partitions,
        extra_confs={
            "spark.local.dir": "/dev/shm/spark-bench",
            # keep task count = the chosen multiple of cores: AQE coalescing
            # to ~64MB targets yields e.g. 38 tasks on 32 cores → a 6-task
            # second wave that idles 26 cores (wave quantization)
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            # fewer, larger Arrow batches amortize the per-batch numpy pass
            "spark.sql.execution.arrow.maxRecordsPerBatch": "131072",
        })
    # exactly ONE task per cache file: maxPartitionBytes above the largest
    # file (a split would slice a conversation across tasks) and an open
    # cost that fills the bin (packing two files would halve parallelism)
    max_file = max(
        (e.stat().st_size for e in os.scandir(data_dir) if e.name.endswith(".parquet")),
        default=1 << 27,
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(max_file + (1 << 20)))
    spark.conf.set("spark.sql.files.openCostInBytes", str(max_file + (1 << 20)))
    t = spark.read.parquet(data_dir)
    n = t.count()

    def kernel_job():
        return windowed_summary_features_arrow(t, presorted=True)

    _force(extract_turn_features(t))            # discarded warm pass
    _force(kernel_job())
    turn_s, kern_s, cpu_s = 1e9, 1e9, 1e9
    # compute-dense control: chained hashes so the job is ~30 core-seconds,
    # well above the scheduler floor, with no memory traffic
    h = F.col("id")
    for i in range(6):
        h = F.xxhash64(h, F.lit(i))
    cpu_ctl = spark.range(1_000_000_000, numPartitions=shuffle_partitions).select(
        F.sum(h % 1000).alias("s")
    )
    for _ in range(repeats):
        t0 = time.time()
        _force(extract_turn_features(t))
        turn_s = min(turn_s, time.time() - t0)
        t0 = time.time()
        _force(kernel_job())
        kern_s = min(kern_s, time.time() - t0)
        t0 = time.time()
        _force(cpu_ctl)
        cpu_s = min(cpu_s, time.time() - t0)
    spark.stop()
    return turn_s, kern_s, cpu_s, n


def run_scaling(n_turns: int, lo_cpus: int = 8, hi_cpus: int = 32) -> None:
    """N vs 4N 'cluster size' proxy. Each measurement runs in a SUBPROCESS
    pinned with ``taskset`` to exactly N CPUs, so the small configuration
    cannot borrow the other cores for GC/IO/Python workers — the honest
    sandbox stand-in for an 8-executor vs 32-executor cluster."""
    import subprocess

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from mpower_feature_analysis_spark.session import get_spark

    here = os.path.dirname(os.path.abspath(__file__))
    # v2 layout: bucketed by conv_id AND sorted (conv_id, turn_idx, ts)
    # within each file — the write_stable_parquet production layout that
    # makes the presorted (shuffle-free) kernel path valid
    cache = os.path.join(here, ".bench_cache", f"transcripts_sorted_{n_turns}")
    if not os.path.exists(cache):
        spark = get_spark("local[32]", app_name="bench-gen")
        _gen_transcripts_distributed(spark, n_turns, max(64, n_turns // 4000)) \
            .repartition(64, "conv_id") \
            .sortWithinPartitions("conv_id", "turn_idx", "ts") \
            .write.mode("overwrite").parquet(cache)
        spark.stop()

    def measure(cpus: int, parts: int):
        cmd = [
            "taskset", "-c", f"0-{cpus - 1}", sys.executable, os.path.abspath(__file__),
            "--scaling-worker", f"local[{cpus}]", cache, str(parts),
        ]
        out = subprocess.run(cmd, capture_output=True, text=True, cwd=here)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        d = json.loads(line)
        return d["turn_s"], d["kern_s"], d["cpu_s"], d["n"]

    lo_t, lo_k, lo_c, n = measure(lo_cpus, lo_cpus * 8)
    hi_t, hi_k, hi_c, _ = measure(hi_cpus, hi_cpus * 8)
    lo_dt, hi_dt = lo_t + lo_k, hi_t + hi_k
    lo_tp, hi_tp = n / lo_dt, n / hi_dt
    eff = hi_tp / (4.0 * lo_tp)
    result = {
        "metric": f"scaling_efficiency_local{lo_cpus}_vs_local{hi_cpus}",
        "turns": n,
        "local8_sec": round(lo_dt, 2),
        "local8_turns_per_sec": round(lo_tp, 1),
        "local32_sec": round(hi_dt, 2),
        "local32_turns_per_sec": round(hi_tp, 1),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "cpu_control_efficiency": round(lo_c / hi_c / 4.0, 3),
        "detail": {
            f"local{lo_cpus}": {"turn_features_sec": round(lo_t, 2), "kernel_sec": round(lo_k, 2),
                                "cpu_control_sec": round(lo_c, 2)},
            f"local{hi_cpus}": {"turn_features_sec": round(hi_t, 2), "kernel_sec": round(hi_k, 2),
                                "cpu_control_sec": round(hi_c, 2)},
        },
    }
    print(json.dumps(result))
    with open("BENCH.md", "a") as f:
        f.write(
            f"\n## Scaling run: local[{lo_cpus}] vs local[{hi_cpus}] "
            f"({n:,} turns, end-to-end feature extraction: turn features + window kernel)\n\n"
            f"taskset-pinned to exactly N cores; best-of-3 after a discarded warm pass.\n\n"
            f"| config | turn features s | kernel s | total s | turns/sec | cpu-control s |\n"
            f"|---|---|---|---|---|---|\n"
            f"| local[{lo_cpus}], {lo_cpus * 8} shuffle parts | {lo_t:.2f} | {lo_k:.2f} | {lo_dt:.2f} | {lo_tp:,.0f} | {lo_c:.2f} |\n"
            f"| local[{hi_cpus}], {hi_cpus * 8} shuffle parts | {hi_t:.2f} | {hi_k:.2f} | {hi_dt:.2f} | {hi_tp:,.0f} | {hi_c:.2f} |\n\n"
            f"**Scaling efficiency (N→4N cores): {eff:.3f}** (target ≥ 0.8); "
            f"pure-CPU control job on the same harness: "
            f"{lo_c / hi_c / 4.0:.3f}.\n"
        )


if __name__ == "__main__":
    if "--scaling-worker" in sys.argv:
        i = sys.argv.index("--scaling-worker")
        master, data_dir, parts = sys.argv[i + 1], sys.argv[i + 2], int(sys.argv[i + 3])
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        turn_s, kern_s, cpu_s, n = _run_at(master, data_dir, parts)
        print(json.dumps({"turn_s": turn_s, "kern_s": kern_s, "cpu_s": cpu_s, "n": n}))
    elif "--scaling" in sys.argv:
        n = 2_000_000
        if "--turns" in sys.argv:
            n = int(sys.argv[sys.argv.index("--turns") + 1])
        lo, hi = 8, 32
        if "--cpus" in sys.argv:
            lo, hi = (int(x) for x in sys.argv[sys.argv.index("--cpus") + 1].split(","))
        run_scaling(n, lo, hi)
    else:
        run_default()
