"""Round-7 optimization instrumentation (bench.py is FROZEN for measurement).

Modes:

* ``--profile [--sf DIR] [--repeats N] [--only a,b,c]`` — per-query noop-sink
  timing (guide §1.4): one discarded warm pass, then N timed passes each from
  a cleared cache; prints one JSON line with per-query min/median.
* ``--stages [--sf DIR]`` — flagship pipeline cumulative stage timing: times
  each prefix of the dedup → asof → gaps → rolling → counts → ffill →
  sessionize stack so the marginal cost of every stage is visible.
* ``--explain [--sf DIR] [--out plans/r07] [--suffix before] [--only ...]``
  — writes ``.explain("formatted")`` for every headline query to
  ``<out>/<query>_<suffix>.txt``.

All jobs are labelled via ``setJobDescription`` (guide §1.5).
"""

from __future__ import annotations

import io
import json
import os
import statistics
import sys
import time
from contextlib import redirect_stdout


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _thunks(spark, sf_dir):
    """name -> zero-arg thunk returning the DataFrame, mirroring bench.py's
    suite (flagship + window_kernel + HEADLINE)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as e
    from bench import HEADLINE, _flagship
    from mpower_feature_analysis_spark.operators import windowed_summary_features
    from mpower_feature_analysis_spark.transcripts import (
        events_df, transcripts_from_events)

    queries = e.queries()
    out = {"flagship_pipeline": lambda: _flagship(spark, sf_dir)}
    keyed = transcripts_from_events(events_df(spark, sf_dir), keep_key=True)
    out["window_kernel"] = lambda: windowed_summary_features(
        keyed, shuffle_key="user_id")
    for name in HEADLINE:
        out[name] = lambda name=name: queries[name](spark, sf_dir)
    return out


def _spark():
    from mpower_feature_analysis_spark.session import get_spark
    return get_spark(app_name="bench-extra")


def run_profile(sf_dir: str, repeats: int, only: list[str] | None) -> None:
    spark = _spark()
    thunks = _thunks(spark, sf_dir)
    if only:
        thunks = {k: v for k, v in thunks.items() if k in only}
    results = {}
    for name, thunk in thunks.items():
        spark.sparkContext.setJobDescription(f"warm: {name}")
        _force(thunk())
        samples = []
        for r in range(repeats):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"timed[{r}]: {name}")
            t0 = time.time()
            _force(thunk())
            samples.append(round(time.time() - t0, 3))
        results[name] = {
            "min": min(samples),
            "median": round(statistics.median(samples), 3),
            "samples": samples,
        }
        print(json.dumps({"query": name, **results[name]}), flush=True)
    total_med = round(sum(v["median"] for v in results.values()), 3)
    total_min = round(sum(v["min"] for v in results.values()), 3)
    print(json.dumps({
        "metric": "profile", "sf_dir": sf_dir, "repeats": repeats,
        "suite_median_s": total_med, "suite_min_s": total_min,
        "queries": {k: v["median"] for k, v in results.items()},
    }))
    spark.stop()


def run_stages(sf_dir: str, repeats: int) -> None:
    """Cumulative prefix timing of the flagship stack."""
    spark = _spark()
    from mpower_feature_analysis_spark.operators import (
        dedup_last_wins, forward_fill, per_role_running_counts,
        rolling_stats, sessionize, turn_gaps)
    from mpower_feature_analysis_spark.operators.asof import asof_join
    from mpower_feature_analysis_spark.transcripts import (
        load_states, load_transcripts)

    def base():
        return load_transcripts(spark, sf_dir)

    def dd():
        return dedup_last_wins(base(), ["conv_id", "turn_idx"], ["ts"],
                               partition_by=["conv_id"])

    def asof():
        return asof_join(dd(), load_states(spark, sf_dir), payload=["label"])

    def gaps():
        return turn_gaps(asof())

    def roll():
        return rolling_stats(gaps(), "gap_ms", k=5, prefix="gap_roll")

    def counts():
        return per_role_running_counts(
            roll(), ["click", "error", "purchase", "signup", "view"])

    def ffill():
        return forward_fill(counts(), ["tool"], ["conv_id"], ["turn_idx", "ts"])

    def sess():
        return sessionize(ffill(), gap_s=3600.0)

    stages = {"scan+transcripts": base, "dedup": dd, "asof": asof,
              "gaps": gaps, "rolling": roll, "counts": counts,
              "ffill": ffill, "sessionize": sess}
    out = {}
    for name, thunk in stages.items():
        spark.sparkContext.setJobDescription(f"warm: {name}")
        _force(thunk())
        samples = []
        for r in range(repeats):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"stage[{r}]: {name}")
            t0 = time.time()
            _force(thunk())
            samples.append(round(time.time() - t0, 3))
        out[name] = round(statistics.median(samples), 3)
        print(json.dumps({"stage": name, "median": out[name],
                          "samples": samples}), flush=True)
    print(json.dumps({"metric": "flagship_stages", "sf_dir": sf_dir,
                      "cumulative_medians": out}))
    spark.stop()


def run_explain(sf_dir: str, out_dir: str, suffix: str,
                only: list[str] | None) -> None:
    spark = _spark()
    thunks = _thunks(spark, sf_dir)
    if only:
        thunks = {k: v for k, v in thunks.items() if k in only}
    os.makedirs(out_dir, exist_ok=True)
    for name, thunk in thunks.items():
        buf = io.StringIO()
        with redirect_stdout(buf):
            thunk().explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        txt = buf.getvalue()
        print(json.dumps({
            "query": name, "plan": path,
            "exchanges": txt.count("Exchange"),
            "sorts": txt.count("+- Sort") + txt.count("- Sort ["),
            "python_nodes": sum(txt.count(k) for k in (
                "BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                "FlatMapGroupsInPandas", "MapInArrow")),
        }), flush=True)
    spark.stop()


def _arg(flag: str, default=None):
    if flag in sys.argv:
        return sys.argv[sys.argv.index(flag) + 1]
    return default


if __name__ == "__main__":
    sf_dir = _arg("--sf", os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    repeats = int(_arg("--repeats", "3"))
    only = _arg("--only")
    only = only.split(",") if only else None
    if "--profile" in sys.argv:
        run_profile(sf_dir, repeats, only)
    elif "--stages" in sys.argv:
        run_stages(sf_dir, repeats)
    elif "--explain" in sys.argv:
        run_explain(sf_dir, _arg("--out", "plans/r07"),
                    _arg("--suffix", "before"), only)
    else:
        print("usage: bench_extra.py --profile|--stages|--explain "
              "[--sf DIR] [--repeats N] [--only a,b] [--out D] [--suffix S]")
