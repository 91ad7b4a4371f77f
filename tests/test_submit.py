"""North-star packaging claim as a test: the engine runs via
``spark-submit --py-files engine.zip`` from a DIRECTORY OUTSIDE the repo —
only the zip provides the package — and the checkpointed pipeline job
completes with a lineage summary. One subprocess JVM (~40 s), kept to a
single test."""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_runs_pipeline():
    if shutil.which("spark-submit") is None:
        pytest.skip("spark-submit not on PATH")
    work = tempfile.mkdtemp(prefix="submit_test_")
    try:
        zpath = os.path.join(work, "engine.zip")
        pkg = os.path.join(REPO, "mpower_feature_analysis_spark")
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        zf.write(full, os.path.relpath(full, REPO))
        out_dir = os.path.join(work, "out")
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        proc = subprocess.run(
            [
                "spark-submit", "--master", "local[4]",
                "--py-files", zpath,
                os.path.join(REPO, "jobs", "run_pipeline.py"),
                "/root/testdata/sf0.001/events.parquet",
                out_dir, "submit-test-snap", "4",
            ],
            capture_output=True, text=True, cwd=work, env=env, timeout=280,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        summary = json.loads(line)
        assert summary["status"] == "ok"
        assert summary["written"]  # buckets materialized
        assert os.path.exists(os.path.join(out_dir, "_lineage_manifest.json"))
        # idempotent re-submit: everything skips
        proc2 = subprocess.run(
            [
                "spark-submit", "--master", "local[4]",
                "--py-files", zpath,
                os.path.join(REPO, "jobs", "run_pipeline.py"),
                "/root/testdata/sf0.001/events.parquet",
                out_dir, "submit-test-snap", "4",
            ],
            capture_output=True, text=True, cwd=work, env=env, timeout=280,
        )
        assert proc2.returncode == 0, proc2.stderr[-2000:]
        line2 = [l for l in proc2.stdout.splitlines() if l.startswith("{")][-1]
        summary2 = json.loads(line2)
        assert summary2["written"] == []
        assert sorted(summary2["skipped"]) == sorted(
            summary["written"] + summary["skipped"]
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_spark_submit_presorted_two_phase():
    """Round-6 zero-exchange packaging claim: phase 1 stages the bucketed
    union layout, phase 2 runs the presorted flagship in a SEPARATE JVM —
    a true fresh-session catalog, so the bucket spec must round-trip
    through the _layout.json manifest (a bare LOCATION re-create would
    silently reintroduce exchanges)."""
    if shutil.which("spark-submit") is None:
        pytest.skip("spark-submit not on PATH")
    work = tempfile.mkdtemp(prefix="submit_presorted_")
    try:
        zpath = os.path.join(work, "engine.zip")
        pkg = os.path.join(REPO, "mpower_feature_analysis_spark")
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        zf.write(full, os.path.relpath(full, REPO))
        layout = os.path.join(work, "layout")
        out_dir = os.path.join(work, "out")
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}

        def submit(*args):
            return subprocess.run(
                ["spark-submit", "--master", "local[4]", "--py-files", zpath,
                 os.path.join(REPO, "jobs", "run_pipeline_presorted.py"),
                 *args],
                capture_output=True, text=True, cwd=work, env=env, timeout=280,
            )

        p1 = submit("stage", "/root/testdata/sf0.001/events.parquet", layout, "4")
        assert p1.returncode == 0, p1.stderr[-2000:]
        s1 = json.loads([l for l in p1.stdout.splitlines() if l.startswith("{")][-1])
        assert s1["status"] == "ok" and s1["phase"] == "stage"
        assert os.path.exists(os.path.join(layout, "_layout.json"))

        p2 = submit("run", layout, out_dir, "presorted-snap")
        assert p2.returncode == 0, p2.stderr[-2000:]
        s2 = json.loads([l for l in p2.stdout.splitlines() if l.startswith("{")][-1])
        assert s2["status"] == "ok" and s2["phase"] == "run"
        assert s2["written"]
        assert os.path.exists(os.path.join(out_dir, "_lineage_manifest.json"))
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_run_incremental_job_bootstrap_then_refresh():
    """jobs/run_incremental.py wiring end-to-end in one subprocess JVM:
    build a turns snapshot table, bootstrap the features table, append
    churn, refresh — the job must report refreshed=True and advance the
    source pin."""
    work = tempfile.mkdtemp(prefix="inc_job_test_")
    driver = os.path.join(work, "drive.py")
    with open(driver, "w") as f:
        f.write(f'''
import json, sys
sys.path.insert(0, {REPO!r})
from mpower_feature_analysis_spark.session import get_spark
from mpower_feature_analysis_spark.sources.snapshots import (
    commit_snapshot, snapshot_info)
from mpower_feature_analysis_spark.transcripts import load_transcripts
import jobs.run_incremental as job

t_dir = {work!r} + "/turns"
f_dir = {work!r} + "/feats"
spark = get_spark("local[4]", shuffle_partitions=8)
t = load_transcripts(spark, "/root/testdata/sf0.001")
commit_snapshot(t.coalesce(2), t_dir)

sys.argv = ["run_incremental.py", "bootstrap", t_dir, f_dir, "4"]
job.main()
sys.argv = ["run_incremental.py", "refresh", t_dir, f_dir]
job.main()  # no-op: turns unmoved

from pyspark.sql import functions as F
spark = get_spark("local[4]", shuffle_partitions=8)
churn = load_transcripts(spark, "/root/testdata/sf0.001").filter(
    "turn_idx = 0").withColumn("text", F.concat("text", F.lit(" v2"))
).withColumn("ts", F.expr("ts + INTERVAL 1 SECOND"))
commit_snapshot(churn.coalesce(1), t_dir, "append")
sys.argv = ["run_incremental.py", "refresh", t_dir, f_dir]
job.main()
print("PIN", snapshot_info(f_dir)["properties"]["source_snapshot_id"])
''')
    try:
        env = dict(os.environ)
        proc = subprocess.run(
            [sys.executable, driver],
            capture_output=True, text=True, cwd=work, env=env, timeout=400,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        lines = proc.stdout.splitlines()
        jsons = [json.loads(l) for l in lines if l.startswith("{")]
        assert jsons[0]["mode"] == "bootstrap"
        assert jsons[1] == {"status": "ok", "mode": "refresh",
                            "refreshed": False, "from_snapshot": 1,
                            "to_snapshot": 1, "features_snapshot": 1}
        assert jsons[2]["refreshed"] is True
        assert jsons[2]["to_snapshot"] == 2
        assert any(l.strip() == "PIN 2" for l in lines)
    finally:
        shutil.rmtree(work, ignore_errors=True)
