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
