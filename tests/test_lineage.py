import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mpower_feature_analysis_spark.lineage import (
    checkpointed_write,
    load_manifest,
    read_checkpointed,
    verify_against_manifest,
)

SNAP = "snap-001"


@pytest.fixture()
def out_dir():
    d = tempfile.mkdtemp(prefix="lineage_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _collect_sorted(df):
    cols = [c for c in df.columns if c != "bucket"]
    return df.select(*cols).orderBy(*cols).collect()


def test_one_shot_write_and_manifest(spark, dedup_df, out_dir):
    summary = checkpointed_write(dedup_df, out_dir, SNAP, n_buckets=8)
    assert sorted(summary["written"] + summary["skipped"]) == list(range(8))
    m = load_manifest(out_dir)
    assert len(m["buckets"]) == 8
    assert sum(e["rows"] for e in m["buckets"].values()) == dedup_df.count()
    assert all(e["input_snapshot_id"] == SNAP for e in m["buckets"].values())
    assert all(v == "ok" for v in verify_against_manifest(spark, out_dir).values())


def test_resume_equals_one_shot(spark, dedup_df, out_dir):
    """FIXTURES.md §5 resume determinism: partial run + resume ≡ single run."""
    ref_dir = tempfile.mkdtemp(prefix="lineage_ref_")
    try:
        checkpointed_write(dedup_df, ref_dir, SNAP, n_buckets=8)
        # simulated kill: only 3 buckets complete, then resume
        s1 = checkpointed_write(dedup_df, out_dir, SNAP, n_buckets=8, max_buckets_per_call=3)
        assert len(s1["written"]) == 3
        s2 = checkpointed_write(dedup_df, out_dir, SNAP, n_buckets=8)
        assert set(s2["skipped"]) == set(s1["written"])
        a = _collect_sorted(read_checkpointed(spark, out_dir))
        b = _collect_sorted(read_checkpointed(spark, ref_dir))
        assert a == b
        ma, mb = load_manifest(out_dir), load_manifest(ref_dir)
        assert ma["buckets"] == mb["buckets"]  # identical checksums + counts
    finally:
        shutil.rmtree(ref_dir, ignore_errors=True)


def test_rerun_is_noop(spark, dedup_df, out_dir):
    checkpointed_write(dedup_df, out_dir, SNAP, n_buckets=4)
    again = checkpointed_write(dedup_df, out_dir, SNAP, n_buckets=4)
    assert again["written"] == []
    assert len(again["skipped"]) == 4


def test_new_snapshot_recomputes(spark, dedup_df, out_dir):
    checkpointed_write(dedup_df, out_dir, SNAP, n_buckets=4)
    changed = dedup_df.withColumn("role", F.lit("other"))
    s = checkpointed_write(changed, out_dir, "snap-002", n_buckets=4)
    assert len(s["written"]) == 4 and s["skipped"] == []
    m = load_manifest(out_dir)
    assert all(e["input_snapshot_id"] == "snap-002" for e in m["buckets"].values())
    assert all(v == "ok" for v in verify_against_manifest(spark, out_dir).values())


def test_corruption_detected(spark, dedup_df, out_dir):
    checkpointed_write(dedup_df, out_dir, SNAP, n_buckets=4)
    m = load_manifest(out_dir)
    victim = next(b for b, e in m["buckets"].items() if e["rows"] > 0)
    m["buckets"][victim]["checksum"] += 1
    import json, os
    with open(os.path.join(out_dir, "_lineage_manifest.json"), "w") as f:
        json.dump(m, f)
    report = verify_against_manifest(spark, out_dir)
    assert any(v.startswith("mismatch") for v in report.values())


def test_new_snapshot_clears_emptied_bucket(spark, dedup_df, out_dir):
    """A bucket that had rows under snapshot A but zero rows under snapshot B
    must not leak snapshot-A parquet into reads after B commits (dynamic
    partition overwrite alone never rewrites an untouched directory)."""
    checkpointed_write(dedup_df, out_dir, SNAP, n_buckets=4, key_col="conv_id")
    one_conv = dedup_df.limit(1).select("conv_id").collect()[0][0]
    shrunk = dedup_df.filter(F.col("conv_id") == one_conv)
    checkpointed_write(shrunk, out_dir, "snap-002", n_buckets=4, key_col="conv_id")
    got = read_checkpointed(spark, out_dir)
    assert got.count() == shrunk.count()
    assert all(v == "ok" for v in verify_against_manifest(spark, out_dir).values())
