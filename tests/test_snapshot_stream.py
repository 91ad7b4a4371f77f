"""Structured Streaming CDC source over the snapshot log
(streaming/snapshot_source.py): a real spark.readStream source (PySpark
Python Data Source API) whose offsets are snapshot ids."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mpower_feature_analysis_spark.sources.snapshots import (
    commit_snapshot,
    compact_snapshot,
    merge_into,
    read_snapshot,
)
from mpower_feature_analysis_spark.streaming.snapshot_source import (
    SnapshotCDCStreamReader,
    register_snapshot_cdc,
)

SCHEMA = "id bigint, grp string, val double"


def _df(spark, lo, hi, grp="a", files=1):
    rows = [(i, grp, float(i)) for i in range(lo, hi)]
    return spark.createDataFrame(rows, schema=SCHEMA).coalesce(files)


def _run_available_now(spark, table_dir, name, start=None):
    reader = spark.readStream.format("snapshot_cdc").option("path", table_dir)
    if start is not None:
        reader = reader.option("startingSnapshotId", start)
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    return spark.sql(f"select * from {name}")


def test_stream_replays_history(spark, tmp_path):
    register_snapshot_cdc(spark)
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 5), t)
    commit_snapshot(_df(spark, 5, 9), t, "append")

    out = _run_available_now(spark, t, "cdc_hist", start=1)
    rows = out.collect()
    assert {r.change for r in rows} == {"add"}
    assert sorted(r.id for r in rows) == list(range(9))
    by_sid = {r.id: r._commit_snapshot_id for r in rows}
    assert by_sid[0] == 1 and by_sid[8] == 2


def test_stream_default_tails_from_current(spark, tmp_path):
    register_snapshot_cdc(spark)
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 5), t)
    out = _run_available_now(spark, t, "cdc_tail")  # no startingSnapshotId
    assert out.count() == 0  # past commits are not replayed by default


def test_stream_is_exact_state_transition_across_merge(spark, tmp_path):
    """remove-then-add of a rewrite commit's file diff must transition
    snapshot N-1's content exactly to snapshot N's (multiset algebra)."""
    import pandas as pd

    register_snapshot_cdc(spark)
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 10, files=2), t)
    src = spark.createDataFrame([(3, "z", -3.0), (42, "z", 42.0)], SCHEMA)
    merge_into(spark, t, src, ["id"])

    out = _run_available_now(spark, t, "cdc_merge", start=2).toPandas()
    assert set(out["change"]) == {"remove", "add"}

    def key(pdf):
        return (
            pdf[["id", "grp", "val"]]
            .sort_values(["id", "grp", "val"])
            .reset_index(drop=True)
        )

    before = read_snapshot(spark, t, as_of=1).toPandas()
    after = read_snapshot(spark, t, as_of=2).toPandas()
    removed = out[out["change"] == "remove"]
    added = out[out["change"] == "add"]
    # before - removed + added == after, as multisets
    merged = pd.concat(
        [before.merge(removed[["id"]], on="id", how="left", indicator=True)
         .query("_merge == 'left_only'")[["id", "grp", "val"]],
         added[["id", "grp", "val"]]],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(key(merged), key(after))


def test_maintenance_commits_emit_nothing(spark, tmp_path):
    register_snapshot_cdc(spark)
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 20).repartition(4), t)
    commit_snapshot(_df(spark, 20, 40).repartition(4), t, "append")
    sid = compact_snapshot(spark, t)
    assert sid == 3
    out = _run_available_now(spark, t, "cdc_compact", start=3)
    assert out.count() == 0


def test_stream_null_fills_evolved_columns(spark, tmp_path):
    register_snapshot_cdc(spark)
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 3), t)
    evolved = spark.createDataFrame(
        [(10, "b", 1.0, "x")], schema=SCHEMA + ", extra string"
    ).coalesce(1)
    commit_snapshot(evolved, t, "append")
    out = _run_available_now(spark, t, "cdc_evolved", start=1).toPandas()
    assert "extra" in out.columns
    assert out.loc[out["id"] == 10, "extra"].iloc[0] == "x"
    assert out.loc[out["id"] == 0, "extra"].isna().all()


def test_reader_offsets_and_partitions_are_metadata_only(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 4, files=2), t)
    commit_snapshot(_df(spark, 4, 6), t, "append")
    r = SnapshotCDCStreamReader(t, start_sid=1)
    assert r.initialOffset() == {"snapshot_id": 0}
    assert r.latestOffset() == {"snapshot_id": 2}
    parts = r.partitions({"snapshot_id": 0}, {"snapshot_id": 2})
    assert {(p.change, p.snapshot_id) for p in parts} == {
        ("add", 1), ("add", 2)}
    assert len([p for p in parts if p.snapshot_id == 1]) == 2  # 2 files
    # executor path: read one partition directly
    batches = list(r.read(next(p for p in parts if p.snapshot_id == 2)))
    got = [tuple(row) for b in batches for row in zip(
        *[c.to_pylist() for c in b.columns])]
    assert sorted(got) == [("add", 2, 4, "a", 4.0), ("add", 2, 5, "a", 5.0)]
    # tail default: initial offset == current id
    assert SnapshotCDCStreamReader(t, None).initialOffset() == {
        "snapshot_id": 2}


def test_stream_requires_path_option(spark):
    from mpower_feature_analysis_spark.streaming.snapshot_source import (
        SnapshotCDCDataSource,
    )

    with pytest.raises(ValueError, match="path"):
        SnapshotCDCDataSource({}).schema()
