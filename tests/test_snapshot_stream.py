"""Structured Streaming CDC source over the snapshot log
(streaming/snapshot_source.py): a real spark.readStream source (PySpark
Python Data Source API) whose offsets are snapshot ids."""

from __future__ import annotations

import os

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


# ---------------------------------------------------------------------------
# Sink half: writeStream.format("snapshot_cdc") — every micro-batch is one
# append commit; exactly-once via the stream_batch_id property ledger.
# ---------------------------------------------------------------------------


def _mirror(spark, src, dst, ckpt):
    """CDC-mirror: stream table ``src``'s adds into snapshot table ``dst``."""
    q = (
        spark.readStream.format("snapshot_cdc")
        .option("path", src)
        .option("startingSnapshotId", 1)
        .load()
        .filter("change = 'add'")
        .drop("change", "_commit_snapshot_id")
        .writeStream.format("snapshot_cdc")
        .option("path", dst)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive


def test_stream_sink_mirrors_table_and_resumes(spark, tmp_path):
    from mpower_feature_analysis_spark.sources.snapshots import snapshot_ids

    register_snapshot_cdc(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ckpt = str(tmp_path / "ckpt")
    commit_snapshot(_df(spark, 0, 5), a)
    commit_snapshot(_df(spark, 5, 8), a, "append")

    _mirror(spark, a, b, ckpt)
    assert sorted(r.id for r in read_snapshot(spark, b).collect()) == list(
        range(8)
    )
    n_snaps = len(snapshot_ids(b))

    # re-run with the same checkpoint and NO new source commits: the
    # resumed reader offsets skip everything — the mirror must not grow
    _mirror(spark, a, b, ckpt)
    assert snapshot_ids(b) == snapshot_ids(b)[: len(snapshot_ids(b))]
    assert len(snapshot_ids(b)) == n_snaps
    assert read_snapshot(spark, b).count() == 8

    # new source commit, same checkpoint: exactly the delta lands
    commit_snapshot(_df(spark, 100, 102), a, "append")
    _mirror(spark, a, b, ckpt)
    assert sorted(r.id for r in read_snapshot(spark, b).collect()) == (
        list(range(8)) + [100, 101]
    )


def test_stream_sink_batch_replay_is_deduped(spark, tmp_path):
    """A micro-batch whose commit outcome was unknown gets replayed by
    Spark: committing the same batchId twice must append once."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mpower_feature_analysis_spark.sources.snapshots import snapshot_ids
    from mpower_feature_analysis_spark.streaming.snapshot_source import (
        SnapshotCommitStreamWriter, _WrittenFile)
    from pyspark.sql.types import StructType

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 3), t)
    schema = read_snapshot(spark, t).schema

    def staged(vals):
        import uuid

        d = os.path.join(t, "data", f"stream-test-{uuid.uuid4().hex}")
        os.makedirs(d)
        p = os.path.join(d, "part-0.parquet")
        pq.write_table(
            pa.table({"id": pa.array(vals, pa.int64()),
                      "grp": pa.array(["s"] * len(vals)),
                      "val": pa.array([0.0] * len(vals))}), p)
        return p

    w = SnapshotCommitStreamWriter(t, schema)
    w.commit([_WrittenFile([staged([10, 11])])], batchId=0)
    assert read_snapshot(spark, t).count() == 5
    # replay of batch 0 (fresh staged files, same id): no double append
    w.commit([_WrittenFile([staged([10, 11])])], batchId=0)
    assert read_snapshot(spark, t).count() == 5
    assert len(snapshot_ids(t)) == 2
    # next batch proceeds normally
    w.commit([_WrittenFile([staged([20])])], batchId=1)
    assert read_snapshot(spark, t).count() == 6


def test_stream_sink_schema_mismatch_raises(spark, tmp_path):
    from mpower_feature_analysis_spark.streaming.snapshot_source import (
        SnapshotCDCDataSource,
    )

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 3), t)
    from pyspark.sql.types import LongType, StructField, StructType

    bad = StructType([StructField("other", LongType())])
    with pytest.raises(ValueError, match="table schema"):
        SnapshotCDCDataSource({"path": t}).streamWriter(bad, overwrite=False)


def test_sink_ledger_survives_interleaved_plain_commit(spark, tmp_path):
    """Round-6 review finding: a plain append between a stream commit and
    its replay must not wipe the stream_batch_id ledger — the dedup scan
    walks history, not just the parent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mpower_feature_analysis_spark.streaming.snapshot_source import (
        SnapshotCommitStreamWriter, _WrittenFile)

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 3), t)

    def staged(vals):
        import uuid

        d = os.path.join(t, "data", f"stream-test-{uuid.uuid4().hex}")
        os.makedirs(d)
        p = os.path.join(d, "part-0.parquet")
        pq.write_table(
            pa.table({"id": pa.array(vals, pa.int64()),
                      "grp": pa.array(["s"] * len(vals)),
                      "val": pa.array([0.0] * len(vals))}), p)
        return p

    w = SnapshotCommitStreamWriter(t, read_snapshot(spark, t).schema)
    w.commit([_WrittenFile([staged([10])])], batchId=3)
    commit_snapshot(_df(spark, 50, 51), t, "append")  # no properties
    # replay of batch 3 after the interleaved commit: still deduped
    w.commit([_WrittenFile([staged([10])])], batchId=3)
    assert sorted(r.id for r in read_snapshot(spark, t).collect()) == [
        0, 1, 2, 10, 50]


def test_stream_fails_explicitly_on_expired_offsets(spark, tmp_path):
    from mpower_feature_analysis_spark.sources.snapshots import (
        expire_snapshots,
    )

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 2), t)
    commit_snapshot(_df(spark, 2, 4), t, "append")
    commit_snapshot(_df(spark, 4, 6), t, "append")
    expire_snapshots(t, keep_last=1)
    r = SnapshotCDCStreamReader(t, start_sid=1)
    with pytest.raises(ValueError, match="expired"):
        r.partitions({"snapshot_id": 0}, {"snapshot_id": 3})
    # a surviving snapshot whose PARENT was expired is equally unreadable
    with pytest.raises(ValueError, match="expired"):
        r.partitions({"snapshot_id": 2}, {"snapshot_id": 3})


def test_sink_ledger_survives_snapshot_expiry(spark, tmp_path):
    """Round-6 review finding: expire_snapshots can remove every manifest
    carrying stream_batch_id; the sidecar ledger must still dedup a
    replayed micro-batch."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mpower_feature_analysis_spark.sources.snapshots import (
        expire_snapshots, snapshot_ids)
    from mpower_feature_analysis_spark.streaming.snapshot_source import (
        SnapshotCommitStreamWriter, _WrittenFile)

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 3), t)

    def staged(vals):
        d = os.path.join(t, "data", f"stream-test-{uuid.uuid4().hex}")
        os.makedirs(d)
        p = os.path.join(d, "part-0.parquet")
        pq.write_table(
            pa.table({"id": pa.array(vals, pa.int64()),
                      "grp": pa.array(["s"] * len(vals)),
                      "val": pa.array([0.0] * len(vals))}), p)
        return p

    w = SnapshotCommitStreamWriter(t, read_snapshot(spark, t).schema)
    w.commit([_WrittenFile([staged([10])])], batchId=5)
    commit_snapshot(_df(spark, 50, 51), t, "append")  # no BATCH_KEY
    expire_snapshots(t, keep_last=1)  # every keyed manifest gone
    w.commit([_WrittenFile([staged([10])])], batchId=5)  # replay
    assert sorted(r.id for r in read_snapshot(spark, t).collect()) == [
        0, 1, 2, 10, 50]
    assert len(snapshot_ids(t)) == 1  # replay committed nothing


def test_stream_tolerates_expired_parent_of_maintenance_commit(
    spark, tmp_path
):
    from mpower_feature_analysis_spark.sources.snapshots import (
        expire_snapshots,
    )

    t = str(tmp_path / "tbl")
    commit_snapshot(_df(spark, 0, 10).repartition(3), t)
    commit_snapshot(_df(spark, 10, 20).repartition(3), t, "append")
    sid = compact_snapshot(spark, t)
    assert sid == 3
    expire_snapshots(t, keep_last=1)  # only the compact survives
    r = SnapshotCDCStreamReader(t, start_sid=3)
    # compact emits nothing and needs no parent diff: empty, not fatal
    assert r.partitions({"snapshot_id": 2}, {"snapshot_id": 3}) == []


def test_stream_round_trips_ntz_timestamps(spark, tmp_path):
    """The executor-side pyarrow read must deliver TIMESTAMP_NTZ (the
    engine's canonical ts type, utils.ts_ms contract) bit-exactly through
    the arrow cast path."""
    register_snapshot_cdc(spark)
    t = str(tmp_path / "tbl")
    df = spark.range(5).select(
        F.col("id"),
        F.to_timestamp_ntz(
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 61)
        ).alias("ts"),
    ).coalesce(1)
    commit_snapshot(df, t)
    out = _run_available_now(spark, t, "cdc_ntz", start=1)
    got = {(r.id, r.ts) for r in out.collect()}
    want = {(r.id, r.ts) for r in read_snapshot(spark, t).collect()}
    assert got == want and len(got) == 5
