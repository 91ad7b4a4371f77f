"""Structured Streaming source over the snapshot-log table format.

The Delta-CDF / Iceberg-incremental-read analog for
:mod:`mpower_feature_analysis_spark.sources.snapshots`, built on PySpark
4's Python Data Source API (``pyspark.sql.datasource``) — a genuine
``spark.readStream`` source, not a polling helper::

    register_snapshot_cdc(spark)
    df = (spark.readStream.format("snapshot_cdc")
          .option("path", table_dir)
          .option("startingSnapshotId", 1)   # optional: replay history
          .load())

Each micro-batch covers the snapshots committed since the stream's last
offset; offsets are snapshot ids (``{"snapshot_id": N}`` = everything
through N consumed), checkpointable and replayable like any streaming
source.  Per consumed snapshot the stream emits the table's columns
(under the CURRENT table schema — older files null-fill evolved columns)
plus two leading metadata columns::

    change               'add' | 'remove'
    _commit_snapshot_id  the snapshot that introduced the change

Semantics — a STATE-TRANSITION stream, exact by construction:

* ``append`` commits emit their added files' rows as ``add`` — exactly
  the row changelog.
* ``overwrite`` / ``overwrite_where`` / ``merge`` commits emit the
  file-level diff: every removed file's rows as ``remove``, every added
  file's rows as ``add``.  Applying removes-then-adds transitions
  snapshot N-1's content to snapshot N's content EXACTLY (multiset
  algebra on immutable files); unlike the batch
  :func:`..sources.snapshots.row_changelog`, rows that a rewrite merely
  carried from an old file to a new one appear as a self-cancelling
  remove+add pair rather than being multiset-cancelled — cross-file
  ``exceptAll`` needs a shuffle the source's per-file partitions don't
  have, and any consumer that folds the stream by key or applies it as a
  transition is unaffected.
* ``compact`` / ``cluster`` maintenance commits are provably
  content-identical (tested invariant: empty ``row_changelog``) and emit
  NOTHING — a compaction never floods downstream consumers.

Scale: offset resolution and partition planning are metadata-only
(manifest JSON, zero Spark jobs); one ``InputPartition`` per changed
file, so a micro-batch's parallelism equals its churn's file count and
executors read parquet directly via pyarrow — the stream never scans the
table, only the files each commit touched.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StringType, StructField, StructType

from ..sources.snapshots import (
    _load_manifest,
    snapshot_ids,
)

#: maintenance operations are content-identical rewrites: never streamed
_SKIPPED_OPS = frozenset({"compact", "cluster"})


@dataclass
class _FilePartition(InputPartition):
    change: str          # 'add' | 'remove'
    path: str            # absolute parquet path
    snapshot_id: int


def _changed_entries(table_dir: str, sid: int) -> tuple[list[dict], list[dict]]:
    """(removed, added) manifest entries for commit ``sid`` vs its parent —
    pure manifest JSON, no data touched."""
    m = _load_manifest(table_dir, sid)
    if m["parent"] is None:
        return [], list(m["files"])
    pm = _load_manifest(table_dir, m["parent"])
    ap = {e["path"]: e for e in pm["files"]}
    bp = {e["path"]: e for e in m["files"]}
    removed = [ap[p] for p in sorted(set(ap) - set(bp))]
    added = [bp[p] for p in sorted(set(bp) - set(ap))]
    return removed, added


class SnapshotCDCStreamReader(DataSourceStreamReader):
    def __init__(self, table_dir: str, start_sid: int | None,
                 schema_json: str | None = None):
        self._dir = table_dir
        # the stream's FIXED planning schema (standard streaming
        # contract): files from pre-evolution commits null-fill missing
        # columns, files from post-stream-start evolution drop extras
        self._schema_json = schema_json or _load_manifest(table_dir, None)["schema"]
        ids = snapshot_ids(table_dir)
        if start_sid is not None:
            self._initial = int(start_sid) - 1
        else:
            # default: tail the table — only commits AFTER stream start
            self._initial = ids[-1] if ids else 0

    def initialOffset(self) -> dict:
        return {"snapshot_id": self._initial}

    def latestOffset(self) -> dict:
        ids = snapshot_ids(self._dir)
        return {"snapshot_id": ids[-1] if ids else self._initial}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["snapshot_id"]), int(end["snapshot_id"])
        out: list[InputPartition] = []
        for sid in snapshot_ids(self._dir):
            if not lo < sid <= hi:
                continue
            m = _load_manifest(self._dir, sid)
            if m["operation"] in _SKIPPED_OPS:
                continue
            removed, added = _changed_entries(self._dir, sid)
            root = os.path.abspath(self._dir)
            for change, entries in (("remove", removed), ("add", added)):
                for e in entries:
                    out.append(
                        _FilePartition(
                            change=change,
                            path=os.path.join(root, e["path"]),
                            snapshot_id=sid,
                        )
                    )
        return out

    def read(self, partition: _FilePartition):
        """Executor-side: stream one changed file as Arrow batches, cast to
        the table schema (older files null-fill evolved columns), with the
        change metadata columns prepended."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        spark_schema = StructType.fromJson(json.loads(self._schema_json))
        arrow_schema = to_arrow_schema(spark_schema)
        tbl = pq.read_table(partition.path)
        n = tbl.num_rows
        cols = []
        for field in arrow_schema:
            if field.name in tbl.column_names:
                cols.append(tbl.column(field.name).cast(field.type))
            else:
                cols.append(pa.nulls(n, type=field.type))
        out = pa.table(
            [
                pa.array([partition.change] * n, type=pa.string()),
                pa.array([partition.snapshot_id] * n, type=pa.int64()),
                *cols,
            ],
            names=["change", "_commit_snapshot_id"]
            + [f.name for f in arrow_schema],
        )
        yield from out.to_batches(max_chunksize=65536)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream checkpoint; nothing to clean


class SnapshotCDCDataSource(DataSource):
    """``spark.readStream.format("snapshot_cdc")`` — see module docstring.

    Options: ``path`` (required, the snapshot table directory),
    ``startingSnapshotId`` (optional; first snapshot id to INCLUDE —
    default tails the table from the current snapshot)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_cdc"

    def _table_dir(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("snapshot_cdc requires .option('path', table_dir)")
        return path

    def schema(self) -> StructType:
        m = _load_manifest(self._table_dir(), None)
        table_schema = StructType.fromJson(json.loads(m["schema"]))
        from pyspark.sql.types import LongType

        return StructType(
            [
                StructField("change", StringType(), False),
                StructField("_commit_snapshot_id", LongType(), False),
                *table_schema.fields,
            ]
        )

    def streamReader(self, schema: StructType) -> SnapshotCDCStreamReader:
        start = self.options.get("startingsnapshotid")
        # strip the two metadata columns the source itself prepends; the
        # remainder is the table schema the stream was planned with
        table_schema = StructType(schema.fields[2:])
        return SnapshotCDCStreamReader(
            self._table_dir(),
            int(start) if start is not None else None,
            schema_json=table_schema.json(),
        )


def register_snapshot_cdc(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(SnapshotCDCDataSource)
