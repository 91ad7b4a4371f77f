"""Snapshot-log table format: Iceberg-style versioned tables over parquet.

The north rule reads "over Iceberg tables"; the Iceberg runtime jar is not
in this sandbox, so this module implements the three Iceberg properties the
engine actually leans on, from scratch, over plain parquet data files:

* **snapshot isolation** — a reader resolves ONE manifest (an immutable
  JSON file listing immutable data files) and is unaffected by any commit
  that happens after; writers never mutate a data file in place.
* **time travel** — ``read_snapshot(spark, dir, as_of=N)`` plans the scan
  from manifest N's file list; every historical snapshot stays readable
  until explicitly expired.
* **copy-on-write overwrite** — ``overwrite_where`` rewrites ONLY the data
  files that contain matching rows (found with one metadata-cheap
  ``input_file_name()`` aggregation, the analog of Iceberg's manifest-level
  file pruning); untouched files are carried into the new snapshot by
  reference, zero bytes copied.

Layout under ``table_dir``::

    data/s00001/part-*.parquet      one immutable directory per commit
    metadata/v1.json, v2.json ...   one immutable manifest per snapshot
    metadata/current                atomic pointer (os.replace) to latest N

Manifests record per-file row counts read from the parquet FOOTER
(pyarrow metadata, no data scanned — the same statistic Iceberg manifests
carry), the committed schema (so an empty snapshot still reads with the
right types), and the parent snapshot id (the commit log).

Concurrency contract: single writer per table (the reference pipeline's
model — one R session owns a Synapse table version,
utils/helper_utils.R:79-85); the ``os.replace`` pointer swap is atomic, so
any number of concurrent READERS always resolve a complete snapshot. A
multi-writer catalog would swap the pointer compare-and-set style; that
seam is isolated in :func:`_swap_pointer`.

Scale notes (100 TB): planning is O(files) driver-side JSON, like Iceberg
manifest lists; reads hand Spark an explicit file list, so partition
pruning, predicate pushdown and column pruning all still reach the parquet
scan (asserted in tests/test_snapshots.py); ``row_changelog`` diffs ONLY
the files that changed between two snapshots — retained files contribute
identical row multisets to both sides and are excluded from the
``exceptAll`` before any data is read, so CDC cost is proportional to the
changed data, never the table size.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = [
    "commit_snapshot",
    "read_snapshot",
    "overwrite_where",
    "merge_into",
    "compact_snapshot",
    "snapshot_ids",
    "snapshot_info",
    "file_changelog",
    "row_changelog",
    "expire_snapshots",
]


def _meta_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "metadata")


def _manifest_path(table_dir: str, snapshot_id: int) -> str:
    return os.path.join(_meta_dir(table_dir), f"v{snapshot_id}.json")


def _current_id(table_dir: str) -> int | None:
    ptr = os.path.join(_meta_dir(table_dir), "current")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip())


def _swap_pointer(table_dir: str, snapshot_id: int) -> None:
    """Atomic commit: readers see either the old or the new snapshot id,
    never a torn write.  A shared catalog would CAS here instead."""
    ptr = os.path.join(_meta_dir(table_dir), "current")
    tmp = ptr + f".tmp.{snapshot_id}"
    with open(tmp, "w") as f:
        f.write(str(snapshot_id))
    os.replace(tmp, ptr)


def _load_manifest(table_dir: str, snapshot_id: int | None) -> dict:
    if snapshot_id is None:
        snapshot_id = _current_id(table_dir)
        if snapshot_id is None:
            raise FileNotFoundError(f"no snapshot committed under {table_dir}")
    path = _manifest_path(table_dir, snapshot_id)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"snapshot {snapshot_id} not found (expired or never committed)"
        )
    with open(path) as f:
        return json.load(f)


def _norm_path(p: str) -> str:
    """``input_file_name()`` URIs and manifest paths to one form."""
    if p.startswith("file:"):
        p = p[5:]
        while p.startswith("//"):
            p = p[1:]
    return os.path.abspath(p)


def _list_parquet(commit_dir: str) -> list[str]:
    return sorted(
        os.path.join(commit_dir, e)
        for e in os.listdir(commit_dir)
        if e.endswith(".parquet")
    )


def _footer_rows(path: str) -> int:
    """Row count from the parquet footer — no data pages read (the same
    trick functions/similarity.py:75 uses for 'auto' index sizing)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def _file_entries(paths: list[str], table_dir: str) -> list[dict]:
    root = os.path.abspath(table_dir)
    return [
        {"path": os.path.relpath(p, root), "rows": _footer_rows(p)}
        for p in paths
    ]


def _abs_files(table_dir: str, manifest: dict) -> list[str]:
    root = os.path.abspath(table_dir)
    return [os.path.join(root, e["path"]) for e in manifest["files"]]


def _write_commit(
    df: DataFrame, table_dir: str, snapshot_id: int, sub: str = ""
) -> list[str]:
    """Write ``df`` into this commit's immutable data directory and return
    the new file paths.  A commit that fails AFTER this write but before
    the pointer swap leaves an orphan directory no manifest references —
    invisible to every reader (the Iceberg failure mode); the retry picks
    a fresh suffix rather than erroring on the leftover."""
    base = os.path.join(table_dir, "data", f"s{snapshot_id:05d}" + sub)
    d, i = base, 0
    while os.path.exists(d):
        i += 1
        d = f"{base}-r{i}"
    df.write.mode("error").parquet(d)
    return _list_parquet(d)


def _commit(
    table_dir: str,
    operation: str,
    schema_json: str,
    files: list[dict],
    parent: int | None,
    properties: dict | None = None,
) -> int:
    os.makedirs(_meta_dir(table_dir), exist_ok=True)
    snapshot_id = (parent or 0) + 1
    manifest = {
        "snapshot_id": snapshot_id,
        "parent": parent,
        "operation": operation,
        "schema": schema_json,
        "files": files,
        "total_rows": sum(e["rows"] for e in files),
        # snapshot summary properties (Iceberg's snapshot `summary` map):
        # small JSON-able facts a pipeline wants to pin to a commit, e.g.
        # the source-table snapshot id a derived table was computed from
        # (plans/incremental.py keys its CDC refresh on exactly that)
        "properties": dict(properties or {}),
    }
    path = _manifest_path(table_dir, snapshot_id)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    _swap_pointer(table_dir, snapshot_id)
    return snapshot_id


def commit_snapshot(
    df: DataFrame,
    table_dir: str,
    operation: str = "append",
    properties: dict | None = None,
) -> int:
    """Commit ``df`` as a new snapshot and return its id.

    ``operation='append'`` carries the parent snapshot's files forward by
    reference and adds the new ones; ``'overwrite'`` starts the file list
    from scratch (full-table replace — the snapshot-log version of
    ``write.mode('overwrite')``, except every older snapshot stays
    readable).  First commit on an empty dir creates the table.
    """
    if operation not in ("append", "overwrite"):
        raise ValueError(f"unknown operation {operation!r}")
    parent = _current_id(table_dir)
    prior: list[dict] = []
    schema_json = df.schema.json()
    if parent is not None and operation == "append":
        pm = _load_manifest(table_dir, parent)
        # the snapshot scan reads all commits' files under ONE schema
        # (the manifest's), so an append must either match the parent
        # schema by (name, type) or EVOLVE it by appending fields: the
        # parquet reader null-fills columns absent from older files, so
        # pre-evolution rows read back with NULL in the added columns
        # (added fields are therefore stored nullable — Iceberg's
        # added-columns-are-optional rule) while time travel to an older
        # snapshot keeps the older schema; no file is rewritten
        old_f = json.loads(pm["schema"])["fields"]
        new_f = json.loads(df.schema.json())["fields"]

        def _nt(fs):
            return [(f["name"], f["type"]) for f in fs]

        if len(new_f) < len(old_f) or _nt(new_f)[: len(old_f)] != _nt(old_f):
            raise ValueError(
                "append schema mismatch vs parent snapshot (evolution may "
                "only APPEND fields; existing names/types must match)"
            )
        schema_json = json.dumps(
            {
                "type": "struct",
                "fields": old_f
                + [{**f, "nullable": True} for f in new_f[len(old_f):]],
            }
        )
        prior = pm["files"]
    sid = (parent or 0) + 1
    new = _write_commit(df, table_dir, sid)
    return _commit(
        table_dir,
        operation,
        schema_json,
        prior + _file_entries(new, table_dir),
        parent,
        properties,
    )


def read_snapshot(
    spark: SparkSession, table_dir: str, as_of: int | None = None
) -> DataFrame:
    """Scan one snapshot (default: current).  The explicit file list is a
    plain parquet file-source relation, so pushdown/pruning behave exactly
    as a directory scan; an empty snapshot reads as an empty frame with
    the committed schema."""
    m = _load_manifest(table_dir, as_of)
    files = _abs_files(table_dir, m)
    schema = StructType.fromJson(json.loads(m["schema"]))
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)


def overwrite_where(
    spark: SparkSession,
    table_dir: str,
    condition: str,
    replacement: DataFrame | None = None,
) -> int:
    """Copy-on-write ``DELETE WHERE condition`` + optional insert of
    ``replacement`` rows, as one atomic snapshot.  Only data files that
    actually contain a matching row are rewritten (without their matching
    rows); all other files move to the new snapshot by reference.  Returns
    the new snapshot id."""
    parent = _current_id(table_dir)
    if parent is None:
        raise FileNotFoundError(f"no snapshot committed under {table_dir}")
    m = _load_manifest(table_dir, parent)
    files = _abs_files(table_dir, m)
    schema = StructType.fromJson(json.loads(m["schema"]))
    sid = parent + 1

    entries: list[dict] = []
    if files:
        scan = spark.read.schema(schema).parquet(*files)
        # Iceberg-manifest analog: one aggregation finds the file set that
        # must be rewritten; collect is O(matching files), metadata-scale.
        hit = {
            _norm_path(r[0])
            for r in scan.filter(condition)
            .select(F.input_file_name())
            .distinct()
            .collect()
        }
        keep_abs = [f for f in files if _norm_path(f) not in hit]
        rewrite_abs = [f for f in files if _norm_path(f) in hit]
        root = os.path.abspath(table_dir)
        entries += [
            e for e in m["files"]
            if os.path.join(root, e["path"]) in keep_abs
        ]
        if rewrite_abs:
            # DELETE-WHERE semantics: drop rows where the predicate is
            # TRUE; rows where it evaluates NULL are kept (a bare
            # ``~condition`` would drop them too)
            kept_rows = (
                spark.read.schema(schema)
                .parquet(*rewrite_abs)
                .filter(~F.coalesce(F.expr(condition), F.lit(False)))
            )
            entries += _file_entries(
                _write_commit(kept_rows, table_dir, sid, sub="-rw"), table_dir
            )
    if replacement is not None:
        if [f.name for f in replacement.schema.fields] != schema.fieldNames():
            raise ValueError("replacement schema mismatch vs table")
        entries += _file_entries(
            _write_commit(replacement, table_dir, sid, sub="-add"), table_dir
        )
    return _commit(table_dir, "overwrite_where", m["schema"], entries, parent)


def merge_into(
    spark: SparkSession,
    table_dir: str,
    source: DataFrame,
    key_cols: list[str],
    properties: dict | None = None,
) -> int:
    """Keyed copy-on-write upsert: one atomic snapshot that DELETEs every
    target row whose ``key_cols`` tuple appears in ``source`` and INSERTs
    all ``source`` rows.

    For a source with unique keys this is exactly ``MERGE INTO ... WHEN
    MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``; with
    several source rows per key it is the replace-by-key form (swap a
    whole conversation's feature rows in one commit — what
    ``plans/incremental.py`` does after a CDC-scoped recompute).

    Copy-on-write file scope, like :func:`overwrite_where`: ONE left-semi
    aggregation over ``input_file_name()`` finds the files that contain a
    matching key; only those are rewritten (minus their matched rows),
    every other file carries into the new snapshot by reference. NULL keys
    never equi-match: a NULL-key target row is always kept, a NULL-key
    source row is always inserted.

    Scale: the semi-join shuffles on ``key_cols`` and Catalyst/AQE picks
    the build side (a small churn key set broadcasts); rewrite volume is
    O(files containing matched keys), never O(table). Returns the new
    snapshot id.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    parent = _current_id(table_dir)
    if parent is None:
        raise FileNotFoundError(f"no snapshot committed under {table_dir}")
    m = _load_manifest(table_dir, parent)
    schema = StructType.fromJson(json.loads(m["schema"]))
    if [f.name for f in source.schema.fields] != schema.fieldNames():
        raise ValueError("source schema mismatch vs table")
    missing = [k for k in key_cols if k not in schema.fieldNames()]
    if missing:
        raise ValueError(f"key columns not in table schema: {missing}")
    files = _abs_files(table_dir, m)
    sid = parent + 1

    entries: list[dict] = []
    if files:
        keys = source.select(*key_cols).distinct()
        # tag the file BEFORE the join: input_file_name() is per-scan and
        # cannot resolve once a second file source joins the plan
        scan = spark.read.schema(schema).parquet(*files).withColumn(
            "__file", F.input_file_name()
        )
        hit = {
            _norm_path(r[0])
            for r in scan.join(keys, key_cols, "left_semi")
            .select("__file")
            .distinct()
            .collect()
        }
        root = os.path.abspath(table_dir)
        entries += [
            e for e in m["files"]
            if _norm_path(os.path.join(root, e["path"])) not in hit
        ]
        rewrite_abs = [f for f in files if _norm_path(f) in hit]
        if rewrite_abs:
            kept_rows = (
                spark.read.schema(schema)
                .parquet(*rewrite_abs)
                .join(keys, key_cols, "left_anti")
            )
            entries += _file_entries(
                _write_commit(kept_rows, table_dir, sid, sub="-rw"), table_dir
            )
    entries += _file_entries(
        _write_commit(
            source.select(*schema.fieldNames()), table_dir, sid, sub="-add"
        ),
        table_dir,
    )
    return _commit(table_dir, "merge", m["schema"], entries, parent, properties)


def compact_snapshot(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    small_file_bytes: int | None = None,
) -> int:
    """Bin-pack small data files into ~``target_file_bytes`` files as a new
    snapshot with IDENTICAL logical content (Iceberg's ``rewriteDataFiles``).

    Every file smaller than ``small_file_bytes`` (default: the target) is
    read back and re-written as ``ceil(total_small_bytes / target)`` files
    via ``coalesce`` — partition merging only, NO shuffle, no row moves
    across executors beyond concatenation. Files already at or above the
    threshold carry into the new snapshot by reference. A no-op (fewer
    than two small files) returns the current id without committing.

    The invariant tests pin: ``row_changelog(pre, post)`` is EMPTY — the
    rewritten rows cancel under ``exceptAll`` — and time travel to the
    pre-compaction snapshot still reads the original small files. At
    100 TB this is the maintenance job that keeps scan task counts sane
    after many small streaming/CDC commits.
    """
    parent = _current_id(table_dir)
    if parent is None:
        raise FileNotFoundError(f"no snapshot committed under {table_dir}")
    threshold = small_file_bytes or target_file_bytes
    m = _load_manifest(table_dir, parent)
    schema = StructType.fromJson(json.loads(m["schema"]))
    root = os.path.abspath(table_dir)
    small_abs, small_rel = [], set()
    for e in m["files"]:
        p = os.path.join(root, e["path"])
        if os.path.getsize(p) < threshold:
            small_abs.append(p)
            small_rel.add(e["path"])
    if len(small_abs) < 2:
        return parent
    total = sum(os.path.getsize(p) for p in small_abs)
    n_out = max(1, -(-total // target_file_bytes))
    sid = parent + 1
    packed = spark.read.schema(schema).parquet(*small_abs).coalesce(int(n_out))
    entries = [e for e in m["files"] if e["path"] not in small_rel]
    entries += _file_entries(
        _write_commit(packed, table_dir, sid, sub="-compact"), table_dir
    )
    return _commit(table_dir, "compact", m["schema"], entries, parent)


def snapshot_ids(table_dir: str) -> list[int]:
    """Committed snapshot ids, oldest first (expired ones excluded)."""
    md = _meta_dir(table_dir)
    if not os.path.isdir(md):
        return []
    return sorted(
        int(e[1:-5])
        for e in os.listdir(md)
        if e.startswith("v") and e.endswith(".json")
    )


def snapshot_info(table_dir: str, snapshot_id: int | None = None) -> dict:
    """Manifest metadata (operation, parent, file count, total rows)."""
    m = _load_manifest(table_dir, snapshot_id)
    return {
        "snapshot_id": m["snapshot_id"],
        "parent": m["parent"],
        "operation": m["operation"],
        "n_files": len(m["files"]),
        "total_rows": m["total_rows"],
        "properties": m.get("properties", {}),
    }


def _changed_files(
    table_dir: str, from_id: int, to_id: int
) -> tuple[list[dict], list[dict]]:
    a = _load_manifest(table_dir, from_id)
    b = _load_manifest(table_dir, to_id)
    ap = {e["path"]: e for e in a["files"]}
    bp = {e["path"]: e for e in b["files"]}
    removed = [ap[p] for p in sorted(set(ap) - set(bp))]
    added = [bp[p] for p in sorted(set(bp) - set(ap))]
    return removed, added


def file_changelog(table_dir: str, from_id: int, to_id: int) -> list[dict]:
    """Metadata-only CDC: per data file added/removed between two
    snapshots, with footer row counts.  Zero Spark jobs."""
    removed, added = _changed_files(table_dir, from_id, to_id)
    return [{"change": "remove", **e} for e in removed] + [
        {"change": "add", **e} for e in added
    ]


def row_changelog(
    spark: SparkSession, table_dir: str, from_id: int, to_id: int
) -> DataFrame:
    """Row-level CDC between two snapshots: the table's columns plus a
    ``change`` column ('add' rows appear in ``to`` only, 'remove' rows in
    ``from`` only — multiset semantics via ``exceptAll``).

    Files present in BOTH manifests contribute identical row multisets to
    both sides and cancel, so they are excluded before any data is read —
    the diff scans only the changed files, which is what makes CDC viable
    on a 100 TB table with a 0.1% daily churn.

    Both sides read under the NEWER snapshot's schema (schemas only grow
    via append-column evolution): older files null-fill added columns, so
    the changelog carries the evolved columns instead of silently
    projecting them away."""
    m = _load_manifest(table_dir, max(from_id, to_id))
    schema = StructType.fromJson(json.loads(m["schema"]))
    removed, added = _changed_files(table_dir, from_id, to_id)
    root = os.path.abspath(table_dir)

    def side(entries: list[dict]) -> DataFrame:
        paths = [os.path.join(root, e["path"]) for e in entries]
        if not paths:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*paths)

    old, new = side(removed), side(added)
    cols = schema.fieldNames()
    return (
        old.exceptAll(new)
        .select(F.lit("remove").alias("change"), *cols)
        .unionByName(
            new.exceptAll(old).select(F.lit("add").alias("change"), *cols)
        )
    )


def expire_snapshots(table_dir: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` manifests and DELETE data
    files no surviving snapshot references (Iceberg's
    ``expireSnapshots`` + orphan-file vacuum).  Returns the expired ids.
    Time travel to an expired id raises thereafter."""
    ids = snapshot_ids(table_dir)
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    expired = ids[:-keep_last]
    if not expired:
        return []
    survivors = ids[-keep_last:]
    live = {
        e["path"]
        for sid in survivors
        for e in _load_manifest(table_dir, sid)["files"]
    }
    root = os.path.abspath(table_dir)
    for sid in expired:
        for e in _load_manifest(table_dir, sid)["files"]:
            if e["path"] not in live:
                p = os.path.join(root, e["path"])
                if os.path.exists(p):
                    os.remove(p)
        os.remove(_manifest_path(table_dir, sid))
    # sweep now-empty commit directories (cosmetic; readers never list dirs)
    data_root = os.path.join(root, "data")
    if os.path.isdir(data_root):
        for d in os.listdir(data_root):
            full = os.path.join(data_root, d)
            if os.path.isdir(full) and not any(
                f.endswith(".parquet") for f in os.listdir(full)
            ):
                shutil.rmtree(full)
    return expired
