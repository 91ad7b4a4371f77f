"""Incremental (CDC-driven) feature refresh over snapshot-log tables.

The reference recomputes features for the WHOLE activity table every run
(Makefile `features` stage re-reads the full Synapse table; the per-record
R loop has no notion of "already processed"). At 10^12 turns that is the
single biggest cost in the system: daily churn touches a fraction of a
percent of conversations, yet a full pass re-reads 100 TB and re-runs
every window kernel.

This module makes the feature table a *derived snapshot table* that
advances by CDC:

1. the features table's snapshot ``properties`` pin the TURNS snapshot id
   it was computed from (``source_snapshot_id`` — the Iceberg
   snapshot-summary pattern);
2. ``incremental_refresh`` diffs the turns table between that id and the
   current one with :func:`row_changelog` — which reads ONLY the data
   files that changed between the two manifests;
3. the distinct ``conv_id`` set of the diff is the *affected conversation
   set*: window features (gaps, rolling stats, running counts, fills,
   sessionization) and the as-of state attach depend only on rows of the
   SAME conversation, so every feature row of an unaffected conversation
   is provably unchanged — no recompute, no rewrite;
4. the flagship pipeline (`plans/pipeline.py`) reruns on the affected
   conversations only, and :func:`merge_into` swaps exactly those
   conversations' feature rows in one atomic copy-on-write commit.

Cost model at 100 TB: changelog scan is O(changed files); recompute is
O(affected conversations' turns); the merge rewrites O(feature files
containing an affected conversation). The semi-join scan that locates
affected conversations' turns goes through
:func:`read_snapshot_for_keys`, which pre-prunes the file list from
manifest key-envelope stats — on a conv_id-clustered turns table
(:func:`cluster_snapshot` or a ``repartitionByRange`` writer) it plans
only the churn's neighborhood, so NOTHING in the refresh is O(table).

Correctness contract (driver gate ``incremental_flagship``): after any
sequence of appends, upserts, or copy-on-write deletes to the turns
table, ``incremental_refresh`` leaves the features table bit-identical to
a from-scratch ``extract_turn_features`` over the current turns snapshot
— verified hash-exact against a DuckDB oracle that recomputes the full
pipeline (deletes: a fully-removed conversation's feature rows are
dropped via the merge's widened ``delete_keys`` scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.snapshots import (
    commit_snapshot,
    merge_into,
    read_snapshot,
    read_snapshot_for_keys,
    row_changelog,
    snapshot_info,
)
from .pipeline import PipelineConfig, extract_turn_features

#: snapshot-properties key pinning the turns snapshot a features snapshot
#: was derived from
SOURCE_KEY = "source_snapshot_id"


def streaming_refresh(
    spark: SparkSession,
    turns_dir: str,
    features_dir: str,
    checkpoint_dir: str,
    states: DataFrame | None = None,
    config: PipelineConfig | None = None,
    available_now: bool = True,
):
    """Continuous feature maintenance: subscribe to the turns table's
    commit stream (``snapshot_cdc`` source) and advance the features
    table once per micro-batch.

    The stream is the COMMIT NOTIFIER, not the data carrier:
    ``foreachBatch`` ignores the batch rows and calls
    :func:`incremental_refresh`, which re-derives the exact change set
    from the snapshot log (``row_changelog`` between the pinned
    ``source_snapshot_id`` and current). That makes the handler
    idempotent and self-healing by construction — a replayed or skipped
    micro-batch cannot double-apply or lose a refresh, because the
    features table's own property pin, not the stream offset, decides
    what work remains.  Returns the started StreamingQuery (already
    terminated when ``available_now``).
    """
    from ..streaming.snapshot_source import register_snapshot_cdc

    register_snapshot_cdc(spark)
    pinned = snapshot_info(features_dir)["properties"].get(SOURCE_KEY)
    if pinned is None:
        raise ValueError(
            f"{features_dir} carries no {SOURCE_KEY!r} property; bootstrap "
            "with full_refresh()"
        )

    def on_batch(_batch_df, _batch_id: int) -> None:
        # the batch rows are never touched, so no job runs on them — the
        # refresh re-reads the exact change set from the snapshot log
        incremental_refresh(spark, turns_dir, features_dir, states, config)

    writer = (
        spark.readStream.format("snapshot_cdc")
        .option("path", turns_dir)
        # resume from the features table's own pin, not the stream's
        # default tail: commits made before the stream started must still
        # trigger a catch-up refresh on the first micro-batch
        .option("startingSnapshotId", int(pinned) + 1)
        .load()
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def full_refresh(
    spark: SparkSession,
    turns_dir: str,
    features_dir: str,
    states: DataFrame | None = None,
    config: PipelineConfig | None = None,
    cluster_files: int | None = None,
) -> int:
    """From-scratch feature build: run the flagship pipeline over the
    CURRENT turns snapshot and commit the result as a full-table overwrite
    of ``features_dir``, pinning ``source_snapshot_id``. Returns the new
    features snapshot id. Bootstrap for :func:`incremental_refresh`.

    ``cluster_files`` range-clusters the committed features on
    ``(conv_id, turn_idx)`` into that many files. The derived table should
    inherit the entity clustering of its source: it is what keeps the
    later merges' copy-on-write scope tight (localized churn rewrites the
    few files holding the affected conversations, instead of every
    hash-bucket file one of them landed in) and the merge's candidate
    scan prunable by key envelope."""
    src = snapshot_info(turns_dir)["snapshot_id"]
    # pin the read to the id being recorded: a concurrent turns commit
    # between the info call and the scan would otherwise make the
    # source_snapshot_id property a lie
    feats = extract_turn_features(
        read_snapshot(spark, turns_dir, as_of=src), states, config
    )
    if cluster_files is not None:
        feats = feats.repartitionByRange(
            int(cluster_files), "conv_id", "turn_idx"
        ).sortWithinPartitions("conv_id", "turn_idx")
    return commit_snapshot(
        feats, features_dir, operation="overwrite",
        properties={SOURCE_KEY: src},
    )


def incremental_refresh(
    spark: SparkSession,
    turns_dir: str,
    features_dir: str,
    states: DataFrame | None = None,
    config: PipelineConfig | None = None,
) -> dict:
    """Advance the features table to the turns table's current snapshot by
    recomputing ONLY the conversations the CDC diff touches.

    Returns a summary dict: ``refreshed`` (False = already current),
    ``from_snapshot`` / ``to_snapshot`` (turns ids), ``features_snapshot``
    (new features id, or the current one when no-op). Raises if the
    features table was not built by :func:`full_refresh` /
    a prior refresh (no ``source_snapshot_id`` property), or if the turns
    table moved BACKWARD (its snapshot log was expired past the pinned
    id — rebuild with :func:`full_refresh`).
    """
    finfo = snapshot_info(features_dir)
    last = finfo["properties"].get(SOURCE_KEY)
    if last is None:
        raise ValueError(
            f"{features_dir} carries no {SOURCE_KEY!r} property; bootstrap "
            "with full_refresh()"
        )
    last = int(last)
    cur = snapshot_info(turns_dir)["snapshot_id"]
    if cur == last:
        return {
            "refreshed": False,
            "from_snapshot": last,
            "to_snapshot": cur,
            "features_snapshot": finfo["snapshot_id"],
        }
    if cur < last:
        raise ValueError(
            f"turns table at snapshot {cur} is OLDER than the features "
            f"table's source {last}; rebuild with full_refresh()"
        )
    # CDC: reads only the data files that differ between the manifests.
    # The affected-conversation set is consumed several times (envelope
    # agg, turns/states semi-joins, merge delete scope); persist it for
    # the duration of the refresh — every consumer's action completes
    # inside this function, so it is unpersisted before returning (no
    # CacheManager accumulation in long-lived sessions).
    changed = (
        row_changelog(spark, turns_dir, last, cur)
        .select("conv_id")
        .distinct()
        .persist()
    )
    try:
        # affected conversations' turns: manifest key-envelope pruning
        # cuts the file list to the churn's neighborhood BEFORE the exact
        # semi-join runs (O(affected data) on a conv_id-clustered table,
        # never O(table)).  as_of=cur pins the recompute to the snapshot
        # being recorded — a concurrent turns commit cannot leak rows the
        # changelog (last→cur) did not account for
        turns = read_snapshot_for_keys(
            spark, turns_dir, changed, ["conv_id"], as_of=cur
        )
        if states is not None:
            states = states.join(changed, "conv_id", "left_semi")
        # persist the recompute: merge_into consumes its source twice
        # (key-set materialization + the insert write) and the source here
        # is the whole affected-conversations feature pipeline
        feats = extract_turn_features(turns, states, config).persist()
        try:
            # delete scope = ALL affected conversations, not just those
            # the recompute produced rows for: a conversation whose turns
            # were fully DELETED from the source table is in ``changed``
            # (its rows appear as 'remove' CDC) but yields no feature rows
            # — without the wider scope its stale features would linger
            sid = merge_into(
                spark, features_dir, feats, ["conv_id"],
                properties={SOURCE_KEY: cur},
                delete_keys=changed,
            )
        finally:
            feats.unpersist()
    finally:
        changed.unpersist()
    return {
        "refreshed": True,
        "from_snapshot": last,
        "to_snapshot": cur,
        "features_snapshot": sid,
    }
