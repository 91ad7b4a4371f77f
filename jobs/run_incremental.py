"""spark-submit entry point: CONTINUOUSLY-MAINTAINED feature table.

The production shape for a 10^12-turn transcript table: features are a
derived snapshot table that advances by CDC instead of being rebuilt —
each run recomputes only the conversations the turns table's commits
touched since the last run (plans/incremental.py), swaps their feature
rows in one atomic copy-on-write merge, and pins the consumed turns
snapshot id in the features table's own properties, so the job is
idempotent and crash-safe with no external scheduler state.

Usage (cluster)::

    zip -r engine.zip mpower_feature_analysis_spark

    # bootstrap (once), or whenever a from-scratch rebuild is wanted:
    spark-submit --py-files engine.zip jobs/run_incremental.py \
        bootstrap <turns_table_dir> <features_table_dir> [cluster_files]

    # every scheduled advance (cron / Airflow / event-driven):
    spark-submit --py-files engine.zip jobs/run_incremental.py \
        refresh <turns_table_dir> <features_table_dir>

    # or stay subscribed to the turns table's commit stream:
    spark-submit --py-files engine.zip jobs/run_incremental.py \
        stream <turns_table_dir> <features_table_dir> <checkpoint_dir>

``bootstrap`` range-clusters the features on (conv_id, turn_idx) so the
derived table inherits its source's entity clustering — what keeps every
later merge's copy-on-write scope tight (localized churn rewrites the few
files holding the affected conversations).  ``refresh`` is a no-op when
the turns table has not moved.  ``stream`` runs the snapshot_cdc
commit-stream subscription with Trigger.AvailableNow (drain-and-exit;
drop ``available_now`` for a long-running subscription).
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession

from mpower_feature_analysis_spark.plans.incremental import (
    full_refresh,
    incremental_refresh,
    streaming_refresh,
)
from mpower_feature_analysis_spark.plans.pipeline import PipelineConfig
from mpower_feature_analysis_spark.session import ENGINE_CONFS


def main() -> int:
    mode, turns_dir, feats_dir = sys.argv[1], sys.argv[2], sys.argv[3]

    builder = SparkSession.builder.appName(f"mpower-incremental-{mode}")
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    cfg = PipelineConfig()

    if mode == "bootstrap":
        cluster_files = int(sys.argv[4]) if len(sys.argv) > 4 else 64
        sid = full_refresh(
            spark, turns_dir, feats_dir, config=cfg,
            cluster_files=cluster_files,
        )
        print(json.dumps({"status": "ok", "mode": mode,
                          "features_snapshot": sid}))
    elif mode == "refresh":
        out = incremental_refresh(spark, turns_dir, feats_dir, config=cfg)
        print(json.dumps({"status": "ok", "mode": mode, **out}))
    elif mode == "stream":
        ckpt = sys.argv[4]
        streaming_refresh(spark, turns_dir, feats_dir, ckpt, config=cfg)
        print(json.dumps({"status": "ok", "mode": mode}))
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
