"""spark-submit entry point for the ZERO-EXCHANGE flagship (round-6).

Two-phase workflow for repeated feature passes over the same snapshot —
the 10^12-turn shape, where the as-of union's conv_id shuffle is worth
paying exactly once at ingest:

    # phase 1 (once per snapshot): stage the bucketed union layout
    spark-submit --py-files engine.zip jobs/run_pipeline_presorted.py \
        stage <input_events_parquet_dir> <layout_dir> [n_buckets]

    # phase 2 (every feature pass): zero-Exchange plan from the scan
    spark-submit --py-files engine.zip jobs/run_pipeline_presorted.py \
        run <layout_dir> <output_dir> [snapshot_id]

The staged layout is a parquet table bucketed on the conversation key and
per-file sorted on the as-of window ordering
(sources.io.write_bucketed_union_table); phase 2 registers it in the
session catalog and runs extract_turn_features(presorted=True), whose
physical plan contains no Exchange nodes (tests/test_plans.py asserts
this) and whose output is row-identical to the plain route.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession

from mpower_feature_analysis_spark.lineage import checkpointed_write
from mpower_feature_analysis_spark.plans.pipeline import (
    PipelineConfig,
    extract_turn_features,
)
from mpower_feature_analysis_spark.session import ENGINE_CONFS
from mpower_feature_analysis_spark.sources.io import (
    register_bucketed_union_table,
    write_bucketed_union_table,
)
from mpower_feature_analysis_spark.transcripts import (
    states_from_events,
    transcripts_from_events,
)

TABLE = "transcript_union_layout"
ROLES = ("click", "error", "purchase", "signup", "view")


def _spark() -> SparkSession:
    builder = SparkSession.builder.appName("mpower-feature-pipeline-presorted")
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def main() -> int:
    mode = sys.argv[1]
    spark = _spark()
    if mode == "stage":
        in_dir, layout_dir = sys.argv[2], sys.argv[3]
        n_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 32
        events = spark.read.parquet(in_dir)
        turn_cols = write_bucketed_union_table(
            transcripts_from_events(events), states_from_events(events),
            TABLE, layout_dir, n_buckets=n_buckets,
        )
        print(json.dumps({
            "status": "ok", "phase": "stage", "table": TABLE,
            "path": layout_dir, "n_buckets": n_buckets,
            "turn_cols": turn_cols,
        }))
    elif mode == "run":
        layout_dir, out_dir = sys.argv[2], sys.argv[3]
        snapshot_id = (
            sys.argv[4] if len(sys.argv) > 4 else f"snapshot:{layout_dir}"
        )
        if TABLE not in [t.name for t in spark.catalog.listTables()]:
            # fresh session: re-register with the bucket spec from the
            # layout manifest — bucket metadata lives in the catalog, not
            # the parquet files
            register_bucketed_union_table(spark, TABLE, layout_dir)
        features = extract_turn_features(
            spark.table(TABLE), None,
            PipelineConfig(roles=ROLES, presorted=True),
        )
        summary = checkpointed_write(
            features, out_dir, input_snapshot_id=snapshot_id, n_buckets=32
        )
        print(json.dumps({"status": "ok", "phase": "run", **summary}))
    else:
        print(json.dumps({"status": "error", "err": f"unknown mode {mode!r}"}))
        spark.stop()
        return 2
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
