"""spark-submit entry point: end-to-end feature extraction with
checkpointed, lineage-tracked output.

Usage (cluster):
    zip -r engine.zip mpower_feature_analysis_spark
    spark-submit --py-files engine.zip jobs/run_pipeline.py \
        <input_events_parquet_dir> <output_dir> [snapshot_id] [n_buckets]

The SparkSession comes from spark-submit's conf (master/executors set
there); only engine-level confs are applied on top.
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
from mpower_feature_analysis_spark.transcripts import (
    states_from_events,
    transcripts_from_events,
)


def main() -> int:
    in_dir, out_dir = sys.argv[1], sys.argv[2]
    snapshot_id = sys.argv[3] if len(sys.argv) > 3 else f"snapshot:{in_dir}"
    n_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    builder = SparkSession.builder.appName("mpower-feature-pipeline")
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()

    events = spark.read.parquet(in_dir)
    cfg = PipelineConfig(roles=("click", "error", "purchase", "signup", "view"))
    features = extract_turn_features(
        transcripts_from_events(events), states_from_events(events), cfg
    )
    summary = checkpointed_write(
        features, out_dir, input_snapshot_id=snapshot_id, n_buckets=n_buckets
    )
    print(json.dumps({"status": "ok", **summary}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
