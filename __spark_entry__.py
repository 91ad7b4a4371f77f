"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship per-turn feature pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` expose one entry per implemented operator
from SURVEY.md §2, backed by mpower_feature_analysis_spark.plans.driver_queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mpower_feature_analysis_spark.plans import driver_queries as _dq
from mpower_feature_analysis_spark.plans import driver_queries_extra as _dqe
from mpower_feature_analysis_spark.plans import driver_queries_text as _dqt
from mpower_feature_analysis_spark.plans.pipeline import (
    PipelineConfig,
    extract_turn_features,
)
from mpower_feature_analysis_spark.transcripts import load_states, load_transcripts


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: dedup → as-of state attach →
    window features → sessionize, per turn."""
    sf_dir = "/root/testdata/sf0.001"
    t = load_transcripts(spark, sf_dir)
    s = load_states(spark, sf_dir)
    cfg = PipelineConfig(roles=("click", "error", "purchase", "signup", "view"))
    return extract_turn_features(t, s, cfg)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {**_dq.QUERIES, **_dqt.QUERIES, **_dqe.QUERIES}


def oracle_sql() -> dict[str, str]:
    return {**_dq.ORACLES, **_dqt.ORACLES, **_dqe.ORACLES}
