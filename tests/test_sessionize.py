import numpy as np
import pandas as pd

from mpower_feature_analysis_spark import oracle
from mpower_feature_analysis_spark.operators import session_summary, sessionize

GAP_S = 3600.0


def test_session_ids_match_oracle(spark, dedup_df, dedup_pdf):
    got = sessionize(dedup_df, gap_s=GAP_S).orderBy("conv_id", "turn_idx").toPandas()
    want = oracle.sessionize(dedup_pdf, GAP_S)
    np.testing.assert_array_equal(got["session_id"].to_numpy(), want["session_id"].to_numpy())


def test_summary_matches_oracle(spark, dedup_df, dedup_pdf):
    got = (
        session_summary(sessionize(dedup_df, gap_s=GAP_S))
        .orderBy("conv_id", "session_id")
        .toPandas()
    )
    want = oracle.session_summary(oracle.sessionize(dedup_pdf, GAP_S))
    np.testing.assert_array_equal(got["n_turns"].to_numpy(), want["n_turns"].to_numpy())
    np.testing.assert_array_equal(got["duration_ms"].to_numpy(), want["duration_ms"].to_numpy())


def test_gap_exactly_threshold_stays_in_session(spark):
    """Boundary is strict >: a gap of exactly gap_s keeps the session."""
    rows = [
        ("c", 0, "2024-01-01 00:00:00"),
        ("c", 1, "2024-01-01 01:00:00"),  # gap == 3600 s → same session
        ("c", 2, "2024-01-01 02:00:01"),  # gap 3601 s → new session
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts_s string") \
        .selectExpr("conv_id", "turn_idx", "cast(ts_s as timestamp) as ts")
    got = sessionize(t, gap_s=GAP_S).orderBy("turn_idx").toPandas()
    assert list(got["session_id"]) == [0, 0, 1]


def test_first_turn_starts_session_zero(spark, dedup_df):
    s = sessionize(dedup_df, gap_s=GAP_S)
    firsts = s.filter("turn_idx = 0")
    assert firsts.filter("session_id != 0").count() == 0
