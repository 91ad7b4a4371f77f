"""Spark engine vs committed golden parquet fixtures (FIXTURES.md §4-5).

Unlike the live-oracle tests, these fixtures are frozen on disk
(tools/gen_golden.py), so a regression in BOTH the engine and the in-repo
oracle still fails here.
"""

import os

import numpy as np
import pandas as pd
import pytest

from mpower_feature_analysis_spark.operators import (
    backward_fill,
    dedup_last_wins,
    forward_fill,
    per_role_running_counts,
    rolling_stats,
    session_summary,
    sessionize,
    turn_gaps,
    user_aggregate,
    windowed_summary_features,
)

GOLD = os.path.join(os.path.dirname(__file__), "golden")
ROLES = ["user", "assistant", "tool", "system"]


def _gold(name):
    return pd.read_parquet(os.path.join(GOLD, name))


@pytest.fixture(scope="module")
def golden_input(spark):
    t = _gold("input_transcripts.parquet")
    df = spark.createDataFrame(
        t, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    return df.cache()


@pytest.fixture(scope="module")
def golden_dedup_df(spark, golden_input):
    return dedup_last_wins(
        golden_input, ["conv_id", "turn_idx"], ["ts"]
    ).cache()


def _sorted(df, keys=("conv_id", "turn_idx")):
    return df.orderBy(*keys).toPandas().reset_index(drop=True)


def test_dedup_fixture(spark, golden_dedup_df):
    got = _sorted(golden_dedup_df)
    want = _gold("golden_dedup.parquet")
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)


def test_asof_fixture(spark, golden_dedup_df):
    from mpower_feature_analysis_spark.operators import asof_join
    s = spark.createDataFrame(
        _gold("input_states.parquet"),
        "conv_id string, state_ts timestamp, label string, state_seq long",
    )
    got = _sorted(asof_join(golden_dedup_df, s, payload=["label"]))
    want = _gold("golden_asof.parquet")
    assert list(got["label"].fillna("∅")) == list(want["label"].fillna("∅"))
    assert list(got["text"]) == list(want["text"])  # byte fidelity


def test_window_fixture(spark, golden_dedup_df):
    g = rolling_stats(turn_gaps(golden_dedup_df), "gap_ms", 5, prefix="gap_roll")
    g = per_role_running_counts(g, ROLES)
    g = forward_fill(g, ["tool"], ["conv_id"], ["turn_idx", "ts"])
    g = backward_fill(g, ["tool"], ["conv_id"], ["turn_idx", "ts"])
    got = _sorted(g)
    want = _gold("golden_window.parquet")
    np.testing.assert_allclose(
        got["gap_roll_mean"].to_numpy("float64"),
        want["gap_roll_mean"].to_numpy("float64"), rtol=1e-9, equal_nan=True,
    )
    np.testing.assert_array_equal(
        got["gap_ms"].to_numpy("float64"), want["gap_ms"].to_numpy("float64")
    )
    for r in ROLES:
        np.testing.assert_array_equal(
            got[f"n_{r}_so_far"].to_numpy(), want[f"n_{r}_so_far"].to_numpy()
        )
    for c in ("tool_ffill", "tool_bfill"):
        assert list(got[c].fillna("∅")) == list(want[c].fillna("∅"))


def test_sessions_fixture(spark, golden_dedup_df):
    got = _sorted(
        session_summary(sessionize(golden_dedup_df, gap_s=3600.0)),
        keys=("conv_id", "session_id"),
    )
    want = _gold("golden_sessions.parquet")
    np.testing.assert_array_equal(got["n_turns"].to_numpy(), want["n_turns"].to_numpy())
    np.testing.assert_array_equal(
        got["duration_ms"].to_numpy(), want["duration_ms"].to_numpy()
    )


def test_user_agg_fixture(spark, golden_dedup_df):
    g = turn_gaps(golden_dedup_df).filter("gap_ms is not null")
    got = _sorted(user_aggregate(g, value_cols=["gap_ms"]), keys=("conv_id",))
    want = _gold("golden_user_agg.parquet")
    np.testing.assert_array_equal(got["nrecords"].to_numpy(), want["nrecords"].to_numpy())
    np.testing.assert_allclose(
        got["gap_ms_md"].to_numpy("float64"), want["gap_ms_md"].to_numpy("float64"), rtol=0
    )
    np.testing.assert_allclose(
        got["gap_ms_iqr"].to_numpy("float64"), want["gap_ms_iqr"].to_numpy("float64"), rtol=0
    )


def test_kernel_fixture(spark, golden_dedup_df):
    got = _sorted(
        windowed_summary_features(golden_dedup_df, window=8, overlap=0.5),
        keys=("conv_id", "window_idx"),
    )
    want = _gold("golden_kernel.parquet").sort_values(
        ["conv_id", "window_idx"], kind="mergesort"
    ).reset_index(drop=True)
    assert len(got) == len(want)
    for c in ("mean_gap_ms", "median_gap_ms", "iqr_gap_ms", "entropy_gap"):
        np.testing.assert_allclose(
            got[c].to_numpy("float64"), want[c].to_numpy("float64"),
            rtol=1e-9, equal_nan=True, err_msg=c,
        )
