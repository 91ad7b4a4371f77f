import numpy as np
import pandas as pd

from mpower_feature_analysis_spark import oracle
from mpower_feature_analysis_spark.operators import (
    backward_fill,
    enrollment_window_filter,
    forward_fill,
    per_role_running_counts,
    rolling_stats,
    turn_gaps,
    zero_base_ts,
)

ROLES = ["user", "assistant", "tool", "system"]


def _sorted_pdf(df):
    return df.orderBy("conv_id", "turn_idx").toPandas()


def test_turn_gaps_match_oracle(spark, dedup_df, dedup_pdf):
    got = _sorted_pdf(turn_gaps(dedup_df))
    want = oracle.turn_gaps(dedup_pdf)
    np.testing.assert_array_equal(
        got["gap_ms"].to_numpy(dtype="float64"), want["gap_ms"].to_numpy(dtype="float64")
    )
    np.testing.assert_array_equal(
        got["lead_gap_ms"].to_numpy(dtype="float64"),
        want["lead_gap_ms"].to_numpy(dtype="float64"),
    )


def test_gap_null_at_partition_edges(spark, dedup_df):
    g = turn_gaps(dedup_df)
    assert g.filter("turn_idx = 0 and gap_ms is not null").count() == 0
    # exactly one null lead per conversation (the last turn)
    n_convs = dedup_df.select("conv_id").distinct().count()
    assert g.filter("lead_gap_ms is null").count() == n_convs


def test_fills_match_oracle(spark, dedup_df, dedup_pdf):
    f = forward_fill(dedup_df, ["tool"], ["conv_id"], ["turn_idx", "ts"])
    f = backward_fill(f, ["tool"], ["conv_id"], ["turn_idx", "ts"])
    got = _sorted_pdf(f)
    want = oracle.backward_fill(oracle.forward_fill(dedup_pdf))
    for c in ("tool_ffill", "tool_bfill"):
        assert list(got[c].fillna("∅")) == list(want[c].fillna("∅")), c


def test_fill_all_null_run(spark):
    t = spark.createDataFrame(
        [("c", i, None) for i in range(5)], "conv_id string, turn_idx int, tool string"
    )
    f = backward_fill(
        forward_fill(t, ["tool"], ["conv_id"], ["turn_idx"]),
        ["tool"], ["conv_id"], ["turn_idx"],
    )
    rows = f.collect()
    assert all(r.tool_ffill is None and r.tool_bfill is None for r in rows)


def test_running_counts_match_oracle(spark, dedup_df, dedup_pdf):
    got = _sorted_pdf(per_role_running_counts(dedup_df, ROLES))
    want = oracle.running_role_counts(dedup_pdf, ROLES)
    for r in ROLES:
        np.testing.assert_array_equal(
            got[f"n_{r}_so_far"].to_numpy(), want[f"n_{r}_so_far"].to_numpy()
        )


def test_rolling_stats_match_oracle(spark, dedup_df, dedup_pdf):
    k = 5
    got = _sorted_pdf(rolling_stats(turn_gaps(dedup_df), "gap_ms", k, prefix="gap_roll"))
    want = oracle.rolling_gap_stats(dedup_pdf, k)
    np.testing.assert_allclose(
        got["gap_roll_mean"].to_numpy(dtype="float64"),
        want["gap_roll_mean"].to_numpy(dtype="float64"),
        rtol=1e-12, equal_nan=True,
    )
    np.testing.assert_array_equal(got["gap_roll_n"].to_numpy(), want["gap_roll_n"].to_numpy())


def test_zero_base_ts(spark, dedup_df, dedup_pdf):
    got = _sorted_pdf(zero_base_ts(dedup_df))
    s = oracle.sort_stable(dedup_pdf)
    ms = s["ts"].astype("datetime64[ms]").astype("int64")
    want = ms - ms.groupby(s["conv_id"]).transform("min")
    np.testing.assert_array_equal(got["t_rel_ms"].to_numpy(), want.to_numpy())
    assert (got.groupby("conv_id")["t_rel_ms"].min() == 0).all()


def test_enrollment_window_filter(spark, dedup_df, dedup_pdf):
    got = enrollment_window_filter(dedup_df, days=2).count()
    s = dedup_pdf.copy()
    first = s.groupby("conv_id")["ts"].transform("min")
    want = int((s["ts"] <= first + pd.Timedelta(days=2)).sum())
    assert got == want
