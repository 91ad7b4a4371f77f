import numpy as np
import pandas as pd
import pytest

from mpower_feature_analysis_spark import oracle
from mpower_feature_analysis_spark.operators import asof_join


@pytest.fixture(scope="module")
def asof_result(spark, dedup_df, states_df):
    return (
        asof_join(dedup_df, states_df, payload=["label"])
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )


def test_matches_oracle(asof_result, dedup_pdf, states_pdf):
    want = oracle.asof_labels(dedup_pdf, states_pdf)
    got = asof_result
    assert list(got["label"].fillna("∅")) == list(want["label"].fillna("∅"))
    assert list(got["conv_id"]) == list(want["conv_id"])
    assert list(got["turn_idx"]) == list(want["turn_idx"])


def test_zero_temporal_leakage(asof_result, states_pdf):
    """FIXTURES.md §5: every attached state satisfies state_ts <= ts, and the
    attached one is the LATEST such state."""
    sp = states_pdf.sort_values(["conv_id", "state_ts", "state_seq"])
    by_conv = {k: g for k, g in sp.groupby("conv_id")}
    for _, r in asof_result.iterrows():
        g = by_conv.get(r.conv_id)
        cand = g[g.state_ts <= r.ts] if g is not None else None
        want = cand.iloc[-1]["label"] if cand is not None and len(cand) else None
        got = r["label"] if pd.notna(r["label"]) else None
        assert got == want, (r.conv_id, r.turn_idx)


def test_future_states_never_attach(asof_result):
    assert not (asof_result["label"] == "label_future").any()


def test_inclusive_bound(spark):
    """state_ts == ts must match (analysis/mPTS_record.R:31 inclusive)."""
    turns = spark.createDataFrame(
        [("c", 0, "2024-01-01 00:00:00")],
        "conv_id string, turn_idx int, ts_s string",
    ).selectExpr("conv_id", "turn_idx", "cast(ts_s as timestamp) as ts")
    states = spark.createDataFrame(
        [("c", "2024-01-01 00:00:00", "exact", 1)],
        "conv_id string, state_ts_s string, label string, state_seq long",
    ).selectExpr("conv_id", "cast(state_ts_s as timestamp) as state_ts", "label", "state_seq")
    out = asof_join(turns, states, payload=["label"]).collect()
    assert out[0]["label"] == "exact"


def test_state_seq_tiebreak(spark):
    """Two states at the same ts: larger state_seq wins."""
    turns = spark.createDataFrame(
        [("c", 0, "2024-01-01 00:00:01")],
        "conv_id string, turn_idx int, ts_s string",
    ).selectExpr("conv_id", "turn_idx", "cast(ts_s as timestamp) as ts")
    states = spark.createDataFrame(
        [("c", "2024-01-01 00:00:00", "older", 1),
         ("c", "2024-01-01 00:00:00", "newer", 2)],
        "conv_id string, state_ts_s string, label string, state_seq long",
    ).selectExpr("conv_id", "cast(state_ts_s as timestamp) as state_ts", "label", "state_seq")
    out = asof_join(turns, states, payload=["label"]).collect()
    assert out[0]["label"] == "newer"


def test_bucketed_skew_path_equals_plain(spark, dedup_df, states_df, asof_result):
    for bucket_ms in (3_600_000, 86_400_000):
        got = (
            asof_join(dedup_df, states_df, payload=["label"], bucket_ms=bucket_ms)
            .orderBy("conv_id", "turn_idx")
            .toPandas()
        )
        pd.testing.assert_frame_equal(got, asof_result, check_dtype=False)


def test_multi_payload(spark, dedup_df, states_df):
    s2 = states_df.withColumn("label2", states_df["label"])
    out = asof_join(dedup_df, s2, payload=["label", "label2"]).toPandas()
    a = out["label"].fillna("∅")
    b = out["label2"].fillna("∅")
    assert (a == b).all()


def test_randomized_leakage_property(spark):
    """Randomized adversarial micro-fixtures (seeded)."""
    rng = np.random.default_rng(7)
    for trial in range(5):
        n_t, n_s = 40, 15
        t = pd.DataFrame({
            "conv_id": "c",
            "turn_idx": np.arange(n_t, dtype="int32"),
            "ts": pd.to_datetime(1_700_000_000_000 + np.sort(rng.integers(0, 10_000, n_t)).cumsum(), unit="ms"),
        })
        s = pd.DataFrame({
            "conv_id": "c",
            "state_ts": pd.to_datetime(1_700_000_000_000 + rng.integers(0, 400_000, n_s), unit="ms"),
            "label": [f"L{i}" for i in range(n_s)],
            "state_seq": np.arange(n_s, dtype="int64"),
        })
        tdf = spark.createDataFrame(t, "conv_id string, turn_idx int, ts timestamp")
        sdf = spark.createDataFrame(s, "conv_id string, state_ts timestamp, label string, state_seq long")
        got = asof_join(tdf, sdf, payload=["label"]).orderBy("turn_idx").toPandas()
        ss = s.sort_values(["state_ts", "state_seq"])
        for _, r in got.iterrows():
            cand = ss[ss.state_ts <= r.ts]
            want = cand.iloc[-1]["label"] if len(cand) else None
            have = r["label"] if pd.notna(r["label"]) else None
            assert have == want, trial


def test_burst_membership_counts_equals_interval_join(spark):
    """Round-7: the arithmetic fixed-grid burst membership must be
    row-equal to the schedule-expansion + inclusive interval join for
    every stride/width combination — including overlapping bursts
    (width > stride), exact-boundary timestamps (ts == burst_end), and
    turns past the last burst."""
    from pyspark.sql import functions as F

    from mpower_feature_analysis_spark.operators import (
        burst_membership_counts,
        burst_schedule,
        interval_join,
    )

    rng = np.random.default_rng(7)
    rows = []
    base = pd.Timestamp("2024-01-01")
    for conv in range(8):
        # offsets in seconds: dense start, exact day multiples (boundary
        # probes for the inclusive <=), far tail beyond the last burst
        offs = np.concatenate([
            rng.integers(0, 86_400 * 4, 40),
            np.array([0, 86_400, 2 * 86_400, 3 * 86_400, 86_400 * 30]),
        ])
        for o in offs:
            rows.append((f"c{conv}", int(o), base + pd.Timedelta(seconds=int(o))))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts"])
    t = spark.createDataFrame(pdf)

    for n, stride, width in ((9, 2, 1), (5, 1, 2), (3, 3, 3), (4, 1, 1)):
        sched = burst_schedule(t, n_bursts=n, stride_days=stride,
                               width_days=width)
        want = sorted(
            map(tuple, interval_join(t, sched)
                .groupBy("conv_id", "burst_idx")
                .agg(F.count(F.lit(1)).alias("n_turns_in_burst")).collect())
        )
        got = sorted(
            map(tuple, burst_membership_counts(
                t, n_bursts=n, stride_days=stride, width_days=width,
            ).collect())
        )
        assert got == want, (n, stride, width)
