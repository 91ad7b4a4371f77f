import numpy as np
import pandas as pd

from mpower_feature_analysis_spark import oracle
from mpower_feature_analysis_spark.plans.pipeline import (
    PipelineConfig,
    extract_turn_features,
    stable_sorted,
)


def test_text_fidelity_and_stable_order(spark, transcripts_df, transcripts_pdf):
    """Per-turn text byte-equality under stable (conv_id, turn_idx) order —
    the BASELINE.json input_hint invariant."""
    out = extract_turn_features(transcripts_df)
    got = stable_sorted(out).toPandas().sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)
    want = oracle.dedup_last_wins(transcripts_pdf)
    assert list(got["text"]) == list(want["text"])
    assert list(got["conv_id"]) == list(want["conv_id"])
    assert list(got["turn_idx"]) == list(want["turn_idx"])


def test_full_feature_vector_allclose(spark, transcripts_df, transcripts_pdf, states_df, states_pdf):
    """End-to-end allclose vs the composed pandas oracle."""
    cfg = PipelineConfig()
    got = (
        extract_turn_features(transcripts_df, states_df, cfg)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    d = oracle.dedup_last_wins(transcripts_pdf)
    want = oracle.asof_labels(d, states_pdf)
    want = oracle.rolling_gap_stats(want, cfg.rolling_k)
    want = oracle.running_role_counts(want, list(cfg.roles))
    want = oracle.forward_fill(want)
    want = oracle.sessionize(want, cfg.session_gap_s)

    assert len(got) == len(want)
    assert list(got["label"].fillna("∅")) == list(want["label"].fillna("∅"))
    np.testing.assert_allclose(
        got["gap_roll_mean"].to_numpy("float64"),
        want["gap_roll_mean"].to_numpy("float64"),
        rtol=1e-12, equal_nan=True,
    )
    np.testing.assert_array_equal(got["session_id"].to_numpy(), want["session_id"].to_numpy())
    for r in cfg.roles:
        np.testing.assert_array_equal(
            got[f"n_{r}_so_far"].to_numpy(), want[f"n_{r}_so_far"].to_numpy()
        )
    assert list(got["tool_ffill"].fillna("∅")) == list(want["tool_ffill"].fillna("∅"))


def test_pipeline_deterministic_across_runs(spark, transcripts_df, states_df):
    a = extract_turn_features(transcripts_df, states_df).orderBy("conv_id", "turn_idx").collect()
    b = extract_turn_features(transcripts_df, states_df).orderBy("conv_id", "turn_idx").collect()
    assert a == b
