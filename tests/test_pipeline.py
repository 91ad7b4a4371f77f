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


def test_fused_window_stack_equals_operator_chain(spark, transcripts_df, states_df):
    """Round-7: the fused two-layer window stack must be row-for-row
    identical (schema order included) to the original operator chain
    turn_gaps -> rolling_stats -> per_role_running_counts -> forward_fill
    -> sessionize."""
    from mpower_feature_analysis_spark.operators import (
        asof_join,
        dedup_last_wins,
        forward_fill,
        per_role_running_counts,
        rolling_stats,
        sessionize,
        turn_gaps,
    )
    from mpower_feature_analysis_spark.plans.pipeline import (
        PipelineConfig,
        _window_feature_stack,
    )

    cfg = PipelineConfig()
    t = dedup_last_wins(
        transcripts_df, ["conv_id", "turn_idx"], ["ts"], partition_by=["conv_id"]
    )
    t = asof_join(t, states_df, payload=["label"])

    fused = _window_feature_stack(t, cfg)
    ref = turn_gaps(t)
    ref = rolling_stats(ref, "gap_ms", k=cfg.rolling_k, prefix="gap_roll")
    ref = per_role_running_counts(ref, list(cfg.roles))
    ref = forward_fill(ref, ["tool"], ["conv_id"], ["turn_idx", "ts"])
    ref = sessionize(ref, gap_s=cfg.session_gap_s)

    assert fused.columns == ref.columns
    a = fused.orderBy("conv_id", "turn_idx").collect()
    b = ref.orderBy("conv_id", "turn_idx").collect()
    assert a == b and len(a) > 0
