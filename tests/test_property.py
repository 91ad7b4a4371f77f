"""Randomized property tests (hypothesis): the temporal-leakage invariant
and oracle parity of the as-of join under adversarial tiny inputs —
SURVEY.md §5's 'randomized inputs' requirement, complementing the fixed
golden fixtures."""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mpower_feature_analysis_spark import oracle
from mpower_feature_analysis_spark.operators import asof_join

_EPOCH = 1_700_000_000_000


@st.composite
def transcript_case(draw):
    n_convs = draw(st.integers(1, 3))
    turns, states = [], []
    seq = 0
    for c in range(n_convs):
        conv = f"p{c}"
        n_t = draw(st.integers(1, 6))
        # small integer offsets force ts collisions between turns and states
        t_offsets = draw(
            st.lists(st.integers(0, 20), min_size=n_t, max_size=n_t)
        )
        for i, off in enumerate(sorted(t_offsets)):
            turns.append((conv, i, "user", f"t{seq}", None, _EPOCH + off * 1000))
        n_s = draw(st.integers(0, 4))
        s_offsets = draw(
            st.lists(st.integers(-5, 25), min_size=n_s, max_size=n_s)
        )
        for off in s_offsets:  # may precede, collide with, or follow turns
            states.append((conv, _EPOCH + off * 1000, f"lab{seq % 5}", seq))
            seq += 1
    t_pdf = pd.DataFrame(
        turns, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts_ms"]
    )
    s_pdf = pd.DataFrame(
        states, columns=["conv_id", "state_ts_ms", "label", "state_seq"]
    )
    t_pdf["ts"] = pd.to_datetime(t_pdf.pop("ts_ms"), unit="ms")
    s_pdf["state_ts"] = pd.to_datetime(s_pdf.pop("state_ts_ms"), unit="ms")
    return t_pdf, s_pdf


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=transcript_case())
def test_asof_leakage_and_oracle_parity(spark, case):
    t_pdf, s_pdf = case
    t = spark.createDataFrame(
        t_pdf, "conv_id string, turn_idx int, role string, text string, "
               "tool string, ts timestamp"
    )
    s = spark.createDataFrame(
        s_pdf[["conv_id", "state_ts", "label", "state_seq"]],
        "conv_id string, state_ts timestamp, label string, state_seq long",
    )
    got = asof_join(t, s, payload=["label"]).collect()
    assert len(got) == len(t_pdf)

    # temporal leakage: every attached label must come from SOME state of
    # the same conv with state_ts <= ts
    by_conv = {}
    for r in s_pdf.itertuples():
        by_conv.setdefault(r.conv_id, []).append((r.state_ts, r.label))
    for r in got:
        if r.label is not None:
            assert any(
                sts <= r.ts and lab == r.label
                for sts, lab in by_conv.get(r.conv_id, [])
            ), f"leaked label {r.label!r} at {r.ts}"

    # full oracle parity (ffill over the merged timeline)
    want = oracle.asof_labels(t_pdf, s_pdf)
    want_map = {
        (r.conv_id, r.turn_idx): r.label for r in want.itertuples()
    }
    for r in got:
        w = want_map[(r.conv_id, r.turn_idx)]
        assert (r.label == w) or (r.label is None and pd.isna(w))
