"""Generate the golden feature fixtures (FIXTURES.md §4) from the pandas
oracle over the deterministic synthetic transcript table. Committed to
tests/golden/ so the pytest comparison guards against the engine and the
in-repo oracle drifting together.

Usage: python tools/gen_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpower_feature_analysis_spark import oracle  # noqa: E402
from mpower_feature_analysis_spark.transcripts import (  # noqa: E402
    generate_state_events,
    generate_transcripts,
)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden")

SEED, N_TURNS, N_CONVS = 42, 1500, 30
GAP_S, ROLL_K, KW, KO = 3600.0, 5, 8, 0.5
ROLES = ["user", "assistant", "tool", "system"]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    t = generate_transcripts(n_turns=N_TURNS, n_convs=N_CONVS, seed=SEED)
    s = generate_state_events(t, seed=SEED)
    t.to_parquet(os.path.join(OUT, "input_transcripts.parquet"), index=False)
    s.to_parquet(os.path.join(OUT, "input_states.parquet"), index=False)

    d = oracle.dedup_last_wins(t)
    d.to_parquet(os.path.join(OUT, "golden_dedup.parquet"), index=False)

    asof = oracle.asof_labels(d, s)
    asof.to_parquet(os.path.join(OUT, "golden_asof.parquet"), index=False)

    w = oracle.rolling_gap_stats(d, ROLL_K)
    w = oracle.running_role_counts(w, ROLES)
    w = oracle.backward_fill(oracle.forward_fill(w))
    w.to_parquet(os.path.join(OUT, "golden_window.parquet"), index=False)

    sess = oracle.session_summary(oracle.sessionize(d, GAP_S))
    sess.to_parquet(os.path.join(OUT, "golden_sessions.parquet"), index=False)

    ua = oracle.user_aggregate(oracle.turn_gaps(d))
    ua.to_parquet(os.path.join(OUT, "golden_user_agg.parquet"), index=False)

    kf = oracle.window_features(d, window=KW, overlap=KO)
    kf.to_parquet(os.path.join(OUT, "golden_kernel.parquet"), index=False)
    print(f"wrote fixtures to {OUT}")


if __name__ == "__main__":
    main()
