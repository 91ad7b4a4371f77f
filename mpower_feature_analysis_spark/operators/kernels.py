"""Arrow-vectorized group-wise feature kernels (the F1 operator).

The reference's central execution pattern is a group-wise table UDF:
``plyr::ddply(.data, c("recordId","fileColumnName"), .parallel, .fun)`` where
``.fun`` parses a record's samples, windows the signal (windowLen=256,
ovlp=0.5 — extract_mhealthtools_tremor_features_mpower1.R:56,135-139), and
emits one row of summary statistics PER WINDOW (mean/median/IQR/entropy…,
via mhealthtools::time_domain_summary — extract_mhealthtools_tremor_features.R:144-145).
Errors never kill the job: they become an ``error``-string row
(extract_mhealthtools_tapping_features.R:117-121).

Engine form: ``df.groupBy("conv_id").applyInPandas(kernel, schema)`` — one
Arrow batch per conversation, numpy-vectorized inside (sliding windows via
stride tricks), variable-row output, nullable ``error`` column declared up
front (§1.3: Spark schemas are static). No per-row Python anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

WINDOW_FEATURE_SCHEMA = (
    "conv_id string, window_idx int, n int, "
    "start_turn_idx int, end_turn_idx int, "
    "mean_gap_ms double, median_gap_ms double, iqr_gap_ms double, "
    "entropy_gap double, error string"
)

#: Entropy spec (deterministic, mirrored by the pandas oracle): Shannon
#: entropy (nats) of the 10-bin histogram of the window's values over
#: [min, max]; 0.0 when all values are equal.
_ENTROPY_BINS = 10


def _entropy(x: np.ndarray) -> float:
    lo, hi = float(x.min()), float(x.max())
    if hi <= lo:
        return 0.0
    hist, _ = np.histogram(x, bins=_ENTROPY_BINS, range=(lo, hi))
    p = hist / hist.sum()
    p = p[p > 0]
    return float(-(p * np.log(p)).sum())


def _window_starts(n: int, window: int, step: int) -> np.ndarray:
    if n < window:
        return np.empty(0, dtype=np.int64)
    return np.arange(0, n - window + 1, step, dtype=np.int64)


def make_window_kernel(window: int = 8, overlap: float = 0.5, min_turns: int = 2):
    """Build the per-group kernel: overlapping windows of ``window`` turns
    with ``overlap`` fraction (step = window*(1-overlap)), one output row per
    window over the inter-turn gap series. Groups with < ``min_turns`` turns
    emit a single error row (F5 error channel) instead of raising."""
    step = max(1, int(round(window * (1.0 - overlap))))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        conv = pdf["conv_id"].iloc[0]

        def err(msg: str) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "conv_id": [conv], "window_idx": [np.int32(-1)],
                    "n": [np.int32(0)],
                    "start_turn_idx": [np.int32(-1)], "end_turn_idx": [np.int32(-1)],
                    "mean_gap_ms": [np.nan], "median_gap_ms": [np.nan],
                    "iqr_gap_ms": [np.nan], "entropy_gap": [np.nan],
                    "error": [msg],
                }
            )

        try:
            if len(pdf) < min_turns:
                return err(f"group too small: {len(pdf)} turns")
            g = pdf.sort_values(["turn_idx", "ts"], kind="mergesort")
            ts_ms = g["ts"].values.astype("datetime64[ms]").astype("int64")
            gaps = np.diff(ts_ms).astype("float64")
            turn_idx = g["turn_idx"].values.astype("int64")[1:]  # gap i ends at turn i+1
            starts = _window_starts(len(gaps), window, step)
            if len(starts) == 0:
                # short conversation: one window over everything
                starts = np.array([0], dtype=np.int64)
                wins = [gaps]
                bounds = [(turn_idx[0], turn_idx[-1])]
            else:
                sw = np.lib.stride_tricks.sliding_window_view(gaps, window)[::step]
                wins = list(sw)
                bounds = [(turn_idx[s], turn_idx[s + window - 1]) for s in starts]
            q1, md, q3 = (
                np.array([np.percentile(w, p, method="linear") for w in wins])
                for p in (25, 50, 75)
            )
            return pd.DataFrame(
                {
                    "conv_id": conv,
                    "window_idx": np.arange(len(wins), dtype="int32"),
                    "n": np.array([len(w) for w in wins], dtype="int32"),
                    "start_turn_idx": np.array([b[0] for b in bounds], dtype="int32"),
                    "end_turn_idx": np.array([b[1] for b in bounds], dtype="int32"),
                    "mean_gap_ms": np.array([w.mean() for w in wins]),
                    "median_gap_ms": md,
                    "iqr_gap_ms": q3 - q1,
                    "entropy_gap": np.array([_entropy(w) for w in wins]),
                    "error": None,
                }
            )
        except Exception as e:  # F5: never fail the task
            return err(f"{type(e).__name__}: {e}")

    return kernel


def windowed_summary_features(
    transcripts: DataFrame,
    window: int = 8,
    overlap: float = 0.5,
    min_turns: int = 2,
    group_col: str = "conv_id",
) -> DataFrame:
    """Per-conversation windowed summary features via applyInPandas.

    Scale notes: the groupBy hash-shuffles on conv_id once; Arrow moves each
    group as columnar batches; the kernel is pure numpy (no per-row Python).
    Hot conversations: cap group size upstream by splitting on session_id or
    turn_idx ranges (see plans/pipeline.py) — the kernel itself is O(k·w).
    """
    kernel = make_window_kernel(window=window, overlap=overlap, min_turns=min_turns)
    cols = ["conv_id", "turn_idx", "ts"]
    return (
        transcripts.select(*cols)
        .groupBy(group_col)
        .applyInPandas(kernel, WINDOW_FEATURE_SCHEMA)
    )
