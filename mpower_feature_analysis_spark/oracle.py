"""Single-node pandas oracle: an independent reimplementation of the engine
semantics (SURVEY.md §2) used to produce golden fixtures and to property-test
the Spark operators.

Quantiles are type-7 (``np.percentile(method="linear")``), matching R's
``median``/``IQR`` defaults used by the reference
(feature_processing/aggregate_users/aggregate_tapping_features.R:91-94).
All time math is integer epoch-milliseconds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_ORDER = ["conv_id", "turn_idx", "ts"]


def _ms(s: pd.Series) -> pd.Series:
    return s.astype("datetime64[ms]").astype("int64")


def sort_stable(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(_ORDER, kind="mergesort").reset_index(drop=True)


def dedup_last_wins(df: pd.DataFrame) -> pd.DataFrame:
    """Last-wins per (conv_id, turn_idx) by ts."""
    s = df.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
    return (
        s.groupby(["conv_id", "turn_idx"], sort=True).tail(1).pipe(sort_stable)
    )


def asof_labels(turns: pd.DataFrame, states: pd.DataFrame) -> pd.DataFrame:
    """Latest state with state_ts <= ts (inclusive), ties among states broken
    by state_seq; returns turns + ``label``."""
    t = turns.assign(__kind=1, __seq=np.nan, __label=None, __ts=turns["ts"])
    s = pd.DataFrame(
        {
            "conv_id": states["conv_id"],
            "__ts": states["state_ts"],
            "__kind": 0,
            "__seq": states["state_seq"].astype("float64"),
            "__label": states["label"],
        }
    )
    u = pd.concat([t, s], ignore_index=True)
    u = u.sort_values(
        ["conv_id", "__ts", "__kind", "__seq"], kind="mergesort", na_position="last"
    )
    u["label"] = u.groupby("conv_id")["__label"].ffill()
    out = u[u["__kind"] == 1].drop(columns=["__kind", "__seq", "__label", "__ts"])
    return sort_stable(out)


def turn_gaps(df: pd.DataFrame) -> pd.DataFrame:
    s = sort_stable(df)
    ms = _ms(s["ts"])
    g = s.groupby("conv_id", sort=False)
    s["gap_ms"] = ms.groupby(s["conv_id"]).diff()
    s["lead_gap_ms"] = -ms.groupby(s["conv_id"]).diff(-1)
    _ = g
    return s


def forward_fill(df: pd.DataFrame, col: str = "tool") -> pd.DataFrame:
    s = sort_stable(df)
    s[f"{col}_ffill"] = s.groupby("conv_id")[col].ffill()
    return s


def backward_fill(df: pd.DataFrame, col: str = "tool") -> pd.DataFrame:
    s = sort_stable(df)
    s[f"{col}_bfill"] = s.groupby("conv_id")[col].bfill()
    return s


def running_role_counts(df: pd.DataFrame, roles: list[str]) -> pd.DataFrame:
    s = sort_stable(df)
    for r in roles:
        s[f"n_{r}_so_far"] = (
            (s["role"] == r).astype("int64").groupby(s["conv_id"]).cumsum()
        )
    return s


def rolling_gap_stats(df: pd.DataFrame, k: int) -> pd.DataFrame:
    s = turn_gaps(df)
    g = s.groupby("conv_id")["gap_ms"]
    s["gap_roll_mean"] = g.transform(lambda x: x.rolling(k, min_periods=1).mean())
    s["gap_roll_min"] = g.transform(lambda x: x.rolling(k, min_periods=1).min())
    s["gap_roll_max"] = g.transform(lambda x: x.rolling(k, min_periods=1).max())
    s["gap_roll_n"] = g.transform(lambda x: x.rolling(k, min_periods=1).count())
    return s


def sessionize(df: pd.DataFrame, gap_s: float) -> pd.DataFrame:
    s = turn_gaps(df)
    new = s["gap_ms"].isna() | (s["gap_ms"] > gap_s * 1000)
    s["session_id"] = new.astype("int64").groupby(s["conv_id"]).cumsum() - 1
    return s


def session_summary(s: pd.DataFrame) -> pd.DataFrame:
    ms = _ms(s["ts"])
    out = (
        s.assign(__ms=ms)
        .groupby(["conv_id", "session_id"], sort=True)
        .agg(
            n_turns=("turn_idx", "size"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            lo=("__ms", "min"),
            hi=("__ms", "max"),
        )
        .reset_index()
    )
    out["duration_ms"] = out["hi"] - out["lo"]
    return out.drop(columns=["lo", "hi"])


def user_aggregate(df_gaps: pd.DataFrame) -> pd.DataFrame:
    d = df_gaps[df_gaps["gap_ms"].notna()]
    def agg(g: pd.DataFrame) -> pd.Series:
        v = g["gap_ms"].to_numpy(dtype="float64")
        q1, md, q3 = np.percentile(v, [25, 50, 75], method="linear")
        return pd.Series(
            {
                "nrecords": g["turn_idx"].nunique(),
                "gap_ms_md": md,
                "gap_ms_iqr": q3 - q1,
            }
        )
    return d.groupby("conv_id", sort=True).apply(agg, include_groups=False).reset_index()


def window_features(
    df: pd.DataFrame, window: int = 8, overlap: float = 0.5, bins: int = 10
) -> pd.DataFrame:
    """Independent reimplementation of the kernel spec (FIXTURES.md §4.3):
    strided windows over per-conversation gap series; mean/median/IQR +
    histogram entropy with bin = clip(floor((x-min)/(max-min)*B), 0, B-1)."""
    step = max(1, int(round(window * (1.0 - overlap))))
    rows = []
    for conv, g in sort_stable(df).groupby("conv_id", sort=True):
        ms = _ms(g["ts"]).to_numpy()
        tid = g["turn_idx"].to_numpy()
        if len(ms) < 2:
            rows.append((conv, -1, 0, -1, -1, np.nan, np.nan, np.nan, np.nan,
                         f"group too small: {len(ms)} turns"))
            continue
        gaps = np.diff(ms).astype("float64")
        t_end = tid[1:]
        if len(gaps) < window:
            starts = [0]
            wins = [gaps]
        else:
            starts = list(range(0, len(gaps) - window + 1, step))
            wins = [gaps[i:i + window] for i in starts]
        for wi, (st, wv) in enumerate(zip(starts, wins)):
            q1, md, q3 = np.percentile(wv, [25, 50, 75], method="linear")
            lo, hi = wv.min(), wv.max()
            if hi > lo:
                idx = np.clip(
                    np.floor((wv - lo) / (hi - lo) * bins).astype(int), 0, bins - 1
                )
                p = np.bincount(idx, minlength=bins) / len(wv)
                p = p[p > 0]
                ent = float(-(p * np.log(p)).sum())
            else:
                ent = 0.0
            rows.append((conv, wi, len(wv), t_end[st], t_end[st + len(wv) - 1],
                         wv.mean(), md, q3 - q1, ent, None))
    return pd.DataFrame(
        rows,
        columns=["conv_id", "window_idx", "n", "start_turn_idx", "end_turn_idx",
                 "mean_gap_ms", "median_gap_ms", "iqr_gap_ms", "entropy_gap", "error"],
    )
