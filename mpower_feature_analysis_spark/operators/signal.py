"""Extended signal-statistics kernel (W8-W10): time-domain summary with
skewness/kurtosis, lag autocorrelation, linear detrend, and a
windowed-sinc FIR band-pass — pure numpy (scipy is not in this container;
the FIR designer is the textbook hamming-windowed sinc).

Reference: mpowertools/mhealthtools time & frequency domain summaries per
overlapping window (extract_mhealthtools_tremor_features_mpower1.R:104-174:
loess detrend → band-pass filter → windowSignal → per-window stats → ACF).
Same pipeline shape, re-specced deterministically:

  detrend (least-squares line) → optional FIR band-pass → overlapping
  windows → {mean, sd, skew, kurtosis (excess), acf_lag1..m, spectral
  energy in band} per window.

Runs per conversation/sensor-group under the same mapInPandas/applyInPandas
harness as kernels.py; one row per window; error-channel column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

SIGNAL_FEATURE_SCHEMA = (
    "conv_id string, window_idx int, n int, "
    "mean double, sd double, skew double, kurtosis double, "
    "acf1 double, acf2 double, energy double, error string"
)


def linear_detrend(x: np.ndarray) -> np.ndarray:
    """Remove the least-squares line (deterministic loess stand-in)."""
    n = len(x)
    if n < 2:
        return x - x.mean() if n else x
    t = np.arange(n, dtype="float64")
    tm, xm = t.mean(), x.mean()
    denom = ((t - tm) ** 2).sum()
    slope = ((t - tm) * (x - xm)).sum() / denom if denom else 0.0
    return x - (xm + slope * (t - tm))


def fir_bandpass(n_taps: int, low: float, high: float) -> np.ndarray:
    """Hamming-windowed sinc band-pass (normalized cutoffs in (0, 1),
    Nyquist = 1). numpy-only equivalent of scipy.signal.firwin(pass_zero
    ='bandpass')."""
    assert n_taps % 2 == 1, "odd tap count keeps linear phase"
    m = np.arange(n_taps) - (n_taps - 1) / 2
    h = high * np.sinc(high * m) - low * np.sinc(low * m)
    h *= np.hamming(n_taps)
    # normalize passband center gain to 1
    fc = (low + high) / 2
    gain = np.abs(np.sum(h * np.exp(-1j * np.pi * fc * np.arange(n_taps))))
    return h / gain if gain > 0 else h


def apply_fir(x: np.ndarray, taps: np.ndarray) -> np.ndarray:
    """Zero-phase-ish filtering: same-length 'same' convolution."""
    return np.convolve(x, taps, mode="same")


def _moments(sw: np.ndarray):
    """Vectorized per-row mean/sd/skew/excess-kurtosis (population
    moments, ddof=0 — the deterministic spec mirrored by tests).

    Powers are explicit multiplies and the skew denominator is
    ``m2*sqrt(m2)`` — IEEE-deterministic ops any SQL engine reproduces
    bit-for-bit (libm ``pow`` is not), so the DuckDB oracle can match."""
    mean = sw.mean(axis=1)
    d = sw - mean[:, None]
    d2 = d * d
    m2 = d2.mean(axis=1)
    m3 = (d2 * d).mean(axis=1)
    m4 = (d2 * d2).mean(axis=1)
    sd = np.sqrt(m2)
    with np.errstate(divide="ignore", invalid="ignore"):
        skew = np.where(m2 > 0, m3 / (m2 * sd), 0.0)
        kurt = np.where(m2 > 0, m4 / (m2 * m2) - 3.0, 0.0)
    return mean, sd, skew, kurt


def _acf(sw: np.ndarray, lag: int) -> np.ndarray:
    """Per-row autocorrelation at ``lag`` (R acf convention: denominator is
    the lag-0 sum of squares over the full window)."""
    d = sw - sw.mean(axis=1, keepdims=True)
    denom = (d ** 2).sum(axis=1)
    num = (d[:, lag:] * d[:, :-lag]).sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(denom > 0, num / denom, 0.0)


def make_signal_kernel(
    window: int = 64,
    overlap: float = 0.5,
    value_col: str = "value",
    detrend: bool = True,
    band: tuple[float, float] | None = None,
    n_taps: int = 21,
):
    """Per-group kernel over a numeric signal column ordered by
    (turn_idx, ts): detrend → optional band-pass → overlapping windows →
    moments + acf + energy."""
    step = max(1, int(round(window * (1.0 - overlap))))
    taps = fir_bandpass(n_taps, *band) if band else None

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        conv = pdf["conv_id"].iloc[0]

        def err(msg: str) -> pd.DataFrame:
            return pd.DataFrame({
                "conv_id": [conv], "window_idx": [np.int32(-1)], "n": [np.int32(0)],
                "mean": [np.nan], "sd": [np.nan], "skew": [np.nan],
                "kurtosis": [np.nan], "acf1": [np.nan], "acf2": [np.nan],
                "energy": [np.nan], "error": [msg],
            })

        try:
            g = pdf.sort_values(["turn_idx", "ts"], kind="mergesort")
            x = g[value_col].to_numpy(dtype="float64")
            x = x[~np.isnan(x)]
            if len(x) < 4:
                return err(f"group too small: {len(x)} samples")
            if detrend:
                x = linear_detrend(x)
            if taps is not None:
                x = apply_fir(x, taps)
            if len(x) < window:
                sw = x[None, :]
            else:
                sw = np.lib.stride_tricks.sliding_window_view(x, window)[::step]
            mean, sd, skew, kurt = _moments(sw)
            return pd.DataFrame({
                "conv_id": conv,
                "window_idx": np.arange(sw.shape[0], dtype="int32"),
                "n": np.full(sw.shape[0], sw.shape[1], dtype="int32"),
                "mean": mean, "sd": sd, "skew": skew, "kurtosis": kurt,
                "acf1": _acf(sw, 1), "acf2": _acf(sw, 2),
                "energy": (sw ** 2).mean(axis=1),
                "error": None,
            })
        except Exception as e:  # F5: error channel, never a task failure
            return err(f"{type(e).__name__}: {e}")

    return kernel


def signal_summary_features(
    df: DataFrame,
    value_col: str = "value",
    window: int = 64,
    overlap: float = 0.5,
    detrend: bool = True,
    band: tuple[float, float] | None = None,
    group_col: str = "conv_id",
    shuffle_key: str | None = None,
) -> DataFrame:
    """Per-group signal summary via applyInPandas.

    ``shuffle_key``: physical grouping column when it differs from
    ``group_col`` but partitions identically (e.g. ``user_id`` when
    conv_id = f(user_id)) — lets Catalyst reuse an upstream exchange on
    that key instead of re-shuffling on the derived string column. The
    kernel still labels output rows by ``group_col``.
    """
    kernel = make_signal_kernel(
        window=window, overlap=overlap, value_col=value_col,
        detrend=detrend, band=band,
    )
    key = shuffle_key or group_col
    cols = [group_col, "turn_idx", "ts", value_col]
    if shuffle_key and shuffle_key not in cols:
        cols.append(shuffle_key)
    return (
        df.select(*cols)
        .groupBy(key)
        .applyInPandas(kernel, SIGNAL_FEATURE_SCHEMA)
    )
