import numpy as np
import pandas as pd
import pytest

from mpower_feature_analysis_spark.operators.signal import (
    _acf,
    apply_fir,
    fir_bandpass,
    linear_detrend,
    signal_summary_features,
)


def _make_signal_df(spark, x, conv="c"):
    n = len(x)
    pdf = pd.DataFrame({
        "conv_id": conv,
        "turn_idx": np.arange(n, dtype="int32"),
        "ts": pd.to_datetime(1_700_000_000_000 + np.arange(n) * 10, unit="ms"),
        "value": x,
    })
    return spark.createDataFrame(
        pdf, "conv_id string, turn_idx int, ts timestamp, value double"
    )


def test_moments_match_numpy(spark):
    rng = np.random.default_rng(11)
    x = rng.normal(2.0, 3.0, 200)
    df = _make_signal_df(spark, x)
    out = signal_summary_features(df, window=64, overlap=0.5, detrend=False) \
        .orderBy("window_idx").toPandas()
    xs = np.lib.stride_tricks.sliding_window_view(x, 64)[::32]
    w0 = xs[0]
    assert abs(out.loc[0, "mean"] - w0.mean()) < 1e-12
    assert abs(out.loc[0, "sd"] - w0.std(ddof=0)) < 1e-12
    d = w0 - w0.mean()
    skew = (d ** 3).mean() / (d ** 2).mean() ** 1.5
    kurt = (d ** 4).mean() / (d ** 2).mean() ** 2 - 3
    assert abs(out.loc[0, "skew"] - skew) < 1e-12
    assert abs(out.loc[0, "kurtosis"] - kurt) < 1e-12


def test_acf_detects_periodicity(spark):
    t = np.arange(256, dtype="float64")
    x = np.sin(2 * np.pi * t / 8)  # period 8 → acf at lag 2 = cos(pi/2) ≈ 0
    df = _make_signal_df(spark, x)
    out = signal_summary_features(df, window=64, detrend=False) \
        .orderBy("window_idx").toPandas()
    # lag-1 acf of a period-8 sine ≈ cos(2π/8) ≈ 0.707
    assert abs(out.loc[0, "acf1"] - np.cos(2 * np.pi / 8)) < 0.05


def test_detrend_removes_line():
    x = 3.0 + 0.5 * np.arange(100) + np.sin(np.arange(100))
    d = linear_detrend(x)
    assert abs(d.mean()) < 1e-9
    t = np.arange(100) - 49.5
    slope = (t * d).sum() / (t ** 2).sum()
    assert abs(slope) < 1e-12


def test_fir_bandpass_response():
    taps = fir_bandpass(41, 0.15, 0.35)
    t = np.arange(2000, dtype="float64")
    inband = np.sin(np.pi * 0.25 * t)     # normalized freq 0.25 → passband
    outband = np.sin(np.pi * 0.7 * t)     # 0.7 → stopband
    yi = apply_fir(inband, taps)[100:-100]
    yo = apply_fir(outband, taps)[100:-100]
    gain_in = yi.std() / inband[100:-100].std()
    gain_out = yo.std() / outband[100:-100].std()
    assert gain_in > 0.8
    assert gain_out < 0.1


def test_error_channel_short_group(spark):
    df = _make_signal_df(spark, np.array([1.0, 2.0]))
    out = signal_summary_features(df).collect()
    assert len(out) == 1 and "too small" in out[0]["error"]


def test_nan_values_dropped(spark):
    x = np.concatenate([np.full(5, np.nan), np.arange(80, dtype="float64")])
    df = _make_signal_df(spark, x)
    out = signal_summary_features(df, window=64, detrend=False).collect()
    assert all(r["error"] is None for r in out)
