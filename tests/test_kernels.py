import numpy as np
import pytest
import pandas as pd

from mpower_feature_analysis_spark import oracle
from mpower_feature_analysis_spark.operators import windowed_summary_features

SORT = ["conv_id", "window_idx"]


def _run(df, **kw):
    return (
        windowed_summary_features(df, **kw).orderBy(*SORT).toPandas()
    )


def test_matches_pandas_oracle(spark, dedup_df, dedup_pdf):
    got = _run(dedup_df, window=8, overlap=0.5)
    want = oracle.window_features(dedup_pdf, window=8, overlap=0.5)
    want = want.sort_values(SORT, kind="mergesort").reset_index(drop=True)
    assert len(got) == len(want)
    for c in ["conv_id", "window_idx", "n", "start_turn_idx", "end_turn_idx"]:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy())
    for c in ["mean_gap_ms", "median_gap_ms", "iqr_gap_ms", "entropy_gap"]:
        np.testing.assert_allclose(
            got[c].to_numpy(dtype="float64"),
            want[c].to_numpy(dtype="float64"),
            rtol=1e-9, equal_nan=True, err_msg=c,
        )


def test_strategies_identical(spark, dedup_df):
    a = _run(dedup_df, strategy="applyInPandas")
    b = _run(dedup_df, strategy="mapInPandas")
    pd.testing.assert_frame_equal(a, b)


def test_skew_split_identical(spark, dedup_df):
    """Hot-conversation range-splitting with boundary overlap reproduces the
    unsplit output exactly — SURVEY.md §4 skew handling for kernels."""
    from mpower_feature_analysis_spark.operators import (
        windowed_summary_features_skew_split,
    )
    a = _run(dedup_df, window=8, overlap=0.5)
    for split in (16, 64):
        b = (
            windowed_summary_features_skew_split(
                dedup_df, window=8, overlap=0.5, split_turns=split
            )
            .orderBy(*SORT)
            .toPandas()
        )
        pd.testing.assert_frame_equal(a, b)


def test_arrow_path_identical(spark, dedup_df):
    """mapInArrow zero-copy path == pandas kernel, bit-exact."""
    from mpower_feature_analysis_spark.operators.kernels import (
        windowed_summary_features_arrow,
    )
    a = _run(dedup_df, window=8, overlap=0.5)
    b = (
        windowed_summary_features_arrow(dedup_df, window=8, overlap=0.5)
        .orderBy(*SORT)
        .toPandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_jvm_path_identical(spark, dedup_df):
    """The no-Python JVM formulation (explode-to-windows + hash aggs +
    exact percentile) reproduces the pandas kernel: exact on ints/strings,
    1e-12 allclose on floats (summation-order differences only)."""
    from mpower_feature_analysis_spark.operators import windowed_summary_features_jvm

    a = _run(dedup_df, window=8, overlap=0.5)
    b = (
        windowed_summary_features_jvm(dedup_df, window=8, overlap=0.5)
        .orderBy(*SORT)
        .toPandas()
    )
    assert len(a) == len(b)
    for c in ("conv_id", "window_idx", "n", "start_turn_idx", "end_turn_idx", "error"):
        assert list(a[c].fillna("∅")) == list(b[c].fillna("∅")), c
    for c in ("mean_gap_ms", "median_gap_ms", "iqr_gap_ms", "entropy_gap"):
        np.testing.assert_allclose(
            a[c].to_numpy("float64"), b[c].to_numpy("float64"),
            rtol=1e-12, equal_nan=True, err_msg=c,
        )


def test_skew_split_rejects_misaligned_chunk(spark, dedup_df):
    from mpower_feature_analysis_spark.operators import (
        windowed_summary_features_skew_split,
    )
    with pytest.raises(ValueError):
        windowed_summary_features_skew_split(dedup_df, window=8, overlap=0.5, split_turns=33)


def test_type7_quantile_parity(spark):
    """Exact type-7 (R default / np linear) quantiles inside kernels."""
    ts0 = 1_700_000_000_000
    gaps = [1000, 3000, 2000, 10000, 4000, 8000, 6000, 5000, 7000]
    ts = np.cumsum([0] + gaps) + ts0
    t = pd.DataFrame({
        "conv_id": "c",
        "turn_idx": np.arange(len(ts), dtype="int32"),
        "ts": pd.to_datetime(ts, unit="ms"),
    })
    tdf = spark.createDataFrame(t, "conv_id string, turn_idx int, ts timestamp")
    got = _run(tdf, window=9, overlap=0.5)
    v = np.array(gaps, dtype="float64")
    q1, md, q3 = np.percentile(v, [25, 50, 75], method="linear")
    assert got.loc[0, "median_gap_ms"] == md
    assert got.loc[0, "iqr_gap_ms"] == q3 - q1


def test_error_channel_for_tiny_groups(spark):
    t = spark.createDataFrame(
        [("solo", 0, "2024-01-01 00:00:00")],
        "conv_id string, turn_idx int, ts_s string",
    ).selectExpr("conv_id", "turn_idx", "cast(ts_s as timestamp) as ts")
    out = _run(t)
    assert len(out) == 1
    assert out.loc[0, "error"] == "group too small: 1 turns"
    assert np.isnan(out.loc[0, "mean_gap_ms"])


def test_constant_gaps_zero_entropy(spark):
    ts0 = 1_700_000_000_000
    ts = ts0 + np.arange(12) * 1000
    t = pd.DataFrame({
        "conv_id": "c",
        "turn_idx": np.arange(12, dtype="int32"),
        "ts": pd.to_datetime(ts, unit="ms"),
    })
    tdf = spark.createDataFrame(t, "conv_id string, turn_idx int, ts timestamp")
    got = _run(tdf, window=8, overlap=0.5)
    assert (got["entropy_gap"] == 0.0).all()
    assert (got["iqr_gap_ms"] == 0.0).all()


def test_skew_split_rejects_chunk_smaller_than_window(spark, dedup_df):
    from mpower_feature_analysis_spark.operators import (
        windowed_summary_features_skew_split,
    )
    with pytest.raises(ValueError, match=">= window"):
        windowed_summary_features_skew_split(
            dedup_df, window=8, overlap=0.5, split_turns=4
        )


def test_presorted_layout_equals_default(spark, dedup_df, tmp_path):
    """The shuffle-free presorted mapInArrow path over a bucketed, sorted
    parquet layout (what write_stable_parquet produces) reproduces the
    default repartition+sort path exactly — the scaling bench relies on it."""
    from mpower_feature_analysis_spark.operators.kernels import (
        windowed_summary_features_arrow,
    )
    from mpower_feature_analysis_spark.sources.io import write_stable_parquet

    path = str(tmp_path / "sorted_transcripts")
    write_stable_parquet(
        dedup_df, path, key_col="conv_id",
        order_cols=("conv_id", "turn_idx", "ts"), n_partitions=4,
    )
    back = spark.read.parquet(path)
    a = (
        windowed_summary_features_arrow(back, window=8, overlap=0.5, presorted=True)
        .orderBy(*SORT).toPandas()
    )
    b = (
        windowed_summary_features_arrow(back, window=8, overlap=0.5)
        .orderBy(*SORT).toPandas()
    )
    pd.testing.assert_frame_equal(a, b)
    # and no exchange in the presorted plan
    import io as _io
    from contextlib import redirect_stdout
    buf = _io.StringIO()
    with redirect_stdout(buf):
        windowed_summary_features_arrow(back, window=8, presorted=True).explain()
    assert "Exchange" not in buf.getvalue()


def test_arrow_shuffle_key_variant_identical(spark):
    """Shuffling the arrow kernel on a 1:1 precursor key (user_id) instead
    of the derived conv_id string reproduces the default output exactly —
    and plans with a single exchange end-to-end from events."""
    from mpower_feature_analysis_spark.operators.kernels import (
        windowed_summary_features_arrow,
    )
    from mpower_feature_analysis_spark.transcripts import (
        events_df, transcripts_from_events,
    )
    sf = "/root/testdata/sf0.001"
    t_keyed = transcripts_from_events(events_df(spark, sf), keep_key=True)
    t_plain = transcripts_from_events(events_df(spark, sf))
    a = (
        windowed_summary_features_arrow(t_keyed, window=8, shuffle_key="user_id")
        .orderBy(*SORT).toPandas()
    )
    b = (
        windowed_summary_features_arrow(t_plain, window=8)
        .orderBy(*SORT).toPandas()
    )
    pd.testing.assert_frame_equal(a, b)
    import io as _io
    import re as _re
    from contextlib import redirect_stdout
    buf = _io.StringIO()
    with redirect_stdout(buf):
        windowed_summary_features_arrow(
            t_keyed, window=8, shuffle_key="user_id"
        ).explain("formatted")
    assert len(_re.findall(r"\(\d+\) Exchange", buf.getvalue())) == 1


def test_mapinpandas_honors_shuffle_key(spark, dedup_df):
    """ADVICE round 2: the min_turns fallback used to silently drop
    shuffle_key; now the pandas path partitions/sorts by it (same sort-key
    construction as the arrow path) and output equality holds."""
    from pyspark.sql import functions as F
    df = dedup_df.withColumn("user_key", F.col("conv_id"))
    base = windowed_summary_features(
        df, window=8, min_turns=3, strategy="mapInPandas"
    ).orderBy("conv_id", "window_idx").collect()
    keyed = windowed_summary_features(
        df, window=8, min_turns=3, strategy="mapInPandas", shuffle_key="user_key"
    ).orderBy("conv_id", "window_idx").collect()
    assert base == keyed


def test_applyinpandas_rejects_shuffle_key(spark, dedup_df):
    import pytest
    from pyspark.sql import functions as F
    df = dedup_df.withColumn("user_key", F.col("conv_id"))
    with pytest.raises(ValueError, match="cannot honor shuffle_key"):
        windowed_summary_features(
            df, window=8, strategy="applyInPandas", shuffle_key="user_key"
        )
