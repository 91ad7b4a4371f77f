import numpy as np

from mpower_feature_analysis_spark import oracle
from mpower_feature_analysis_spark.operators import (
    group_median_iqr,
    ordered_categorical_max,
    turn_gaps,
    user_aggregate,
)


def test_user_aggregate_type7_parity(spark, dedup_df, dedup_pdf):
    g = turn_gaps(dedup_df).filter("gap_ms is not null")
    got = user_aggregate(g, value_cols=["gap_ms"]).orderBy("conv_id").toPandas()
    want = oracle.user_aggregate(oracle.turn_gaps(dedup_pdf))
    np.testing.assert_array_equal(got["nrecords"].to_numpy(), want["nrecords"].to_numpy())
    np.testing.assert_allclose(
        got["gap_ms_md"].to_numpy("float64"), want["gap_ms_md"].to_numpy("float64"), rtol=0
    )
    np.testing.assert_allclose(
        got["gap_ms_iqr"].to_numpy("float64"), want["gap_ms_iqr"].to_numpy("float64"), rtol=0
    )


def test_group_median_iqr_regex_selection(spark, dedup_df):
    g = turn_gaps(dedup_df)
    out = group_median_iqr(g, ["conv_id"], col_regex="^gap_")
    assert {"gap_ms_md", "gap_ms_iqr"}.issubset(set(out.columns))


def test_ordered_categorical_max(spark):
    levels = ["no_answer", "control", "parkinsons"]
    df = spark.createDataFrame(
        [("a", "control"), ("a", "no_answer"), ("b", "parkinsons"), ("b", "control")],
        "k string, g string",
    )
    out = {r.k: r.g_max for r in ordered_categorical_max(df, ["k"], "g", levels).collect()}
    assert out == {"a": "control", "b": "parkinsons"}


def test_ordered_categorical_max_unknown_levels(spark):
    """Values outside the level list rank below all known levels; an
    all-unknown group decodes to NULL (not a runtime error) — matches the
    DuckDB oracle's CASE semantics."""
    levels = ["no_answer", "control", "parkinsons"]
    df = spark.createDataFrame(
        [("a", "control"), ("a", "MYSTERY"), ("b", "MYSTERY"), ("b", "???")],
        "k string, g string",
    )
    out = {r.k: r.g_max for r in ordered_categorical_max(df, ["k"], "g", levels).collect()}
    assert out == {"a": "control", "b": None}


def test_user_aggregate_records_unique_equals_distinct(spark, dedup_df):
    """records_unique=True (plain count) must reproduce the countDistinct
    rollup exactly when the record column is unique per entity — the
    round-7 fast path used by q_user_aggregate, where turn_idx is a
    row_number derivation."""
    g = turn_gaps(dedup_df).filter("gap_ms is not null")
    a = user_aggregate(g, value_cols=["gap_ms"]).orderBy("conv_id").collect()
    b = user_aggregate(g, value_cols=["gap_ms"], records_unique=True).orderBy(
        "conv_id").collect()
    assert a == b
