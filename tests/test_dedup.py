import pandas as pd

from mpower_feature_analysis_spark import oracle
from mpower_feature_analysis_spark.operators import dedup_exact, dedup_last_wins


def test_last_wins_matches_oracle(spark, transcripts_df, transcripts_pdf):
    got = (
        dedup_last_wins(transcripts_df, ["conv_id", "turn_idx"], ["ts"])
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    want = oracle.dedup_last_wins(transcripts_pdf)[got.columns].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_last_wins_removes_all_dups(spark, transcripts_df):
    d = dedup_last_wins(transcripts_df, ["conv_id", "turn_idx"], ["ts"])
    assert d.groupBy("conv_id", "turn_idx").count().filter("count > 1").count() == 0


def test_last_wins_deterministic(spark, transcripts_df):
    runs = [
        dedup_last_wins(transcripts_df, ["conv_id", "turn_idx"], ["ts"])
        .orderBy("conv_id", "turn_idx")
        .collect()
        for _ in range(2)
    ]
    assert runs[0] == runs[1]


def test_keep_first(spark, transcripts_df, transcripts_pdf):
    got = (
        dedup_last_wins(transcripts_df, ["conv_id", "turn_idx"], ["ts"], keep="first")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    want = (
        transcripts_pdf.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
        .groupby(["conv_id", "turn_idx"], sort=True)
        .head(1)
        .pipe(oracle.sort_stable)[got.columns]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dedup_exact(spark, transcripts_df):
    doubled = transcripts_df.unionByName(transcripts_df)
    d = dedup_exact(doubled, subset=["conv_id", "turn_idx", "ts"])
    assert d.count() == transcripts_df.select("conv_id", "turn_idx", "ts").distinct().count()
    # full-row exact dedup
    d2 = dedup_exact(doubled)
    assert d2.count() == transcripts_df.distinct().count()


def test_last_wins_keys_cover_all_columns(spark):
    """When the dedup keys cover every column there are no tie-break columns
    to hash — the operator must still analyze and dedup correctly."""
    df = spark.createDataFrame([("a", 1), ("a", 1), ("b", 2)], "k string, v int")
    out = dedup_last_wins(df, ["k", "v"], order_by=["v"])
    assert sorted((r.k, r.v) for r in out.collect()) == [("a", 1), ("b", 2)]
