from pyspark.sql import functions as F

from mpower_feature_analysis_spark.operators.curation import (
    curate_sparse_state,
    normalize_version,
    recode_by_regex,
    remove_test_users,
)


def test_recode_by_regex_first_match_wins(spark):
    df = spark.createDataFrame(
        [("iPhone 12;ios",), ("iPad Pro",), ("Pixel 7",), ("unknown",)],
        "phone string",
    )
    out = [
        r.kind
        for r in df.select(
            recode_by_regex(
                "phone",
                [("iPhone|iPad", "apple"), ("Pixel", "google")],
                default="other",
            ).alias("kind")
        ).collect()
    ]
    assert out == ["apple", "apple", "google", "other"]


def test_normalize_version(spark):
    df = spark.createDataFrame(
        [("mPower, version 1.4.2",), ("app 2.0",), ("none",)], "appVersion string"
    )
    out = [r.version_norm for r in df.select(normalize_version("appVersion")).collect()]
    assert out == ["1.4.2", "2.0", ""]


def test_remove_test_users(spark, dedup_df):
    test = spark.createDataFrame(
        [(r.conv_id,) for r in dedup_df.select("conv_id").distinct().limit(3).collect()],
        "conv_id string",
    )
    out = remove_test_users(dedup_df, test)
    assert out.join(test, "conv_id", "left_semi").count() == 0
    assert out.count() == dedup_df.join(test, "conv_id", "left_anti").count()


def test_curate_sparse_state(spark, dedup_df):
    out = curate_sparse_state(dedup_df, "tool")
    assert out.filter(F.col("tool").isNull()).count() == 0
    # schema probe: absent column materializes as nullable string
    probe = curate_sparse_state(dedup_df.drop("tool"), "tool")
    assert dict(probe.dtypes)["tool"] == "string"
    assert probe.filter(F.col("tool").isNotNull()).count() == 0
