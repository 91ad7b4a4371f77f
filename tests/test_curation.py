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


def test_normalize_time_units_per_group(spark):
    """Groups with ms-scale medians are divided by 1000; s-scale groups
    untouched (curation_utils.R:15-22 heuristic)."""
    from mpower_feature_analysis_spark.operators.curation import (
        normalize_time_units,
    )
    rows = [("ms", float(v)) for v in (900_000, 1_000_000, 1_100_000)]
    rows += [("s", float(v)) for v in (900, 1000, 1100)]
    df = spark.createDataFrame(rows, "conv_id string, t double")
    got = {(r.conv_id, i): r.t for i, r in enumerate(
        normalize_time_units(df, "t").orderBy("conv_id", "t").collect())}
    vals = sorted(v for (g, _), v in got.items() if g == "ms")
    assert vals == [900.0, 1000.0, 1100.0]       # scaled from ms
    vals_s = sorted(v for (g, _), v in got.items() if g == "s")
    assert vals_s == [900.0, 1000.0, 1100.0]     # untouched (median 1000 not > 1000)
