"""Metadata curation chain (EP2 step 2) — the reference's
``curate_app_version → curate_med_timepoint → curate_phone_info →
remove_test_user`` pipeline (utils/curation_utils.R:26-95) as Catalyst
expressions: case_when recode ladders, regex normalization, anti-join
test-user removal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def recode_by_regex(
    col: Column | str, rules: list[tuple[str, str]], default: Column | str | None = None
) -> Column:
    """Ordered regex → value ladder (curate_phone_info's case_when over
    str_detect, utils/curation_utils.R:66-86). First match wins."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for pattern, value in rules:
        cond = c.rlike(pattern)
        expr = F.when(cond, value) if expr is None else expr.when(cond, value)
    if expr is None:
        raise ValueError("rules must be non-empty")
    if default is None:
        return expr.otherwise(c)
    return expr.otherwise(default if isinstance(default, Column) else F.lit(default))


def normalize_version(col: Column | str, out: str = "version_norm") -> Column:
    """Extract the numeric version from 'name, version X.Y' strings
    (separate(appVersion, ','), curation_utils.R:26-33 + str_extract of
    digits, extract_mhealthtools_tapping_features.R:60)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"([0-9]+(\.[0-9]+)*)", 1).alias(out)


def remove_test_users(
    df: DataFrame, test_users: DataFrame, on: str = "conv_id"
) -> DataFrame:
    """Anti-join removal of test accounts (P8/J6,
    utils/curation_utils.R:89-95). Broadcast the (small) test-user list."""
    return df.join(F.broadcast(test_users.select(on).distinct()), on, "left_anti")


def curate_sparse_state(
    df: DataFrame, col: str = "tool", none_value: str = "none"
) -> DataFrame:
    """curate_med_timepoint analog (utils/curation_utils.R:56-63): probe for
    the column, recode nulls of the sparse state column to an explicit
    'none' level so group-bys don't drop them."""
    if col not in df.columns:  # schema probe → static nullable column
        return df.withColumn(col, F.lit(None).cast("string"))
    return df.withColumn(col, F.coalesce(F.col(col), F.lit(none_value)))
