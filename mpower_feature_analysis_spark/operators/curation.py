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


def normalize_time_units(
    df: DataFrame,
    t_col: str = "t",
    group_col: str = "conv_id",
    threshold: float = 1000.0,
    out_col: str | None = None,
) -> DataFrame:
    """ms→s unit heuristic (utils/curation_utils.R:15-22: ``if(median(t) >
    1000) t/1000``): a group whose median time value exceeds ``threshold``
    is in milliseconds — scale the whole group to seconds.

    Grouped EXACT median via the percentile window aggregate (shares the
    group's exchange); the scale is a conditional expression, so the only
    cost is one window pass. The median only gates the branch — output
    values are exactly ``t`` or ``t/1000``, so cross-engine comparison is
    bit-exact as long as no group median sits on the threshold.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col)
    med = F.percentile(F.col(t_col), F.lit(0.5)).over(w)
    scaled = F.when(med > threshold, F.col(t_col) / F.lit(1000.0)).otherwise(
        F.col(t_col)
    )
    return df.withColumn(out_col or t_col, scaled)
