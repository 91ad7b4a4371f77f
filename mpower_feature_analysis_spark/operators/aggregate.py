"""Grouped aggregation operators: exact median/IQR, user-level rollups,
pivots, ordered-categorical max.

The signature aggregate of the reference is median+IQR across many feature
columns per user: ``summarise(across(matches(...), list(iqr=IQR, md=median),
na.rm=T))`` (/root/reference/feature_processing/aggregate_users/
aggregate_tapping_features.R:91-94 and siblings). R's ``median``/``IQR``
default to type-7 quantiles = linear interpolation at index p*(n-1) — which
is exactly Spark's exact ``percentile`` aggregate and numpy's
``method="linear"``. We therefore use ``F.percentile`` (JVM exact agg), NOT
``percentile_approx``, so allclose parity holds.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def median_iqr_exprs(cols: Sequence[str]) -> list:
    """percentile-based md/iqr agg expressions for each column, named
    ``{col}_md`` / ``{col}_iqr`` (mirrors the reference's ``{col}_md``,
    ``{col}_iqr`` naming, aggregate_tapping_features.R:91-94).

    ONE ``percentile(col, [.25, .5, .75])`` aggregate per column serves
    both outputs — the median is the array's middle element, bit-identical
    to a separate ``percentile(col, 0.5)`` (same buffer, same type-7
    interpolation) at half the aggregation state (round-7: the extra
    percentile buffer collected every value per group a second time)."""
    out = []
    for c in cols:
        q = F.percentile(F.col(c), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
        out.append(q[1].alias(f"{c}_md"))
        out.append((q[2] - q[0]).alias(f"{c}_iqr"))
    return out


def group_median_iqr(
    df: DataFrame,
    group_by: list[str],
    value_cols: Sequence[str] | None = None,
    col_regex: str | None = None,
) -> DataFrame:
    """A2: per-group exact median + IQR across many columns. Columns may be
    picked by regex over names — the reference's ``matches("Inter|Drift")``
    idiom (§1.3) done driver-side."""
    if value_cols is None:
        if col_regex is None:
            raise ValueError("pass value_cols or col_regex")
        pat = re.compile(col_regex)
        value_cols = [
            c for c, t in df.dtypes
            if pat.search(c) and t in ("double", "float", "bigint", "int", "smallint")
        ]
    return df.groupBy(*group_by).agg(*median_iqr_exprs(value_cols))


def user_aggregate(
    features: DataFrame,
    entity_col: str = "conv_id",
    record_col: str = "turn_idx",
    value_cols: Sequence[str] = (),
    records_unique: bool = False,
) -> DataFrame:
    """EP2 user-level rollup: nrecords = distinct record count per entity,
    then median/IQR of each feature (aggregate_tapping_features.R:85-94).
    Single shuffle on the entity key; countDistinct and percentiles share
    the same hash aggregate.

    ``records_unique=True`` asserts the caller KNOWS ``record_col`` is
    unique (and non-null) within each entity — e.g. a ``row_number``
    derivation — and swaps ``countDistinct`` for a plain ``count``:
    identical result, but the distinct aggregate's Expand duplicated the
    whole input row stream through the aggregation (measured +80% on the
    gap rollup at 1M turns, round-7)."""
    nrec = (F.count(F.col(record_col)) if records_unique
            else F.countDistinct(F.col(record_col)))
    aggs = [nrec.alias("nrecords")]
    aggs += median_iqr_exprs(value_cols)
    return features.groupBy(entity_col).agg(*aggs)


def pivot_wide(
    df: DataFrame,
    keys: list[str],
    pivot_col: str,
    pivot_values: list[str],
    value_expr,
    fill: object | None = 0,
) -> DataFrame:
    """U3 long→wide pivot (``pivot_wider``,
    aggregate_tremor_features.R:146-152). Explicit ``pivot_values`` avoids
    the extra distinct-values job — mandatory at scale."""
    out = df.groupBy(*keys).pivot(pivot_col, pivot_values).agg(value_expr)
    if fill is not None:
        out = out.fillna(fill, subset=pivot_values)
    return out


def ordered_categorical_max(
    df: DataFrame,
    group_by: list[str],
    col: str,
    levels: list[str],
    out_col: str | None = None,
) -> DataFrame:
    """§1.2 ordered-factor ``max()`` (extract_demographics.R:74-85): encode
    rank via array_position against the level list, take max, decode."""
    out_col = out_col or f"{col}_max"
    lv = F.array(*[F.lit(x) for x in levels])
    # array_position yields 0 for values not in `levels`; map that to NULL so
    # max() ignores unknowns and an all-unknown group decodes to NULL instead
    # of erroring on element_at(lv, 0)
    rank = F.nullif(F.array_position(lv, F.col(col)), F.lit(0).cast("long"))
    # try_element_at: a NULL max-rank (all-unknown group) decodes to NULL —
    # plain element_at resolves a NULL index to the LAST element here
    return df.groupBy(*group_by).agg(
        F.try_element_at(lv, F.max(rank).cast("int")).alias(out_col)
    )
