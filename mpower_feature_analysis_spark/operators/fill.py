"""Forward/backward fill of sparse columns over per-entity time order.

Reference analog: sparse ``medTimepoint`` / ``answers.medicationTiming``
carried along per record (/root/reference/utils/curation_utils.R:56-63) and
``summarise_all(last)`` collapse (= fill-to-last). The engine makes fill a
first-class window operator:

* forward fill = ``last(col, ignorenulls=True)`` over
  ``rowsBetween(unboundedPreceding, 0)``
* backward fill = ``first(col, ignorenulls=True)`` over
  ``rowsBetween(0, unboundedFollowing)``

Pure JVM window functions — whole-stage codegen'd, one shuffle per
partitioning (reused across multiple fills on the same keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def forward_fill(
    df: DataFrame,
    cols: list[str],
    partition_by: list[str],
    order_by: list[str],
    suffix: str = "_ffill",
) -> DataFrame:
    w = (
        W.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    for c in cols:
        df = df.withColumn(c + suffix, F.last(c, ignorenulls=True).over(w))
    return df


def backward_fill(
    df: DataFrame,
    cols: list[str],
    partition_by: list[str],
    order_by: list[str],
    suffix: str = "_bfill",
) -> DataFrame:
    w = (
        W.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    for c in cols:
        df = df.withColumn(c + suffix, F.first(c, ignorenulls=True).over(w))
    return df
