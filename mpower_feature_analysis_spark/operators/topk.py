"""Top-K per group (W12/O2).

Reference: ``order(nrecords, decreasing=TRUE)`` then take first n per match
class (/root/reference/utils/analysis_utils.R:26-43); ``slice(1:30)`` top
features (aggregate_tremor_features.R:61-68). Engine: row_number over a
per-group window — shuffle on the group key only, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_by: list[str],
    order_by: list,
    k: int,
    rank_col: str = "rank",
    keep_rank: bool = True,
) -> DataFrame:
    w = W.partitionBy(*group_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)
