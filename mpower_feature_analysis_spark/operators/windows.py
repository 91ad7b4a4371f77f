"""Window-function temporal features over per-conversation order.

The reference computes these implicitly inside its per-record R loop
(SURVEY.md §2.5): zero-based timestamps (``t = timestamp - .$timestamp[1]``,
utils/curation_utils.R:107-110), diff/diffinv derivatives
(extract_mhealthtools_tremor_features_mpower1.R:141-157), first-14-days
enrollment filters (feature_processing/superusers/get_baseline_activity.R:16-42).
Here they are explicit ``Window.partitionBy(conv_id).orderBy(turn_idx, ts)``
operators: lag/lead gaps, per-role running counts, rolling trailing-k stats.

All JVM-side window exprs; gaps are BIGINT milliseconds (``unix_millis``)
so results are integer-exact across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..utils import ts_ms


def conv_window(
    partition_by: list[str] | str = "conv_id",
    order_by: list[str] | None = None,
):
    parts = [partition_by] if isinstance(partition_by, str) else partition_by
    return W.partitionBy(*parts).orderBy(*(order_by or ["turn_idx", "ts"]))


def turn_gaps(
    df: DataFrame,
    partition_by: str = "conv_id",
    order_by: list[str] | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Per turn: gap to previous turn and to next turn, in ms (nullable at
    conversation edges). lag = W6 diff; lead mirrors it."""
    w = conv_window(partition_by, order_by)
    ms = ts_ms(ts_col)
    return df.withColumn("gap_ms", (ms - F.lag(ms).over(w)).cast("long")).withColumn(
        "lead_gap_ms", (F.lead(ms).over(w) - ms).cast("long")
    )


def per_role_running_counts(
    df: DataFrame,
    roles: list[str],
    partition_by: str = "conv_id",
    order_by: list[str] | None = None,
    role_col: str = "role",
) -> DataFrame:
    """Cumulative count of each role up to and including the current turn
    (reference analog: n_distinct/record counting per cohort,
    aggregate_tapping_features.R:87-91 — made per-turn and leak-free)."""
    w = conv_window(partition_by, order_by).rowsBetween(W.unboundedPreceding, W.currentRow)
    for r in roles:
        df = df.withColumn(
            f"n_{r}_so_far",
            F.sum(F.when(F.col(role_col) == r, 1).otherwise(0)).over(w).cast("long"),
        )
    return df


def rolling_stats(
    df: DataFrame,
    value_col: str,
    k: int,
    partition_by: str = "conv_id",
    order_by: list[str] | None = None,
    prefix: str | None = None,
) -> DataFrame:
    """Trailing-k-row rolling mean/min/max/count of ``value_col``
    (reference analog: overlapping fixed-length signal windows,
    extract_mhealthtools_tremor_features_mpower1.R:135-139 — the per-row
    rolling form; the strided segment form lives in kernels.py)."""
    p = prefix or f"{value_col}_roll{k}"
    w = conv_window(partition_by, order_by).rowsBetween(-(k - 1), W.currentRow)
    v = F.col(value_col)
    return (
        df.withColumn(f"{p}_mean", F.avg(v).over(w))
        .withColumn(f"{p}_min", F.min(v).over(w))
        .withColumn(f"{p}_max", F.max(v).over(w))
        .withColumn(f"{p}_n", F.count(v).over(w).cast("long"))
    )


def zero_base_ts(
    df: DataFrame,
    partition_by: str = "conv_id",
    order_by: list[str] | None = None,
    ts_col: str = "ts",
    out_col: str = "t_rel_ms",
) -> DataFrame:
    """W2: per-group zero-based time axis
    (``t = timestamp - .$timestamp[1]``, utils/curation_utils.R:107-110)."""
    w = conv_window(partition_by, order_by).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    ms = ts_ms(ts_col)
    return df.withColumn(out_col, (ms - F.min(ms).over(w)).cast("long"))


def enrollment_window_filter(
    df: DataFrame,
    days: int = 14,
    partition_by: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """W4: keep each entity's first ``days`` days of activity
    (get_baseline_activity.R:16-42) — pure window, no nest/unnest."""
    w = W.partitionBy(partition_by)
    first_ts = F.min(F.col(ts_col)).over(w)
    return df.withColumn("__first_ts", first_ts).filter(
        F.col(ts_col) <= F.col("__first_ts") + F.expr(f"INTERVAL {days} DAYS")
    ).drop("__first_ts")
