"""Gap-threshold sessionization.

Reference analog: the 90-day burst schedule segmentation of
analysis/mpower_study_burst_summary.R:74-116 (activity records grouped into
time windows per user). The engine's generic form: a new session starts
when the inter-turn gap exceeds ``gap`` — ``lag(ts)`` + running sum of
boundary flags, entirely JVM window exprs, one shuffle on conv_id.

A turn exactly ``gap`` after its predecessor stays in the same session
(boundary is strict ``>``, mirroring the reference's inclusive interval
membership, analysis/mPTS_record.R:31).

Structured Streaming swap-in: the same semantics are available as
``F.session_window(ts, gap)`` — see streaming/sessionize_stream.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..utils import ts_ms


def sessionize(
    df: DataFrame,
    gap_s: float = 3600.0,
    partition_by: str = "conv_id",
    order_by: list[str] | None = None,
    ts_col: str = "ts",
    out_col: str = "session_id",
) -> DataFrame:
    order_by = order_by or ["turn_idx", "ts"]
    w = W.partitionBy(partition_by).orderBy(*order_by)
    ms = ts_ms(ts_col)
    gap_ms = ms - F.lag(ms).over(w)
    is_new = F.when(gap_ms.isNull() | (gap_ms > int(gap_s * 1000)), 1).otherwise(0)
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return df.withColumn(
        out_col, (F.sum(is_new).over(wsum) - F.lit(1)).cast("long")
    )


def session_summary(
    sessions: DataFrame,
    partition_by: str = "conv_id",
    session_col: str = "session_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session rollup: turn count, span, start/end
    (≈ per-burst day counts, mpower_study_burst_summary.R:100-116)."""
    return sessions.groupBy(partition_by, session_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (ts_ms(F.max(ts_col)) - ts_ms(F.min(ts_col)))
        .cast("long")
        .alias("duration_ms"),
    )
