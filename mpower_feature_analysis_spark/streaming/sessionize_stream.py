"""Structured Streaming sessionization — the swap-in counterpart of the
batch gap-threshold operator (operators/sessionize.py).

The reference is batch-only (SURVEY.md §2.10: no streams anywhere in the
repo), so this is forward-looking engine surface, not parity: the same
session semantics expressed with ``F.session_window(ts, gap)`` + watermark,
so a transcript stream can be sessionized incrementally with bounded state.

Batch/stream agreement: for a fully-delivered conversation,
``session_window`` merges turns whose gaps are < gap (strict), while the
batch operator starts a new session when gap > threshold (strict). The two
agree everywhere except gaps EXACTLY equal to the threshold — the batch
operator keeps them together, session_window splits. Tests assert agreement
on threshold-free data and document the boundary difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    turns: DataFrame,
    gap_s: float = 3600.0,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "conv_id",
) -> DataFrame:
    """Per (conv_id, session window): turn count + span. Works on a
    streaming DataFrame (append mode after watermark close) and equally on
    a batch DataFrame for testing."""
    src = turns
    if turns.isStreaming:
        src = turns.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), f"{int(gap_s)} seconds").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            key_col,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_turns", "session_start", "session_end",
        )
    )


def run_stream_once(spark, input_dir: str, schema: str, gap_s: float, query_name: str) -> DataFrame:
    """Drive a parquet-backed stream to completion synchronously (memory
    sink), returning the materialized result — the local smoke-test harness
    for the streaming path."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    out = sessionize_stream(stream, gap_s=gap_s)
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
