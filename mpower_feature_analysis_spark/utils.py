"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_ms(col) -> Column:
    """Epoch milliseconds (BIGINT) of a timestamp column.

    Parquet written without timezone loads as TIMESTAMP_NTZ, which
    ``unix_millis`` rejects; with the session timezone pinned to UTC
    (session.py) the cast to TIMESTAMP preserves the instant exactly.
    Integer milliseconds keep gap features exact across engines (no float
    epoch rounding).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp"))
