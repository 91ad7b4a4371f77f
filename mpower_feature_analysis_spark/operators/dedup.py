"""Deduplication operators.

Reference semantics: ``group_by(recordId, fileColumnName) %>%
summarise_all(last)`` — last-record-wins on the arrival order of the scan
(/root/reference/utils/helper_utils.R:41-43,117-119). In a distributed
engine "arrival order" is undefined, so the engine makes the ordering
explicit: last-wins by an ``order_by`` column list (typically ``ts``).

Scale notes: one shuffle on the dedup keys; the window + filter form lets
Catalyst push the shuffle exchange that downstream per-key windows reuse.
No ``dropDuplicates`` (its kept-row is partition-order-dependent →
nondeterministic output, which violates the stable-ordering invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def dedup_last_wins(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    keep: str = "last",
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Keep exactly one row per ``keys``: the last (or first) by ``order_by``.

    Deterministic: ties on ``order_by`` are broken by a stable hash of the
    remaining columns so reruns keep the same row.

    ``partition_by`` (a strict prefix of ``keys``) shuffles on that prefix
    only: rows of each key-group are made contiguous by an in-partition sort
    and the winner is the group's first row (lag-change detection). Use it to
    share ONE exchange with downstream windows on the same prefix — e.g.
    dedup per (conv_id, turn_idx) inside a conv_id-partitioned pipeline
    costs zero extra shuffles.
    """
    if keep not in ("first", "last"):
        raise ValueError("keep must be 'first' or 'last'")
    non_key = [c for c in df.columns if c not in set(keys)]
    # zero-arg xxhash64 fails analysis when `keys` covers every column; any
    # constant works then — the group rows are identical on all columns
    tiebreak = F.xxhash64(*non_key) if non_key else F.lit(0).cast("long")
    ordering = [F.col(c) for c in order_by] + [tiebreak]
    if keep == "last":
        ordering = [o.desc() for o in ordering]

    if partition_by is None:
        w = W.partitionBy(*keys).orderBy(*ordering)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    rest = [k for k in keys if k not in set(partition_by)]
    if not rest:
        raise ValueError("partition_by must be a strict prefix of keys")
    w = W.partitionBy(*partition_by).orderBy(
        *[F.col(k).asc() for k in rest], *ordering
    )
    prev = F.lag(F.struct(*[F.col(k) for k in rest])).over(w)
    cur = F.struct(*[F.col(k) for k in rest])
    return (
        df.withColumn("__new_grp", prev.isNull() | (prev != cur))
        .filter(F.col("__new_grp"))
        .drop("__new_grp")
    )


def dedup_exact(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact duplicate removal via hash-groupBy (one shuffle, map-side
    partial agg). Equivalent of ``distinct()`` in the reference
    (feature_processing/superusers/get_baseline_demo.R:25) but expressed as
    a groupBy so AQE can split skewed hash buckets."""
    cols = subset or df.columns
    others = [c for c in df.columns if c not in set(cols)]
    if not others:
        return df.groupBy(*cols).agg(F.lit(1).alias("__one")).drop("__one")
    agg = [F.min_by(F.struct(*others), F.xxhash64(*others)).alias("__rest")]
    out = df.groupBy(*cols).agg(*agg)
    return out.select(*cols, *[F.col(f"__rest.{c}").alias(c) for c in others])
