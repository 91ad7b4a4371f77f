"""The flagship end-to-end feature-extraction pipeline (EP1 re-expressed).

Reference lifecycle (Makefile `features` stage, SURVEY.md §3 EP1):
scan → normalize → dedup last-wins → per-record group loop → features → sink.

Spark shape: one declarative plan — read → dedup (window) → as-of state
attach → window features (gaps, running counts, fills) → sessionize →
[optionally] Arrow window kernels — with exactly one shuffle on conv_id that
every window/group step reuses.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.asof import (
    asof_attach_from_union,
    dedup_turns_in_union,
)
from ..operators import (
    asof_join,
    dedup_last_wins,
    windowed_summary_features,
)


@dataclass
class PipelineConfig:
    session_gap_s: float = 3600.0
    rolling_k: int = 5
    kernel_window: int = 8
    kernel_overlap: float = 0.5
    roles: tuple[str, ...] = ("user", "assistant", "tool", "system")
    #: zero-exchange route (round-5 verdict item 6): the input to
    #: :func:`extract_turn_features` is a PRE-STAGED bucketed union table
    #: (``sources.io.write_bucketed_union_table``) rather than a raw
    #: transcript frame — every dedup/as-of/window step then plans with
    #: ZERO Exchange nodes (asserted in tests/test_plans.py)
    presorted: bool = False


def extract_turn_features(
    transcripts: DataFrame,
    states: DataFrame | None = None,
    config: PipelineConfig | None = None,
) -> DataFrame:
    """Per-turn feature vector at each (conv_id, turn_idx, ts).

    Output preserves ``text`` byte-identically (per-turn text equality
    invariant) and attaches: as-of state ``label`` (zero leakage), gap_ms /
    lead_gap_ms, rolling gap stats, per-role running counts, forward-filled
    tool, session_id.
    """
    cfg = config or PipelineConfig()
    if cfg.presorted:
        # `transcripts` IS the staged bucketed union table (turns+states
        # in the _union_marked layout) — states ride inside it
        if states is not None:
            raise ValueError(
                "presorted=True takes the staged union table as the single "
                "input; pass states=None (they are already in the layout)"
            )
        return extract_turn_features_presorted(transcripts, cfg)
    # partition_by=conv_id: the dedup shares the single conv_id exchange
    # with every window below — the whole pipeline shuffles ONCE.
    t = dedup_last_wins(
        transcripts, ["conv_id", "turn_idx"], ["ts"], partition_by=["conv_id"]
    )
    if states is not None:
        t = asof_join(t, states, payload=["label"])
    return _window_feature_stack(t, cfg)


def _window_feature_stack(t: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """The shared post-as-of window features: gaps → rolling stats →
    per-role counts → ffill(tool) → sessionize, all over the conv_id
    clustering the upstream step already established.

    Round-7 FUSED form: the operator chain
    (turn_gaps → rolling_stats → per_role_running_counts → forward_fill →
    sessionize) builds nine interleaved Window/Project pairs that
    CollapseWindow cannot merge, so every step was a separate pass over
    the partition. The same expressions grouped by DEPENDENCY LAYER —
    layer 1: gaps, per-role cumulative counts, tool ffill (independent of
    each other); layer 2: rolling stats over ``gap_ms`` and the session
    boundary cumsum (both consume layer 1's lag) — collapse to one Window
    node per distinct frame (5 instead of 9) sharing one sort. Every
    expression is verbatim from the operator it replaces and the output
    column order is the chain's, so rows are identical (pinned by
    tests/test_pipeline.py)."""
    from pyspark.sql import Window as W

    from ..utils import ts_ms

    base = list(t.columns)
    w = W.partitionBy("conv_id").orderBy("turn_idx", "ts")
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    ms = ts_ms("ts")
    t1 = t.select(
        "*",
        (ms - F.lag(ms).over(w)).cast("long").alias("gap_ms"),
        (F.lead(ms).over(w) - ms).cast("long").alias("lead_gap_ms"),
        *[
            F.sum(F.when(F.col("role") == r, 1).otherwise(0))
            .over(wcum).cast("long").alias(f"n_{r}_so_far")
            for r in cfg.roles
        ],
        F.last("tool", ignorenulls=True).over(wcum).alias("tool_ffill"),
    )
    wk = w.rowsBetween(-(cfg.rolling_k - 1), W.currentRow)
    v = F.col("gap_ms")
    # sessionize's internal gap is ms - lag(ms) un-cast; unix_millis is
    # already LONG so the layer-1 gap_ms column carries the same value
    is_new = F.when(
        v.isNull() | (v > int(cfg.session_gap_s * 1000)), 1
    ).otherwise(0)
    return t1.select(
        *base,
        "gap_ms",
        "lead_gap_ms",
        F.avg(v).over(wk).alias("gap_roll_mean"),
        F.min(v).over(wk).alias("gap_roll_min"),
        F.max(v).over(wk).alias("gap_roll_max"),
        F.count(v).over(wk).cast("long").alias("gap_roll_n"),
        *[f"n_{r}_so_far" for r in cfg.roles],
        "tool_ffill",
        (F.sum(is_new).over(wcum) - F.lit(1)).cast("long").alias("session_id"),
    )


def extract_turn_features_presorted(
    union_table: DataFrame,
    config: PipelineConfig | None = None,
    payload: tuple[str, ...] = ("label",),
    on: str = "conv_id",
    turn_ts: str = "ts",
) -> DataFrame:
    """Zero-exchange flagship (round-5 verdict item 6): the same
    dedup → as-of → window-features plan as :func:`extract_turn_features`,
    over a PRE-STAGED bucketed union layout
    (``sources.io.write_bucketed_union_table``).

    The staged table is hash-clustered on ``__k`` and per-file sorted on
    the as-of window ordering, so every step's distribution requirement —
    the (conv_id, turn_idx) dedup window included, via the
    ClusteredDistribution subset rule — is satisfied straight from the
    scan: the ENTIRE plan contains ZERO Exchange nodes (asserted in
    tests/test_plans.py) and is hash-identical to the plain route
    (tests/test_pipeline.py). At 10^12 turns this converts the pipeline's
    one shuffle into a one-time ingest cost shared by every feature pass.
    """
    cfg = config or PipelineConfig()
    meta = ("__k", "__ts", "__kind", "__seq")
    rest = [
        c for c in union_table.columns
        if c not in meta and not c.startswith("__p_")
    ]
    turn_cols = [on, *rest, turn_ts]
    dd = dedup_turns_in_union(
        union_table, turn_cols, keys=(on, "turn_idx"), order_by=(turn_ts,),
        on=on, turn_ts=turn_ts,
    )
    t = asof_attach_from_union(
        dd, turn_cols, on=on, turn_ts=turn_ts, payload=list(payload)
    )
    return _window_feature_stack(t, cfg)


def extract_window_features(
    transcripts: DataFrame, config: PipelineConfig | None = None
) -> DataFrame:
    """Per-window Arrow-kernel summary features (the mhealthtools analog)."""
    cfg = config or PipelineConfig()
    return windowed_summary_features(
        transcripts, window=cfg.kernel_window, overlap=cfg.kernel_overlap
    )


def stable_sorted(df: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """O3 stable output ordering: deterministic repartition by conv_id +
    sortWithinPartitions(conv_id, turn_idx) before any write."""
    parts = df.repartition(n_partitions, "conv_id") if n_partitions else df.repartition("conv_id")
    return parts.sortWithinPartitions("conv_id", "turn_idx")
