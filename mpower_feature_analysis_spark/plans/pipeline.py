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

from ..operators import (
    asof_join,
    dedup_last_wins,
    forward_fill,
    per_role_running_counts,
    rolling_stats,
    sessionize,
    turn_gaps,
    windowed_summary_features,
)


@dataclass
class PipelineConfig:
    session_gap_s: float = 3600.0
    rolling_k: int = 5
    kernel_window: int = 8
    kernel_overlap: float = 0.5
    roles: tuple[str, ...] = ("user", "assistant", "tool", "system")


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
    # partition_by=conv_id: the dedup shares the single conv_id exchange
    # with every window below — the whole pipeline shuffles ONCE.
    t = dedup_last_wins(
        transcripts, ["conv_id", "turn_idx"], ["ts"], partition_by=["conv_id"]
    )
    if states is not None:
        t = asof_join(t, states, payload=["label"])
    t = turn_gaps(t)
    t = rolling_stats(t, "gap_ms", k=cfg.rolling_k, prefix="gap_roll")
    t = per_role_running_counts(t, list(cfg.roles))
    t = forward_fill(t, ["tool"], ["conv_id"], ["turn_idx", "ts"])
    t = sessionize(t, gap_s=cfg.session_gap_s)
    return t


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
