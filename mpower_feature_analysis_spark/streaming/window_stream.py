"""Stateful streaming windowed summary features — the Structured Streaming
twin of operators/kernels.py::windowed_summary_features (the engine's
central F1 kernel), built on ``applyInPandasWithState``.

A window's feature row is emitted in the micro-batch where its LAST turn
arrives; cross-batch continuity lives in ``GroupState`` as a bounded tail
of (turn_idx, ts_ms) pairs — at most ``window + 1`` turns per
conversation regardless of stream length, plus the next scheduled window
start. Feature math (mean / type-7 median / IQR / binned Shannon entropy
over the inter-turn gap series) is imported from the batch kernel module,
so the two paths cannot drift.

Streaming-vs-batch semantic deltas (documented, asserted by tests):

* only FULL windows are emitted (``n == window``): a stream cannot know a
  conversation has ended, so the batch path's short-conversation
  single-window row and the <2-turn error row do not exist here; the
  batch operator remains the source of truth for reprocessing.
* ordering contract as in asof_stream: one conversation's turns arrive in
  (turn_idx) order ACROSS micro-batches (a conv_id-partitioned log
  preserves producer order); within a micro-batch any order is fine.

tests/test_streaming.py drives two micro-batches through a file source
and asserts row-for-row equality with the batch kernel's full windows.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.kernels import WINDOW_FEATURE_SCHEMA, _entropy_rows

WINDOW_STREAM_INPUT_SCHEMA = "conv_id string, turn_idx int, ts timestamp"

#: carried per-conversation state: the next scheduled window start (a gap
#: index, always a multiple of the step) and the tail of turns from that
#: gap's first turn onward — everything future windows still need.
WINDOW_STREAM_STATE_SCHEMA = (
    "next_start long, tail_turn_idx array<long>, tail_ts_ms array<long>"
)


def _window_rows(conv, all_idx, all_ms, next_start, window, step):
    """Emit every complete window over the local turn tail.

    ``all_idx``/``all_ms`` hold the turns at absolute positions
    [next_start, ...); local gap j is absolute gap next_start + j, and
    absolute window starts are multiples of ``step`` — ``next_start`` is
    the next one by construction, so local starts are 0, step, 2*step, ...
    """
    gaps = np.diff(all_ms).astype("float64")
    n_starts = (len(gaps) - window) // step + 1 if len(gaps) >= window else 0
    if n_starts <= 0:
        return None, next_start, 0
    starts = np.arange(0, n_starts * step, step, dtype="int64")
    sw = np.lib.stride_tricks.sliding_window_view(gaps, window)[::step][:n_starts]
    q1, md, q3 = np.percentile(sw, [25, 50, 75], axis=1, method="linear")
    out = pd.DataFrame(
        {
            "conv_id": conv,
            "window_idx": ((next_start + starts) // step).astype("int32"),
            "n": np.full(n_starts, window, dtype="int32"),
            "start_turn_idx": all_idx[starts + 1].astype("int32"),
            "end_turn_idx": all_idx[starts + window].astype("int32"),
            "mean_gap_ms": sw.mean(axis=1),
            "median_gap_ms": md,
            "iqr_gap_ms": q3 - q1,
            "entropy_gap": _entropy_rows(sw),
            "error": None,
        }
    )
    consumed = int(starts[-1]) + step  # local position of the new next start
    return out, next_start + consumed, consumed


def make_window_stream_func(window: int = 8, overlap: float = 0.5):
    step = max(1, int(round(window * (1.0 - overlap))))

    def func(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            next_start, tail_idx, tail_ms = state.get
            tail_idx = np.asarray(tail_idx, dtype="int64")
            tail_ms = np.asarray(tail_ms, dtype="int64")
        else:
            next_start, tail_idx, tail_ms = 0, np.empty(0, "int64"), np.empty(0, "int64")
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        whole = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        whole = whole.sort_values(["turn_idx", "ts"], kind="mergesort")
        new_idx = whole["turn_idx"].to_numpy(dtype="int64")
        new_ms = whole["ts"].values.astype("datetime64[ms]").astype("int64")
        all_idx = np.concatenate([tail_idx, new_idx])
        all_ms = np.concatenate([tail_ms, new_ms])
        conv = whole["conv_id"].iloc[0]
        out, next_start, consumed = _window_rows(
            conv, all_idx, all_ms, next_start, window, step
        )
        # trim the carried tail to the turns future windows still need —
        # after emission fewer than `window` gaps remain past next_start,
        # so the tail is bounded by window + 1 turns forever
        state.update(
            (int(next_start), all_idx[consumed:].tolist(), all_ms[consumed:].tolist())
        )
        if out is not None and len(out):
            yield out

    return func


def windowed_features_stream(
    turns_stream: DataFrame, window: int = 8, overlap: float = 0.5
) -> DataFrame:
    """Per-conversation overlapping-window gap features over a turn stream;
    output rows equal the batch kernel's full-window rows (pinned by
    tests/test_streaming.py across two real micro-batches)."""
    return turns_stream.groupBy("conv_id").applyInPandasWithState(
        make_window_stream_func(window=window, overlap=overlap),
        WINDOW_FEATURE_SCHEMA,
        WINDOW_STREAM_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
