"""Stateful streaming as-of state attach — the Structured Streaming twin of
the flagship batch operator (operators/asof.py::asof_join), built on
``applyInPandasWithState`` (the north-star's named mechanism for custom
stateful operators).

Input model: ONE stream per conversation carrying both row kinds (the union
shape the batch as-of join also uses, operators/asof.py:73):

    (conv_id string, kind int /*0=state, 1=turn*/, ts timestamp,
     turn_idx int /*turns*/, state_seq long /*states*/, label string /*states*/)

Semantics: every turn is emitted once, labeled with the latest state whose
``state_ts <= ts`` (inclusive; ties among equal state_ts broken by the
larger state_seq) — identical to the batch operator WITHIN the delivered
prefix. Cross-batch state is carried in ``GroupState`` (one tiny tuple per
conversation: bounded memory regardless of stream length).

Ordering contract (documented, standard for log-partitioned transports):
rows of one conversation arrive in non-decreasing ``ts`` order ACROSS
micro-batches (e.g. a Kafka topic partitioned by conv_id preserves
producer order). Within a micro-batch any order is fine — rows are sorted
before the scan.

Late-state contract (round-5 verdict item 5, pinned by
tests/test_streaming.py::test_stateful_asof_stream_late_state_contract) —
what happens when a STATE row arrives in a later micro-batch with ``ts``
below the previous batch's max (the ordering contract violated):

* turns already emitted in earlier batches are NEVER retro-corrected —
  append-mode emissions are final, so a stream under out-of-order
  delivery can disagree with the batch join on exactly those turns; the
  batch operator is the source of truth for reprocessing;
* within its own (and later) micro-batches the late state participates
  normally: it labels co-late turns that sort at-or-after it, and it
  REPLACES the carried state iff it is newer by the (state_ts, state_seq)
  tie rule — an older-than-carried late state can label only co-late
  turns sandwiched before the carried state's ts, never anything after.

There is no watermark here (``NoTimeout``): late states are applied
best-effort rather than dropped, because dropping would also desync the
carried state for all FUTURE turns, which is strictly worse than the
bounded within-batch correction above.

tests/test_streaming.py drives two micro-batches through a file source
(maxFilesPerTrigger=1) and asserts equality with the batch ``asof_join``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: union-stream input schema (see module docstring)
ASOF_STREAM_INPUT_SCHEMA = (
    "conv_id string, kind int, ts timestamp, turn_idx int, "
    "state_seq long, label string"
)

ASOF_STREAM_OUTPUT_SCHEMA = "conv_id string, turn_idx int, ts timestamp, label string"

#: carried per-conversation state: latest (state_ts_us, state_seq, label).
#: MICROsecond resolution — the table timestamps are datetime64[us]; a
#: millisecond-truncated carry would mis-sort against a same-true-ts state
#: arriving later (tie-rule violation)
ASOF_STREAM_STATE_SCHEMA = "state_ts_us long, state_seq long, label string"


def _attach_labels(pdf: pd.DataFrame, carried: tuple | None):
    """Sort one micro-batch's rows by (ts, kind, state_seq) — states sort
    before turns at equal ts, later state_seq wins — forward-fill labels,
    return (turn rows, new carried state). Mirrors oracle.asof_labels.

    The carried state participates as a synthetic STATE ROW in the sort
    (not as an unconditional ffill seed): an incoming state with equal
    state_ts but smaller state_seq must NOT override the carried one —
    the tie rule is 'larger state_seq wins' exactly as in the batch join.
    """
    if carried is not None:
        # turn_idx=-1 (not NA): an all-NA column in the concat would hit
        # pandas' deprecated empty/all-NA dtype-inference path; the seed is
        # kind=0 so it is never emitted
        seed = pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "kind": [0],
                "ts": [pd.Timestamp(carried[0], unit="us")],
                "turn_idx": [-1],
                "state_seq": [carried[1]],
                "label": [carried[2]],
            }
        )
        pdf = pd.concat([seed, pdf[seed.columns]], ignore_index=True)
    g = pdf.sort_values(["ts", "kind", "state_seq"], kind="mergesort")
    labels = g["label"].where(g["kind"] == 0)
    filled = labels.ffill().reset_index(drop=True)
    g = g.reset_index(drop=True)
    turns = g[g["kind"] == 1]
    out = pd.DataFrame(
        {
            "conv_id": turns["conv_id"],
            "turn_idx": turns["turn_idx"].astype("int32"),
            "ts": turns["ts"],
            "label": filled[turns.index],
        }
    )
    states = g[g["kind"] == 0]
    new_carried = carried
    if len(states):
        last = states.sort_values(["ts", "state_seq"], kind="mergesort").iloc[-1]
        ts_us = int(np.datetime64(last["ts"], "us").astype("int64"))
        cand = (ts_us, int(last["state_seq"]), last["label"])
        if carried is None or (cand[0], cand[1]) >= (carried[0], carried[1]):
            new_carried = cand
    return out, new_carried


def _asof_state_func(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # materialize ALL Arrow chunks of this group's micro-batch before
    # sorting: per-chunk processing would break within-batch order
    # independence (a state in a later chunk couldn't label turns in an
    # earlier chunk). Memory bound = this group's rows in one micro-batch,
    # the same bound applyInPandas already implies.
    carried = state.get if state.exists else None
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        whole = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        out, carried = _attach_labels(whole, carried)
        if len(out):
            yield out
    if carried is not None:
        state.update(carried)


def asof_label_stream(union_stream: DataFrame) -> DataFrame:
    """Attach the latest-known state label to each turn of a streaming
    union of turns and state events, keyed by conv_id.
    (applyInPandasWithState is streaming-only in Spark 4; the batch
    equivalent is operators.asof.asof_join, and _attach_labels is
    unit-tested against the pandas oracle directly.)"""
    return union_stream.groupBy("conv_id").applyInPandasWithState(
        _asof_state_func,
        ASOF_STREAM_OUTPUT_SCHEMA,
        ASOF_STREAM_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
