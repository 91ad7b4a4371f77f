"""The transcript data model and its deterministic derivations.

Authoritative input shape (BASELINE.json ``input_hint``)::

    transcripts(conv_id string, turn_idx int, role string, text string,
                tool string /*sparse*/, ts timestamp)

Two sources of transcript-shaped data:

1. :func:`transcripts_from_events` — derives a transcripts table from the
   driver's ``events`` parquet (TESTDATA.md) with a mapping that is expressed
   IDENTICALLY in Spark and in ANSI/DuckDB SQL (:data:`TRANSCRIPTS_CTE`), so
   every engine operator gets a DuckDB oracle in ``__spark_entry__.py``.
2. :func:`generate_transcripts` — a seeded, wall-clock-free synthetic
   generator (pandas/numpy) implementing FIXTURES.md §1-3: zipf-skewed hot
   conversations, duplicated (conv_id, turn_idx) rows, sparse ``tool``,
   session gaps, out-of-order physical layout. Used by pytest golden tests
   and by the scaling bench.

The reference analog: Synapse "activity table" rows keyed by
(recordId, healthCode, createdOn) — see /root/reference/utils/helper_utils.R:34-47.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# 1. events → transcripts (shared Spark + SQL derivation)
# ---------------------------------------------------------------------------

#: DuckDB CTE body. MUST stay semantically identical to
#: :func:`transcripts_from_events`. ``row_number`` is made deterministic by
#: the unique ``event_id`` tie-breaker.
TRANSCRIPTS_CTE = """
transcripts AS (
    SELECT 'c' || CAST(user_id AS VARCHAR)                             AS conv_id,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) - 1 AS INT)  AS turn_idx,
           event_type                                                  AS role,
           props                                                       AS text,
           CASE WHEN event_id % 7 = 0 THEN 'tool_' || event_type END   AS tool,
           ts
    FROM events
)
"""

#: As-of right side: sparse per-conversation state stream (≈ the burst
#: schedule table of analysis/mpower_study_burst_summary.R). Every 5th event
#: is a state change; because states reuse event timestamps, exact
#: ``state_ts == ts`` collisions occur and exercise the inclusive (<=) bound
#: (reference: in_burst uses >= start & <= end, analysis/mPTS_record.R:31).
STATES_CTE = """
states AS (
    SELECT 'c' || CAST(user_id AS VARCHAR)  AS conv_id,
           ts                               AS state_ts,
           'st_' || event_type              AS label,
           event_id                         AS state_seq
    FROM events
    WHERE event_id % 5 = 0
)
"""


#: Signal frame: the transcript derivation carrying the numeric ``value``
#: column instead of role/text/tool — ONE scan + ONE shuffle of events
#: (round-1 joined transcripts back to events on (conv_id, ts), paying a
#: second scan and exchange for a column that was already in hand).
SIGNAL_CTE = """
sig AS (
    SELECT 'c' || CAST(user_id AS VARCHAR)                             AS conv_id,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) - 1 AS INT)  AS turn_idx,
           ts,
           CAST(value AS DOUBLE)                                       AS value
    FROM events
)
"""


def events_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def signal_frame_from_events(
    events: DataFrame, keep_key: bool = False, with_turn_idx: bool = True
) -> DataFrame:
    """Spark twin of :data:`SIGNAL_CTE`. ``keep_key=True`` retains the raw
    ``user_id`` so downstream per-conversation operators can shuffle on it
    and reuse this window's exchange (conv_id is a bijection of user_id).

    Partition key (round-7, guide §2.4): the derivation window groups by
    user ⇔ by conversation (1:1), but ``hashpartitioning(user_id)`` does
    NOT satisfy a downstream window on the derived ``conv_id`` string —
    the hashes differ — so consumers that group by ``conv_id`` paid a
    second full exchange. With ``keep_key=False`` (consumers only see
    ``conv_id``) the window now partitions directly on the conv_id
    EXPRESSION; Spark's alias-aware output partitioning then lets every
    downstream conv_id window/group reuse this single exchange. The
    ``keep_key=True`` path keeps the raw-key partitioning for consumers
    that shuffle on ``user_id``. Identical rows either way: the groups
    and the (ts, event_id) ordering are unchanged. The conv_id column is
    projected BELOW the window and the window partitions on that
    attribute — partitioning by the concat EXPRESSION would be extracted
    into a hidden ``_w0`` column the final projection drops, losing the
    output partitioning.

    ``with_turn_idx=False`` (round-7, keep_key only): consumers that use
    ``turn_idx`` ONLY as an ordering key (the signal kernels — they sort
    by (turn_idx, ts) and never emit it) can skip the row_number window
    outright: within a conversation, ordering by (turn_idx, ts) is the
    SAME permutation as ordering by (ts, event_id) — turn_idx is the
    row_number of exactly that ordering — so the frame ships (conv_id,
    ts, value, user_id, event_id) and saves a full Sort + Window pass
    over the events."""
    conv = F.concat(F.lit("c"), F.col("user_id").cast("string"))
    if not with_turn_idx:
        if not keep_key:
            raise ValueError("with_turn_idx=False requires keep_key=True")
        return events.select(
            conv.alias("conv_id"),
            F.col("ts"),
            F.col("value").cast("double").alias("value"),
            F.col("user_id"),
            F.col("event_id"),
        )
    if keep_key:
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        return events.select(
            conv.alias("conv_id"),
            (F.row_number().over(w) - F.lit(1)).cast("int").alias("turn_idx"),
            F.col("ts"),
            F.col("value").cast("double").alias("value"),
            F.col("user_id"),
        )
    pre = events.select(conv.alias("conv_id"), "ts", "event_id", "value")
    w = W.partitionBy("conv_id").orderBy("ts", "event_id")
    return pre.select(
        F.col("conv_id"),
        (F.row_number().over(w) - F.lit(1)).cast("int").alias("turn_idx"),
        F.col("ts"),
        F.col("value").cast("double").alias("value"),
    )


def transcripts_from_events(events: DataFrame, keep_key: bool = False) -> DataFrame:
    """Spark twin of :data:`TRANSCRIPTS_CTE`.

    One window, one shuffle; at 100 TB this is the same shuffle the
    downstream per-conversation windows need, so Catalyst reuses the
    exchange. ``keep_key=True`` retains the raw ``user_id`` so downstream
    group operators can shuffle on it and reuse this window's exchange
    outright (conv_id is a bijection of user_id).

    Partition key (round-7, guide §2.4): with ``keep_key=False`` the
    window partitions on the derived conv_id EXPRESSION, not ``user_id``
    — hashpartitioning(user_id) does not satisfy a downstream window on
    the conv_id string (different hashes), so every conv_id consumer of
    ``load_transcripts`` paid a second full exchange. Same groups, same
    ordering, identical rows; see :func:`signal_frame_from_events` for
    why conv_id is projected below the window.
    """
    conv = F.concat(F.lit("c"), F.col("user_id").cast("string"))
    tool = F.when(F.col("event_id") % 7 == 0,
                  F.concat(F.lit("tool_"), F.col("event_type")))
    if keep_key:
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        return events.select(
            conv.alias("conv_id"),
            (F.row_number().over(w) - F.lit(1)).cast("int").alias("turn_idx"),
            F.col("event_type").alias("role"),
            F.col("props").alias("text"),
            tool.alias("tool"),
            F.col("ts"),
            F.col("user_id"),
        )
    pre = events.select(
        conv.alias("conv_id"), F.col("ts"), F.col("event_id"),
        F.col("event_type"), F.col("props"),
    )
    w = W.partitionBy("conv_id").orderBy("ts", "event_id")
    return pre.select(
        F.col("conv_id"),
        (F.row_number().over(w) - F.lit(1)).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        tool.alias("tool"),
        F.col("ts"),
    )


def states_from_events(events: DataFrame) -> DataFrame:
    """Spark twin of :data:`STATES_CTE`."""
    return events.filter(F.col("event_id") % 5 == 0).select(
        F.concat(F.lit("c"), F.col("user_id").cast("string")).alias("conv_id"),
        F.col("ts").alias("state_ts"),
        F.concat(F.lit("st_"), F.col("event_type")).alias("label"),
        F.col("event_id").alias("state_seq"),
    )


def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transcripts_from_events(events_df(spark, sf_dir))


def load_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    return states_from_events(events_df(spark, sf_dir))


# ---------------------------------------------------------------------------
# 2. Synthetic generator (FIXTURES.md §1-3) — seeded, wall-clock-free
# ---------------------------------------------------------------------------

_ROLES = np.array(["user", "assistant", "tool", "system"])
_TOOLS = np.array(["search", "python", "browser", "editor", "shell"])
_EPOCH = np.datetime64("2024-01-01T00:00:00", "us")


def generate_transcripts(
    n_turns: int = 6000,
    n_convs: int = 100,
    seed: int = 42,
    hot_frac: float = 0.2,
    n_hot: int = 2,
    dup_frac: float = 0.02,
    session_gap_s: float = 3600.0,
    shuffle_rows: bool = True,
) -> pd.DataFrame:
    """Deterministic transcript table per FIXTURES.md §1.

    * ``n_hot`` hot conversations hold ``hot_frac`` of all turns (skew →
      exercises salting / range-split).
    * ``dup_frac`` of rows are duplicated with a later ts and altered text
      (exercises last-record-wins dedup, utils/helper_utils.R:41-43).
    * inter-turn gaps mix sub-minute chatter with > ``session_gap_s`` jumps
      (sessionization boundaries).
    * ``tool`` non-null on ~10% of turns; includes empty & unicode text.
    * rows physically shuffled so ordering is truly exercised.
    """
    rng = np.random.default_rng(seed)
    hot_turns = int(n_turns * hot_frac)
    cold_turns = n_turns - hot_turns
    conv_of_turn = np.concatenate([
        rng.integers(0, n_hot, hot_turns),
        rng.integers(n_hot, n_convs, cold_turns),
    ])
    counts = np.bincount(conv_of_turn, minlength=n_convs)

    frames = []
    for conv in range(n_convs):
        k = int(counts[conv])
        if k == 0:
            continue
        # gaps: mostly 1-120 s, ~3% long jumps of 2-6 h
        gaps = rng.uniform(1.0, 120.0, k)
        jump = rng.random(k) < 0.03
        gaps[jump] = rng.uniform(2 * 3600.0, 6 * 3600.0, int(jump.sum()))
        gaps[0] = rng.uniform(0, 86400.0 * 30)  # conversation start offset
        ts = _EPOCH + (np.cumsum(gaps) * 1e6).astype("int64").astype("timedelta64[us]")
        roles = _ROLES[rng.integers(0, len(_ROLES), k)]
        tool = np.where(
            rng.random(k) < 0.10, _TOOLS[rng.integers(0, len(_TOOLS), k)], None
        )
        text = np.array(
            [f"turn {i} of conv {conv} ★ {rng.integers(0, 10 ** 6)}" for i in range(k)],
            dtype=object,
        )
        if k > 3:
            text[rng.integers(0, k)] = ""  # empty-string survivor
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": f"conv{conv:05d}",
                    "turn_idx": np.arange(k, dtype="int32"),
                    "role": roles,
                    "text": text,
                    "tool": tool,
                    "ts": ts,
                }
            )
        )
    df = pd.concat(frames, ignore_index=True)

    # duplicated (conv_id, turn_idx) rows with later ts → dedup fodder
    n_dup = int(len(df) * dup_frac)
    if n_dup:
        dup = df.sample(n=n_dup, random_state=seed).copy()
        dup["ts"] = dup["ts"] + pd.Timedelta(seconds=1)
        dup["text"] = dup["text"].astype(str) + " (resent)"
        df = pd.concat([df, dup], ignore_index=True)

    if shuffle_rows:
        df = df.sample(frac=1.0, random_state=seed + 1).reset_index(drop=True)
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df


def generate_state_events(
    transcripts: pd.DataFrame, seed: int = 42, rate: float = 0.15
) -> pd.DataFrame:
    """State stream per FIXTURES.md §2 — includes never-matching future
    states (leakage probes) and exact ``state_ts == ts`` collisions."""
    rng = np.random.default_rng(seed + 7)
    out = []
    seq = 0
    for conv_id, g in transcripts.groupby("conv_id", sort=True):
        ts_sorted = np.sort(g["ts"].values)
        n_states = max(1, int(len(ts_sorted) * rate))
        idx = rng.integers(0, len(ts_sorted), n_states)
        for i in idx:
            exact = rng.random() < 0.3  # inclusive-bound probe
            sts = ts_sorted[i] if exact else ts_sorted[i] - np.timedelta64(
                int(rng.uniform(1, 30) * 1e6), "us"
            )
            out.append((conv_id, sts, f"label_{seq % 11}", seq))
            seq += 1
        # leakage probe: a state strictly after the last turn — must never match
        out.append(
            (conv_id, ts_sorted[-1] + np.timedelta64(3600_000_000, "us"),
             "label_future", seq)
        )
        seq += 1
    df = pd.DataFrame(out, columns=["conv_id", "state_ts", "label", "state_seq"])
    df["state_ts"] = df["state_ts"].astype("datetime64[us]")
    return df


def spark_transcripts(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """pandas → Spark with the canonical schema (Arrow path)."""
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    return spark.createDataFrame(pdf, schema=schema)
