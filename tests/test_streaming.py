import shutil
import tempfile

import pytest

from mpower_feature_analysis_spark.operators import session_summary, sessionize
from mpower_feature_analysis_spark.streaming.sessionize_stream import (
    run_stream_once,
    sessionize_stream,
)

SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
GAP_S = 3600.0


@pytest.fixture(scope="module")
def staged_dir(spark, dedup_df):
    d = tempfile.mkdtemp(prefix="stream_src_")
    dedup_df.write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_matches_batch_session_counts(spark, dedup_df, staged_dir):
    """Streaming session_window ≡ batch sessionize on threshold-free data
    (generator gaps are continuous — ties at exactly 3600s have measure 0)."""
    stream_out = run_stream_once(spark, staged_dir, SCHEMA, GAP_S, "sess_smoke")
    batch = session_summary(sessionize(dedup_df, gap_s=GAP_S))
    got = {
        (r.conv_id, r.session_start, r.session_end): r.n_turns
        for r in stream_out.collect()
    }
    want = {
        (r.conv_id, r.session_start, r.session_end): r.n_turns
        for r in batch.collect()
    }
    assert got == want


def test_batch_dataframe_passthrough(spark, dedup_df):
    out = sessionize_stream(dedup_df, gap_s=GAP_S)
    assert out.count() == session_summary(sessionize(dedup_df, gap_s=GAP_S)).count()


def test_update_mode_stateful_sessionize_matches_batch(spark, dedup_df):
    """Round-4 verdict item 7: UPDATE-mode sessionization ≡ batch. The
    stateful applyInPandasWithState sessionizer streams two real
    micro-batches (split at the global median ts, so open sessions
    straddle the trigger boundary and must be carried in state) into a
    memory sink in update mode; reducing the upsert log — last write per
    (conv_id, session_start), where n_turns grows monotonically — must
    equal the batch gap-split summary EXACTLY (same strict-> boundary
    rule, full µs timestamp precision)."""
    import pyspark.sql.functions as F

    from mpower_feature_analysis_spark.streaming.sessionize_stream import (
        sessionize_stream_stateful,
    )

    src = tempfile.mkdtemp(prefix="stream_upd_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_upd_ckpt_")
    try:
        # one FILE per micro-batch (coalesce(1)): the file source orders
        # triggers by file, and a global-median ts cut is an in-order
        # prefix for every conversation — same staging contract as the
        # driver's _two_batch_ts_split
        median_us = int(
            dedup_df.selectExpr("median(unix_micros(ts)) AS m").collect()[0][0]
        )
        dedup_df.filter(F.unix_micros("ts") <= median_us).coalesce(1).write.parquet(
            f"{src}/b0"
        )
        dedup_df.filter(F.unix_micros("ts") > median_us).coalesce(1).write.parquet(
            f"{src}/b1"
        )
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/b*")
        )
        q = (
            sessionize_stream_stateful(stream, gap_s=GAP_S)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("sess_update")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # upsert reduction: final value per (conv_id, session_start)
        final = (
            spark.table("sess_update")
            .groupBy("conv_id", "session_start")
            .agg(
                F.max("session_end").alias("session_end"),
                F.max("n_turns").alias("n_turns"),
            )
        )
        got = {
            (r.conv_id, r.session_start, r.session_end): r.n_turns
            for r in final.collect()
        }
        batch = session_summary(sessionize(dedup_df, gap_s=GAP_S))
        want = {
            (r.conv_id, r.session_start, r.session_end): r.n_turns
            for r in batch.collect()
        }
        assert got == want
        # closed-flag sanity: at least one session closed IN-STREAM (gap
        # observed inside delivered data), and every closed emission is
        # final (its n_turns equals the reduced value)
        closed = spark.table("sess_update").filter("closed").collect()
        assert closed
        for r in closed:
            assert got[(r.conv_id, r.session_start, r.session_end)] == r.n_turns
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def _union_rows(turns_pdf, states_pdf):
    import pandas as pd
    t = pd.DataFrame({
        "conv_id": turns_pdf["conv_id"],
        "kind": pd.array([1] * len(turns_pdf), dtype="int32"),
        "ts": turns_pdf["ts"],
        "turn_idx": turns_pdf["turn_idx"].astype("int32"),
        "state_seq": pd.array([None] * len(turns_pdf), dtype="Int64"),
        "label": None,
    })
    s = pd.DataFrame({
        "conv_id": states_pdf["conv_id"],
        "kind": pd.array([0] * len(states_pdf), dtype="int32"),
        "ts": states_pdf["state_ts"],
        "turn_idx": pd.array([None] * len(states_pdf), dtype="Int32"),
        "state_seq": states_pdf["state_seq"].astype("int64"),
        "label": states_pdf["label"],
    })
    import pandas as pd2
    return pd2.concat([t, s], ignore_index=True)


def test_stateful_asof_stream_matches_batch(spark, dedup_pdf, states_pdf, dedup_df, states_df):
    """applyInPandasWithState as-of attach across TWO micro-batches (file
    source, maxFilesPerTrigger=1) == the batch asof_join: state carried in
    GroupState labels chunk-2 turns from chunk-1 states."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mpower_feature_analysis_spark.operators import asof_join
    from mpower_feature_analysis_spark.streaming.asof_stream import (
        ASOF_STREAM_INPUT_SCHEMA,
        asof_label_stream,
    )

    u = _union_rows(dedup_pdf, states_pdf)
    cutoff = u["ts"].quantile(0.5)
    src = tempfile.mkdtemp(prefix="asof_stream_src_")
    ckpt = tempfile.mkdtemp(prefix="asof_stream_ckpt_")
    try:
        for i, chunk in enumerate([u[u["ts"] <= cutoff], u[u["ts"] > cutoff]]):
            p = os.path.join(src, f"part-{i:04d}.parquet")
            tbl = pa.Table.from_pandas(chunk.reset_index(drop=True), preserve_index=False)
            pq.write_table(tbl, p)
            os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

        stream = (
            spark.readStream.schema(ASOF_STREAM_INPUT_SCHEMA)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = (
            asof_label_stream(stream)
            .writeStream.outputMode("append").format("memory")
            .queryName("asof_stream_t").option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            # exactly two micro-batches consumed the two files
            n_batches = len(q.recentProgress)
        finally:
            q.stop()
        got = {
            (r.conv_id, r.turn_idx): r.label
            for r in spark.sql("SELECT * FROM asof_stream_t").collect()
        }
        want = {
            (r.conv_id, r.turn_idx): r.label
            for r in asof_join(dedup_df, states_df, payload=["label"]).collect()
        }
        assert n_batches >= 2
        assert got == want
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_attach_labels_unit_matches_oracle(dedup_pdf, states_pdf):
    """The per-batch attach function (single invocation, empty initial
    state) reproduces oracle.asof_labels on the full union frame."""
    from mpower_feature_analysis_spark import oracle
    from mpower_feature_analysis_spark.streaming.asof_stream import _attach_labels

    u = _union_rows(dedup_pdf, states_pdf)
    got = {}
    for _, grp in u.groupby("conv_id", sort=False):  # one group per conv,
        out, carried = _attach_labels(grp, None)     # as the stream delivers
        got.update(zip(zip(out["conv_id"], out["turn_idx"]), out["label"]))
    want_df = oracle.asof_labels(dedup_pdf, states_pdf)
    want = dict(zip(zip(want_df["conv_id"], want_df["turn_idx"]), want_df["label"]))
    # NaN-safe compare
    assert set(got) == set(want)
    for k in want:
        a, b = got[k], want[k]
        assert (a == b) or (pd_isna(a) and pd_isna(b)), (k, a, b)
    assert carried is not None


def pd_isna(x):
    import pandas as pd
    return pd.isna(x)


def test_attach_labels_carried_tie_rule():
    """An incoming state with EQUAL state_ts but smaller state_seq must not
    override the carried state (larger state_seq wins, as in the batch
    join); and a state arriving in any chunk position labels all later-ts
    turns of the batch."""
    import pandas as pd
    from mpower_feature_analysis_spark.streaming.asof_stream import _attach_labels

    t0 = pd.Timestamp(1_700_000_000_000, unit="ms")
    batch = pd.DataFrame({
        "conv_id": ["c1"] * 3,
        "kind": [0, 1, 1],
        "ts": [t0, t0, t0 + pd.Timedelta(seconds=5)],
        "turn_idx": [None, 7, 8],
        "state_seq": [3, None, None],
        "label": ["B", None, None],
    })
    carried = (1_700_000_000_000_000, 5, "A")  # same ts (us), LARGER seq than 'B'
    out, new_carried = _attach_labels(batch, carried)
    assert list(out["label"]) == ["A", "A"]
    assert new_carried == carried  # 'B' must not displace 'A'


def test_stateful_asof_stream_multi_chunk_group(spark, dedup_pdf, states_pdf, dedup_df, states_df):
    """Groups larger than one Arrow batch arrive as several chunks per
    micro-batch; the stateful function must sort across ALL of them (a
    state in a later chunk labels turns in an earlier chunk)."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from mpower_feature_analysis_spark.operators import asof_join
    from mpower_feature_analysis_spark.streaming.asof_stream import (
        ASOF_STREAM_INPUT_SCHEMA,
        asof_label_stream,
    )

    u = _union_rows(dedup_pdf, states_pdf)
    src = tempfile.mkdtemp(prefix="asof_chunk_src_")
    ckpt = tempfile.mkdtemp(prefix="asof_chunk_ckpt_")
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        # shuffle rows so chunk contents are in arbitrary ts order, then
        # force tiny Arrow batches: every conversation spans many chunks
        shuffled = u.sample(frac=1.0, random_state=7).reset_index(drop=True)
        pq.write_table(
            pa.Table.from_pandas(shuffled, preserve_index=False),
            os.path.join(src, "part-0000.parquet"),
        )
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
        stream = spark.readStream.schema(ASOF_STREAM_INPUT_SCHEMA).parquet(src)
        q = (
            asof_label_stream(stream)
            .writeStream.outputMode("append").format("memory")
            .queryName("asof_chunk_t").option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r.conv_id, r.turn_idx): r.label
            for r in spark.sql("SELECT * FROM asof_chunk_t").collect()
        }
        want = {
            (r.conv_id, r.turn_idx): r.label
            for r in asof_join(dedup_df, states_df, payload=["label"]).collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_windowed_features_stream_matches_batch(spark, dedup_pdf, dedup_df):
    """Streaming windowed gap features across TWO micro-batches == the
    batch kernel's full-window rows: GroupState carries the bounded turn
    tail so windows spanning the batch boundary come out exactly once,
    with batch-identical values and numbering."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mpower_feature_analysis_spark.operators import windowed_summary_features
    from mpower_feature_analysis_spark.streaming.window_stream import (
        WINDOW_STREAM_INPUT_SCHEMA,
        windowed_features_stream,
    )

    u = dedup_pdf[["conv_id", "turn_idx", "ts"]].sort_values(
        ["conv_id", "turn_idx"]
    )
    # split by turn order WITHIN each conversation (the in-order delivery
    # contract), not by global time
    first = u.groupby("conv_id", sort=False).head(12)
    second = u.loc[u.index.difference(first.index)]
    src = tempfile.mkdtemp(prefix="wstream_src_")
    ckpt = tempfile.mkdtemp(prefix="wstream_ckpt_")
    try:
        for i, chunk in enumerate([first, second]):
            p = os.path.join(src, f"part-{i:04d}.parquet")
            tbl = pa.Table.from_pandas(
                chunk.reset_index(drop=True), preserve_index=False
            )
            pq.write_table(tbl, p)
            os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
        stream = (
            spark.readStream.schema(WINDOW_STREAM_INPUT_SCHEMA)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = (
            windowed_features_stream(stream, window=8, overlap=0.5)
            .writeStream.outputMode("append").format("memory")
            .queryName("wstream_t").option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            n_batches = len(q.recentProgress)
        finally:
            q.stop()
        got = {
            (r.conv_id, r.window_idx): (
                r.n, r.start_turn_idx, r.end_turn_idx, r.mean_gap_ms,
                r.median_gap_ms, r.iqr_gap_ms, r.entropy_gap,
            )
            for r in spark.sql("SELECT * FROM wstream_t").collect()
        }
        batch = windowed_summary_features(dedup_df, window=8, overlap=0.5)
        want = {
            (r.conv_id, r.window_idx): (
                r.n, r.start_turn_idx, r.end_turn_idx, r.mean_gap_ms,
                r.median_gap_ms, r.iqr_gap_ms, r.entropy_gap,
            )
            for r in batch.filter("n = 8").collect()
        }
        assert n_batches >= 2
        assert got == want  # exact: same numpy math on both paths
        # the boundary is real: some window spans both micro-batches
        assert len(got) > 0
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_window_stream_state_is_bounded(spark, dedup_pdf):
    """The carried tail never exceeds window + 1 turns however long the
    conversation runs — the memory bound that makes the operator safe on
    unbounded streams."""
    import numpy as np
    import pandas as pd
    from mpower_feature_analysis_spark.streaming.window_stream import (
        make_window_stream_func,
    )

    class FakeState:
        exists = False
        def __init__(self):
            self.value = None
        @property
        def get(self):
            return self.value
        def update(self, v):
            self.value = v
            self.exists = True

    func = make_window_stream_func(window=8, overlap=0.5)
    st = FakeState()
    n = 0
    for batch_no in range(30):
        m = 37  # awkward batch size: boundaries never align with windows
        pdf = pd.DataFrame({
            "conv_id": "c0",
            "turn_idx": np.arange(n, n + m, dtype="int64"),
            "ts": pd.to_datetime(1_700_000_000_000 + np.arange(n, n + m) * 1000,
                                 unit="ms"),
        })
        n += m
        list(func(("c0",), iter([pdf]), st))
        assert len(st.value[1]) <= 9  # window + 1
    # after 1,110 turns the next scheduled start tracked the stream head
    assert st.value[0] >= (n - 1 - 8)  # within one window of the head


def test_stateful_asof_stream_late_state_contract(spark):
    """Pin the late-state semantics (round-5 verdict item 5): a state row
    delivered in batch 2 with ts BELOW batch-1's max (ordering contract
    violated) (a) never retro-corrects turns already emitted in batch 1,
    (b) labels co-late turns in its own batch per the as-of sort, and
    (c) replaces the carried state only when newer by (ts, seq).

    Layout (conv 'c', ts in seconds from a fixed base):
      batch 1: state A@100(seq1); turns t0@50 (pre-state -> null), t1@150 (A)
      batch 2: late state C@80(seq0, OLDER than carried A),
               late state B@120(seq2, newer than carried A but < 150),
               turns t4@90 (co-late, between C and A -> C),
               t2@130 (-> B), t3@160 (-> B)
    The batch oracle would label t1 with B (120 <= 150); the stream keeps
    A because t1 was already emitted — asserted explicitly as the
    documented divergence.
    """
    import os
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mpower_feature_analysis_spark.streaming.asof_stream import (
        ASOF_STREAM_INPUT_SCHEMA,
        asof_label_stream,
    )

    base = pd.Timestamp("2024-01-01")

    def turn(idx, sec):
        return ("c", 1, base + pd.Timedelta(seconds=sec), idx, None, None)

    def state(sec, seq, label):
        return ("c", 0, base + pd.Timedelta(seconds=sec), None, seq, label)

    cols = ["conv_id", "kind", "ts", "turn_idx", "state_seq", "label"]
    b1 = pd.DataFrame([state(100, 1, "A"), turn(0, 50), turn(1, 150)], columns=cols)
    b2 = pd.DataFrame(
        [state(80, 0, "C"), state(120, 2, "B"), turn(4, 90), turn(2, 130), turn(3, 160)],
        columns=cols,
    )
    for b in (b1, b2):
        b["kind"] = b["kind"].astype("int32")
        b["turn_idx"] = b["turn_idx"].astype("Int32")
        b["state_seq"] = b["state_seq"].astype("Int64")
        b["ts"] = b["ts"].astype("datetime64[us]")  # parquet NANOS unreadable by Spark

    src = tempfile.mkdtemp(prefix="asof_late_src_")
    ckpt = tempfile.mkdtemp(prefix="asof_late_ckpt_")
    try:
        for i, chunk in enumerate([b1, b2]):
            p = os.path.join(src, f"part-{i:04d}.parquet")
            pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False), p)
            os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
        stream = (
            spark.readStream.schema(ASOF_STREAM_INPUT_SCHEMA)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = (
            asof_label_stream(stream)
            .writeStream.outputMode("append").format("memory")
            .queryName("asof_late_t").option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            assert len(q.recentProgress) >= 2
        finally:
            q.stop()
        got = {
            r.turn_idx: r.label
            for r in spark.sql("SELECT * FROM asof_late_t").collect()
        }
        assert got == {
            0: None,   # before any state
            1: "A",    # emitted in batch 1; NOT retro-corrected to B
            4: "C",    # co-late turn labeled by the older late state
            2: "B",    # late-but-newer state B beats carried A at ts>=120
            3: "B",
        }
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_sessionize_stateful_late_event(spark):
    """Pin the stateful sessionizer's late-event contract (round-5
    advice): an event arriving in a later trigger with ts BELOW the open
    session's start (within the watermark) folds into the open session
    with HONEST bounds — session_start is lowered, n_turns counts it —
    and closed sessions are never reopened.

    conv 'c', gap 3600s: batch 1 = turns @1000s,@1100s (open session);
    batch 2 = late turn @400s (folds; start drops to 400) then @6000s
    (gap 4900 > 3600 closes [400,1100] n=3, opens [6000] n=1)."""
    import os
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from mpower_feature_analysis_spark.streaming.sessionize_stream import (
        sessionize_stream_stateful,
    )

    base = pd.Timestamp("2024-01-01")

    def rows(secs):
        return pd.DataFrame({
            "conv_id": ["c"] * len(secs),
            "turn_idx": pd.array(range(len(secs)), dtype="int32"),
            "role": ["user"] * len(secs),
            "text": ["t"] * len(secs),
            "tool": pd.Series([None] * len(secs), dtype="string"),
            "ts": pd.Series(
                [base + pd.Timedelta(seconds=s) for s in secs],
                dtype="datetime64[us]",  # parquet NANOS unreadable by Spark
            ),
        })

    src = tempfile.mkdtemp(prefix="sess_late_src_")
    ckpt = tempfile.mkdtemp(prefix="sess_late_ckpt_")
    try:
        for i, chunk in enumerate([rows([1000, 1100]), rows([400, 6000])]):
            p = os.path.join(src, f"part-{i:04d}.parquet")
            pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False), p)
            os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = (
            sessionize_stream_stateful(stream, gap_s=GAP_S)
            .writeStream.outputMode("update").format("memory")
            .queryName("sess_late").option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            assert len(q.recentProgress) >= 2
        finally:
            q.stop()
        # a late fold LOWERS session_start, so the (conv_id, session_start)
        # upsert key is stable only under the in-order contract — assert
        # the full emission log: batch-1 open snapshot (1000,1100,2) is
        # SUPERSEDED by the closed (400,1100,3), which contains it
        log = sorted(
            (int((r.session_start - base.to_pydatetime()).total_seconds()),
             int((r.session_end - base.to_pydatetime()).total_seconds()),
             r.n_turns, r.closed)
            for r in spark.table("sess_late").collect()
        )
        assert log == [
            (400, 1100, 3, True),     # batch 2: late fold then close
            (1000, 1100, 2, False),   # batch 1 open snapshot (superseded)
            (6000, 6000, 1, False),   # batch 2: new open session
        ]
        # the closed emission is final: exactly one closed row, with the
        # late event already folded in (n_turns=3, start=400)
        closed = spark.table("sess_late").filter("closed").collect()
        assert len(closed) == 1 and closed[0].n_turns == 3
        assert int((closed[0].session_start - base.to_pydatetime()).total_seconds()) == 400
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
