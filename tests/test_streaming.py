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
