"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
kernels.

The decode step is STUBBED (no imaging/audio libraries in this container):
``decode_stub`` produces a deterministic fake feature vector from the bytes
so the Spark-side plumbing — schema, partitioning, UDF signature, batch
shape — is real and tested end-to-end. Swap ``_decode_bytes`` for a real
decoder (PIL/librosa/ffmpeg) in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "sample_rate int, duration_ms long"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, feat array<float>, error string"
)

_FEAT_DIM = 16


def _decode_bytes(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake 'decode + feature-extract': 16 floats derived from
    a sha256 of the bytes. REAL decoders plug in here; raising
    NotImplementedError for unknown kinds exercises the error channel."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    h = hashlib.sha256(payload).digest()
    return (
        np.frombuffer(h[: _FEAT_DIM * 2], dtype="<u2").astype("float32") / 65535.0
    )


def extract_media_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas over binary payloads → fixed-dim feature vectors.

    Arrow moves the binary column zero-copy per batch; per-row failures
    become ``error`` rows (F5 channel), never task failures.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, errs = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                try:
                    feats.append(_decode_bytes(bytes(payload), kind).tolist())
                    errs.append(None)
                except Exception as e:
                    feats.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feat": feats,
                    "error": errs,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURE_SCHEMA
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests.

    The payload is the ASCII hex digest of sha256(str(i)) repeated 8 times
    (512 bytes). ASCII-only bytes keep the derived features recomputable by
    any engine whose sha256 takes strings (the DuckDB oracle in
    plans/driver_queries_text.py re-derives them in pure SQL) while still
    flowing through Spark as a true ``binary`` column.
    """
    kinds = ["image", "audio", "video", "hologram"]  # last one → error row
    rows = []
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).hexdigest().encode("ascii") * 8
        rows.append((i, kinds[i % 4], bytearray(payload), 64, 64, 16000, 1000))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
