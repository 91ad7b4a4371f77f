from mpower_feature_analysis_spark.functions.multimodal import (
    _FEAT_DIM,
    extract_media_features,
    synth_media,
)


def test_media_feature_plumbing(spark):
    media = synth_media(spark, n=64)
    out = extract_media_features(media).orderBy("media_id").collect()
    assert len(out) == 64
    ok = [r for r in out if r.error is None]
    bad = [r for r in out if r.error is not None]
    # every 4th row is kind='hologram' → NotImplementedError error row
    assert len(bad) == 16
    assert all("NotImplementedError" in r.error for r in bad)
    assert all(len(r.feat) == _FEAT_DIM for r in ok)
    assert all(r.feat is None for r in bad)
    assert all(0.0 <= x <= 1.0 for r in ok for x in r.feat)


def test_media_features_deterministic(spark):
    media = synth_media(spark, n=16)
    a = extract_media_features(media).orderBy("media_id").collect()
    b = extract_media_features(media).orderBy("media_id").collect()
    assert a == b


def test_resize_media_plumbing(spark):
    from mpower_feature_analysis_spark.functions.multimodal import resize_media
    media = synth_media(spark, n=16)
    out = resize_media(media, out_w=8, out_h=8).orderBy("media_id").collect()
    assert len(out) == 16
    ok = [r for r in out if r.error is None]
    bad = [r for r in out if r.error is not None]
    assert all(r.kind == "image" for r in ok) and len(ok) == 4
    assert all(len(r.payload) == 64 and r.width == 8 and r.height == 8 for r in ok)
    assert all(r.payload is None for r in bad)
    # deterministic
    again = resize_media(media, out_w=8, out_h=8).orderBy("media_id").collect()
    assert out == again


def test_sample_frames_plumbing(spark):
    from mpower_feature_analysis_spark.functions.multimodal import sample_frames
    media = synth_media(spark, n=16)  # payload = 512 bytes
    out = sample_frames(media, every_k=2, frame_w=16, frame_h=16).collect()
    vids = [r for r in out if r.error is None]
    errs = [r for r in out if r.error is not None]
    # 512 bytes / 256-byte frames = 2 frames; every_k=2 → frame 0 only
    assert all(r.n_frames == 2 and r.frame_idx == 0 and len(r.frame) == 256
               for r in vids)
    assert len(vids) == 4          # one sampled frame per video row
    assert len(errs) == 12         # image/audio/hologram rows → error rows
    assert all(r.frame is None for r in errs)


# ---------------------------------------------------------------------------
# Optional real decoder (round-3: production-real where Pillow exists)
# ---------------------------------------------------------------------------

def _pil_available():
    from mpower_feature_analysis_spark.functions.multimodal import pil_image_module
    return pil_image_module() is not None


def test_decoder_auto_runs_whichever_path_exists(spark):
    """decoder='auto' must be green with OR without Pillow: with it, real
    image decode produces _FEAT_DIM floats; without it, output equals the
    stub path exactly (the oracle path is unchanged either way)."""
    from mpower_feature_analysis_spark.functions.multimodal import (
        extract_media_features,
        synth_media,
    )
    media = synth_media(spark, n=16)
    auto = extract_media_features(media, decoder="auto").orderBy("media_id").collect()
    stub = extract_media_features(media, decoder="stub").orderBy("media_id").collect()
    assert len(auto) == len(stub) == 16
    if not _pil_available():
        assert auto == stub  # this container: fallback is bit-identical
    else:
        # synth payloads are not valid image files: the REAL decoder fails
        # them into the error channel rather than the task
        img_rows = [r for r in auto if r.kind == "image"]
        assert all(r.error is not None for r in img_rows)
    # non-image kinds are stubbed in every mode
    for a, s in zip(auto, stub):
        if a.kind in ("audio", "video"):
            assert a.feat == s.feat


def test_decoder_pil_requires_pillow(spark):
    """decoder='pil' is strict: missing Pillow is an ImportError on every
    row (surfaced through the F5 error channel in the feature kernel),
    never a silent stub fallback."""
    import pytest
    from mpower_feature_analysis_spark.functions.multimodal import (
        extract_media_features,
        resize_media,
        synth_media,
    )
    media = synth_media(spark, n=8)
    if _pil_available():
        pytest.skip("Pillow installed: strictness covered by the auto test")
    rows = extract_media_features(media, decoder="pil").collect()
    img_rows = [r for r in rows if r.kind == "image"]
    assert img_rows and all("ImportError" in r.error for r in img_rows)
    with pytest.raises(ImportError):
        resize_media(media, decoder="pil").collect()


def test_real_resize_when_pillow_present(spark):
    """With Pillow installed, decoder='auto' resize goes through
    PIL.Image.resize; nearest-neighbour on a raw grayscale buffer matches
    the stub's strided selection on axis-aligned cases."""
    import pytest
    if not _pil_available():
        pytest.skip("Pillow not in this container; stub path tested above")
    from mpower_feature_analysis_spark.functions.multimodal import (
        resize_media,
        synth_media,
    )
    media = synth_media(spark, n=8)
    out = resize_media(media, out_w=8, out_h=8, decoder="auto").collect()
    ok = [r for r in out if r.error is None]
    assert ok and all(len(bytes(r.payload)) == 64 for r in ok)
