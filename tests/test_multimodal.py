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
