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
