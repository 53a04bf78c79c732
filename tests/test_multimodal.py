"""Multimodal binary-column plumbing: schema, batching, deterministic fake
decode, frame sampling, and the real-decoder stub contract."""

import pytest

from sac2mseed_spark.functions.multimodal import (
    _decode_real,
    extract_features,
    frame_sample,
    synth_media,
)
from sac2mseed_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return synth_media(load_table(spark, sf_dir, "documents")).cache()


def test_schema_and_counts(spark, media):
    n = media.count()
    feats = extract_features(media)
    assert feats.count() == n
    assert dict(feats.dtypes)["digest"] == "string"
    assert dict(media.dtypes)["payload"] == "binary"


def test_features_deterministic(spark, media):
    a = {r["media_id"]: tuple(r) for r in extract_features(media).collect()}
    b = {r["media_id"]: tuple(r) for r in extract_features(media.repartition(7)).collect()}
    assert a == b


def test_frame_sample_only_videos(spark, media):
    frames = frame_sample(media, every_n=4)
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    got = {}
    for r in frames.collect():
        got.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in got.items():
        assert feats[mid]["kind"] == "video"
        assert idxs == list(range(0, feats[mid]["n_frames"], 4))


def test_vectorized_kernel_matches_per_row_reference(spark, media):
    """The flat-buffer kernel must agree with the per-row _decode_fake
    twin on every feature, including the unrounded mean_level."""
    from sac2mseed_spark.functions.multimodal import _decode_fake

    rows = extract_features(media).collect()
    src = {r["media_id"]: r for r in media.collect()}
    assert rows
    for r in rows:
        p = bytes(src[r["media_id"]]["payload"])
        w, h, nf, ml = _decode_fake(p, r["kind"])
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, nf)
        assert abs(r["mean_level"] - ml) < 1e-12
        assert r["n_bytes"] == len(p)
        import hashlib

        assert r["digest"] == hashlib.md5(p).hexdigest()


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        _decode_real(b"xx", "image")


def test_frame_sample_emits_deterministic_frames(spark, media):
    """Fake frame payloads are non-null, unique per (media, frame), and a
    pure function of the payload digest — re-running yields identical
    bytes (the contract a real grabber must also satisfy)."""
    a = {(r["media_id"], r["frame_idx"]): bytes(r["frame"])
         for r in frame_sample(media, every_n=4).collect()}
    b = {(r["media_id"], r["frame_idx"]): bytes(r["frame"])
         for r in frame_sample(media, every_n=4).collect()}
    assert a == b and a
    assert all(v for v in a.values())
    assert len(set(a.values())) == len(a)
