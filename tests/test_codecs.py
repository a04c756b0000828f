"""Pure-numpy WAV/BMP codecs + the real multimodal decode path."""

import numpy as np
import pytest

import ray.data

from graphscope_ray.data.codecs import (
    decode_bmp, decode_wav, encode_bmp, encode_wav)
from graphscope_ray.data.multimodal import media_features, synth_media


def test_wav_roundtrip():
    wave = np.sin(np.linspace(0, 20, 1600))
    payload = encode_wav(wave, rate=8000)
    pcm, rate = decode_wav(payload)
    assert rate == 8000
    want = (np.clip(wave, -1, 1) * 32767.0).astype(np.int16)
    np.testing.assert_array_equal(pcm, want)


def test_bmp_roundtrip():
    rng = np.random.default_rng(0)
    for h, w in [(5, 7), (4, 4), (9, 3)]:  # odd widths exercise padding
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)


def test_media_features_real_decode():
    tbl = synth_media(n=32, seed=7)
    ds = ray.data.from_arrow(tbl)
    out = media_features(ds, decode="real", feat_dim=8).to_pandas()
    assert len(out) == 32
    feats = np.stack(out["feature"].to_numpy())
    assert feats.shape == (32, 8)
    assert np.isfinite(feats).all()
    assert (feats >= 0).all() and (feats <= 1.0 + 1e-9).all()
    # deterministic
    out2 = media_features(ds, decode="real", feat_dim=8).to_pandas()
    np.testing.assert_array_equal(
        np.stack(out2["feature"].to_numpy()), feats)


def test_image_resize_real():
    from graphscope_ray.data.codecs import decode_bmp
    from graphscope_ray.data.multimodal import image_resize
    tbl = synth_media(n=24, seed=11)
    ds = ray.data.from_arrow(tbl)
    out = image_resize(ds, out_w=8, out_h=6).to_pandas()
    assert len(out) == 24
    src = {int(m): (k, p) for m, k, p in zip(
        tbl["media_id"].to_pylist(), tbl["kind"].to_pylist(),
        tbl["payload"].to_pylist())}
    n_img = 0
    for _, r in out.iterrows():
        kind, orig = src[int(r["media_id"])]
        if kind != "image":
            assert r["payload"] == orig  # pass-through untouched
            continue
        n_img += 1
        assert (r["width"], r["height"]) == (8, 6)
        rgb = decode_bmp(r["payload"])
        assert rgb.shape == (6, 8, 3)
        # nearest-neighbor invariant: every output pixel exists in the
        # source image
        srgb = decode_bmp(orig).reshape(-1, 3)
        sset = {tuple(px) for px in srgb}
        assert all(tuple(px) in sset for px in rgb.reshape(-1, 3))
    assert n_img > 0


def test_avi_roundtrip():
    from graphscope_ray.data.codecs import decode_avi, encode_avi
    rng = np.random.default_rng(3)
    for (n, h, w, fps) in [(1, 4, 4, 8), (5, 7, 9, 4), (3, 31, 5, 25)]:
        fr = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        out, f2 = decode_avi(encode_avi(fr, fps=fps))
        assert f2 == fps
        np.testing.assert_array_equal(out, fr)


def test_avi_rejects_non_rgb24():
    from graphscope_ray.data.codecs import decode_avi
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi(b"nope" * 10)


def test_frame_sample_composes_with_image_stages():
    """frame_sample emits BMP frames that image stages consume; the
    sampled frame pixels equal the struct-oracle's expectation."""
    import hashlib

    import ray.data

    from graphscope_ray.data.multimodal import frame_sample, synth_media
    from graphscope_ray.oracle import frame_sample_expected

    tbl = synth_media(n=32, seed=9)
    got = (frame_sample(ray.data.from_arrow(tbl), every_ms=500)
           .to_pandas().sort_values(["media_id", "ts_ms"])
           .reset_index(drop=True))
    got["frame_sha256"] = [hashlib.sha256(f).hexdigest()
                           for f in got["frame"]]
    want = (frame_sample_expected(tbl, every_ms=500)
            .sort_values(["media_id", "ts_ms"]).reset_index(drop=True))
    assert got[["media_id", "ts_ms", "frame_sha256"]].equals(want)
    # frames are valid BMPs the image decoder accepts
    from graphscope_ray.data.codecs import decode_bmp
    rgb = decode_bmp(got["frame"].iloc[0])
    assert rgb.ndim == 3 and rgb.shape[2] == 3
