"""Media-stage tests: real WAV/PPM decode kernels end to end; codec
formats (JPEG/MP4) remain explicit stubs."""

import numpy as np
import pytest

import ray.data as rd

from ttmf_ray.stages.media import (MEDIA_SCHEMA, MediaFeatureConfig,
                                   decode_ppm, decode_wav, media_features,
                                   real_decode, resize_mean_pool, synth_ppm,
                                   synth_media_batch, synth_wav)


def test_synth_media_schema_and_determinism():
    a = synth_media_batch(np.arange(20))
    b = synth_media_batch(np.arange(20))
    assert a.schema.equals(MEDIA_SCHEMA)
    assert a.equals(b)


def test_media_features_pipeline():
    t = synth_media_batch(np.arange(50))
    out = media_features(rd.from_arrow(t), concurrency=1).to_pandas()
    assert len(out) == 50
    assert set(out.columns) == {"media_id", "kind", "feat_mean", "feat_std",
                                "feat_min", "feat_max"}
    assert (out["feat_max"] <= 255).all() and (out["feat_min"] >= 0).all()


def test_real_decoder_is_explicit_stub_for_codec_formats():
    # mp4 stays an honest stub; JPEG now has the pure-numpy baseline
    # fallback (stages/jpegnp.py) when Pillow is absent.
    with pytest.raises(NotImplementedError):
        real_decode(b"x", "video/mp4")
    with pytest.raises(NotImplementedError):
        real_decode(b"x", "audio/mp3")


def test_real_decoder_jpeg_numpy_fallback():
    """real_decode('image/jpeg') works in this codec-less container via
    the from-scratch baseline decoder: round-trip a synthetic gradient
    through encode_jpeg and check luminance error within quantization
    noise."""
    from ttmf_ray.stages.jpegnp import encode_jpeg

    yy, xx = np.mgrid[0:32, 0:48]
    gray = (96 + 48 * np.sin(xx / 8.0) + 32 * np.cos(yy / 6.0)) \
        .clip(0, 255).astype(np.uint8)
    lum = real_decode(encode_jpeg(gray, quality=90), "image/jpeg")
    assert lum.shape == (32, 48)
    assert np.abs(lum - gray.astype(np.float64)).max() < 12
    rgb = np.stack([gray, gray // 2, 255 - gray], axis=-1)
    lum3 = real_decode(encode_jpeg(rgb, quality=90), "image/jpeg")
    want = rgb.astype(np.float64).mean(axis=2)
    assert np.abs(lum3 - want).mean() < 6


def test_wav_roundtrip_and_features():
    payload = synth_wav(42, 3, rate=16000, n=4000)
    x, rate = decode_wav(payload)
    assert rate == 16000 and len(x) == 4000
    assert np.abs(x).max() <= 1.0
    # sine + harmonic: mean ~0, rms in a sane band
    assert abs(x.mean()) < 0.01
    assert 0.1 < np.sqrt((x ** 2).mean()) < 0.9


def test_ppm_roundtrip_and_resize():
    payload = synth_ppm(42, 5, w=24, h=16)
    img = decode_ppm(payload)
    assert img.shape == (16, 24, 3) and img.dtype == np.uint8
    pooled = resize_mean_pool(img.mean(axis=2), 8)
    assert pooled.shape == (8, 8)
    assert 0 <= pooled.min() and pooled.max() <= 255
    # comment-bearing header parses too
    commented = b"P6\n# a comment\n24 16\n255\n" + payload.split(b"\n", 3)[3]
    assert np.array_equal(decode_ppm(commented), img)


def test_media_features_real_decode_pipeline():
    t = synth_media_batch(np.arange(60), real_payloads=True)
    decodable = t.filter(
        np.isin(np.asarray(t.column("kind")), ["image", "audio"]))
    out = media_features(
        rd.from_arrow(decodable),
        cfg=MediaFeatureConfig(use_fake_decoder=False),
        concurrency=1,
    ).to_pandas()
    assert len(out) == decodable.num_rows > 0
    imgs = out[out["kind"] == "image"]
    auds = out[out["kind"] == "audio"]
    assert (imgs["feat_max"] <= 255).all() and (imgs["feat_min"] >= 0).all()
    assert (auds["feat_min"] >= -1.0).all() and (auds["feat_max"] <= 1.0).all()
    assert (auds["feat_std"] > 0.05).all()      # a sine, not silence


def test_frame_sample_pipeline_matches_scalar_decode():
    import pyarrow as pa

    from ttmf_ray.stages.media import (decode_ppm, frame_sample, mpv_frames,
                                       resize_mean_pool, synth_mpv)

    ids = np.arange(12)
    t = pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "payload": pa.array([synth_mpv(42, int(i)) for i in ids],
                            pa.binary())})
    out = frame_sample(rd.from_arrow(t), concurrency=1).to_pandas() \
        .sort_values(["media_id", "frame_idx"], ignore_index=True)
    # scalar oracle: re-decode every sampled frame independently
    rows = []
    for i in ids:
        for f, ppm in mpv_frames(synth_mpv(42, int(i))):
            if f % 4:
                continue
            img = decode_ppm(ppm).astype(np.float64)
            rows.append((int(i), f, img[:, :, 0].mean(),
                         resize_mean_pool(img.mean(axis=2), 8).std()))
    assert len(out) == len(rows) > 0
    for (mid, f, mr, ls), (_, r) in zip(rows, out.iterrows()):
        assert (r["media_id"], r["frame_idx"]) == (mid, f)
        assert abs(r["mean_r"] - mr) < 1e-12
        assert abs(r["lum_std"] - ls) < 1e-12
    # stride actually samples: frame 1, 2, 3 never appear
    assert not np.isin(out["frame_idx"].to_numpy(), [1, 2, 3]).any()


def test_codec_probe_boundary():
    """JPEG/MP3 decode through the probe when the codec lib exists;
    identical documented NotImplementedError when it does not (this
    container ships neither lib, so here the stub branch is what runs —
    but the test exercises whichever branch the environment provides)."""
    import numpy as np
    import pytest

    from ttmf_ray.stages.media import _PIL_Image, _soundfile, real_decode

    if _PIL_Image is None:
        # Pillow absent: JPEG routes to the pure-numpy baseline decoder,
        # which rejects a marker-less stream.
        with pytest.raises(ValueError):
            real_decode(b"\xff\xd8\xff\xe0fakejpeg", "image/jpeg")
        from ttmf_ray.stages.jpegnp import encode_jpeg

        img = np.full((6, 8, 3), (10, 20, 30), np.uint8)
        px = real_decode(encode_jpeg(img, quality=95), "image/jpeg")
        assert px.shape == (6, 8) and 0 <= px.mean() <= 255
    else:                                    # pragma: no cover - env
        import io

        img = _PIL_Image.new("RGB", (8, 6), (10, 20, 30))
        buf = io.BytesIO()
        img.save(buf, format="JPEG")
        px = real_decode(buf.getvalue(), "image/jpeg")
        assert px.shape == (6, 8) and 0 <= px.mean() <= 255
    if _soundfile is None:
        with pytest.raises(NotImplementedError, match="audio/mpeg"):
            real_decode(b"ID3fakemp3", "audio/mpeg")


def test_image_ahash_dedup_planted_copies():
    """media_image_dedup: ids 50-59 are byte-identical copies of 0-9 —
    each pair must share (ahash, canonical_id) with n_same == 2; the
    40 untouched images stay singletons."""
    import numpy as np

    from ttmf_ray.pipelines.corpus_queries import media_image_dedup

    out = media_image_dedup("/root/testdata/sf0.001").set_index("media_id")
    for j in range(10):
        assert out.loc[50 + j, "ahash"] == out.loc[j, "ahash"]
        assert out.loc[50 + j, "canonical_id"] == j
        assert out.loc[j, "n_same"] == 2
    singles = out.drop(index=list(range(10)) + list(range(50, 60)))
    assert (singles["n_same"] == 1).all()
    assert out["ahash"].nunique() == 50


def test_ahash_noise_robustness():
    """The perceptual property: one-pixel noise moves the aHash at most
    a few bits (byte-identical copies are exactly equal by the dedup
    test above)."""
    import numpy as np

    from ttmf_ray.stages.media import ahash64, decode_ppm, synth_ppm

    img = decode_ppm(synth_ppm(42, 7))
    h0 = ahash64(img)
    noisy = img.copy()
    noisy[3, 5, 1] = (int(noisy[3, 5, 1]) + 9) % 256
    h1 = ahash64(noisy)
    dist = bin(int(np.uint64(h0) ^ np.uint64(h1))).count("1")
    assert dist <= 4


def test_media_jpeg_features_scalar_oracle():
    """media_jpeg_features: the actor-pool feature table must equal an
    independent per-image re-decode (decode -> luminance -> 8x8 mean
    pool -> mean/std/min/max) to float precision — the rows-only
    query's pinned oracle."""
    from ttmf_ray.pipelines.corpus_queries import media_jpeg_features
    from ttmf_ray.stages.media import real_decode, synth_jpeg

    out = media_jpeg_features("/root/testdata/sf0.001") \
        .set_index("media_id")
    assert len(out) == 60 and (out["kind"] == "image").all()
    for i in (0, 7, 31, 59):
        lum = real_decode(synth_jpeg(42, i), "image/jpeg")
        v = resize_mean_pool(lum, 8)
        r = out.loc[i]
        assert abs(r["feat_mean"] - round(float(v.mean()), 6)) <= 1e-6
        assert abs(r["feat_std"] - round(float(v.std()), 6)) <= 1e-6
        assert abs(r["feat_min"] - round(float(v.min()), 6)) <= 1e-6
        assert abs(r["feat_max"] - round(float(v.max()), 6)) <= 1e-6


def test_media_audio_dedup_planted_copies():
    """media_audio_dedup: ids 50-59 are byte-identical copies of 0-9 —
    identical fingerprints, canonical = the lower id; untouched clips
    stay singletons."""
    from ttmf_ray.pipelines.corpus_queries import media_audio_dedup

    import collections

    from ttmf_ray.stages.media import (audio_fingerprint, decode_wav,
                                       synth_wav)

    out = media_audio_dedup("/root/testdata/sf0.001").set_index("media_id")
    assert len(out) == 60
    # scalar oracle: recompute every fingerprint independently and
    # derive the EXPECTED groups from it — the code is gain-invariant
    # and bin-quantized (31.25 Hz), so near-f0 clips legitimately
    # collide (the aHash planted-fixture lesson, CLAUDE.md round 3)
    exp = {i: int(audio_fingerprint(decode_wav(
        synth_wav(42, int(i % 50 if i >= 50 else i)))[0]))
        for i in range(60)}
    groups = collections.defaultdict(list)
    for i, f in exp.items():
        groups[f].append(i)
    for i in range(60):
        assert out.loc[i, "afp"] == exp[i]
        grp = groups[exp[i]]
        assert out.loc[i, "n_same"] == len(grp)
        assert out.loc[i, "canonical_id"] == min(grp)
    # the planted byte-copies are in-group by construction
    for j in range(10):
        assert out.loc[50 + j, "afp"] == out.loc[j, "afp"]


def test_audio_fingerprint_gain_robust_but_content_sensitive():
    """The quantized spectral-peak code survives a mild gain change but
    distinguishes different tones."""
    from ttmf_ray.stages.media import audio_fingerprint, decode_wav, synth_wav

    x, _ = decode_wav(synth_wav(42, 3))
    assert audio_fingerprint(x) == audio_fingerprint(0.7 * x)
    y, _ = decode_wav(synth_wav(42, 4))
    assert audio_fingerprint(x) != audio_fingerprint(y)
