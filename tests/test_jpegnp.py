"""Pure-numpy baseline JPEG codec (ttmf_ray/stages/jpegnp.py)."""

import numpy as np
import pytest

from ttmf_ray.stages.jpegnp import (QUANT_LUMA, ZIGZAG, _scaled_quant,
                                    decode_jpeg, encode_jpeg)


def _gradient(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return np.clip(120 + 60 * np.sin(xx / 9.0) + 40 * np.cos(yy / 7.0)
                   + rng.normal(0, 3, (h, w)), 0, 255).astype(np.uint8)


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec spot checks: scan starts 0,1,8,16,9,2 and ends at 63
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert ZIGZAG[-1] == 63


def test_gray_roundtrip_quantization_bounded():
    img = _gradient(40, 56)
    data = encode_jpeg(img, quality=90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    dec = decode_jpeg(data)
    assert dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 16 and err.mean() < 4


def test_color_roundtrip():
    g = _gradient(24, 40, seed=3)
    rgb = np.stack([g, np.roll(g, 5, axis=1), 255 - g], axis=-1)
    dec = decode_jpeg(encode_jpeg(rgb, quality=90))
    assert dec.shape == rgb.shape
    err = np.abs(dec.astype(float) - rgb.astype(float))
    assert err.mean() < 8


def test_non_multiple_of_8_dims_crop_exactly():
    img = _gradient(13, 21, seed=5)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == (13, 21)


def test_quality_monotone():
    """Lower quality -> smaller stream and larger error (on average)."""
    img = _gradient(48, 48, seed=9)
    lo = encode_jpeg(img, quality=20)
    hi = encode_jpeg(img, quality=95)
    assert len(lo) < len(hi)
    e_lo = np.abs(decode_jpeg(lo).astype(float) - img).mean()
    e_hi = np.abs(decode_jpeg(hi).astype(float) - img).mean()
    assert e_hi < e_lo


def test_scaled_quant_spec_formula():
    # quality 50 is the identity scaling of the Annex-K base table
    assert np.array_equal(_scaled_quant(QUANT_LUMA, 50), QUANT_LUMA)
    assert (_scaled_quant(QUANT_LUMA, 1) >= QUANT_LUMA).all()
    assert (_scaled_quant(QUANT_LUMA, 100) == 1).all()


def test_flat_image_is_dc_only_and_exact():
    """A constant image is pure DC: decode must be exact (no AC, the DC
    quantizer divides the level shift exactly for value 128)."""
    img = np.full((16, 16), 128, np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=50))
    assert np.array_equal(dec, img)


def test_byte_stuffing_survives():
    """Find an image whose entropy stream contains 0xFF bytes (stuffed
    as FF 00) and check it still decodes — the unstuffing path."""
    for seed in range(30):
        img = _gradient(16, 16, seed=seed)
        data = encode_jpeg(img, quality=75)
        scan = data[data.find(b"\xff\xda"):]
        if b"\xff\x00" in scan:
            dec = decode_jpeg(data)
            assert np.abs(dec.astype(int) - img.astype(int)).mean() < 6
            return
    pytest.skip("no stuffed byte produced in 30 seeds")


def test_truncated_stream_raises():
    img = _gradient(16, 16)
    data = encode_jpeg(img)
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(data[:20])
    with pytest.raises(ValueError):
        decode_jpeg(b"nonsense")
