"""Image codec invariants (BASELINE.json input_hint): lossless PPM roundtrip,
lossy DCT with PSNR >= 40 dB, perceptual hash behavior."""

import numpy as np
import pytest

from vectortiles_spark.images import codec as ic


def _img(seed: int, w: int = 48, h: int = 32) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255 / max(w - 1, 1) + yy * 40 / max(h - 1, 1)) % 256
    img = np.stack([base, base * 0.7, base * 0.4], axis=-1)
    img += rng.normal(0, 8, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_ppm_roundtrip_exact():
    img = _img(1)
    assert np.array_equal(ic.decode_ppm(ic.encode_ppm(img)), img)


def test_ppm_header_with_comment():
    img = _img(2, 8, 8)
    data = ic.encode_ppm(img)
    with_comment = b"P6\n# a comment\n" + data[3:]
    assert np.array_equal(ic.decode_ppm(with_comment), img)


@pytest.mark.parametrize("seed,w,h", [(3, 8, 8), (4, 33, 17), (5, 64, 64), (6, 48, 24)])
def test_dct_psnr_at_least_40(seed, w, h):
    img = _img(seed, w, h)
    dec = ic.decode_dct(ic.encode_dct(img))
    assert dec.shape == img.shape
    assert ic.psnr(img, dec) >= 40.0


def test_decode_sniffs_format():
    img = _img(7)
    assert np.array_equal(ic.decode_image(ic.encode_ppm(img)), img)
    assert ic.decode_image(ic.encode_dct(img)).shape == img.shape
    with pytest.raises(ValueError):
        ic.decode_image(b"\x00\x01\x02")


def test_phash_deterministic_and_sensitive():
    a = _img(8)
    assert ic.phash64(a) == ic.phash64(a.copy())
    # mild noise -> small hamming distance; different image -> large
    noisy = np.clip(a.astype(np.int16) + 2, 0, 255).astype(np.uint8)
    other = _img(99)
    d_noise = ic.hamming64(ic.phash64(a), ic.phash64(noisy))
    d_other = ic.hamming64(ic.phash64(a), ic.phash64(other))
    assert d_noise <= 8
    assert d_other > d_noise


def test_phash_fits_int64():
    h = ic.phash64(_img(9))
    assert -(2**63) <= h < 2**63
