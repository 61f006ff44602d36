"""Color science tests: known white points, sRGB round trips, blackbody locus."""
import numpy as np
import pytest

from mcrt_tpu.color import cie


def test_d65_white_maps_to_unit_rgb():
    white = cie.D65_XYZ / cie.D65_XYZ[1]
    rgb = cie.srgb_from_xyz(white)
    np.testing.assert_allclose(rgb, [1.0, 1.0, 1.0], atol=1e-9)


def test_srgb_round_trip():
    rng = np.random.RandomState(0)
    rgb = rng.rand(10, 3)
    back = cie.srgb_from_xyz(cie.xyz_from_srgb(rgb))
    np.testing.assert_allclose(back, rgb, atol=1e-12)


def test_gamma_round_trip():
    v = np.linspace(0, 1, 100)
    np.testing.assert_allclose(cie.gamma_expand(cie.gamma_compress(v)), v, atol=1e-12)


def test_rgb2xyz_matches_standard():
    # Derived matrix should be close to the published sRGB D65 matrix.
    std = np.array(
        [
            [0.4124, 0.3576, 0.1805],
            [0.2126, 0.7152, 0.0722],
            [0.0193, 0.1192, 0.9505],
        ]
    )
    np.testing.assert_allclose(cie.RGB2XYZ, std, atol=2e-3)


def test_white_point_lookup():
    d65 = cie.white_point("D65")
    assert d65[1] == pytest.approx(1.0)
    x = d65[0] / d65.sum()
    assert x == pytest.approx(0.31271, abs=1e-5)
    # Unknown name falls back to the MISSING chromaticity (reference behavior)
    missing = cie.white_point("NOPE")
    assert missing[0] / missing.sum() == pytest.approx(0.32090, abs=1e-5)


def test_blackbody_6500k_near_d65():
    bb = cie.blackbody_xyz(6504.0)
    x = bb[0] / bb.sum()
    y = bb[1] / bb.sum()
    # Planckian locus at ~6500K is near (0.3135, 0.3237)
    assert x == pytest.approx(0.3135, abs=5e-3)
    assert y == pytest.approx(0.3237, abs=5e-3)


def test_flat_reflectance_spectrum_is_white():
    w = np.linspace(360, 830, 48)
    rgb = cie.srgb_from_spectrum(w, np.ones_like(w), cie.SpectralType.REFLECTANCE)
    np.testing.assert_allclose(rgb, [1.0, 1.0, 1.0], atol=1e-3)
