"""Film reconstruction filter tests (VERDICT r3 #7).

The seven kernels are pinned against an independent transcription of the
published Mitchell-Netravali cubic (SIGGRAPH '88 eq. 6) and the reference's
Gaussian/Lanczos forms (/root/reference/source/camera/filter.hpp:10-65), the
per-filter default radii against film.cpp:31-44, and the whole splat/scan path
against a compiled-reference golden rendered WITH a film block.
"""
import json
import math
import pathlib

import numpy as np
import pytest

from mcrt_tpu.camera import film as film_mod

REF_SCENES = pathlib.Path("/root/reference/scenes")
GOLDENS = pathlib.Path(__file__).parent / "goldens"


def mitchell_paper(x, B, C):
    """Mitchell & Netravali 1988, eq. 6 — written from the paper, NOT from the
    factored Horner form the implementation uses — times the reference's
    k = 6/(6-2B) normalization (filter.hpp:16)."""
    x = np.abs(np.asarray(x, np.float64))
    f = np.where(
        x < 1.0,
        ((12 - 9 * B - 6 * C) * x**3 + (-18 + 12 * B + 6 * C) * x**2 + (6 - 2 * B)) / 6.0,
        np.where(
            x < 2.0,
            ((-B - 6 * C) * x**3 + (B * 6 + 30 * C) * x**2 + (-12 * B - 48 * C) * x
             + (8 * B + 24 * C)) / 6.0,
            0.0,
        ),
    )
    return f * 6.0 / (6.0 - 2.0 * B)


XS = np.linspace(0.0, 1.999, 777)

CASES = [
    ("mitchell-netravali", lambda x: mitchell_paper(x, 1 / 3, 1 / 3)),
    ("catmull-rom", lambda x: mitchell_paper(x, 0.0, 0.5)),
    ("b-spline", lambda x: mitchell_paper(x, 1.0, 0.0)),
    ("hermite", lambda x: mitchell_paper(x * 0.5, 0.0, 0.0)),
    ("gaussian", lambda x: np.exp(-2.0 * x**2) - math.exp(-8.0)),
    ("lanczos", lambda x: np.where(
        x == 0, 1.0,
        2.0 * np.sin(np.pi * x) * np.sin(np.pi * x / 2.0) / (np.pi**2 * np.maximum(x, 1e-9)**2))),
    ("box", lambda x: np.ones_like(x)),
]


@pytest.mark.parametrize("name,ref_fn", CASES)
def test_filter_kernel_matches_reference_form(name, ref_fn):
    got = np.asarray(film_mod.filter_eval(name, np.asarray(XS, np.float64)))
    want = ref_fn(XS)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_filter_known_values():
    # All cubic-family filters are normalized to f(0) = 1 (k factor).
    for name in ("mitchell-netravali", "catmull-rom", "b-spline", "lanczos", "box"):
        assert abs(float(film_mod.filter_eval(name, np.float64(0.0))) - 1.0) < 1e-12, name
    # Catmull-Rom interpolates: zero at the integer sample x=1.
    assert abs(float(film_mod.filter_eval("catmull-rom", np.float64(1.0)))) < 1e-12
    # Continuity at the piecewise boundary x=1.
    for name in ("mitchell-netravali", "catmull-rom", "b-spline"):
        lo = float(film_mod.filter_eval(name, np.float64(1.0 - 1e-9)))
        hi = float(film_mod.filter_eval(name, np.float64(1.0 + 1e-9)))
        assert abs(lo - hi) < 1e-6, name
    # Gaussian reaches exactly zero at the support edge x=2.
    assert abs(float(film_mod.filter_eval("gaussian", np.float64(2.0)))) < 1e-12


def test_default_radii_match_reference():
    # film.cpp:31-44
    want = {"box": 0.5, "mitchell-netravali": 2.0, "catmull-rom": 2.0,
            "b-spline": 1.39, "hermite": 1.0, "gaussian": 1.71, "lanczos": 2.0}
    assert film_mod.DEFAULT_RADII == want


@pytest.mark.parametrize("name", [c[0] for c in CASES])
def test_splat_constant_partition(name):
    """A constant-radiance sample field must scan back to exactly that constant
    for ANY filter (weighted mean of identical values), and interior pixel
    weights must be positive."""
    cfg = film_mod.FilmConfig(16, 16, name, film_mod.DEFAULT_RADII[name])
    rng = np.random.RandomState(0)
    n = 4096
    px = np.stack([rng.uniform(0, 16, n), rng.uniform(0, 16, n)], axis=-1).astype(np.float32)
    val = np.full((n, 3), 0.7, np.float32)
    acc = film_mod.splat(cfg, px, val)
    img = np.asarray(film_mod.scan(acc))
    inner = img[4:12, 4:12]
    np.testing.assert_allclose(inner, 0.7, rtol=2e-5)
    assert np.all(np.asarray(acc)[4:12, 4:12, 3] > 0)


@pytest.mark.slow
def test_mitchell_netravali_golden_vs_reference():
    """End-to-end splat parity: hexagon room rendered by the compiled reference
    WITH a camera film block {filter: mitchell-netravali} (film.cpp:61-79 path,
    radius 2 -> 4x4-pixel footprints, negative lobes) vs ours."""
    from mcrt_tpu import Scene, RenderConfig, render
    from mcrt_tpu.camera import image as image_mod

    j = json.loads((REF_SCENES / "hexagon_room_diffuse.json").read_text())
    j["cameras"][0]["image"] = {"width": 64, "height": 64, "plain": True}
    j["cameras"][0]["sqrtspp"] = 16
    j["cameras"][0]["film"] = {"filter": "mitchell-netravali"}
    scene = Scene(j, scene_dir=REF_SCENES)
    assert scene.cameras[0].film == {"filter": "mitchell-netravali"}

    hdr = render(scene, 0, RenderConfig(dtype="float32", rays_per_chunk=1 << 16))
    ours = np.clip(image_mod.finalize(hdr, scene.cameras[0].image), 0.0, 1.0)
    ref = image_mod.read_tga(GOLDENS / "hexagon_mn_64_s16.tga").astype(np.float64) / 255.0

    diff = np.abs(ours - ref)
    per_channel = np.abs(ours.mean(axis=(0, 1)) - ref.mean(axis=(0, 1)))
    assert np.all(per_channel < 0.02), per_channel
    assert np.percentile(diff, 95) < 0.25, np.percentile(diff, 95)
    assert diff.mean() < 0.05, diff.mean()
