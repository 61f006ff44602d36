"""BSDF correctness: energy conservation (white furnace), sampler-vs-pdf chi-square
style checks, Fresnel identities, GGX VNDF distribution."""
import numpy as np
import jax.numpy as jnp
import pytest

from mcrt_tpu.materials import bsdf
from mcrt_tpu.ops import geometry as g


def _mat(n, **kw):
    """Build a MatParams batch of size n with given overrides."""
    d = dict(
        reflectance=np.ones((n, 3)),
        specular_reflectance=np.ones((n, 3)),
        transmittance=np.ones((n, 3)),
        roughness=np.zeros(n),
        specular_roughness=np.zeros(n),
        transparency=np.zeros(n),
        ior=np.full(n, -1.0),
        perfect_mirror=np.zeros(n, bool),
        has_complex=np.zeros(n, bool),
        complex_real=np.ones((n, 3)),
        complex_imag=np.zeros((n, 3)),
        rough=np.zeros(n, bool),
        rough_specular=np.zeros(n, bool),
        opaque=np.ones(n, bool),
        dirac_delta=np.zeros(n, bool),
        oren_A=np.ones(n),
        oren_B=np.zeros(n),
    )
    d.update(kw)
    d["rough"] = d["roughness"] > 1e-9
    d["rough_specular"] = d["specular_roughness"] > 1e-9
    if np.any(d["roughness"] > 0):
        var = d["roughness"] ** 2
        d["oren_A"] = 1.0 - 0.5 * var / (var + 0.33)
        d["oren_B"] = 0.45 * var / (var + 0.09)
    return bsdf.MatParams(**{k: jnp.asarray(v) for k, v in d.items()})


def test_fresnel_normal_incidence():
    n1 = jnp.asarray([1.0])
    n2 = jnp.asarray([1.5])
    f = bsdf.fresnel_dielectric(n1, n2, jnp.asarray([1.0]))
    # ((n2-n1)/(n2+n1))^2 = 0.04
    assert float(f[0]) == pytest.approx(0.04, abs=1e-6)


def test_fresnel_tir():
    f = bsdf.fresnel_dielectric(jnp.asarray([1.5]), jnp.asarray([1.0]), jnp.asarray([0.1]))
    assert float(f[0]) == 1.0


def test_fresnel_grazing():
    f = bsdf.fresnel_dielectric(jnp.asarray([1.0]), jnp.asarray([1.5]), jnp.asarray([0.0]))
    assert float(f[0]) == pytest.approx(1.0, abs=1e-9)


def test_fresnel_conductor_range():
    n1 = jnp.ones(64)
    real = jnp.full((64, 3), 0.2)
    imag = jnp.full((64, 3), 3.0)
    cos = jnp.linspace(0.01, 1.0, 64)
    f = np.asarray(bsdf.fresnel_conductor(n1, real, imag, cos))
    assert np.all(f >= 0.0) and np.all(f <= 1.0)
    assert f[-1].mean() > 0.9  # metal at normal incidence is highly reflective


def test_lambertian_furnace():
    """Integral of f*cos over hemisphere == reflectance for Lambertian."""
    n = 1 << 14
    rng = np.random.RandomState(1)
    u, v = rng.rand(n), rng.rand(n)
    wi = np.asarray(g.cos_weighted_hemi(jnp.asarray(u), jnp.asarray(v)))
    wo = np.tile([0.3, 0.2, np.sqrt(1 - 0.13)], (n, 1))
    mat = _mat(n, reflectance=np.full((n, 3), 0.7))
    f, pdf = bsdf.diffuse_reflection(mat, jnp.asarray(wi), jnp.asarray(wo))
    est = np.asarray(f) * wi[:, 2:3] / np.asarray(pdf)[:, None]
    assert est.mean(axis=0) == pytest.approx([0.7, 0.7, 0.7], abs=0.02)


def test_oren_nayar_reduces_to_lambert_at_zero_roughness():
    n = 128
    rng = np.random.RandomState(2)
    wi = np.asarray(g.cos_weighted_hemi(jnp.asarray(rng.rand(n)), jnp.asarray(rng.rand(n))))
    wo = np.tile([0.0, 0.0, 1.0], (n, 1))
    m_rough = _mat(n, roughness=np.full(n, 1e-8))
    m_smooth = _mat(n)
    f1, _ = bsdf.diffuse_reflection(m_rough, jnp.asarray(wi), jnp.asarray(wo))
    f2, _ = bsdf.diffuse_reflection(m_smooth, jnp.asarray(wi), jnp.asarray(wo))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)


def test_ggx_vndf_sampling_matches_pdf():
    """Monte Carlo: E[f_ggx * |wi.z| / pdf] over VNDF-sampled reflections ~= directional
    albedo <= 1, and pdf>0 wherever sampled."""
    n = 1 << 14
    rng = np.random.RandomState(3)
    a = np.full(n, 0.3)
    wo = np.tile([0.4, 0.0, np.sqrt(1 - 0.16)], (n, 1))
    m = np.asarray(
        bsdf.ggx_visible_microfacet(jnp.asarray(rng.rand(n)), jnp.asarray(rng.rand(n)), jnp.asarray(wo), jnp.asarray(a))
    )
    # reflect wo around m
    wi = -wo + 2.0 * np.sum(wo * m, axis=-1, keepdims=True) * m
    valid = wi[:, 2] > 0
    f, pdf = bsdf.ggx_reflection(jnp.asarray(wi), jnp.asarray(wo), jnp.asarray(a))
    f, pdf = np.asarray(f)[valid], np.asarray(pdf)[valid]
    assert np.all(pdf > 0)
    est = f * wi[valid, 2] / pdf
    albedo = est.sum() / n
    assert 0.7 < albedo <= 1.0 + 1e-3  # GGX loses some energy to masking, never gains


def test_ggx_reflection_pdf_integral():
    """Integral of the reflection pdf over the upper hemisphere equals the VNDF mass
    whose reflected direction stays above the horizon: ~1 for small alpha, < 1 for
    rough surfaces (the rest is rejected by the wi.z < 0 check)."""
    rng = np.random.RandomState(4)
    n = 1 << 15
    wi = np.asarray(g.cos_weighted_hemi(jnp.asarray(rng.rand(n)), jnp.asarray(rng.rand(n))))
    wo = np.tile([0.0, 0.0, 1.0], (n, 1))
    for alpha, lo, hi in [(0.05, 0.95, 1.05), (0.5, 0.72, 0.88)]:
        a = np.full(n, alpha)
        _, pdf = bsdf.ggx_reflection(jnp.asarray(wi), jnp.asarray(wo), jnp.asarray(a))
        est = np.asarray(pdf) / (wi[:, 2] / np.pi)
        assert lo < est.mean() < hi, (alpha, est.mean())


def test_smooth_dielectric_event_probabilities():
    n = 1 << 12
    rng = np.random.RandomState(5)
    mat = _mat(
        n,
        transparency=np.ones(n),
        ior=np.full(n, 1.5),
        opaque=np.zeros(n, bool),
        dirac_delta=np.ones(n, bool),
    )
    n2 = jnp.full(n, 1.5)
    R = bsdf.fresnel_dielectric(jnp.ones(n), n2, jnp.full(n, 1.0))
    ev = np.asarray(bsdf.select_event(mat, n2, R, mat.transparency, jnp.asarray(rng.rand(n))))
    frac_reflect = (ev == bsdf.REFLECT).mean()
    assert frac_reflect == pytest.approx(0.04, abs=0.02)
    assert np.all((ev == bsdf.REFLECT) | (ev == bsdf.REFRACT))


def test_layered_eval_forced_diffuse_for_negative_ior():
    n = 4
    mat = _mat(n)
    wo = jnp.asarray(np.tile([0.0, 0.0, 1.0], (n, 1)))
    wi = jnp.asarray(np.tile([0.6, 0.0, 0.8], (n, 1)))
    f, pdf = bsdf.eval_layered(
        mat, wo, wi, jnp.ones(n), mat.ior, jnp.zeros(n, bool),
        jnp.zeros(n), mat.transparency, jnp.zeros(n, jnp.int32), False, jnp.zeros(n, bool)
    )
    np.testing.assert_allclose(np.asarray(f), 1.0 / np.pi, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pdf), 0.8 / np.pi, atol=1e-6)
