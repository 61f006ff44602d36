"""Layered BSDF: eval, pdf, and sampling — vectorized, branch-free, differentiable.

Capability parity with the reference's material layer
(/root/reference/source/material/{material,ggx,fresnel}.cpp and
source/ray/interaction.cpp): a smooth/GGX specular layer over a Lambertian/Oren-Nayar
diffuse base with stochastic event selection (REFLECT/REFRACT/DIFFUSE), dielectric and
conductor Fresnel, and the radiance-vs-importance transport asymmetry for refraction.
All per-material branching is `jnp.where` over gathered parameter rows; directions are
in the shading-local frame (z = shading normal) exactly as the reference's
CoordinateSystem usage.

Event codes: 0 = REFLECT, 1 = REFRACT, 2 = DIFFUSE.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import geometry as g

REFLECT, REFRACT, DIFFUSE = 0, 1, 2

_INV_PI = 1.0 / jnp.pi


class MatParams(NamedTuple):
    """Per-ray gathered material parameters (all leading dim R)."""
    reflectance: jnp.ndarray            # (R,3) gamma-expanded
    specular_reflectance: jnp.ndarray   # (R,3)
    transmittance: jnp.ndarray          # (R,3)
    roughness: jnp.ndarray              # (R,) Oren-Nayar sigma
    specular_roughness: jnp.ndarray     # (R,) GGX alpha
    transparency: jnp.ndarray           # (R,)
    ior: jnp.ndarray                    # (R,)
    perfect_mirror: jnp.ndarray         # (R,) bool
    has_complex: jnp.ndarray            # (R,) bool
    complex_real: jnp.ndarray           # (R,3)
    complex_imag: jnp.ndarray           # (R,3)
    rough: jnp.ndarray                  # (R,) bool
    rough_specular: jnp.ndarray         # (R,) bool
    opaque: jnp.ndarray                 # (R,) bool
    dirac_delta: jnp.ndarray            # (R,) bool
    oren_A: jnp.ndarray                 # (R,)
    oren_B: jnp.ndarray                 # (R,)


def pack_materials(tables):
    """(n_mats, 27) packed material table for the single-wide-gather fetch.

    Per-lane gathers on TPU cost ~0.3 ms per 2^16 rays REGARDLESS of row width
    (measured round 5), so consolidating the material fetch into one
    (n_mats, 27)-row gather is ~17x cheaper than per-field gathers. Build this
    OUTSIDE the bounce loop (the concat is differentiable — reflectance /
    roughness / ior / transparency gradients still flow into the tables)."""
    dtype = tables.mat_reflectance.dtype
    f = lambda x: x.astype(dtype)[:, None]
    return jnp.concatenate(
        [
            tables.mat_reflectance,             # 0:3
            tables.mat_specular_reflectance,    # 3:6
            tables.mat_transmittance,           # 6:9
            f(tables.mat_roughness),            # 9
            f(tables.mat_specular_roughness),   # 10
            f(tables.mat_transparency),         # 11
            f(tables.mat_ior),                  # 12
            f(tables.mat_perfect_mirror),       # 13
            f(tables.mat_has_complex),          # 14
            tables.mat_complex_real,            # 15:18
            tables.mat_complex_imag,            # 18:21
            f(tables.mat_rough),                # 21
            f(tables.mat_rough_specular),       # 22
            f(tables.mat_opaque),               # 23
            f(tables.mat_dirac_delta),          # 24
            f(tables.mat_oren_A),               # 25
            f(tables.mat_oren_B),               # 26
        ],
        axis=1,
    )


def gather_materials(tables, mat_id, pack=None) -> MatParams:
    """Fetch per-ray material params with ONE wide gather (see pack_materials)."""
    m = jnp.maximum(mat_id, 0)
    if pack is None:
        pack = pack_materials(tables)
    row = pack[m]                               # (R, 27): the ONE gather
    b = lambda c: row[:, c] > 0.5
    return MatParams(
        reflectance=row[:, 0:3],
        specular_reflectance=row[:, 3:6],
        transmittance=row[:, 6:9],
        roughness=row[:, 9],
        specular_roughness=row[:, 10],
        transparency=row[:, 11],
        ior=row[:, 12],
        perfect_mirror=b(13),
        has_complex=b(14),
        complex_real=row[:, 15:18],
        complex_imag=row[:, 18:21],
        rough=b(21),
        rough_specular=b(22),
        opaque=b(23),
        dirac_delta=b(24),
        oren_A=row[:, 25],
        oren_B=row[:, 26],
    )


# ----------------------------------------------------------------------------------
# Fresnel
# ----------------------------------------------------------------------------------

def fresnel_dielectric(n1, n2, cos_theta):
    """Lagarde-memo dielectric Fresnel (reference fresnel.cpp:16-27). TIR -> 1."""
    ratio = n2 / jnp.where(n1 == 0.0, jnp.asarray(1.0, n1.dtype), n1)
    g2 = ratio * ratio + cos_theta * cos_theta - 1.0
    tir = g2 < 0.0
    # Double-where: sqrt'(0) = inf would leak NaN into ior gradients through the
    # untaken branch at TIR lanes (the result there is overwritten with 1).
    gr = jnp.sqrt(jnp.where(tir, 1.0, jnp.maximum(g2, 0.0)))
    g_p_c = gr + cos_theta
    g_m_c = gr - cos_theta
    denom1 = jnp.where(g_p_c == 0.0, jnp.asarray(1.0, gr.dtype), g_p_c)
    term1 = (g_m_c / denom1) ** 2
    denom2 = g_m_c * cos_theta + 1.0
    denom2 = jnp.where(denom2 == 0.0, jnp.asarray(1.0, gr.dtype), denom2)
    term2 = ((g_p_c * cos_theta - 1.0) / denom2) ** 2
    f = 0.5 * term1 * (1.0 + term2)
    return jnp.where(tir, jnp.ones_like(f), f)


def fresnel_conductor(n1, eta_real, eta_imag, cos_theta):
    """Per-channel conductor Fresnel with complex IOR (reference fresnel.cpp:30-49).
    n1: (R,), eta_*: (R,3), cos_theta: (R,). Returns (R,3)."""
    # Clamp into the physical range: cos_theta arrives from dot products and can
    # exceed 1 by an ulp, making sin2 negative — then t3 + t4 below can cross
    # zero and the quotient rule's 1/(t3+t4)^2 partial turns inf/NaN (round 4).
    ct = jnp.clip(cos_theta[..., None], 0.0, 1.0)
    cos2 = ct * ct
    sin2 = 1.0 - cos2
    n1e = n1[..., None]
    # Non-conductor lanes carry eta == 0; the sqrt arguments below then touch 0
    # and their inf partials poison every gradient routed through the masked
    # conductor branch of eval_layered. Substitute a benign dummy eta — those
    # lanes' results are discarded by the has_complex where.
    real_conductor = (eta_real > 0.0) | (eta_imag > 0.0)
    eta_real = jnp.where(real_conductor, eta_real, 1.0)
    eta_imag = jnp.where(real_conductor, eta_imag, 1.0)
    eta2 = (eta_real / n1e) ** 2
    eta_k2 = (eta_imag / n1e) ** 2
    t0 = eta2 - eta_k2 - sin2
    a2_p_b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * eta_k2, 1e-30))
    t1 = a2_p_b2 + cos2
    t2 = 2.0 * ct * jnp.sqrt(jnp.maximum(0.5 * (a2_p_b2 + t0), 1e-30))
    r_perp = (t1 - t2) / (t1 + t2)
    t3 = cos2 * a2_p_b2 + sin2 * sin2
    t4 = t2 * sin2
    r_par = r_perp * (t3 - t4) / (t3 + t4)
    return 0.5 * (r_par + r_perp)


# ----------------------------------------------------------------------------------
# GGX microfacet (isotropic alpha as (ax = ay); reference supports dvec2 a)
# ----------------------------------------------------------------------------------

def _safe(x):
    return jnp.where(x == 0.0, jnp.asarray(jnp.finfo(x.dtype).tiny, x.dtype), x)


def ggx_D(m, a):
    """NDF (reference ggx.cpp:21-24), isotropic a.

    Denominator floored at 1e-12, NOT dtype-tiny: m can be the zero vector (e.g.
    the transmission half-vector with n1 == n2), and 1/tiny partials are inf,
    which poisons gradients through masked lanes. Legitimate denominators are
    >= pi*a^4 ~ 3e-8 at the sharpest alpha in the bundled scenes."""
    a2 = a * a
    denom = jnp.pi * a2 * ((m[..., 0] ** 2 + m[..., 1] ** 2) / _safe(a2) + m[..., 2] ** 2) ** 2
    return 1.0 / jnp.maximum(denom, 1e-12)


def ggx_lambda(w, a):
    # z^2 floored at 1e-12 (not dtype-tiny): 1/tiny overflows to inf and the
    # inf partial turns zero cotangents into NaN in reverse mode.
    z2 = jnp.maximum(w[..., 2] ** 2, 1e-12)
    return (-1.0 + jnp.sqrt(1.0 + (a * a) * (w[..., 0] ** 2 + w[..., 1] ** 2) / z2)) / 2.0


def ggx_G1(w, a):
    return 1.0 / (1.0 + ggx_lambda(w, a))


def ggx_G2(wi, wo, a):
    return 1.0 / (1.0 + ggx_lambda(wo, a) + ggx_lambda(wi, a))


def _sgn_clamp(x, eps):
    """Clamp |x| >= eps preserving sign (0 treated as +). Gradient-safe divisor."""
    mag = jnp.maximum(jnp.abs(x), eps)
    return jnp.where(x < 0.0, -mag, mag)


def ggx_DV(m, wo, a):
    return ggx_G1(wo, a) * g.dot(wo, m) * ggx_D(m, a) / _sgn_clamp(wo[..., 2], 1e-9)


def ggx_reflection(wi, wo, a):
    """(brdf_scalar, pdf) for microfacet reflection (reference ggx.cpp:46-52).
    Degenerate wi ~ -wo lanes (a transmission direction fed through the
    reflection lobe) get a benign half-vector and a zero result."""
    h = wo + wi
    degen = g.dot(h, h) < 1e-8
    up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], wi.dtype), h.shape)
    m = g.normalize(jnp.where(degen[..., None], up, h), eps=1e-9)
    pdf = ggx_DV(m, wo, a) / _sgn_clamp(4.0 * g.dot(m, wo), 1e-9)
    f = ggx_D(m, a) * ggx_G2(wi, wo, a) / _sgn_clamp(4.0 * wo[..., 2] * wi[..., 2], 1e-12)
    zero = jnp.zeros_like(f)
    return jnp.where(degen, zero, f), jnp.where(degen, zero, pdf)


def ggx_transmission(wi, wo, n1, n2, a):
    """(btdf_scalar, pdf) for microfacet transmission (reference ggx.cpp:54-65).

    Degenerate half-vector guard: with n1 ~ n2 and wi ~ -wo the unnormalized m is
    ~0; dividing by its tiny length produces overflow-scale reverse-mode partials
    that reach every upstream parameter, so the degenerate lanes are substituted
    with a benign m BEFORE any nonlinearity and their (physically meaningless)
    result forced to 0."""
    m_un = wo * n1[..., None] + wi * n2[..., None]
    m_len2_raw = g.dot(m_un, m_un)
    degen = m_len2_raw < 1e-8
    up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], wi.dtype), m_un.shape)
    m_un = jnp.where(degen[..., None], up, m_un)
    m_len2 = g.dot(m_un, m_un)
    m = m_un / jnp.sqrt(m_len2)[..., None]
    m = jnp.where((n1 < n2)[..., None], -m, m)
    dm_dwi = n2 * n2 * jnp.abs(g.dot(wi, m)) / m_len2
    pdf = ggx_DV(m, wo, a) * dm_dwi
    f = jnp.abs(ggx_G2(wi, wo, a) * ggx_D(m, a) * g.dot(wo, m) * dm_dwi / _sgn_clamp(wo[..., 2] * wi[..., 2], 1e-12))
    zero = jnp.zeros_like(f)
    return jnp.where(degen, zero, f), jnp.where(degen, zero, pdf)


def ggx_visible_microfacet(u, v, wo, a):
    """Heitz VNDF sampling in local frame (reference ggx.cpp:67-88), isotropic a."""
    a3 = a[..., None]
    vh = g.normalize(jnp.stack([a * wo[..., 0], a * wo[..., 1], wo[..., 2]], axis=-1))
    len2 = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(len2, jnp.finfo(wo.dtype).tiny))
    t1 = jnp.where(
        (len2 > 0.0)[..., None],
        jnp.stack([-vh[..., 1] * inv_len, vh[..., 0] * inv_len, jnp.zeros_like(inv_len)], axis=-1),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], wo.dtype), vh.shape),
    )
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(u)
    phi = v * (2.0 * jnp.pi)
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    # Double-where both sqrts: at the disk boundary the argument touches 0 and
    # sqrt'(0) = inf turns the clamped lanes' zero tangents into NaN in reverse
    # mode (the sampled direction is differentiable w.r.t. roughness).
    c1 = 1.0 - p1 * p1
    p2 = (1.0 - s) * jnp.sqrt(jnp.where(c1 > 0.0, c1, 1.0)) * (c1 > 0.0) + s * p2
    c2 = 1.0 - p1 * p1 - p2 * p2
    nh = (
        p1[..., None] * t1
        + p2[..., None] * t2
        + (jnp.sqrt(jnp.where(c2 > 0.0, c2, 1.0)) * (c2 > 0.0))[..., None] * vh
    )
    return g.normalize(
        jnp.stack([a * nh[..., 0], a * nh[..., 1], jnp.maximum(nh[..., 2], 0.0)], axis=-1)
    )


# ----------------------------------------------------------------------------------
# Material lobes (reference material.cpp)
# ----------------------------------------------------------------------------------

def diffuse_reflection(mat: MatParams, wi, wo):
    """(f (R,3), pdf (R,)) — Lambertian or Oren-Nayar by `rough` flag
    (material.cpp:17-27, 76-95). Zero when wi.z < 0."""
    wiz = wi[..., 2]
    pdf = jnp.maximum(wiz, 0.0) * _INV_PI
    lamb = mat.reflectance * _INV_PI

    # Oren-Nayar, trig-free form; guard the degenerate straight-up directions where
    # the azimuthal angle is undefined (den == 0 -> cos term contributes 0).
    num = wi[..., 0] * wo[..., 0] + wi[..., 1] * wo[..., 1]
    den2 = (wi[..., 0] ** 2 + wi[..., 1] ** 2) * (wo[..., 0] ** 2 + wo[..., 1] ** 2)
    cos_dphi = jnp.clip(num / jnp.sqrt(jnp.where(den2 <= 0.0, 1.0, den2)), 0.0, 1.0)
    cos_dphi = jnp.where(den2 <= 0.0, 0.0, cos_dphi)
    # Double-where: at wiz = +/-1 the argument is exactly 0 and sqrt'(0) = inf
    # would leak NaN into every upstream parameter's gradient.
    sin2 = (1.0 - wiz ** 2) * (1.0 - wo[..., 2] ** 2)
    D = (jnp.sqrt(jnp.where(sin2 > 0.0, sin2, 1.0)) * (sin2 > 0.0)) / _safe(
        jnp.maximum(wiz, wo[..., 2])
    )
    on = lamb * (mat.oren_A + mat.oren_B * cos_dphi * D)[..., None]
    f = jnp.where(mat.rough[..., None], on, lamb)
    bad = wiz < 0.0
    return jnp.where(bad[..., None], 0.0, f), jnp.where(bad, 0.0, pdf)


def _ggx_safe_alpha(mat: MatParams):
    """GGX alpha for evaluation: smooth lanes (alpha == 0) would compute 0 * inf
    = NaN inside ggx_D and poison every upstream gradient through the untaken
    jnp.where branch; substitute a benign dummy — their results are discarded."""
    return jnp.where(mat.rough_specular, mat.specular_roughness, 0.25)


def specular_reflection(mat: MatParams, wi, wo):
    """(f (R,3), pdf (R,)) — smooth mirror lobe or GGX (material.cpp:29-45)."""
    wiz = wi[..., 2]
    a = _ggx_safe_alpha(mat)
    f_ggx, pdf_ggx = ggx_reflection(wi, wo, a)
    f_rough = mat.specular_reflectance * f_ggx[..., None]
    f_smooth = mat.specular_reflectance / jnp.maximum(jnp.abs(wiz), 1e-9)[..., None]
    pdf = jnp.where(mat.rough_specular, pdf_ggx, 1.0)
    f = jnp.where(mat.rough_specular[..., None], f_rough, f_smooth)
    bad = wiz < 0.0
    return jnp.where(bad[..., None], 0.0, f), jnp.where(bad, 0.0, pdf)


def specular_transmission(mat: MatParams, wi, wo, n1, n2, inside, flux):
    """(f (R,3), pdf (R,)) — smooth or GGX transmission with the radiance/importance
    (n2/n1)^2 asymmetry (material.cpp:47-68). Zero when wi.z > 0. `flux` is a static
    Python bool (radiance transport=False, photon transport=True)."""
    wiz = wi[..., 2]
    btdf_color = jnp.where(inside[..., None], jnp.ones_like(mat.transmittance), mat.transmittance)
    ratio_n2n1 = (n2 / _safe(n1)) ** 2
    ratio_n1n2 = (n1 / _safe(n2)) ** 2

    f_ggx, pdf_ggx = ggx_transmission(wi, wo, n1, n2, _ggx_safe_alpha(mat))
    f_rough = btdf_color * f_ggx[..., None]
    if flux:
        f_rough = f_rough * ratio_n2n1[..., None]
    f_smooth = btdf_color * mat.transmittance / jnp.maximum(jnp.abs(wiz), 1e-9)[..., None]
    # NOTE: reference multiplies transmittance once in btdf init and once more in the
    # smooth branch (btdf *= transmittance / |wi.z|) — but btdf was initialized to
    # transmittance (or 1 inside), so smooth branch is transmittance^2 outside? No:
    # btdf = !inside ? transmittance : 1; then smooth: btdf *= transmittance/|z|.
    # That IS transmittance^2 when entering. Match the reference exactly:
    # (material.cpp:56-66)
    if not flux:
        f_smooth = f_smooth * ratio_n1n2[..., None]
    pdf = jnp.where(mat.rough_specular, pdf_ggx, 1.0)
    f = jnp.where(mat.rough_specular[..., None], f_rough, f_smooth)
    bad = wiz > 0.0
    return jnp.where(bad[..., None], 0.0, f), jnp.where(bad, 0.0, pdf)


# ----------------------------------------------------------------------------------
# Layered BSDF evaluation (reference interaction.cpp:84-153)
# ----------------------------------------------------------------------------------

def eval_layered(
    mat: MatParams,
    wo,            # (R,3) local outgoing (toward camera/previous vertex)
    wi,            # (R,3) local incident (new/light direction)
    n1, n2,        # (R,) ior ordering from the interaction
    inside,        # (R,) bool
    R_clamped,     # (R,) specular reflect probability from the interaction
    T,             # (R,) transparency
    event,         # (R,) int32 event code of the ray that wi came from
    flux: bool,    # static: importance transport
    wi_dirac,      # (R,) bool: wi is the direction of the ray spawned dirac-ly
):
    """Returns (f (R,3), pdf (R,)) of the full layered BSDF (no |wi.z| factor)."""
    # cos_theta for Fresnel: wo.z, or half-vector based for rough specular.
    # Degenerate half-vectors (wi ~ -wo, or n1 ~ n2 canceling the transmission m)
    # are substituted with +z BEFORE normalize: normalize(~0) has overflow-scale
    # partials that poison gradients through the masked branches.
    up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], wi.dtype), wi.shape)
    h_refl = wo + wi
    h_refl = jnp.where((g.dot(h_refl, h_refl) < 1e-8)[..., None], up, h_refl)
    m_refl = g.normalize(h_refl)
    cos_refl = g.dot(wo, m_refl)
    h_tr = wo * n1[..., None] + wi * n2[..., None]
    h_tr = jnp.where((g.dot(h_tr, h_tr) < 1e-8)[..., None], up, h_tr)
    m_tr = g.normalize(h_tr)
    cos_tr = g.dot(wo, m_tr)
    cos_tr = jnp.where(n1 < n2, -cos_tr, cos_tr)
    cos_rough = jnp.where(wi[..., 2] > 0.0, cos_refl, cos_tr)
    cos_theta = jnp.where(mat.rough_specular, cos_rough, wo[..., 2])

    F = fresnel_dielectric(n1, n2, cos_theta)

    f_s, pdf_s = specular_reflection(mat, wi, wo)
    f_d, pdf_d = diffuse_reflection(mat, wi, wo)
    f_t_raw, pdf_t_raw = specular_transmission(mat, wi, wo, n1, n2, inside, flux)
    use_t = F < 1.0
    f_t = jnp.where(use_t[..., None], f_t_raw, f_s)
    pdf_t = jnp.where(use_t, pdf_t_raw, pdf_s)

    # Mode 1: perfect mirror / conductor — pure specular reflection
    cond = fresnel_conductor(n1, mat.complex_real, mat.complex_imag, cos_theta)
    f_mirror = f_s * jnp.where(mat.has_complex[..., None], cond, jnp.ones_like(cond))
    pdf_mirror = pdf_s

    # Mode 2: n2 < 1 — forced diffuse
    f_forced_d, pdf_forced_d = f_d, pdf_d

    # Mode 3a: wi is the dirac-sampled ray direction
    is_reflect = event == REFLECT
    f_dirac = jnp.where(
        is_reflect[..., None], f_s * F[..., None], f_t * (T * (1.0 - F))[..., None]
    )
    pdf_dirac = jnp.where(is_reflect, R_clamped, T * (1.0 - R_clamped))

    # Mode 3b: smooth specular layer, non-dirac wi — diffuse-only layer
    f_smooth_layer = f_d * ((1.0 - F) * (1.0 - T))[..., None]
    pdf_smooth_layer = pdf_d * (1.0 - R_clamped) * (1.0 - T)

    # Mode 3c: rough specular — full lerp mix
    mix = lambda a, b, t: a + (b - a) * t
    f_mix = mix(mix(f_d, f_t, T[..., None]), f_s, F[..., None])
    pdf_mix = mix(mix(pdf_d, pdf_t, T), pdf_s, R_clamped)

    f3 = jnp.where(
        wi_dirac[..., None], f_dirac,
        jnp.where(mat.rough_specular[..., None], f_mix, f_smooth_layer),
    )
    pdf3 = jnp.where(
        wi_dirac, pdf_dirac, jnp.where(mat.rough_specular, pdf_mix, pdf_smooth_layer)
    )

    mode1 = (mat.perfect_mirror | mat.has_complex)
    mode2 = (~mode1) & (n2 < 1.0)
    f = jnp.where(mode1[..., None], f_mirror, jnp.where(mode2[..., None], f_forced_d, f3))
    pdf = jnp.where(mode1, pdf_mirror, jnp.where(mode2, pdf_forced_d, pdf3))
    return f, pdf


def select_event(mat: MatParams, n2, R_clamped, T, u):
    """Stochastic event selection (reference interaction.cpp:156-183).
    Returns int32 event code per ray."""
    r_or_refract = jnp.where(R_clamped > u, REFLECT, jnp.where(R_clamped + (1.0 - R_clamped) * T > u, REFRACT, DIFFUSE))
    forced_mirror = mat.perfect_mirror | mat.has_complex
    forced_diffuse = (~forced_mirror) & (n2 < 1.0)
    return jnp.where(
        forced_mirror, REFLECT, jnp.where(forced_diffuse, DIFFUSE, r_or_refract)
    ).astype(jnp.int32)
