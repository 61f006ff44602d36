"""Shared integrator machinery: interaction setup, NEE, emissive MIS, BSDF bounce.

This is the TPU analogue of the reference's Integrator base class + Interaction
(/root/reference/source/integrator/integrator.cpp, source/ray/interaction.cpp): the
per-hit frame/Fresnel setup, next-event estimation, BSDF-side MIS, and the
event-select + new-ray block are pure functions over masked ray lanes, composed by
both the path tracer and the photon mapper (emission pass and eye pass).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

from ..materials import bsdf
from ..ops import geometry as g
from ..ops import intersect as isect
from ..sampling import sobol
from ..scene.loader import SceneMeta, SceneTables


class Interaction(NamedTuple):
    """Everything derived from one wavefront hit (reference interaction.cpp:12-53)."""
    position: jnp.ndarray    # (R,3)
    normal: jnp.ndarray      # (R,3) geometric, flipped toward the incoming ray
    sn: jnp.ndarray          # (R,3) shading normal (same side as `normal`)
    tb_t: jnp.ndarray        # (R,3) tangent
    tb_b: jnp.ndarray        # (R,3) bitangent
    wo_l: jnp.ndarray        # (R,3) local outgoing direction (toward previous vertex)
    inside: jnp.ndarray      # (R,) bool
    n1: jnp.ndarray          # (R,)
    n2: jnp.ndarray          # (R,)
    R_cl: jnp.ndarray        # (R,) clamped Fresnel reflect probability
    T: jnp.ndarray           # (R,) transparency
    mat: bsdf.MatParams
    mat_id: jnp.ndarray      # (R,) int32
    area: jnp.ndarray        # (R,)
    radiosity: jnp.ndarray   # (R,3)
    emissive_idx: jnp.ndarray  # (R,) int32, -1 if not emissive
    t_safe: jnp.ndarray      # (R,) hit distance (1 on miss lanes)


class ScenePacks(NamedTuple):
    """Loop-invariant packed tables for the single-wide-gather fetches. Build
    ONCE per jitted step (outside the bounce loop) with build_packs — built
    inline they re-materialize every loop iteration (round-5 trace: the
    (n_surf, 19) concat alone was ~0.07 ms per bounce at 68k surfaces)."""
    shade: jnp.ndarray   # (n_surf, 19) see interaction_setup
    mat: jnp.ndarray     # (n_mats, 27) see bsdf.pack_materials
    light: jnp.ndarray   # (n_lights, 19) see sample_direct


def build_packs(tables: SceneTables, meta: SceneMeta) -> ScenePacks:
    dtype = tables.surf_area.dtype
    n_surf = tables.surf_area.shape[0]
    ntri = meta.n_tris
    pad = n_surf - ntri
    f = lambda x: x.astype(dtype)[:, None]

    def tri_col(x):
        return jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), dtype)], 0) if pad else x

    shade = jnp.concatenate(
        [
            f(tables.surf_area),                            # 0
            f(tables.surf_mat),                             # 1
            tables.surf_radiosity,                          # 2:5
            f(tables.surf_emissive_idx),                    # 5
            tri_col(tables.tri_n),                          # 6:9
            tri_col(f(tables.tri_interp)),                  # 9
            tri_col(tables.tri_vn.reshape(ntri, 9)),        # 10:19
        ],
        axis=1,
    )
    return ScenePacks(shade=shade, mat=bsdf.pack_materials(tables),
                      light=build_light_pack(tables))


def build_light_pack(tables: SceneTables):
    dtype = tables.surf_area.dtype
    f = lambda x: x.astype(dtype)[:, None]
    if not tables.light_cdf.shape[0]:
        return jnp.zeros((0, 19), dtype)
    return jnp.concatenate(
        [
            f(tables.light_surf),           # 0 (ids exact in f32 below 2^24)
            f(tables.light_select_prob),    # 1
            tables.light_radiosity,         # 2:5
            f(tables.light_area),           # 5
            f(tables.light_kind),           # 6
            tables.light_p0,                # 7:10
            tables.light_p1,                # 10:13
            tables.light_p2,                # 13:16
            tables.light_normal,            # 16:19
        ],
        axis=1,
    )


def _surface_normal_packed(tables, meta, sid, row, position):
    """surface_normal (ops/intersect.py) fed from the packed per-surface row:
    the triangle geometric normal comes from pack cols 6:9; sphere/quadric
    normals stay analytic (they depend on the hit position)."""
    n = row[:, 6:9]
    if meta.n_sphs:
        sph_id = jnp.clip(sid - meta.sphere_offset, 0, max(meta.n_sphs - 1, 0))
        sph_n = (position - tables.sph_origin[sph_id]) / tables.sph_radius[sph_id][:, None]
        n = jnp.where((sid >= meta.sphere_offset)[:, None], sph_n, n)
    if meta.n_quads:
        quad_id = jnp.clip(sid - meta.quad_offset, 0, max(meta.n_quads - 1, 0))
        p4 = jnp.concatenate([position, jnp.ones_like(position[..., :1])], axis=-1)
        grad = jnp.einsum("rij,rj->ri", tables.quad_G[quad_id], p4)
        n = jnp.where((sid >= meta.quad_offset)[:, None], g.normalize(grad), n)
    return n


def _shading_normal_packed(meta, sid, row, uv, geom_n, direction):
    """shading_normal (ops/intersect.py) fed from pack cols 9 (interp flag) and
    10:19 (the three vertex normals), with the same flip-side fallback
    (reference interaction.cpp:23-30)."""
    is_tri = sid < meta.sphere_offset
    interp = is_tri & (row[:, 9] > 0.5)
    vn = row[:, 10:19]
    u, v = uv[..., 0:1], uv[..., 1:2]
    sn = g.normalize((1.0 - u - v) * vn[:, 0:3] + u * vn[:, 3:6] + v * vn[:, 6:9])
    cos_g = g.dot(direction, geom_n)
    cos_s = g.dot(direction, sn)
    flip_mismatch = (cos_g < 0.0) != (cos_s < 0.0)
    use_interp = interp & ~flip_mismatch
    return jnp.where(use_interp[:, None], sn, geom_n)


def interaction_setup(
    tables: SceneTables,
    meta: SceneMeta,
    origin,
    direction,
    hit: isect.Hit,
    iors,
    ior_count,
    refraction_level,
    medium_ior,
    packs: ScenePacks | None = None,
) -> Interaction:
    """Per-hit frame, IOR ordering, Fresnel probabilities (interaction.cpp:12-53)."""
    dtype = origin.dtype
    missed = hit.surf_id < 0
    t_safe = jnp.where(missed, jnp.asarray(1.0, dtype), hit.t)
    position = origin + direction * t_safe[:, None]
    position = isect.refine_positions(tables, meta, hit.surf_id, position)

    s = jnp.maximum(hit.surf_id, 0)
    # One wide packed per-surface gather (area/mat/radiosity/emissive + the
    # triangle normal data) instead of ~8 narrow ones: per-lane gathers cost
    # ~0.3 ms each per 2^16 rays on TPU regardless of row width (round-5
    # measurement). Callers inside loops should pass prebuilt `packs`.
    if packs is None:
        packs = build_packs(tables, meta)
    row = packs.shade[s]
    area = row[:, 0]
    mat_id = (row[:, 1] + 0.5).astype(jnp.int32)
    radiosity = row[:, 2:5]
    emissive_idx = jnp.where(row[:, 5] >= 0, row[:, 5] + 0.5, -1.0).astype(jnp.int32)

    geom_n_raw = _surface_normal_packed(tables, meta, s, row, position)
    cos_g = g.dot(direction, geom_n_raw)
    inside = cos_g > 0.0

    mat = bsdf.gather_materials(tables, mat_id, pack=packs.mat)

    external_ior = g.onehot_row_take(
        iors, jnp.clip(refraction_level - 1, 0, ior_count - 1)
    )
    n1 = medium_ior
    n2 = jnp.where(inside & ~mat.opaque, external_ior, mat.ior)

    sn_raw = _shading_normal_packed(meta, s, row, hit.uv, geom_n_raw, direction)
    flip = inside[:, None]
    normal = jnp.where(flip, -geom_n_raw, geom_n_raw)
    sn = jnp.where(flip, -sn_raw, sn_raw)
    tb_t, tb_b = g.orthonormal_basis(sn)
    out = -direction
    wo_l = g.to_local(out, tb_t, tb_b, sn)

    R_f = bsdf.fresnel_dielectric(n1, n2, g.dot(sn, out))
    R_cl = jnp.where(mat.rough_specular, jnp.clip(R_f, 0.1, 0.9), R_f)
    return Interaction(
        position=position, normal=normal, sn=sn, tb_t=tb_t, tb_b=tb_b, wo_l=wo_l,
        inside=inside, n1=n1, n2=n2, R_cl=R_cl, T=mat.transparency,
        mat=mat, mat_id=mat_id, area=area, radiosity=radiosity,
        emissive_idx=emissive_idx, t_safe=t_safe,
    )


def sample_emissive(ix: Interaction, direction, bounce, ray_dirac, prev_light,
                    prev_bsdf_pdf, prev_select_prob, hit_surf_id, alive):
    """BSDF-side MIS emission pickup (integrator.cpp:93-110). Returns (R,3) add."""
    is_emissive = ix.emissive_idx >= 0
    direct = (bounce == 0) | ray_dirac
    out = -direction
    cos_light = g.dot(out, ix.normal)
    same_light = prev_light == hit_surf_id
    # Double-where: non-light surfaces have area 0, making light_pdf_e inf and
    # power_heuristic's partial w.r.t. prev_bsdf_pdf NaN on masked lanes.
    pdf_used = is_emissive & same_light & (ix.area * cos_light > 0.0)
    light_pdf_e = jnp.where(
        pdf_used, ix.t_safe * ix.t_safe / bsdf._safe(ix.area * cos_light), 1.0
    )
    mis_e = g.power_heuristic(prev_bsdf_pdf, light_pdf_e)
    emit = jnp.where(
        direct[:, None],
        ix.radiosity,
        jnp.where(same_light[:, None], (mis_e / bsdf._safe(prev_select_prob))[:, None] * ix.radiosity, 0.0),
    )
    return jnp.where((alive & is_emissive & ~ix.inside)[:, None], emit, 0.0)


def sample_direct(
    tables: SceneTables,
    ix: Interaction,
    ctx,
    intersect_fn: Callable,
    eps,
    alive,
    packs: ScenePacks | None = None,
):
    """Next-event estimation with MIS (integrator.cpp:31-87).

    Returns (nee (R,3) unweighted by throughput, prev_light (R,), prev_select_prob,
    shadow_rays (R,) int32 count contribution)."""
    dtype = ix.position.dtype
    R = ix.position.shape[0]
    u_l0 = sobol.sample(ctx, 0)
    u_l1 = sobol.sample(ctx, 1)
    u_l2 = sobol.sample(ctx, 2)
    n_l = tables.light_cdf.shape[0]
    light_idx = jnp.clip(g.cdf_index(tables.light_cdf, u_l2), 0, n_l - 1)
    # One wide packed gather for every per-light field (narrow per-field gathers
    # cost ~0.3 ms each per 2^16 rays on TPU; width is free — round-5 measurement).
    lpack = packs.light if packs is not None else build_light_pack(tables)
    lrow = lpack[light_idx]
    lsurf = (lrow[:, 0] + 0.5).astype(jnp.int32)
    select_prob = lrow[:, 1]
    l_radiosity = lrow[:, 2:5]
    l_area = lrow[:, 5]
    from .path_tracer import _sample_light_position_from

    light_pos, l_normal = _sample_light_position_from(
        lrow[:, 6], lrow[:, 7:10], lrow[:, 10:13], lrow[:, 13:16], lrow[:, 16:19],
        u_l0, u_l1)

    shadow_o = ix.position + ix.normal * eps
    sdir0 = g.normalize(light_pos - shadow_o)
    cos_light_theta = g.dot(-sdir0, l_normal)
    cos_theta_s = g.dot(sdir0, ix.normal)
    retry = (cos_theta_s <= 0.0) & ~ix.mat.opaque & (cos_theta_s != 0.0)
    shadow_o = jnp.where(retry[:, None], ix.position - ix.normal * eps, shadow_o)
    sdir = g.normalize(light_pos - shadow_o)

    # Park shadow rays that cannot contribute (dead lanes, dirac materials) far
    # outside the scene so traversal blocks skip them (see path_tracer.PARK_DISTANCE).
    need = alive & ~ix.mat.dirac_delta
    park_o = jnp.asarray([2e30, 2e30, 2e30], dtype)
    park_d = jnp.asarray([0.57735026, 0.57735026, 0.57735026], dtype)
    shadow_o = jnp.where(need[:, None], shadow_o, park_o)
    sdir = jnp.where(need[:, None], sdir, park_d)

    sh = intersect_fn(shadow_o, sdir)
    shadow_rays = jnp.sum((alive & ~ix.mat.dirac_delta).astype(jnp.int32))
    vis = (sh.surf_id == lsurf) & (sh.surf_id >= 0)

    nee_ok = (
        alive & ~ix.mat.dirac_delta & (cos_light_theta > 0.0)
        & ((cos_theta_s > 0.0) | retry) & vis
    )
    # Double-where BEFORE squaring: on occluded/parked lanes sh.t is float-max;
    # t*t would be inf (making power_heuristic NaN) and even inside a where the
    # untaken branch's partial d(t^2)/dt = 2t overflows to inf, which turns the
    # masked lanes' zero cotangents into NaN for every upstream parameter.
    t_vis = jnp.where(nee_ok, sh.t, 1.0)
    light_pdf = jnp.where(
        nee_ok, t_vis * t_vis / bsdf._safe(l_area * cos_light_theta), 1.0
    )
    wi_l = g.to_local(sdir, ix.tb_t, ix.tb_b, ix.sn)
    f_nee, pdf_nee = bsdf.eval_layered(
        ix.mat, ix.wo_l, wi_l, ix.n1, ix.n2, ix.inside, ix.R_cl, ix.T,
        event=jnp.zeros_like(ix.mat_id), flux=False,
        wi_dirac=jnp.zeros_like(alive),
    )
    bsdf_absidotn = f_nee * jnp.abs(wi_l[..., 2])[:, None]
    nee_ok = nee_ok & (pdf_nee > 0.0)
    mis_w = g.power_heuristic(light_pdf, pdf_nee)
    nee = (mis_w / bsdf._safe(light_pdf * select_prob))[:, None] * bsdf_absidotn * l_radiosity
    nee = jnp.where(nee_ok[:, None], nee, 0.0)
    prev_light = jnp.where(ix.mat.dirac_delta | ~alive, -1, lsurf)
    return nee, prev_light, select_prob, shadow_rays


class Bounce(NamedTuple):
    """Result of event selection + new-ray spawn + BSDF weight (ray.cpp:16-66 and
    interaction.cpp:56-72,156-183)."""
    new_dir: jnp.ndarray          # (R,3)
    new_origin: jnp.ndarray       # (R,3)
    new_medium: jnp.ndarray       # (R,)
    did_refract: jnp.ndarray      # (R,) bool
    dirac_next: jnp.ndarray       # (R,) bool
    is_diffuse: jnp.ndarray       # (R,) bool
    weight: jnp.ndarray           # (R,3) f * |wi.z| / pdf (1 on invalid lanes)
    pdf: jnp.ndarray              # (R,)
    valid: jnp.ndarray            # (R,) bool
    level_delta: jnp.ndarray      # (R,) int32
    refr_scale_mult: jnp.ndarray  # (R,)


def bsdf_bounce(ix: Interaction, direction, ctx, eps, flux: bool) -> Bounce:
    """Stochastic event selection and new ray (Sobol dims 3,4 = BSDF, 5 = event)."""
    u_b0 = sobol.sample(ctx, 3)
    u_b1 = sobol.sample(ctx, 4)
    u_int = sobol.sample(ctx, 5)
    mat = ix.mat
    event = bsdf.select_event(mat, ix.n2, ix.R_cl, ix.T, u_int)
    dirac_next = (event != bsdf.DIFFUSE) & ~mat.rough_specular

    vndf_l = bsdf.ggx_visible_microfacet(u_b0, u_b1, ix.wo_l, bsdf._ggx_safe_alpha(mat))
    spec_n = jnp.where(
        mat.rough_specular[:, None], g.from_local(vndf_l, ix.tb_t, ix.tb_b, ix.sn), ix.sn
    )
    refl_dir = g.reflect(direction, spec_n)
    inv_eta = ix.n1 / bsdf._safe(ix.n2)
    cos_m = g.dot(spec_n, direction)
    k = 1.0 - inv_eta * inv_eta * (1.0 - cos_m * cos_m)
    refr_ok = k >= 0.0
    # Double-where: sqrt'(0) = inf at the TIR boundary would leak NaN into ior
    # gradients through the untaken (TIR) branch below.
    k_safe = jnp.where(refr_ok, jnp.maximum(k, 1e-30), 1.0)
    refr_dir = (
        inv_eta[:, None] * direction
        - (inv_eta * cos_m + jnp.sqrt(k_safe))[:, None] * spec_n
    )
    tir_dir = direction - spec_n * (2.0 * cos_m)[:, None]
    diff_dir = g.from_local(g.cos_weighted_hemi(u_b0, u_b1), ix.tb_t, ix.tb_b, ix.sn)

    is_refl = event == bsdf.REFLECT
    is_refr = event == bsdf.REFRACT
    is_diff = event == bsdf.DIFFUSE
    did_refract = is_refr & refr_ok

    new_dir = jnp.where(
        is_refl[:, None], refl_dir,
        jnp.where(is_refr[:, None], jnp.where(refr_ok[:, None], refr_dir, tir_dir), diff_dir),
    )
    new_dir = g.normalize(new_dir)
    new_medium = jnp.where(did_refract, ix.n2, ix.n1)
    new_origin = ix.position + jnp.where(did_refract[:, None], -ix.normal * eps, ix.normal * eps)
    level_delta = jnp.where(did_refract, jnp.where(ix.inside, -1, 1), 0)
    refr_scale_mult = jnp.where(did_refract, (ix.n2 / bsdf._safe(ix.n1)) ** 2, 1.0)

    wi_l_new = g.to_local(new_dir, ix.tb_t, ix.tb_b, ix.sn)
    valid = jnp.where(did_refract, wi_l_new[..., 2] < 0.0, wi_l_new[..., 2] > 0.0)
    f_new, pdf_new = bsdf.eval_layered(
        mat, ix.wo_l, wi_l_new, ix.n1, ix.n2, ix.inside, ix.R_cl, ix.T,
        event=event, flux=flux, wi_dirac=dirac_next,
    )
    valid = valid & (pdf_new > 0.0)
    weight = jnp.where(
        valid[:, None],
        f_new * (jnp.abs(wi_l_new[..., 2]) / bsdf._safe(pdf_new))[:, None],
        1.0,
    )
    return Bounce(
        new_dir=new_dir, new_origin=new_origin, new_medium=new_medium,
        did_refract=did_refract, dirac_next=dirac_next, is_diffuse=is_diff,
        weight=weight, pdf=pdf_new, valid=valid,
        level_delta=level_delta, refr_scale_mult=refr_scale_mult,
    )


def update_ior_stack(iors, ior_count, refraction_level, level_delta, new_medium, K: int):
    """RefractionHistory push/pop for the new ray (ray.cpp:80-98).

    The slot write is a one-hot masked select, not a scatter: per-lane scatters
    serialize on TPU the same way per-lane gathers do."""
    new_level = refraction_level + level_delta
    push = (new_level > 0) & (new_level == ior_count)
    pop = (new_level > 0) & (new_level < ior_count - 1)
    slot = jnp.clip(ior_count, 0, K - 1)
    at_slot = jnp.arange(K)[None, :] == slot[:, None]
    iors = jnp.where(at_slot & push[:, None], new_medium[:, None], iors)
    ior_count = ior_count + jnp.where(push, 1, 0) - jnp.where(pop, 1, 0)
    ior_count = jnp.clip(ior_count, 1, K)
    return iors, ior_count, new_level
