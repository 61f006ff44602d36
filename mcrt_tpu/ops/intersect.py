"""Batched ray-scene intersection (brute force, all primitive types).

TPU-native replacement for the reference's per-ray virtual `Surface::intersect`
dispatch (/root/reference/source/surface/{triangle,sphere,quadric}.cpp): rays are a
megabatch (R,), primitives are SoA tables, and each type is intersected as one dense
(R x N) vector computation with a masked argmin. Matches the reference's no-BVH mode
(scene.cpp:159-172); BVH-accelerated traversal lives in ops/bvh (used when the scene
has a `bvh` block and the primitive count warrants it).

Hit encoding: surf_id == -1 means miss; uv are barycentric (triangles only).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..scene.loader import SceneMeta, SceneTables
from . import geometry as g


class Hit(NamedTuple):
    t: jnp.ndarray        # (R,)
    surf_id: jnp.ndarray  # (R,) int32, -1 = miss
    uv: jnp.ndarray       # (R, 2) triangle barycentrics
    steps: jnp.ndarray | None = None  # scalar int32 BVH node-walk steps (None: brute)


def _big(dtype):
    return jnp.asarray(jnp.finfo(dtype).max, dtype)


def intersect_tris_block(origin, direction, v0, e1, e2, eps):
    """Moller-Trumbore for (R,) rays x (T,) triangles -> (t (R,T), u, v, valid).

    Mirrors the reference's test exactly (triangle.cpp:23-63): parallel-determinant
    rejection at |det| < eps, u,v in [0,1], u+v <= 1, t > 0.
    """
    d = direction[:, None, :]
    o = origin[:, None, :]
    p = jnp.cross(d, e2[None, :, :])
    det = jnp.sum(p * e1[None, :, :], axis=-1)
    parallel = jnp.abs(det) < eps
    inv_det = 1.0 / jnp.where(parallel, jnp.asarray(1.0, det.dtype), det)
    tvec = o - v0[None, :, :]
    u = jnp.sum(p * tvec, axis=-1) * inv_det
    q = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(q * d, axis=-1) * inv_det
    t = jnp.sum(q * e2[None, :, :], axis=-1) * inv_det
    valid = (
        ~parallel
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (v <= 1.0)
        & (u + v <= 1.0)
        & (t > 0.0)
    )
    return t, u, v, valid


def refine_tri_hit(tables: "SceneTables", meta: "SceneMeta", origin, direction, t, surf_id, uv,
                   geo=None):
    """Recompute (t, u, v) of the winning triangle with one exact Moller-Trumbore.

    Both intersection paths (brute block and cluster-BVH matmul) funnel their
    triangle winner through this single gathered-triangle evaluation, so the final
    hit values are bitwise identical regardless of which acceleration path found
    the winner. This is what lets BVH and no-BVH renders of the same scene produce
    the same Monte Carlo sample paths (the cluster path's MXU bilinear forms are
    only used for culling + winner selection, never as the reported hit)."""
    if not meta.n_tris:
        return t, uv
    sid = jnp.maximum(surf_id, 0)
    is_tri = (surf_id >= 0) & (sid < meta.sphere_offset)
    tid = jnp.clip(sid, 0, meta.n_tris - 1)
    # One 9-wide gather instead of three narrow ones (TPU gather cost is
    # ~independent of row width). Callers inside loops pass a prebuilt `geo`.
    if geo is None:
        geo = build_geo_pack(tables)
    grow = geo[tid]
    v0 = grow[:, 0:3]
    e1 = grow[:, 3:6]
    e2 = grow[:, 6:9]
    p = jnp.cross(direction, e2)
    det = jnp.sum(p * e1, axis=-1)
    inv_det = 1.0 / jnp.where(det == 0.0, jnp.asarray(1.0, det.dtype), det)
    tvec = origin - v0
    u = jnp.sum(p * tvec, axis=-1) * inv_det
    q = jnp.cross(tvec, e1)
    v = jnp.sum(q * direction, axis=-1) * inv_det
    tt = jnp.sum(q * e2, axis=-1) * inv_det
    t_out = jnp.where(is_tri, tt, t)
    uv_out = jnp.where(is_tri[:, None], jnp.stack([u, v], axis=-1), uv)
    return t_out, uv_out


def build_geo_pack(tables):
    """(n_tris, 9) packed [v0|e1|e2] for refine_tri_hit's single wide gather;
    build outside loop bodies (loop-invariant)."""
    return jnp.concatenate([tables.tri_v0, tables.tri_e1, tables.tri_e2], axis=1)


def intersect_spheres_block(origin, direction, centers, radii):
    """(R,) rays x (S,) spheres -> (t (R,S), valid).

    Same math as the reference's quadratic (sphere.cpp:13-26) but in the
    cancellation-free vector-rejection form so it stays accurate in f32: the
    perpendicular distance is computed from the rejection vector directly instead
    of |so|^2 - t_ca^2 (whose f32 roundoff is ~1e-3 at typical scene scales and
    visibly biases sphere shading)."""
    so = centers[None, :, :] - origin[:, None, :]          # ray origin -> center
    t_ca = jnp.sum(direction[:, None, :] * so, axis=-1)    # closest approach
    perp = so - t_ca[..., None] * direction[:, None, :]
    d2 = jnp.sum(perp * perp, axis=-1)
    r2 = radii[None, :] ** 2
    hit = d2 <= r2
    # Double-where: sqrt'(0) = inf on miss lanes (d2 > r2 clamped to 0) poisons
    # reverse-mode gradients of ray origin/direction through masked lanes.
    t_hc = jnp.sqrt(jnp.where(hit, jnp.maximum(r2 - d2, 1e-30), 1.0))
    t_min = t_ca - t_hc
    t_max = t_ca + t_hc
    valid = hit & (t_max >= 0.0)
    t = jnp.where(t_min < 0.0, t_max, t_min)
    return t, valid


def refine_positions(tables: "SceneTables", meta: "SceneMeta", surf_id, position):
    """Snap hit points exactly onto analytic surfaces (spheres) to kill the f32
    along-ray error accumulated in position = o + t*d."""
    if not meta.n_sphs:
        return position
    sid = jnp.maximum(surf_id, 0)
    sph_id = jnp.clip(sid - meta.sphere_offset, 0, max(meta.n_sphs - 1, 0))
    center = tables.sph_origin[sph_id]
    radius = tables.sph_radius[sph_id][:, None]
    on_sphere = center + g.normalize(position - center) * radius
    is_sph = (sid >= meta.sphere_offset) & (sid < meta.quad_offset)
    return jnp.where(is_sph[:, None], on_sphere, position)


def _slab_entry(origin, direction, bb_min, bb_max):
    """Ray-AABB slab test for (R,) rays x (Q,) boxes -> (hit, t_entry>=0)."""
    inv_d = 1.0 / direction
    o = origin[:, None, :]
    inv = inv_d[:, None, :]
    t1 = (bb_min[None, :, :] - o) * inv
    t2 = (bb_max[None, :, :] - o) * inv
    t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)
    t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (t_near <= t_far) & (t_far >= 0.0)
    return hit, jnp.maximum(t_near, 0.0)


def intersect_quadrics_block(origin, direction, Q, bb_min, bb_max):
    """(R,) rays x (Qn,) quadrics -> (t (R,Qn), valid). Reference quadric.cpp:69-100:
    start at the BB entry point, solve the quadratic, reject exits outside the BB."""
    bb_hit, t_bb = _slab_entry(origin, direction, bb_min, bb_max)
    o3 = origin[:, None, :] + direction[:, None, :] * t_bb[..., None]
    ones = jnp.ones(o3.shape[:-1] + (1,), o3.dtype)
    o4 = jnp.concatenate([o3, ones], axis=-1)            # (R, Qn, 4)
    d4 = jnp.concatenate([direction, jnp.zeros_like(direction[..., :1])], axis=-1)  # (R, 4)
    Qo = jnp.einsum("qij,rqj->rqi", Q, o4)
    Qd = jnp.einsum("qij,rj->rqi", Q, d4)
    a = jnp.sum(d4[:, None, :] * Qd, axis=-1)
    b = jnp.sum(d4[:, None, :] * Qo, axis=-1) * 2.0
    c = jnp.sum(o4 * Qo, axis=-1)
    valid, t_min, t_max = g.solve_quadratic(a, b, c)
    valid = valid & (t_max >= 0.0) & bb_hit
    t_rel = jnp.where(t_min < 0.0, t_max, t_min)
    t = t_bb + t_rel
    pos = origin[:, None, :] + direction[:, None, :] * t[..., None]
    inside_bb = jnp.all((pos >= bb_min[None, :, :]) & (pos <= bb_max[None, :, :]), axis=-1)
    return t, valid & inside_bb


def intersect_brute(tables: SceneTables, meta: SceneMeta, origin, direction) -> Hit:
    """Closest hit across all primitive tables. origin/direction: (R, 3)."""
    dtype = origin.dtype
    R = origin.shape[0]
    eps = jnp.asarray(1e-9, dtype)
    best_t = jnp.full((R,), _big(dtype))
    best_id = jnp.full((R,), -1, jnp.int32)
    best_uv = jnp.zeros((R, 2), dtype)

    if meta.n_tris:
        t, u, v, valid = intersect_tris_block(origin, direction, tables.tri_v0, tables.tri_e1, tables.tri_e2, eps)
        t = jnp.where(valid, t, _big(dtype))
        idx = jnp.argmin(t, axis=-1)
        tt = jnp.min(t, axis=-1)  # == t at idx; avoids a take_along_axis gather
        hit_valid = tt < best_t
        best_id = jnp.where(hit_valid, idx.astype(jnp.int32), best_id)
        uu = g.onehot_row_take(u, idx)
        vv = g.onehot_row_take(v, idx)
        best_uv = jnp.where(hit_valid[:, None], jnp.stack([uu, vv], axis=-1), best_uv)
        best_t = jnp.minimum(best_t, tt)

    if meta.n_sphs:
        t, valid = intersect_spheres_block(origin, direction, tables.sph_origin, tables.sph_radius)
        t = jnp.where(valid, t, _big(dtype))
        idx = jnp.argmin(t, axis=-1)
        tt = jnp.min(t, axis=-1)
        hit_valid = tt < best_t
        best_id = jnp.where(hit_valid, idx.astype(jnp.int32) + meta.sphere_offset, best_id)
        best_t = jnp.minimum(best_t, tt)

    if meta.n_quads:
        t, valid = intersect_quadrics_block(origin, direction, tables.quad_Q, tables.quad_bb_min, tables.quad_bb_max)
        t = jnp.where(valid, t, _big(dtype))
        idx = jnp.argmin(t, axis=-1)
        tt = jnp.min(t, axis=-1)
        hit_valid = tt < best_t
        best_id = jnp.where(hit_valid, idx.astype(jnp.int32) + meta.quad_offset, best_id)
        best_t = jnp.minimum(best_t, tt)

    best_t, best_uv = refine_tri_hit(tables, meta, origin, direction, best_t, best_id, best_uv)
    return Hit(t=best_t, surf_id=best_id, uv=best_uv)


def surface_normal(tables: SceneTables, meta: SceneMeta, surf_id, position):
    """Outward geometric normal at `position` for each surface id (gather + dispatch)."""
    sid = jnp.maximum(surf_id, 0)
    tri_id = jnp.clip(sid, 0, max(meta.n_tris - 1, 0))
    sph_id = jnp.clip(sid - meta.sphere_offset, 0, max(meta.n_sphs - 1, 0))
    quad_id = jnp.clip(sid - meta.quad_offset, 0, max(meta.n_quads - 1, 0))

    n = tables.tri_n[tri_id]
    if meta.n_sphs:
        sph_n = (position - tables.sph_origin[sph_id]) / tables.sph_radius[sph_id][:, None]
        n = jnp.where((sid >= meta.sphere_offset)[:, None], sph_n, n)
    if meta.n_quads:
        p4 = jnp.concatenate([position, jnp.ones_like(position[..., :1])], axis=-1)
        grad = jnp.einsum("rij,rj->ri", tables.quad_G[quad_id], p4)
        quad_n = g.normalize(grad)
        n = jnp.where((sid >= meta.quad_offset)[:, None], quad_n, n)
    return n


def shading_normal(tables: SceneTables, meta: SceneMeta, surf_id, uv, geom_n, direction):
    """Interpolated shading normal with geometric fallback when the interpolated
    normal flips sides relative to the ray (reference interaction.cpp:23-30)."""
    sid = jnp.maximum(surf_id, 0)
    tri_id = jnp.clip(sid, 0, max(meta.n_tris - 1, 0))
    is_tri = sid < meta.sphere_offset
    interp = is_tri & tables.tri_interp[tri_id]
    vn = tables.tri_vn[tri_id]  # (R, 3, 3)
    u, v = uv[..., 0:1], uv[..., 1:2]
    sn = g.normalize((1.0 - u - v) * vn[:, 0] + u * vn[:, 1] + v * vn[:, 2])
    cos_g = g.dot(direction, geom_n)
    cos_s = g.dot(direction, sn)
    flip_mismatch = (cos_g < 0.0) != (cos_s < 0.0)
    use_interp = interp & ~flip_mismatch
    return jnp.where(use_interp[:, None], sn, geom_n)
