"""Lockstep BVH traversal on device: skip-link walk over the flat node array.

TPU-native replacement for the reference's per-ray priority-queue best-first
traversal (/root/reference/source/bvh/bvh.cpp:80-129): every ray carries a node
index; one `lax.while_loop` iteration advances every live ray one node (descend on
AABB hit, else jump via skip link; leaves run a fixed-width masked primitive loop).
No stacks, no queues, no divergence beyond per-lane indices — pure gathers + VPU.

Spheres and quadrics (always few) are intersected brute-force and merged.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.loader import SceneMeta, SceneTables
from . import geometry as g
from .intersect import Hit, intersect_spheres_block, intersect_quadrics_block, intersect_tris_block


class DeviceBVH(NamedTuple):
    bb_min: jnp.ndarray   # (N,3)
    bb_max: jnp.ndarray   # (N,3)
    first: jnp.ndarray    # (N,)
    count: jnp.ndarray    # (N,)
    skip: jnp.ndarray     # (N,)
    # Reordered triangle data (leaf primitives contiguous)
    tri_v0: jnp.ndarray
    tri_e1: jnp.ndarray
    tri_e2: jnp.ndarray
    tri_id: jnp.ndarray   # (P,) int32 original triangle index


def device_bvh(flat, tables: SceneTables) -> DeviceBVH:
    """Upload a FlatBVH (over triangles) with reordered triangle data."""
    order = jnp.asarray(flat.prim_order)
    return DeviceBVH(
        bb_min=jnp.asarray(flat.bb_min, tables.tri_v0.dtype),
        bb_max=jnp.asarray(flat.bb_max, tables.tri_v0.dtype),
        first=jnp.asarray(flat.first),
        count=jnp.asarray(flat.count),
        skip=jnp.asarray(flat.skip),
        tri_v0=tables.tri_v0[order],
        tri_e1=tables.tri_e1[order],
        tri_e2=tables.tri_e2[order],
        tri_id=order.astype(jnp.int32),
    )


def _tri_hit(v0, e1, e2, o, d, eps):
    """Single-prim-per-lane Moller-Trumbore. All inputs (R,3)/(R,). -> t,u,v,valid."""
    p = jnp.cross(d, e2)
    det = jnp.sum(p * e1, axis=-1)
    parallel = jnp.abs(det) < eps
    inv_det = 1.0 / jnp.where(parallel, 1.0, det)
    tvec = o - v0
    u = jnp.sum(p * tvec, axis=-1) * inv_det
    q = jnp.cross(tvec, e1)
    v = jnp.sum(q * d, axis=-1) * inv_det
    t = jnp.sum(q * e2, axis=-1) * inv_det
    valid = (~parallel) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0) & (u + v <= 1.0) & (t > 0.0)
    return t, u, v, valid


def traverse(bvh: DeviceBVH, origin, direction, max_leaf: int, max_steps: int = 10_000):
    """Closest triangle hit for (R,) rays. Returns (t, tri_id, u, v) with tri_id=-1 miss."""
    dtype = origin.dtype
    R = origin.shape[0]
    n_nodes = bvh.skip.shape[0]
    eps = jnp.asarray(1e-9, dtype)
    inv_d = 1.0 / direction
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    i0 = (origin[:, 0] * 0).astype(jnp.int32)  # varying zeros under shard_map

    class St(NamedTuple):
        node: jnp.ndarray
        best_t: jnp.ndarray
        best_id: jnp.ndarray
        best_u: jnp.ndarray
        best_v: jnp.ndarray
        steps: jnp.ndarray

    def cond(st: St):
        return jnp.any(st.node < n_nodes) & (st.steps < max_steps)

    def body(st: St):
        node = jnp.minimum(st.node, n_nodes - 1)
        active = st.node < n_nodes
        nb_min = bvh.bb_min[node]
        nb_max = bvh.bb_max[node]
        t1 = (nb_min - origin) * inv_d
        t2 = (nb_max - origin) * inv_d
        t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)
        t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
        box_hit = (t_near <= t_far) & (t_far >= 0.0) & (t_near < st.best_t)

        count = bvh.count[node]
        first = bvh.first[node]
        is_leaf = count > 0

        best_t, best_id = st.best_t, st.best_id
        best_u, best_v = st.best_u, st.best_v
        process = active & box_hit & is_leaf
        for k in range(max_leaf):
            pid = jnp.minimum(first + k, bvh.tri_id.shape[0] - 1)
            t, u, v, valid = _tri_hit(
                bvh.tri_v0[pid], bvh.tri_e1[pid], bvh.tri_e2[pid], origin, direction, eps
            )
            take = process & (k < count) & valid & (t < best_t)
            best_id = jnp.where(take, bvh.tri_id[pid], best_id)
            best_u = jnp.where(take, u, best_u)
            best_v = jnp.where(take, v, best_v)
            best_t = jnp.where(take, t, best_t)

        descend = active & box_hit & ~is_leaf
        nxt = jnp.where(descend, node + 1, bvh.skip[node])
        nxt = jnp.where(active, nxt, st.node)
        return St(nxt, best_t, best_id, best_u, best_v, st.steps + 1)

    init = St(
        node=i0,
        best_t=origin[:, 0] * 0 + big,
        best_id=i0 - 1,
        best_u=origin[:, 0] * 0,
        best_v=origin[:, 0] * 0,
        steps=jnp.asarray(0, jnp.int32),
    )
    final = jax.lax.while_loop(cond, body, init)
    return final.best_t, final.best_id, final.best_u, final.best_v


def make_intersect_fn(tables: SceneTables, meta: SceneMeta, bvh: DeviceBVH, max_leaf: int):
    """Scene intersect closure: BVH for triangles + brute force spheres/quadrics."""

    def intersect(origin, direction):
        dtype = origin.dtype
        R = origin.shape[0]
        big = jnp.asarray(jnp.finfo(dtype).max, dtype)
        best_t, best_id, u, v = traverse(bvh, origin, direction, max_leaf)
        best_uv = jnp.stack([u, v], axis=-1)

        if meta.n_sphs:
            t, valid = intersect_spheres_block(origin, direction, tables.sph_origin, tables.sph_radius)
            t = jnp.where(valid, t, big)
            idx = jnp.argmin(t, axis=-1)
            tt = jnp.take_along_axis(t, idx[:, None], axis=-1)[:, 0]
            better = tt < best_t
            best_id = jnp.where(better, idx.astype(jnp.int32) + meta.sphere_offset, best_id)
            best_t = jnp.minimum(best_t, tt)

        if meta.n_quads:
            t, valid = intersect_quadrics_block(origin, direction, tables.quad_Q, tables.quad_bb_min, tables.quad_bb_max)
            t = jnp.where(valid, t, big)
            idx = jnp.argmin(t, axis=-1)
            tt = jnp.take_along_axis(t, idx[:, None], axis=-1)[:, 0]
            better = tt < best_t
            best_id = jnp.where(better, idx.astype(jnp.int32) + meta.quad_offset, best_id)
            best_t = jnp.minimum(best_t, tt)

        return Hit(t=best_t, surf_id=best_id, uv=best_uv)

    return intersect
