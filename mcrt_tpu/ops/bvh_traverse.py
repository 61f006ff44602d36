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


def traverse(bvh: DeviceBVH, origin, direction, max_leaf: int, max_steps: int = 100_000):
    """Closest triangle hit for (R,) rays. Returns (t, tri_id, u, v) with tri_id=-1 miss.

    "while-while" lockstep: an inner loop walks every lane to its next hit leaf
    (node gathers only — no triangle work on internal nodes), then the outer loop
    body runs the fixed-width leaf-primitive tests for all lanes at once.
    """
    dtype = origin.dtype
    n_nodes = bvh.skip.shape[0]
    eps = jnp.asarray(1e-9, dtype)
    inv_d = 1.0 / direction
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    i0 = (origin[:, 0] * 0).astype(jnp.int32)  # varying zeros under shard_map

    def walk_to_leaf(node, best_t):
        """Advance each lane until it sits on a hit leaf or falls off the tree."""

        def w_cond(carry):
            node, at_leaf, steps = carry
            return jnp.any(~at_leaf & (node < n_nodes)) & (steps < max_steps)

        def w_body(carry):
            node, at_leaf, steps = carry
            nd = jnp.minimum(node, n_nodes - 1)
            nb_min = bvh.bb_min[nd]
            nb_max = bvh.bb_max[nd]
            t1 = (nb_min - origin) * inv_d
            t2 = (nb_max - origin) * inv_d
            t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)
            t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
            box_hit = (t_near <= t_far) & (t_far >= 0.0) & (t_near < best_t)
            is_leaf = bvh.count[nd] > 0
            active = ~at_leaf & (node < n_nodes)
            # stop on a hit leaf; descend into hit internal; else skip
            new_at_leaf = at_leaf | (active & box_hit & is_leaf)
            nxt = jnp.where(box_hit & ~is_leaf, nd + 1, bvh.skip[nd])
            node = jnp.where(active & ~(box_hit & is_leaf), nxt, node)
            return node, new_at_leaf, steps + 1

        at_leaf0 = i0 != 0
        node, at_leaf, _ = jax.lax.while_loop(
            w_cond, w_body, (node, at_leaf0, jnp.asarray(0, jnp.int32))
        )
        return node, at_leaf

    class St(NamedTuple):
        node: jnp.ndarray
        at_leaf: jnp.ndarray
        best_t: jnp.ndarray
        best_id: jnp.ndarray
        best_u: jnp.ndarray
        best_v: jnp.ndarray

    def cond(st: St):
        return jnp.any(st.at_leaf)

    def body(st: St):
        # Process current leaves
        nd = jnp.minimum(st.node, n_nodes - 1)
        first = bvh.first[nd]
        count = jnp.where(st.at_leaf, bvh.count[nd], 0)
        best_t, best_id = st.best_t, st.best_id
        best_u, best_v = st.best_u, st.best_v
        for k in range(max_leaf):
            pid = jnp.minimum(first + k, bvh.tri_id.shape[0] - 1)
            t, u, v, valid = _tri_hit(
                bvh.tri_v0[pid], bvh.tri_e1[pid], bvh.tri_e2[pid], origin, direction, eps
            )
            take = (k < count) & valid & (t < best_t)
            best_id = jnp.where(take, bvh.tri_id[pid], best_id)
            best_u = jnp.where(take, u, best_u)
            best_v = jnp.where(take, v, best_v)
            best_t = jnp.where(take, t, best_t)
        # Continue from the leaf's skip link
        node = jnp.where(st.at_leaf, bvh.skip[nd], st.node)
        node, at_leaf = walk_to_leaf(node, best_t)
        return St(node, at_leaf, best_t, best_id, best_u, best_v)

    node0, at_leaf0 = walk_to_leaf(i0, origin[:, 0] * 0 + big)
    init = St(
        node=node0,
        at_leaf=at_leaf0,
        best_t=origin[:, 0] * 0 + big,
        best_id=i0 - 1,
        best_u=origin[:, 0] * 0,
        best_v=origin[:, 0] * 0,
    )
    final = jax.lax.while_loop(cond, body, init)
    return final.best_t, final.best_id, final.best_u, final.best_v


def traverse_blocks(
    bvh: DeviceBVH, origin, direction, max_leaf: int, block: int = 256,
    max_steps: int = 1_000_000,
):
    """Block-synchronous traversal: TPU-shaped alternative to per-lane walks.

    XLA lowers per-lane gathers (node AABBs indexed by a per-ray node pointer) to
    near-scalar loops on TPU — catastrophically slow. Here rays are grouped into
    blocks of `block` consecutive rays; each block walks the tree with ONE scalar
    node cursor (gathers are per-block, i.e. tiny), descending whenever ANY ray in
    the block hits the node's AABB. All per-ray work is dense broadcast VPU math.
    Camera and shadow rays are coherent, so the block union stays close to the
    per-ray node set; bounce-ray coherence comes from upstream ray ordering.

    Returns (t, tri_id, u, v) per ray, tri_id = -1 on miss.
    """
    dtype = origin.dtype
    R = origin.shape[0]
    n_nodes = bvh.skip.shape[0]
    eps = jnp.asarray(1e-9, dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    K = min(block, R)
    pad = (-R) % K
    if pad:
        origin = jnp.concatenate([origin, jnp.broadcast_to(origin[-1:], (pad, 3))], axis=0)
        direction = jnp.concatenate([direction, jnp.broadcast_to(direction[-1:], (pad, 3))], axis=0)
    B = origin.shape[0] // K
    o = origin.reshape(B, K, 3)
    d = direction.reshape(B, K, 3)
    inv_d = 1.0 / d

    ib0 = (o[:, 0, 0] * 0).astype(jnp.int32)  # (B,) varying zeros

    class St(NamedTuple):
        node: jnp.ndarray     # (B,)
        best_t: jnp.ndarray   # (B,K)
        best_id: jnp.ndarray  # (B,K)
        best_u: jnp.ndarray
        best_v: jnp.ndarray
        steps: jnp.ndarray

    def cond(st: St):
        return jnp.any(st.node < n_nodes) & (st.steps < max_steps)

    def body(st: St):
        nd = jnp.minimum(st.node, n_nodes - 1)
        active = st.node < n_nodes
        nb_min = bvh.bb_min[nd][:, None, :]   # (B,1,3)
        nb_max = bvh.bb_max[nd][:, None, :]
        t1 = (nb_min - o) * inv_d
        t2 = (nb_max - o) * inv_d
        t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)   # (B,K)
        t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
        box_hit = (t_near <= t_far) & (t_far >= 0.0) & (t_near < st.best_t)
        any_hit = jnp.any(box_hit, axis=-1) & active      # (B,)

        count = bvh.count[nd]
        first = bvh.first[nd]
        is_leaf = count > 0
        do_leaf = any_hit & is_leaf

        best_t, best_id = st.best_t, st.best_id
        best_u, best_v = st.best_u, st.best_v
        for k in range(max_leaf):
            pid = jnp.minimum(first + k, bvh.tri_id.shape[0] - 1)   # (B,)
            v0 = bvh.tri_v0[pid][:, None, :]
            e1 = bvh.tri_e1[pid][:, None, :]
            e2 = bvh.tri_e2[pid][:, None, :]
            p = jnp.cross(d, e2)
            det = jnp.sum(p * e1, axis=-1)
            parallel = jnp.abs(det) < eps
            idet = 1.0 / jnp.where(parallel, 1.0, det)
            tvec = o - v0
            u = jnp.sum(p * tvec, axis=-1) * idet
            q = jnp.cross(tvec, e1)
            v = jnp.sum(q * d, axis=-1) * idet
            t = jnp.sum(q * e2, axis=-1) * idet
            valid = (
                (~parallel) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0)
                & (u + v <= 1.0) & (t > 0.0)
            )
            take = (do_leaf & (k < count))[:, None] & valid & (t < best_t)
            tri = bvh.tri_id[pid][:, None]
            best_id = jnp.where(take, jnp.broadcast_to(tri, take.shape), best_id)
            best_u = jnp.where(take, u, best_u)
            best_v = jnp.where(take, v, best_v)
            best_t = jnp.where(take, t, best_t)

        descend = any_hit & ~is_leaf
        nxt = jnp.where(descend, nd + 1, bvh.skip[nd])
        node = jnp.where(active, nxt, st.node)
        return St(node, best_t, best_id, best_u, best_v, st.steps + 1)

    init = St(
        node=ib0,
        best_t=o[..., 0] * 0 + big,
        best_id=ib0[:, None] - 1 + (o[..., 0] * 0).astype(jnp.int32),
        best_u=o[..., 0] * 0,
        best_v=o[..., 0] * 0,
        steps=jnp.asarray(0, jnp.int32),
    )
    final = jax.lax.while_loop(cond, body, init)
    flat = lambda x: x.reshape(-1)[:R]
    return flat(final.best_t), flat(final.best_id), flat(final.best_u), flat(final.best_v)


def make_intersect_fn(tables: SceneTables, meta: SceneMeta, bvh: DeviceBVH, max_leaf: int):
    """Scene intersect closure: BVH for triangles + brute force spheres/quadrics."""

    def intersect(origin, direction):
        dtype = origin.dtype
        R = origin.shape[0]
        big = jnp.asarray(jnp.finfo(dtype).max, dtype)
        best_t, best_id, u, v = traverse_blocks(bvh, origin, direction, max_leaf)
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
