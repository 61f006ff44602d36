"""Cluster BVH: fat-leaf BVH + MXU-dense ray-triangle intersection.

THE TPU-native acceleration structure of this framework. TPUs have no per-lane
gather, so pointer-chasing per-ray BVH walks (reference bvh.cpp:80-129) lower to
near-scalar code. Instead:

  * The BVH is built with FAT leaves ("clusters" of up to S triangles, S ~ 128-512).
    The cluster-level tree is tiny (P/S leaves), so a block of rays can walk it
    synchronously with a single scalar node cursor per block — all control data
    access is per-block, never per-lane.
  * Ray-triangle intersection against a whole cluster is a dense batched matmul on
    the MXU: Moller-Trumbore decomposes into four bilinear forms
        det   = d . (E2 x E1)
        u*det = -cr . E2 - d . (E2 x v0)
        v*det =  cr . E1 + d . (E1 x v0)          (cr = d x o)
        t*det =  o . n2 - v0 . n2                 (n2 = E1 x E2)
    i.e. out[k, tri, 0:4] = F[k, :] @ M[tri]  with ray features
    F = [d, o, cr, 1] (10) and a precomputed (10, 4) matrix per triangle.
    One (K, 10) @ (10, 4S) matmul intersects K rays with a whole cluster.

This replaces divergence with dense FLOPs — exactly the trade the MXU wants.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.loader import SceneMeta, SceneTables
from .intersect import Hit, intersect_spheres_block, intersect_quadrics_block


class ClusterBVH(NamedTuple):
    # Cluster-level tree (DFS with skip links; every leaf is one cluster)
    bb_min: jnp.ndarray        # (N,3)
    bb_max: jnp.ndarray        # (N,3)
    skip: jnp.ndarray          # (N,)
    node_cluster: jnp.ndarray  # (N,) int32 cluster id for leaves, -1 internal
    # Per-cluster dense data (padded to S triangles)
    feat: jnp.ndarray          # (C, 10, 4*S) f32: per-tri bilinear forms
    tri_id: jnp.ndarray        # (C, S) int32 original triangle id, -1 padding
    center: jnp.ndarray        # (C, 3) cluster centroid: geometry stored relative to
                               # it and rays translated per visit, so the bilinear
                               # forms stay small-magnitude (f32-safe)
    cl_bb_min: jnp.ndarray     # (C,3) leaf/cluster AABBs (flat culling sweep)
    cl_bb_max: jnp.ndarray     # (C,3)
    # Exact 3-way bf16 split of the combined per-cluster value table
    # [feat | tri_id | center] (C, 40S+S+3), for the one-hot MXU gather used by
    # the best-first traversal (val0+val1+val2 reconstructs f32 exactly: the
    # one-hot operand is 0/1 which bf16 represents exactly, so each pass is an
    # exact partial sum). None when the tables are f64 (CPU tests use plain
    # gathers instead).
    val0: jnp.ndarray | None
    val1: jnp.ndarray | None
    val2: jnp.ndarray | None
    # Pallas traversal tables (f32 scenes only, None for f64): per-cluster record
    # (C, 4*Sp, 12) with the center-folded M'^T + tri-id bits (see
    # traverse_kernel.py) and transposed cluster AABBs (Lc, 8), Lc = 128-padded C.
    rec: jnp.ndarray | None
    cl_bb: jnp.ndarray | None
    # (C and S are implied by tri_id.shape — keep this pytree arrays-only so it can
    # be passed straight through jit boundaries)


# Cluster-count ceiling for the exact one-hot MXU gather (see upload_cluster_bvh).
_ONEHOT_MAX_CLUSTERS = 2048


def build_cluster_features(v0, e1, e2, dtype=np.float32):
    """(P,3)x3 -> (P, 10, 4) per-triangle bilinear-form matrices (numpy)."""
    n2 = np.cross(e1, e2)
    e2v0 = np.cross(e2, v0)
    e1v0 = np.cross(e1, v0)
    dvn = np.sum(v0 * n2, axis=-1)
    P = len(v0)
    M = np.zeros((P, 10, 4), dtype)
    # F = [d(0:3), o(3:6), cr(6:9), 1(9)]
    M[:, 0:3, 0] = -n2
    M[:, 0:3, 1] = -e2v0
    M[:, 6:9, 1] = -e2
    M[:, 0:3, 2] = e1v0
    M[:, 6:9, 2] = e1
    M[:, 3:6, 3] = n2
    M[:, 9, 3] = -dvn
    return M


def upload_cluster_bvh(flat, scene, dtype=np.float32) -> ClusterBVH:
    """FlatBVH (fat leaves) + host scene triangle data -> device ClusterBVH."""
    leaf_mask = flat.count > 0
    n_nodes = len(flat.skip)
    node_cluster = np.full(n_nodes, -1, np.int32)
    leaf_ids = np.nonzero(leaf_mask)[0]
    node_cluster[leaf_ids] = np.arange(len(leaf_ids), dtype=np.int32)
    C = len(leaf_ids)
    S = int(flat.count.max()) if C else 1

    v0 = scene.tri_v0
    e1 = scene.tri_e1
    e2 = scene.tri_e2

    # Vectorized gather of each leaf's primitive slice into the (C, S) padded
    # layout (the per-leaf Python loop this replaces took minutes at 10^6 tris).
    first = flat.first[leaf_ids].astype(np.int64)           # (C,)
    count = flat.count[leaf_ids].astype(np.int64)           # (C,)
    col = np.arange(S, dtype=np.int64)[None, :]             # (1, S)
    valid = col < count[:, None]                            # (C, S)
    gidx = first[:, None] + np.minimum(col, np.maximum(count[:, None] - 1, 0))
    prims = flat.prim_order[gidx]                           # (C, S) clamped gather
    tri_id = np.where(valid, prims, -1).astype(np.int32)
    center = 0.5 * (flat.bb_min[leaf_ids] + flat.bb_max[leaf_ids])
    vmask = valid[..., None]
    pv0 = np.where(vmask, v0[prims] - center[:, None, :], 0.0)
    pe1 = np.where(vmask, e1[prims], 0.0)
    pe2 = np.where(vmask, e2[prims], 0.0)

    feat = build_cluster_features(
        pv0.reshape(-1, 3), pe1.reshape(-1, 3), pe2.reshape(-1, 3), dtype
    ).reshape(C, S, 10, 4)
    # (C, S, 10, 4) -> (C, 10, 4, S) -> (C, 10, 4S): output columns grouped by form
    feat = np.ascontiguousarray(feat.transpose(0, 2, 3, 1)).reshape(C, 10, 4 * S)

    val0 = val1 = val2 = None
    # One-hot matmul gather cost scales with C (B*C*F per pass): a win over the
    # dynamic row gather up to ~2k clusters (measured v5e), a loss beyond. Large
    # scenes (C > _ONEHOT_MAX_CLUSTERS) fall back to the plain gather path.
    if np.dtype(dtype).itemsize == 4 and C <= _ONEHOT_MAX_CLUSTERS:
        # Combined value table + exact 3-way bf16 split (8+8+8 mantissa bits
        # covers the full f32 significand) for the one-hot MXU gather.
        val = np.concatenate(
            [feat.reshape(C, 40 * S), tri_id.astype(np.float32), center.astype(np.float32)],
            axis=1,
        ).astype(np.float32)
        import ml_dtypes

        c0 = val.astype(ml_dtypes.bfloat16)
        r0 = val - c0.astype(np.float32)
        c1 = r0.astype(ml_dtypes.bfloat16)
        r1 = r0 - c1.astype(np.float32)
        c2 = r1.astype(ml_dtypes.bfloat16)
        val0, val1, val2 = (jnp.asarray(c) for c in (c0, c1, c2))

    rec = cl_bb = None
    if np.dtype(dtype).itemsize == 4:
        rec, cl_bb = _build_pallas_tables(feat, tri_id, center,
                                          flat.bb_min[leaf_ids], flat.bb_max[leaf_ids])

    return ClusterBVH(
        bb_min=jnp.asarray(flat.bb_min, dtype),
        bb_max=jnp.asarray(flat.bb_max, dtype),
        skip=jnp.asarray(flat.skip),
        node_cluster=jnp.asarray(node_cluster),
        feat=jnp.asarray(feat),
        tri_id=jnp.asarray(tri_id),
        center=jnp.asarray(center, dtype),
        cl_bb_min=jnp.asarray(flat.bb_min[leaf_ids], dtype),
        cl_bb_max=jnp.asarray(flat.bb_max[leaf_ids], dtype),
        val0=val0,
        val1=val1,
        val2=val2,
        rec=rec,
        cl_bb=cl_bb,
    )


def _build_pallas_tables(feat, tri_id, center, cl_lo, cl_hi):
    """Host-side build of the Pallas traversal record + AABB tables.

    feat (C, 10, 4S) is form-major [det|udet|vdet|tdet] in cluster-local
    coordinates; fold the center translation into the matrix so the kernel can
    use global-frame ray features:  F_global @ M' == F_local @ M  (see
    traverse_kernel.py docstring for the derivation and precision argument)."""
    C, _, S4 = feat.shape
    S = S4 // 4
    Sp = -(-S // 128) * 128
    M = feat.reshape(C, 10, 4, S)
    Mp = np.zeros((C, 10, 4, Sp), np.float32)
    Mp[:, :, :, :S] = M
    # d-rows: M'[0:3] = M[0:3] - c x M[6:9]
    c = center.astype(np.float32)                       # (C, 3)
    M69 = Mp[:, 6:9]                                    # (C, 3, 4, Sp)
    cxm = np.cross(c[:, :, None, None], M69, axis=1)
    Mp[:, 0:3] -= cxm
    # 1-row: M'[9] = M[9] - c . M[3:6]
    Mp[:, 9] -= np.einsum("ci,cifs->cfs", c, Mp[:, 3:6])
    # rec (C, 10, 5*Sp): columns grouped [det|udet|vdet|tdet|tri] x Sp. The tri
    # group's only nonzero row is the constant-1 feature (row 9) carrying the
    # triangle id as an f32 VALUE (exact below 2^24), so the id rides out of the
    # same matmul with no gather/bitcast/transpose in the kernel. -1 = padding.
    # 16 feature rows (10 used, 6 zero padding) so the sublane dim matches the
    # VMEM tile (8, 128) exactly — Mosaic cannot slice a 10-row plane out of a
    # 16-row padded buffer.
    tri_p = np.full((C, Sp), -1.0, np.float32)
    tri_p[:, :S] = tri_id.astype(np.float32)
    G5 = np.zeros((C, 16, 5, Sp), np.float32)
    G5[:, :10, :4] = Mp
    G5[:, 9, 4, :] = tri_p
    rec = G5.reshape(C, 16, 5 * Sp)
    # AABB table (8, Lc) lane-major: rows 0:3 lo, 4:7 hi; padded lanes (>= C)
    # masked in-kernel
    Lc = max(128, -(-C // 128) * 128)
    cl_bb = np.zeros((8, Lc), np.float32)
    cl_bb[0:3, :] = np.inf
    cl_bb[4:7, :] = -np.inf
    cl_bb[0:3, :C] = cl_lo.T
    cl_bb[4:7, :C] = cl_hi.T
    return jnp.asarray(rec), jnp.asarray(cl_bb)


def _part1by2(x):
    """Spread the low 10 bits of x so there are 2 zero bits between each."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def coherence_key(origin, direction, bb_lo, bb_hi):
    """Sort key grouping rays that start near each other and point the same way.

    Layout (high→low): 3-bit direction octant | 18-bit origin Morton | 9-bit
    direction Morton. This is the TPU analogue of the reference's work-queue
    keeping threads busy on nearby buckets (work-queue.hpp:13-61): the blocked
    traversal is only efficient when the rays of a block share a tight frustum.
    The direction bits matter for pinhole camera rays, whose origins are all
    identical — without them a block's frustum spans the whole view. Parked dead
    rays (origin ~2e30) clip to the far corner and sort to the tail, so whole
    blocks of dead lanes prune in one step.
    """
    octant = (
        (direction[:, 0] < 0).astype(jnp.uint32)
        + 2 * (direction[:, 1] < 0).astype(jnp.uint32)
        + 4 * (direction[:, 2] < 0).astype(jnp.uint32)
    )
    q = jnp.clip((origin - bb_lo) / jnp.maximum(bb_hi - bb_lo, 1e-30), 0.0, 1.0)
    cell = (q * 63.0).astype(jnp.uint32)              # 6 bits/axis
    om = (
        _part1by2(cell[:, 0])
        | (_part1by2(cell[:, 1]) << 1)
        | (_part1by2(cell[:, 2]) << 2)
    )
    qd = jnp.clip((direction + 1.0) * 0.5, 0.0, 1.0)
    dcell = (qd * 7.0).astype(jnp.uint32)             # 3 bits/axis
    dm = (
        _part1by2(dcell[:, 0])
        | (_part1by2(dcell[:, 1]) << 1)
        | (_part1by2(dcell[:, 2]) << 2)
    )
    return ((octant << 27) | (om << 9) | dm).astype(jnp.int32)


def _ray_features(o, d):
    """(..., 3) origin/direction -> (..., 10) feature vector [d, o, d x o, 1]."""
    cr = jnp.cross(d, o)
    one = jnp.ones(o.shape[:-1] + (1,), o.dtype)
    return jnp.concatenate([d, o, cr, one], axis=-1)


def intersect_cluster(feat_c, tri_id_c, rayF, o, d, best_t, best_id, best_u, best_v,
                      precision=jax.lax.Precision.HIGHEST):
    """Dense MXU intersection of (B,K) rays against their block's cluster.

    feat_c: (B, 10, 4S); tri_id_c: (B, S); rayF: (B, K, 10). Updates and returns
    the per-ray best hit.

    Precision: the TPU default computes f32 matmuls with single-pass bf16
    (~2e-3 rel error), which corrupts t enough to visibly shift hit points.
    HIGHEST (bf16x6) recovers f32 accuracy; with cluster-local coordinates
    (small magnitudes) the winner then matches the exact refinement pass.
    """
    S = tri_id_c.shape[-1]
    out = jnp.einsum(
        "bkf,bfn->bkn", rayF, feat_c,
        preferred_element_type=jnp.float32, precision=precision,
    )
    B, K = rayF.shape[0], rayF.shape[1]
    out = out.reshape(B, K, 4, S)
    det = out[:, :, 0, :]
    udet = out[:, :, 1, :]
    vdet = out[:, :, 2, :]
    tdet = out[:, :, 3, :]
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    u = udet * inv_det
    v = vdet * inv_det
    t = tdet * inv_det
    pad = (tri_id_c < 0)[:, None, :]
    valid = (
        (det != 0.0) & ~pad
        & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0) & (u + v <= 1.0)
        & (t > 0.0) & (t < best_t[..., None])
    )
    t_m = jnp.where(valid, t, jnp.inf)
    tbest = jnp.min(t_m, axis=-1)                       # (B,K)
    improved = jnp.isfinite(tbest)
    # one-hot select of the winner (first minimum)
    is_best = (t_m == tbest[..., None]) & valid
    first_best = is_best & (jnp.cumsum(is_best, axis=-1) == 1)
    sel = lambda x: jnp.sum(jnp.where(first_best, x, 0.0), axis=-1)
    sel_i = lambda x: jnp.sum(jnp.where(first_best, x, 0), axis=-1)
    new_t = jnp.where(improved, tbest, best_t)
    win_id = sel_i(jnp.broadcast_to(tri_id_c[:, None, :], valid.shape)).astype(best_id.dtype)
    new_id = jnp.where(improved, win_id, best_id)
    new_u = jnp.where(improved, sel(u), best_u)
    new_v = jnp.where(improved, sel(v), best_v)
    return new_t, new_id, new_u, new_v


def intersect_clusters_multi(feat_c, tri_id_c, rayF, best_t, best_id, best_u, best_v,
                             precision=jax.lax.Precision.HIGHEST):
    """Dense MXU intersection of (B,K) rays against G clusters per block at once.

    feat_c: (B, G, 10, 4S); tri_id_c: (B, G, S); rayF: (B, G, K, 10) — each
    cluster keeps its own local-coordinate ray features (the bilinear forms are
    built relative to per-cluster centers). One batched einsum covers all G
    clusters, so the best-first round loop amortizes its fixed per-iteration
    runtime cost over G MXU dispatches (round-4 diagnostic: ~77 rounds x ~30 us
    fixed cost dominated the render; G-wide rounds divide that by G).
    """
    B, G, _, S4 = feat_c.shape
    S = S4 // 4
    K = rayF.shape[2]
    out = jnp.einsum(
        "bgkf,bgfn->bkgn", rayF, feat_c,
        preferred_element_type=jnp.float32, precision=precision,
    )
    out = out.reshape(B, K, G, 4, S)
    det = out[:, :, :, 0, :].reshape(B, K, G * S)
    udet = out[:, :, :, 1, :].reshape(B, K, G * S)
    vdet = out[:, :, :, 2, :].reshape(B, K, G * S)
    tdet = out[:, :, :, 3, :].reshape(B, K, G * S)
    tri_flat = tri_id_c.reshape(B, G * S)
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    u = udet * inv_det
    v = vdet * inv_det
    t = tdet * inv_det
    pad = (tri_flat < 0)[:, None, :]
    valid = (
        (det != 0.0) & ~pad
        & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0) & (u + v <= 1.0)
        & (t > 0.0) & (t < best_t[..., None])
    )
    t_m = jnp.where(valid, t, jnp.inf)
    tbest = jnp.min(t_m, axis=-1)                       # (B,K)
    improved = jnp.isfinite(tbest)
    is_best = (t_m == tbest[..., None]) & valid
    first_best = is_best & (jnp.cumsum(is_best, axis=-1) == 1)
    sel = lambda x: jnp.sum(jnp.where(first_best, x, 0.0), axis=-1)
    sel_i = lambda x: jnp.sum(jnp.where(first_best, x, 0), axis=-1)
    new_t = jnp.where(improved, tbest, best_t)
    win_id = sel_i(jnp.broadcast_to(tri_flat[:, None, :], valid.shape)).astype(best_id.dtype)
    new_id = jnp.where(improved, win_id, best_id)
    new_u = jnp.where(improved, sel(u), best_u)
    new_v = jnp.where(improved, sel(v), best_v)
    return new_t, new_id, new_u, new_v


def traverse_walk(cbvh: ClusterBVH, origin, direction, block: int = 256, max_steps: int = 200_000):
    """Block-synchronous while-while traversal of the cluster tree.

    Returns per-ray (t, tri_id, u, v, steps), tri_id = -1 on miss; steps is an
    int32 (2,) vector [walk_steps, leaf_rounds]: total node-walk iterations
    summed over all inner while_loops, and outer body iterations (each body runs
    one (B,K,10)@(B,10,4S) MXU dispatch — the number that sizes the dense-FLOP
    budget for MFU estimates). On-device diagnostics for attributing traversal
    cost / runaway loops without host-side bisection.
    """
    dtype = origin.dtype
    R = origin.shape[0]
    n_nodes = cbvh.skip.shape[0]
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

    ib0 = (o[:, 0, 0] * 0).astype(jnp.int32)

    def walk(node, best_t):
        """Advance every block to its next hit leaf (or off the tree)."""

        def w_cond(carry):
            node, at_leaf, steps = carry
            return jnp.any(~at_leaf & (node < n_nodes)) & (steps < max_steps)

        def w_body(carry):
            node, at_leaf, steps = carry
            nd = jnp.minimum(node, n_nodes - 1)
            nb_min = cbvh.bb_min[nd][:, None, :]
            nb_max = cbvh.bb_max[nd][:, None, :]
            t1 = (nb_min - o) * inv_d
            t2 = (nb_max - o) * inv_d
            t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)
            t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
            box_hit = (t_near <= t_far) & (t_far >= 0.0) & (t_near < best_t)
            any_hit = jnp.any(box_hit, axis=-1)
            is_leaf = cbvh.node_cluster[nd] >= 0
            active = ~at_leaf & (node < n_nodes)
            stop = active & any_hit & is_leaf
            nxt = jnp.where(any_hit & ~is_leaf, nd + 1, cbvh.skip[nd])
            node = jnp.where(active & ~stop, nxt, node)
            return node, at_leaf | stop, steps + 1

        node, at_leaf, steps = jax.lax.while_loop(
            w_cond, w_body, (node, ib0 != 0, jnp.asarray(0, jnp.int32))
        )
        return node, at_leaf, steps

    class St(NamedTuple):
        node: jnp.ndarray
        at_leaf: jnp.ndarray
        steps: jnp.ndarray
        rounds: jnp.ndarray
        best_t: jnp.ndarray
        best_id: jnp.ndarray
        best_u: jnp.ndarray
        best_v: jnp.ndarray

    def cond(st: St):
        return jnp.any(st.at_leaf)

    def body(st: St):
        nd = jnp.minimum(st.node, n_nodes - 1)
        cl = jnp.maximum(cbvh.node_cluster[nd], 0)
        feat_c = cbvh.feat[cl]          # (B, 10, 4S)
        tri_c = jnp.where(st.at_leaf[:, None], cbvh.tri_id[cl], -1)
        # Translate rays into cluster-local coordinates (f32 precision).
        o_local = o - cbvh.center[cl][:, None, :]
        rayF_local = _ray_features(o_local, d)
        bt, bid, bu, bv = intersect_cluster(
            feat_c, tri_c, rayF_local, o, d, st.best_t, st.best_id, st.best_u, st.best_v,
        )
        node = jnp.where(st.at_leaf, cbvh.skip[nd], st.node)
        node, at_leaf, steps = walk(node, bt)
        return St(node, at_leaf, st.steps + steps, st.rounds + 1, bt, bid, bu, bv)

    node0, at_leaf0, steps0 = walk(ib0, o[..., 0] * 0 + big)
    init = St(
        node=node0,
        at_leaf=at_leaf0,
        steps=steps0,
        rounds=jnp.asarray(0, jnp.int32),
        best_t=o[..., 0] * 0 + big,
        best_id=(o[..., 0] * 0).astype(jnp.int32) - 1,
        best_u=o[..., 0] * 0,
        best_v=o[..., 0] * 0,
    )
    final = jax.lax.while_loop(cond, body, init)
    flat = lambda x: x.reshape(-1)[:R]
    return (
        flat(final.best_t), flat(final.best_id), flat(final.best_u),
        flat(final.best_v), jnp.stack([final.steps, final.rounds]),
    )


def traverse_bestfirst(cbvh: ClusterBVH, origin, direction, block: int = 256,
                       group: int = 8):
    """Dense-cull best-first traversal: few fat iterations, no tree walk.

    The reference's per-ray priority-queue traversal (bvh.cpp:80-129) visits
    leaves nearest-first with pruning. This is the same strategy vectorized per
    block of K coherent rays, shaped for a runtime where loop iterations and
    gathers carry multi-microsecond fixed costs (axon/TPU, measured round 4):

      1. CULL: one dense conservative slab test of every block frustum (interval
         arithmetic over the block's origin/direction bounds) against every
         cluster AABB -> a (B, C) hit mask + entry-distance lower bound. No loop.
      2. ORDER: lax.sort the (B, C) candidates by entry bound (best-first).
      3. ROUNDS: one while_loop over candidate ranks; each iteration gathers the
         rank-r cluster of every block with an exact one-hot MXU matmul (3 bf16
         passes) and runs the dense Moller-Trumbore einsum. A block stops
         contributing when its next candidate's entry bound exceeds the block's
         worst best-t (per-ray pruning happens inside intersect_cluster).

    Iteration count = max over blocks of surviving candidates (typically 5-30
    for coherence-sorted rays) vs ~2000 tree-walk steps for the same workload.
    Returns per-ray (t, tri_id, u, v, steps) with steps = [candidates, rounds].
    """
    dtype = origin.dtype
    R = origin.shape[0]
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    K = min(block, R)
    pad = (-R) % K
    if pad:
        origin = jnp.concatenate([origin, jnp.broadcast_to(origin[-1:], (pad, 3))], axis=0)
        direction = jnp.concatenate([direction, jnp.broadcast_to(direction[-1:], (pad, 3))], axis=0)
    B = origin.shape[0] // K
    o = origin.reshape(B, K, 3)
    d = direction.reshape(B, K, 3)

    C, S = cbvh.tri_id.shape
    F = 40 * S  # feat columns in the combined value table

    # ---- 1. exact per-ray slab test vs every cluster AABB, tiled over C ----
    # A block-interval (frustum) version of this test was tried first and is
    # uselessly loose for shadow rays: the slab product's interval width is
    # |offset| * direction_spread, so at distance ~60 a 0.07-wide direction cone
    # passed ~700 of 826 clusters where the exact per-ray union is ~8 (round-4
    # forensics). The exact test is pure dense VPU math — B*K*C*3 lanes, tiled
    # so only a (B,K,CT) slice is ever live — and reduces per block to
    # "any ray hits" + the block's nearest entry distance, which is all the
    # round loop needs. Parked lanes (origin ~2e30, dead rays) produce t_near
    # ~ -3e30 < 0 with t_far < 0 -> no hit, so they cull themselves exactly.
    inv_d = 1.0 / d
    CT = min(128, C)
    n_tiles = -(-C // CT)
    Cpad = n_tiles * CT
    pad_box = np.full((1, 3), np.inf, np.float32)
    cl_lo = jnp.concatenate(
        [cbvh.cl_bb_min] + [jnp.asarray(pad_box, dtype)] * (Cpad - C), axis=0
    ) if Cpad > C else cbvh.cl_bb_min
    cl_hi = jnp.concatenate(
        [cbvh.cl_bb_max] + [jnp.asarray(pad_box, dtype)] * (Cpad - C), axis=0
    ) if Cpad > C else cbvh.cl_bb_max

    def cull_tile(i, carry):
        hit_acc, tmin_acc = carry                      # (B,Cpad) bool / f32
        lo = jax.lax.dynamic_slice_in_dim(cl_lo, i * CT, CT, 0)   # (CT,3)
        hi = jax.lax.dynamic_slice_in_dim(cl_hi, i * CT, CT, 0)
        # (lo - o) * inv_d — NOT lo*inv_d - o*inv_d: with an axis-aligned ray
        # (d component 0, inv_d = inf) the latter is inf - inf = NaN and every
        # comparison goes false, silently culling every cluster (round-4 bug
        # caught by the 2M-triangle height-field test).
        t1 = (lo[None, None, :, :] - o[:, :, None, :]) * inv_d[:, :, None, :]
        t2 = (hi[None, None, :, :] - o[:, :, None, :]) * inv_d[:, :, None, :]
        tn = jnp.max(jnp.minimum(t1, t2), axis=-1)     # (B,K,CT)
        tf = jnp.min(jnp.maximum(t1, t2), axis=-1)
        h = (tn <= tf) & (tf >= 0.0)
        in_range = (i * CT + jnp.arange(CT, dtype=jnp.int32)) < C
        h = h & in_range[None, None, :]
        any_h = jnp.any(h, axis=1)                     # (B,CT)
        tn_min = jnp.min(jnp.where(h, tn, big), axis=1)
        hit_acc = jax.lax.dynamic_update_slice_in_dim(hit_acc, any_h, i * CT, 1)
        tmin_acc = jax.lax.dynamic_update_slice_in_dim(tmin_acc, tn_min, i * CT, 1)
        return hit_acc, tmin_acc

    # Derive the cull carry from the (possibly device-varying) ray data so the
    # fori_loop carry types are consistent under shard_map (scan-vma rule).
    vz = o[:, 0, 0] * 0.0                                   # (B,) varying zeros
    hit0 = (vz[:, None] + jnp.zeros((1, Cpad), dtype)) > 1.0
    tmin0 = vz[:, None] + jnp.full((1, Cpad), big, dtype)
    hit, t_near_lb = jax.lax.fori_loop(0, n_tiles, cull_tile, (hit0, tmin0))
    hit = hit[:, :C]
    t_near_lb = t_near_lb[:, :C]
    n_candidates = jnp.sum(hit.astype(jnp.int32))
    parked = jnp.max(jnp.abs(o), axis=-1) > jnp.asarray(1e28, dtype)   # (B,K)

    # ---- 2. best-first order (sort keys + ids together: no gathers) ----
    key = jnp.where(hit, t_near_lb, big)
    ids = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None, :], (B, C))
    key_s, ids_s = jax.lax.sort((key, ids), dimension=1, num_keys=1)
    # G-wide rounds: pad the candidate lists to a multiple of G with non-hits so
    # every round can slice a full (G, B) panel.
    G = max(1, min(group, C))
    Cr = -(-C // G) * G
    if Cr > C:
        key_s = jnp.concatenate(
            [key_s, jnp.full((B, Cr - C), big, dtype)], axis=1)
        ids_s = jnp.concatenate(
            [ids_s, jnp.zeros((B, Cr - C), jnp.int32)], axis=1)
    key_t = key_s.T                                   # (Cr,B): G-row slice per round
    ids_t = ids_s.T

    iota_c = jnp.arange(C, dtype=jnp.int32)

    class St(NamedTuple):
        r: jnp.ndarray
        best_t: jnp.ndarray
        best_id: jnp.ndarray
        best_u: jnp.ndarray
        best_v: jnp.ndarray

    def round_inputs(st: St):
        tlb = jax.lax.dynamic_slice_in_dim(key_t, st.r, G, 0).T    # (B,G)
        cl = jax.lax.dynamic_slice_in_dim(ids_t, st.r, G, 0).T     # (B,G)
        # Parked lanes never find a hit; exclude their +inf best_t from the
        # block's pruning demand or no block with a parked lane would ever stop.
        demand = jnp.max(jnp.where(parked, 0.0, st.best_t), axis=1)
        active = tlb < demand[:, None]                             # (B,G)
        return cl, active

    def cond(st: St):
        _, active = round_inputs(st)
        return (st.r < Cr) & jnp.any(active)

    def body(st: St):
        cl, active = round_inputs(st)
        if cbvh.val0 is not None:
            # Exact one-hot MXU gather: 3 bf16 passes reconstruct f32.
            oh = (cl.reshape(B * G)[:, None] == iota_c[None, :]).astype(jnp.bfloat16)
            mm = lambda v: jax.lax.dot_general(
                oh, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            val = mm(cbvh.val0) + mm(cbvh.val1) + mm(cbvh.val2)
            feat_c = val[:, :F].reshape(B, G, 10, 4 * S).astype(dtype)
            tri_c = jnp.round(val[:, F : F + S]).astype(jnp.int32).reshape(B, G, S)
            center_c = val[:, F + S :].astype(dtype).reshape(B, G, 3)
        else:
            feat_c = cbvh.feat[cl]          # (B,G,10,4S)
            tri_c = cbvh.tri_id[cl]         # (B,G,S)
            center_c = cbvh.center[cl]      # (B,G,3)
        tri_c = jnp.where(active[:, :, None], tri_c, -1)
        o_local = o[:, None, :, :] - center_c[:, :, None, :]       # (B,G,K,3)
        d_b = jnp.broadcast_to(d[:, None, :, :], o_local.shape)
        rayF_local = _ray_features(o_local, d_b)                   # (B,G,K,10)
        bt, bid, bu, bv = intersect_clusters_multi(
            feat_c, tri_c, rayF_local, st.best_t, st.best_id, st.best_u, st.best_v,
        )
        return St(st.r + G, bt, bid, bu, bv)

    init = St(
        r=jnp.asarray(0, jnp.int32),
        best_t=o[..., 0] * 0 + big,
        best_id=(o[..., 0] * 0).astype(jnp.int32) - 1,
        best_u=o[..., 0] * 0,
        best_v=o[..., 0] * 0,
    )
    final = jax.lax.while_loop(cond, body, init)
    flat = lambda x: x.reshape(-1)[:R]
    return (
        flat(final.best_t), flat(final.best_id), flat(final.best_u),
        flat(final.best_v), jnp.stack([n_candidates, final.r // G]),
    )


# The Pallas kernel keeps the (K, Lc) per-(ray-block, cluster) entry-distance
# matrix in VMEM for exact per-ray pruning; beyond this cluster count it would
# not fit (256 sublanes * Lc * 4 B; 6144 -> 6 MB of ~16 MB VMEM). Larger scenes
# fall back to the XLA best-first formulation.
_PALLAS_MAX_CLUSTERS = 6144


def _pallas_available(cbvh: ClusterBVH) -> bool:
    """Pallas traversal runs on real TPU backends with f32 tables."""
    import os

    if cbvh.rec is None or os.environ.get("MCRT_NO_PALLAS"):
        return False
    if cbvh.cl_bb.shape[1] > _PALLAS_MAX_CLUSTERS:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def traverse(cbvh: ClusterBVH, origin, direction, block: int = 256, method: str = "bestfirst",
             group: int = 8):
    if method == "walk":
        return traverse_walk(cbvh, origin, direction, block)
    if method == "pallas":
        from .traverse_kernel import traverse_pallas

        return traverse_pallas(cbvh, origin, direction, block)
    return traverse_bestfirst(cbvh, origin, direction, block, group=group)


def make_intersect_fn(
    tables: SceneTables, meta: SceneMeta, cbvh: ClusterBVH, block: int = 256,
    sort_rays: bool = True, method: str | None = None, group: int = 8,
):
    """Scene intersect closure: cluster BVH for triangles + brute spheres/quadrics.

    The block-synchronous tree walk is the production traversal; with
    coherence-sorted rays it measures 267-420 M rays/s on v5e (chunk 2^16-2^17,
    tools/tpu_probe.py). A flat cull-and-sweep alternative was prototyped in
    round 2 and measured 10,000x slower (0.02 M rays/s) — deleted in round 3.

    sort_rays: group rays into coherent blocks for the tree walk by Morton/octant
    key INSIDE this wrapper — permute only (origin, direction) in, scatter the 4
    hit fields back out. Round 3 instead permuted the whole ~22-array bounce
    carry every bounce inside the integrator loop, whose temporary footprint
    faulted the v5e chip at 2^18-ray dispatches (see README fault table); this
    formulation keeps the carry in lane order and cured that fault (round 4,
    tools/fault_probe.py: 2^18/2^19 now pass).

    method: None selects automatically — the fused Pallas kernel on TPU backends
    (traverse_kernel.py), the XLA best-first formulation elsewhere.
    """
    if method is None:
        method = "pallas" if _pallas_available(cbvh) else "bestfirst"

    from .intersect import build_geo_pack, refine_tri_hit

    # Loop-invariant: built once when the closure is traced (make_intersect_fn
    # is called outside the bounce loop), not per bounce iteration.
    geo_pack = build_geo_pack(tables) if meta.n_tris else None

    def intersect(origin, direction):
        dtype = origin.dtype
        big = jnp.asarray(jnp.finfo(dtype).max, dtype)
        # The traversal is DISCRETE (which triangle wins) — its while_loop is not
        # reverse-differentiable and must not be: gradients flow through
        # refine_tri_hit below, which re-evaluates the winning triangle's (t,u,v)
        # differentiably from the real (origin, direction). Detach the loop.
        sg_o = jax.lax.stop_gradient(origin)
        sg_d = jax.lax.stop_gradient(direction)
        if sort_rays:
            key = coherence_key(sg_o, sg_d, cbvh.bb_min[0], cbvh.bb_max[0])
            perm = jnp.argsort(key)
            # ONE packed 6-wide gather for the permute (o|d) and ONE packed
            # 4-wide gather for the unsort: TPU gather cost is per row, not per
            # element, and the 8 narrow gathers this replaces were ~0.5 ms each
            # per 2^16 rays (round-5 trace, ~4 ms/bounce).
            od = jnp.concatenate([sg_o, sg_d], axis=1)[perm]
            t_s, id_s, u_s, v_s, steps = traverse(
                cbvh, od[:, 0:3], od[:, 3:6], block, method=method, group=group
            )
            # Unsort with a gather through the inverse permutation (argsort of
            # argsort) — NOT a scatter: a scatter inside the bounce while_loop
            # trips an XLA TPU codegen cliff (12 s/dispatch at 2^16, round 4).
            inv = jnp.argsort(perm)
            # ids ride as exact float VALUES (all ids < 2^24, -1 = miss). NOT a
            # bitcast: small int bit patterns are f32 subnormals, which the TPU
            # VPU flushes to zero in the fused select/copy chain (verified:
            # bitcast version renders black on v5e, value version is exact).
            id_f = id_s.astype(dtype)
            unid = lambda x: jnp.where(x < 0, -1, (x + 0.5).astype(jnp.int32))
            packed = jnp.stack([t_s, id_f, u_s, v_s], axis=1)[inv]
            best_t, best_id, u, v = (
                packed[:, 0], unid(packed[:, 1]), packed[:, 2], packed[:, 3])
        else:
            best_t, best_id, u, v, steps = traverse(
                cbvh, sg_o, sg_d, block, method=method, group=group)
        best_uv = jnp.stack([u, v], axis=-1)
        # Re-evaluate the winner exactly (same gathered-triangle ops as the brute
        # path) so BVH and no-BVH renders produce bitwise-identical hits.
        best_t, best_uv = refine_tri_hit(
            tables, meta, origin, direction, best_t, best_id, best_uv, geo=geo_pack)

        if meta.n_sphs:
            t, valid = intersect_spheres_block(origin, direction, tables.sph_origin, tables.sph_radius)
            t = jnp.where(valid, t, big)
            idx = jnp.argmin(t, axis=-1)
            tt = jnp.min(t, axis=-1)  # == t at idx; avoids a take_along_axis gather
            better = tt < best_t
            best_id = jnp.where(better, idx.astype(jnp.int32) + meta.sphere_offset, best_id)
            best_t = jnp.minimum(best_t, tt)

        if meta.n_quads:
            t, valid = intersect_quadrics_block(origin, direction, tables.quad_Q, tables.quad_bb_min, tables.quad_bb_max)
            t = jnp.where(valid, t, big)
            idx = jnp.argmin(t, axis=-1)
            tt = jnp.min(t, axis=-1)
            better = tt < best_t
            best_id = jnp.where(better, idx.astype(jnp.int32) + meta.quad_offset, best_id)
            best_t = jnp.minimum(best_t, tt)

        return Hit(t=best_t, surf_id=best_id, uv=best_uv, steps=steps)

    return intersect
