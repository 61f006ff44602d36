"""Pallas TPU kernel: fused cull + best-first cluster traversal.

Replaces the XLA formulation (cluster_bvh.traverse_bestfirst) whose einsum
epilogue materialized O(B*K*G*4S) f32 intermediates in HBM every round (~1 GB
per round at chunk 2^16, measured HBM-bandwidth-bound at ~15 ms per 2^16-ray
traversal on v5e; see the round-5 xplane profile: copy.294 / fusion.144/147/148
were the top ops). Here the whole traversal of one K-ray block runs inside a
single Mosaic program:

  1. CULL: slab-test every cluster AABB against the block's rays in (128, K)
     tiles, keeping a per-cluster entry-distance key table in VMEM. No HBM
     intermediates.
  2. ROUNDS: while any unvisited candidate's entry bound is below the block's
     worst live best-t, argmin-select the nearest candidate (exact best-first,
     per-block early exit — no max-over-blocks rounds), DMA its ~24 KB record
     from HBM, run one (4S, 10) @ (10, K) MXU matmul (Moller-Trumbore as
     bilinear forms, reference triangle.cpp:23-63 re-derived), and fold the
     best-hit reduction in-register.

Only the per-ray best hit (4 x (B, K) arrays + a (B, 2) stats row) ever
returns to HBM.

Record layout (built host-side in cluster_bvh._build_pallas_tables):
  rec[c] = (10, 5*Sp) f32: the per-triangle bilinear-form matrix M' with the
  cluster center folded in:   M'[0:3] = M[0:3] - c x M[6:9]   (d rows)
                              M'[9]   = M[9]   - c . M[3:6]   (1 row)
  so F_global @ M' == F_local @ M exactly in real arithmetic (det involves only
  d rows where M[6:9] = 0, so det stays in the cluster-local small-magnitude
  regime; u/v/t pick up global-frame rounding ~1e-5 relative, and the winner is
  re-evaluated exactly by refine_tri_hit downstream). Columns are grouped
  [det | udet | vdet | tdet | tri] x Sp — the fifth group's only nonzero row is
  the constant-1 feature carrying the triangle id as an exact f32 value, so the
  id rides out of the same matmul (-1 = padding).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.4e38  # slightly under f32 max: "no hit" sentinel
PARK_LIMIT = 1e28  # lanes with |origin| beyond this are parked (dead) rays


def _kernel(ft_ref, bb_ref, rec_hbm, t_ref, id_ref, u_ref, v_ref, st_ref,
            tn_ref, vis_ref, buf_ref, sems, *, C: int, Sp: int, K: int):
    """One K-ray block: ft_ref (1, 16, K) ray features, bb_ref (Lc, 8) cluster
    AABBs (cols 0:3 lo, 4:7 hi), rec_hbm (C, 16, 5Sp) in HBM; outputs (1, K).

    Pruning is EXACT per ray: the cull keeps the whole (Lc, K) entry-distance
    matrix in VMEM and every round recomputes each candidate's key as the min
    entry distance over rays it could still beat (tn < that ray's best-t) — as
    best-t tightens, candidates die ray-by-ray, not block-by-block. Candidate
    records are double-buffered: the next argmin is picked and its DMA started
    before the current record is processed, hiding the HBM fetch latency."""
    Lc = bb_ref.shape[0]
    T = Lc // 128
    big = jnp.float32(BIG)

    dx = ft_ref[0, 0:1, :]
    dy = ft_ref[0, 1:2, :]
    dz = ft_ref[0, 2:3, :]
    ox = ft_ref[0, 3:4, :]
    oy = ft_ref[0, 4:5, :]
    oz = ft_ref[0, 5:6, :]
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz

    # ---- 1. cull: per-(cluster, ray) entry distance, big = miss ----
    for ct in range(T):
        sl = slice(ct * 128, (ct + 1) * 128)
        lo_x = bb_ref[sl, 0:1]
        lo_y = bb_ref[sl, 1:2]
        lo_z = bb_ref[sl, 2:3]
        hi_x = bb_ref[sl, 4:5]
        hi_y = bb_ref[sl, 5:6]
        hi_z = bb_ref[sl, 6:7]
        t1x = (lo_x - ox) * inv_dx                             # (128, K)
        t2x = (hi_x - ox) * inv_dx
        t1y = (lo_y - oy) * inv_dy
        t2y = (hi_y - oy) * inv_dy
        t1z = (lo_z - oz) * inv_dz
        t2z = (hi_z - oz) * inv_dz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                         jnp.minimum(t1z, t2z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                         jnp.maximum(t1z, t2z))
        h = (tn <= tf) & (tf >= 0.0)
        tn_ref[sl, :] = jnp.where(h, tn, big)

    row_io = jax.lax.broadcasted_iota(jnp.int32, (Lc, 1), 0)
    vis_ref[:, :] = jnp.where(row_io < C, 0.0, big)
    n_cand = jnp.sum(
        (jnp.min(tn_ref[:, :], axis=1, keepdims=True) + vis_ref[:, :] < big)
        .astype(jnp.int32))

    def argmin_keys(bt):
        # candidate key = min entry distance over rays it could still improve
        beats = tn_ref[:, :] < bt                               # (Lc, K)
        key = jnp.min(jnp.where(beats, tn_ref[:, :], big), axis=1, keepdims=True)
        key = jnp.maximum(key, vis_ref[:, :])                   # visited -> big
        kmin = jnp.min(key)
        cl = jnp.min(jnp.where(key == kmin, row_io, Lc))
        return kmin, cl

    def start_fetch(slot, cl):
        pltpu.make_async_copy(rec_hbm.at[cl], buf_ref.at[slot], sems.at[slot]).start()

    bt0 = jnp.full((1, K), big, jnp.float32)
    kmin0, cl0 = argmin_keys(bt0)
    vis_ref[:, :] = jnp.where(row_io == cl0, big, vis_ref[:, :])

    @pl.when(kmin0 < big)
    def _():
        start_fetch(0, cl0)

    rowS = jax.lax.broadcasted_iota(jnp.int32, (Sp, K), 0)

    def cond(carry):
        r, kmin, cl, bt, bid, bu, bv = carry
        return (r < C) & (kmin < big)

    def body(carry):
        r, kmin, cl, bt, bid, bu, bv = carry
        slot = jax.lax.rem(r, jnp.int32(2))
        # Pick + prefetch the NEXT candidate before processing the current one.
        nkmin, ncl = argmin_keys(bt)
        vis_ref[:, :] = jnp.where(row_io == ncl, big, vis_ref[:, :])

        @pl.when(nkmin < big)
        def _():
            start_fetch(1 - slot, ncl)

        pltpu.make_async_copy(rec_hbm.at[cl], buf_ref.at[slot], sems.at[slot]).wait()
        out = jax.lax.dot_general(
            buf_ref[slot], ft_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                       # (5Sp, K)
        det = out[0 * Sp:1 * Sp, :]
        udet = out[1 * Sp:2 * Sp, :]
        vdet = out[2 * Sp:3 * Sp, :]
        tdet = out[3 * Sp:4 * Sp, :]
        tri_f = out[4 * Sp:5 * Sp, :]                           # (Sp, K) exact ids
        inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
        u = udet * inv_det
        v = vdet * inv_det
        t = tdet * inv_det
        valid = (
            (det != 0.0) & (tri_f >= 0.0)
            & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0) & (u + v <= 1.0)
            & (t > 0.0) & (t < bt)
        )                                                       # (Sp, K)
        t_m = jnp.where(valid, t, big)
        tbest = jnp.min(t_m, axis=0, keepdims=True)             # (1, K)
        improved = tbest < big
        sel = (t_m == tbest) & valid
        first = sel & (rowS == jnp.min(jnp.where(sel, rowS, Sp), axis=0, keepdims=True))
        pick = lambda x: jnp.sum(jnp.where(first, x, 0.0), axis=0, keepdims=True)
        win_id = pick(tri_f) + 0.5                              # round-to-int below
        bt = jnp.where(improved, tbest, bt)
        bid = jnp.where(improved, win_id.astype(jnp.int32), bid)
        bu = jnp.where(improved, pick(u), bu)
        bv = jnp.where(improved, pick(v), bv)
        return r + 1, nkmin, ncl, bt, bid, bu, bv

    init = (
        jnp.int32(0), kmin0, cl0,
        bt0,
        jnp.full((1, K), -1, jnp.int32),
        jnp.zeros((1, K), jnp.float32),
        jnp.zeros((1, K), jnp.float32),
    )
    r_fin, kmin_x, _, bt, bid, bu, bv = jax.lax.while_loop(cond, body, init)

    # Drain the last prefetched record (started in the final body iteration, or
    # the pre-loop fetch if the loop never ran) so no DMA outlives the kernel.
    @pl.when(kmin_x < big)
    def _():
        pltpu.make_async_copy(
            rec_hbm.at[0], buf_ref.at[jax.lax.rem(r_fin, jnp.int32(2))],
            sems.at[jax.lax.rem(r_fin, jnp.int32(2))]).wait()

    t_ref[0, :, :] = bt
    id_ref[0, :, :] = bid
    u_ref[0, :, :] = bu
    v_ref[0, :, :] = bv
    st_ref[0, 0, 0] = n_cand
    st_ref[0, 0, 1] = r_fin


@functools.partial(jax.jit, static_argnums=(3, 4))
def _run(rec, cl_bb, ft, C: int, interpret: bool):
    B, _, K = ft.shape
    Lc = cl_bb.shape[0]
    Sp = rec.shape[2] // 5
    grid = (B,)
    kern = functools.partial(_kernel, C=C, Sp=Sp, K=K)
    t, tid, u, v, st = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 16, K), lambda b: (b, 0, 0)),
            pl.BlockSpec((Lc, 8), lambda b: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, 2), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, K), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, K), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, K), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, K), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 2), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Lc, K), jnp.float32),
            pltpu.VMEM((Lc, 1), jnp.float32),
            pltpu.VMEM((2, 16, rec.shape[2]), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(ft, cl_bb, rec)
    return t, tid, u, v, st


def traverse_pallas(cbvh, origin, direction, block: int = 256, interpret: bool = False):
    """Drop-in for cluster_bvh.traverse_bestfirst on TPU: per-ray
    (t, tri_id, u, v, steps[candidates, rounds]).  Requires cbvh.rec/cl_bb
    (built for f32 tables by upload_cluster_bvh)."""
    R = origin.shape[0]
    K = min(block, R)
    pad = (-R) % K
    if pad:
        origin = jnp.concatenate([origin, jnp.broadcast_to(origin[-1:], (pad, 3))], axis=0)
        direction = jnp.concatenate([direction, jnp.broadcast_to(direction[-1:], (pad, 3))], axis=0)
    B = origin.shape[0] // K
    o = origin.reshape(B, K, 3)
    d = direction.reshape(B, K, 3)
    cr = jnp.cross(d, o)
    ones = jnp.ones((B, K, 1), origin.dtype)
    zeros6 = jnp.zeros((B, K, 6), origin.dtype)
    F = jnp.concatenate([d, o, cr, ones, zeros6], axis=-1)  # (B, K, 16)
    ft = F.transpose(0, 2, 1).astype(jnp.float32)           # (B, 16, K)
    C = cbvh.rec.shape[0]
    t, tid, u, v, st = _run(cbvh.rec, cbvh.cl_bb, ft, C, interpret)
    flat = lambda x: x.reshape(-1)[:R]
    steps = jnp.stack([jnp.sum(st[:, 0, 0]), jnp.max(st[:, 0, 1])])
    return (flat(t).astype(origin.dtype), flat(tid),
            flat(u).astype(origin.dtype), flat(v).astype(origin.dtype), steps)
