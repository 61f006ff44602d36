"""Pallas TPU kernel: fused cull + best-first cluster traversal.

Replaces the XLA formulation (cluster_bvh.traverse_bestfirst) whose einsum
epilogue materialized O(B*K*G*4S) f32 intermediates in HBM every round (~1 GB
per round at chunk 2^16, measured HBM-bandwidth-bound at ~15 ms per 2^16-ray
traversal on v5e). Here the whole traversal of one K-ray block runs inside a
single Mosaic program:

  1. CULL: slab-test every cluster AABB against the block's rays in (K, 128)
     tiles — rays on sublanes, clusters on lanes — keeping the whole (K, Lc)
     entry-distance matrix in VMEM. No HBM intermediates.
  2. ROUNDS: while any unvisited candidate could still beat some ray's best-t
     (EXACT per-ray pruning: candidate keys are recomputed from the entry
     matrix against the current per-ray best-t every round), argmin-select the
     nearest candidate, DMA its record from HBM (double-buffered: the next
     candidate's fetch is started before the current record is processed), run
     one (K, 16) @ (16, 5Sp) MXU matmul (Moller-Trumbore as bilinear forms,
     reference triangle.cpp:23-63 re-derived), and fold the best-hit reduction
     in-register.

Every tensor keeps rays on SUBLANES and clusters/forms on LANES, so the (1, Lc)
key vectors, the (K, 1) per-ray carries, and the (B, K, 1) outputs are all
lane- or sublane-native — no transposes, and no 128x memory blow-up from
single-lane columns (which previously capped the cluster count at 4096).

Record layout (built host-side in cluster_bvh._build_pallas_tables):
  rec[c] = (16, 5*Sp) f32 (rows 10:16 zero padding): the per-triangle
  bilinear-form matrix M' with the cluster center folded in:
      M'[0:3] = M[0:3] - c x M[6:9]   (d rows)
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
            tn_ref, buf_ref, sems, *, C: int, Sp: int, K: int):
    """One K-ray block. ft_ref (1, K, 16) ray features [d|o|dxo|1|0...], bb_ref
    (8, Lc) cluster AABBs (rows 0:3 lo, 4:7 hi, lane-major), rec_hbm
    (C, 16, 5Sp) in HBM; outputs (1, K, 1) + stats (1, 1, 2) SMEM."""
    Lc = bb_ref.shape[1]
    T = Lc // 128
    big = jnp.float32(BIG)

    ft = ft_ref[0]                                             # (K, 16)
    dx = ft[:, 0:1]
    dy = ft[:, 1:2]
    dz = ft[:, 2:3]
    ox = ft[:, 3:4]
    oy = ft[:, 4:5]
    oz = ft[:, 5:6]
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz

    # ---- 1. cull: per-(ray, cluster) entry distance, big = miss ----
    for ct in range(T):
        sl = slice(ct * 128, (ct + 1) * 128)
        lo_x = bb_ref[0:1, sl]                                 # (1, 128)
        lo_y = bb_ref[1:2, sl]
        lo_z = bb_ref[2:3, sl]
        hi_x = bb_ref[4:5, sl]
        hi_y = bb_ref[5:6, sl]
        hi_z = bb_ref[6:7, sl]
        t1x = (lo_x - ox) * inv_dx                             # (K, 128)
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
        tn_ref[:, sl] = jnp.where(h, tn, big)

    lane_io = jax.lax.broadcasted_iota(jnp.int32, (1, Lc), 1)
    # Mask the padded cluster rows (>= C) once.
    tn_ref[:, :] = jnp.where(lane_io < C, tn_ref[:, :], big)
    n_cand = jnp.sum(
        (jnp.min(tn_ref[:, :], axis=0, keepdims=True) < big).astype(jnp.int32))

    def argmin_keys(bt, vis):
        # candidate key = min entry distance over rays it could still improve;
        # vis (1, Lc) is big for visited/padded candidates (a carried value —
        # dynamic single-lane VMEM writes would need 128-alignment Mosaic can't
        # prove, so visited state lives in registers, not in tn_ref).
        beats = tn_ref[:, :] < bt                               # (K, Lc)
        key = jnp.min(jnp.where(beats, tn_ref[:, :], big), axis=0, keepdims=True)
        key = jnp.maximum(key, vis)
        kmin = jnp.min(key)
        cl = jnp.min(jnp.where(key == kmin, lane_io, Lc))
        return kmin, cl

    def start_fetch(slot, cl):
        pltpu.make_async_copy(rec_hbm.at[cl], buf_ref.at[slot], sems.at[slot]).start()

    bt0 = jnp.full((K, 1), big, jnp.float32)
    vis0 = jnp.where(lane_io < C, 0.0, big)
    kmin0, cl0 = argmin_keys(bt0, vis0)
    vis0 = jnp.where(lane_io == cl0, big, vis0)

    @pl.when(kmin0 < big)
    def _():
        start_fetch(0, cl0)

    lane_sp = jax.lax.broadcasted_iota(jnp.int32, (K, Sp), 1)

    def cond(carry):
        r, kmin, cl, vis, bt, bid, bu, bv = carry
        return (r < C) & (kmin < big)

    def body(carry):
        r, kmin, cl, vis, bt, bid, bu, bv = carry
        slot = jax.lax.rem(r, jnp.int32(2))
        # Pick + prefetch the NEXT candidate before processing the current one.
        nkmin, ncl = argmin_keys(bt, vis)
        vis = jnp.where(lane_io == ncl, big, vis)

        @pl.when(nkmin < big)
        def _():
            start_fetch(1 - slot, ncl)

        pltpu.make_async_copy(rec_hbm.at[cl], buf_ref.at[slot], sems.at[slot]).wait()
        out = jax.lax.dot_general(
            ft, buf_ref[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                       # (K, 5Sp)
        det = out[:, 0 * Sp:1 * Sp]
        udet = out[:, 1 * Sp:2 * Sp]
        vdet = out[:, 2 * Sp:3 * Sp]
        tdet = out[:, 3 * Sp:4 * Sp]
        tri_f = out[:, 4 * Sp:5 * Sp]                           # (K, Sp) exact ids
        inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
        u = udet * inv_det
        v = vdet * inv_det
        t = tdet * inv_det
        valid = (
            (det != 0.0) & (tri_f >= 0.0)
            & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0) & (u + v <= 1.0)
            & (t > 0.0) & (t < bt)
        )                                                       # (K, Sp)
        t_m = jnp.where(valid, t, big)
        tbest = jnp.min(t_m, axis=1, keepdims=True)             # (K, 1)
        improved = tbest < big
        sel = (t_m == tbest) & valid
        first = sel & (lane_sp == jnp.min(jnp.where(sel, lane_sp, Sp), axis=1, keepdims=True))
        pick = lambda x: jnp.sum(jnp.where(first, x, 0.0), axis=1, keepdims=True)
        win_id = pick(tri_f) + 0.5                              # round-to-int below
        bt = jnp.where(improved, tbest, bt)
        bid = jnp.where(improved, win_id.astype(jnp.int32), bid)
        bu = jnp.where(improved, pick(u), bu)
        bv = jnp.where(improved, pick(v), bv)
        return r + 1, nkmin, ncl, vis, bt, bid, bu, bv

    init = (
        jnp.int32(0), kmin0, cl0, vis0,
        bt0,
        jnp.full((K, 1), -1, jnp.int32),
        jnp.zeros((K, 1), jnp.float32),
        jnp.zeros((K, 1), jnp.float32),
    )
    r_fin, kmin_x, _, _, bt, bid, bu, bv = jax.lax.while_loop(cond, body, init)

    # Drain the last prefetched record (started in the final body iteration) so
    # no DMA outlives the kernel. kmin_x < big iff a prefetch is in flight
    # (r == C exhaustion with a live next candidate).
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
    B, K, _ = ft.shape
    Lc = cl_bb.shape[1]
    Sp = rec.shape[2] // 5
    kern = functools.partial(_kernel, C=C, Sp=Sp, K=K)
    t, tid, u, v, st = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, 16), lambda b: (b, 0, 0)),
            pl.BlockSpec((8, Lc), lambda b: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, K, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, K, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, K, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, K, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, 2), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, K, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, K, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, K, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, K, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 2), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, Lc), jnp.float32),
            pltpu.VMEM((2, 16, rec.shape[2]), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(ft, cl_bb, rec)
    return t, tid, u, v, st


def traverse_pallas(cbvh, origin, direction, block: int = 256, interpret: bool = False):
    """Drop-in for cluster_bvh.traverse_bestfirst on TPU: per-ray
    (t, tri_id, u, v, steps[candidates, rounds]). Requires cbvh.rec/cl_bb
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
    ft = jnp.concatenate([d, o, cr, ones, zeros6], axis=-1).astype(jnp.float32)
    C = cbvh.rec.shape[0]
    t, tid, u, v, st = _run(cbvh.rec, cbvh.cl_bb, ft, C, interpret)
    flat = lambda x: x.reshape(-1)[:R]
    steps = jnp.stack([jnp.sum(st[:, 0, 0]), jnp.max(st[:, 0, 1])])
    return (flat(t).astype(origin.dtype), flat(tid),
            flat(u).astype(origin.dtype), flat(v).astype(origin.dtype), steps)
