"""Pallas TPU kernel: exact one-ring k-NN for the photon-map radiance estimates.

The XLA formulation (photon_grid.knn) gathers 27 cells x M photon rows PER
QUERY — at M=400 that is ~90M serialized gather rows per 8k-query estimate,
measured ~0.4 s per estimate call on v5e (the photon eye pass ran at 0.02 M
rays/s, ~100x below the path tracer). This kernel replaces the gathers with
contiguous DMA:

  1. Queries are sorted by grid cell (XLA side) and processed in blocks of
     K=256. Each block computes the AABB of its queries' one-ring cells.
  2. The photon array is CSR-sorted by cell id with z the fastest axis, so
     each (x, y) column of the box is ONE contiguous row range — the kernel
     marches the box's columns, DMA-ing each z-run into a VMEM staging buffer.
     Over-reads past a run's end land on real photons of neighboring cells,
     which can only ADD candidates (k-NN correctness is unaffected); alignment
     gaps are masked by a prefilled id of -1.
  3. The k-th-nearest radius is found by bisection over the staged photons
     (pure VPU compare-reduces, ~24 passes), then the <= k selected photon ids
     and distances are emitted with rank-masked reduces.

Every selected photon is read exactly (no per-cell M cap, so no subsample
reweighting); blocks whose box or population exceeds the static caps are
FLAGGED and re-answered by the caller's exact fallback, as are queries with
fewer than k in-ring neighbors — identical semantics to photon_grid.knn's
exact mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.4e38
KPAD = 56      # output slots per query (k <= KPAD)
STAGE = 16384  # staged photon rows per block
TS = 2048      # selection tile (d2 recomputed per (K, TS) tile; (K, STAGE) at
               # once would need 16 MB of VMEM)
RUNCAP = 2048  # rows DMA'd per piece; longer z-runs split across pieces
COLCAP = 128   # max (x, y) columns marched per block


def _cumsum_lanes(x):
    """Inclusive prefix sum along the lane axis (Mosaic has no cumsum
    primitive): Hillis-Steele with pltpu.roll, log2(n) masked shift-adds."""
    n = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    sh = 1
    while sh < n:
        rolled = pltpu.roll(x, shift=sh, axis=1)
        x = x + jnp.where(lane >= sh, rolled, 0)
        sh *= 2
    return x


def _kernel(qp_ref, ph_hbm, cs2_hbm, idx_ref, d2_ref, cnt_ref, flag_ref,
            stage_ref, zcol_ref, sems, *, k: int, nx: int, ny: int, nz: int,
            bbx: float, bby: float, bbz: float, inv_cell: float,
            cell2: float, n_photons: int, K: int):
    big = jnp.float32(BIG)
    q = qp_ref[0]                                   # (K, 8): pos3 | valid | pad
    qx = q[:, 0:1]
    qy = q[:, 1:2]
    qz = q[:, 2:3]
    qvalid = q[:, 3:4] > 0.5                        # (K, 1)

    # ---- query cell box (invalid queries excluded from the box) ----
    def cell_of(p, bb, n):
        c = jnp.floor((p - bb) * inv_cell).astype(jnp.int32)
        return jnp.clip(c, 0, n - 1)

    cx = cell_of(qx, bbx, nx)
    cy = cell_of(qy, bby, ny)
    cz = cell_of(qz, bbz, nz)
    bigi = jnp.int32(2**30)
    lo_of = lambda c, n: jnp.clip(jnp.min(jnp.where(qvalid, c, bigi)) - 1, 0, n - 1)
    hi_of = lambda c, n: jnp.clip(jnp.max(jnp.where(qvalid, c, -1)) + 1, 0, n - 1)
    x0, x1 = lo_of(cx, nx), hi_of(cx, nx)
    y0, y1 = lo_of(cy, ny), hi_of(cy, ny)
    z0, z1 = lo_of(cz, nz), hi_of(cz, nz)
    any_valid = jnp.any(qvalid)
    nxs = x1 - x0 + 1
    nys = y1 - y0 + 1
    n_cols = nxs * nys
    overflow = (n_cols > COLCAP) | ~any_valid

    # ---- prefill staging ids with -1 (alignment gaps must read invalid) ----
    stage_ref[:, :] = jnp.full((STAGE, 8), -1.0, jnp.float32)

    # ---- march columns, DMA contiguous z-runs (split into RUNCAP pieces) ----
    def col_body(carry):
        col, cnt, ovf = carry
        gx = x0 + col // nys
        gy = y0 + col % nys
        # Per-column z bounds from the queries whose one-ring touches THIS
        # (x, y) column — far tighter than the block box's z-extent when the
        # queries trace a curve/surface through the box (the block-box z-range
        # overflowed staging on sparse query sets).
        touch = qvalid & (cx >= gx - 1) & (cx <= gx + 1) \
            & (cy >= gy - 1) & (cy <= gy + 1)
        z0c = jnp.clip(jnp.min(jnp.where(touch, cz, bigi)) - 1, 0, nz - 1)
        z1c = jnp.clip(jnp.max(jnp.where(touch, cz, -1)) + 1, 0, nz - 1)
        any_touch = jnp.any(touch)
        # cs2_hbm row (gx*ny + gy) holds cell_start for every z cell of this
        # column plus the end sentinel — one aligned whole-row DMA (1-D
        # cell_start windows hit Mosaic's 1024-element slice alignment rule).
        copy = pltpu.make_async_copy(
            cs2_hbm.at[pl.ds(gx * ny + gy, 1)], zcol_ref, sems.at[0])
        copy.start()
        copy.wait()
        s = zcol_ref[0, z0c]
        # end of the run = start of the cell PAST z1c
        e = jnp.where(any_touch, zcol_ref[0, z1c + 1], s)

        def piece_body(pc):
            p, cnt, ovf = pc
            src0 = s + p * RUNCAP
            left = e - src0
            wr = ((cnt + 7) // 8) * 8               # align-8 staging cursor
            ovf = ovf | (wr + RUNCAP > STAGE)
            wrc = jnp.minimum(wr, STAGE - RUNCAP)
            src = jnp.minimum(src0, jnp.int32(max(n_photons - RUNCAP, 0)))

            @pl.when((left > 0) & ~ovf)
            def _():
                cp = pltpu.make_async_copy(
                    ph_hbm.at[pl.ds(src, RUNCAP)],
                    stage_ref.at[pl.ds(wrc, RUNCAP)], sems.at[1])
                cp.start()
                cp.wait()
                # Invalidate the fixed-size window's over-read tail: those rows
                # are photons of OTHER cells that a later column/piece may
                # stage again — leaving them live double-counts photons (dedup
                # bug caught by the interpret-mode parity test).
                row_io = jax.lax.broadcasted_iota(jnp.int32, (STAGE, 1), 0)
                tail = (row_io >= wrc + left) & (row_io < wrc + RUNCAP)
                ids = stage_ref[:, 3:4]
                stage_ref[:, 3:4] = jnp.where(tail, -1.0, ids)

            got = jnp.clip(left, 0, RUNCAP)
            return p + 1, jnp.where(ovf, cnt, wr + got), ovf

        def piece_cond(pc):
            p, cnt, ovf = pc
            return (s + p * RUNCAP < e) & ~ovf

        _, cnt, ovf = jax.lax.while_loop(piece_cond, piece_body,
                                         (jnp.int32(0), cnt, ovf))
        return col + 1, cnt, ovf

    def col_cond(carry):
        col, cnt, ovf = carry
        return (col < n_cols) & ~ovf

    _, cnt_fin, overflow = jax.lax.while_loop(
        col_cond, col_body, (jnp.int32(0), jnp.int32(0), overflow))

    # ---- selection, tiled at TS columns ((K, STAGE) at once blows VMEM) ----
    n_tiles = STAGE // TS

    def tile_d2(t):
        sl = slice(t * TS, (t + 1) * TS)
        px = stage_ref[sl, 0]
        py = stage_ref[sl, 1]
        pz = stage_ref[sl, 2]
        pid_t = stage_ref[sl, 3]
        dx = qx - px[None, :]
        dy = qy - py[None, :]
        dz = qz - pz[None, :]
        d2 = dx * dx + dy * dy + dz * dz            # (K, TS)
        return jnp.where((pid_t >= 0.0)[None, :], d2, big), pid_t

    # bisect the k-th-nearest radius^2 per query, capped at cell_size^2
    kk = jnp.int32(k)

    def bis_body(i, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)                       # (K, 1)
        cnt_q = jnp.zeros((K, 1), jnp.int32)
        for t in range(n_tiles):
            d2_t, _ = tile_d2(t)
            cnt_q = cnt_q + jnp.sum((d2_t <= mid).astype(jnp.int32),
                                    axis=1, keepdims=True)
        ge = cnt_q >= kk
        return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

    lo0 = jnp.zeros((K, 1), jnp.float32)
    hi0 = jnp.full((K, 1), cell2, jnp.float32)
    _, r2k = jax.lax.fori_loop(0, 26, bis_body, (lo0, hi0))

    # ---- emit <= KPAD (id, d2) pairs per query ----
    # fori over output slots with a one-hot column accumulator (a fully
    # unrolled tiles x KPAD emit OOM-killed the Mosaic compiler).
    kpad_lane = jax.lax.broadcasted_iota(jnp.int32, (K, KPAD), 1)
    out_id = jnp.zeros((K, KPAD), jnp.float32)
    out_d2 = jnp.zeros((K, KPAD), jnp.float32)
    base = jnp.zeros((K, 1), jnp.int32)             # selected before this tile
    for t in range(n_tiles):
        d2_t, pid_t = tile_d2(t)
        sel_t = d2_t <= r2k                          # (K, TS)
        rank_t = base + _cumsum_lanes(sel_t.astype(jnp.int32))
        rk = jnp.where(sel_t, rank_t, 0)

        def emit_j(j, acc):
            oid, od2 = acc
            at_j = rk == (j + 1)
            cj = (kpad_lane == j).astype(jnp.float32)           # (K, KPAD)
            idv = jnp.sum(jnp.where(at_j, pid_t[None, :], 0.0),
                          axis=1, keepdims=True)                # (K, 1)
            d2v = jnp.sum(jnp.where(at_j, d2_t, 0.0), axis=1, keepdims=True)
            return oid + idv * cj, od2 + d2v * cj

        out_id, out_d2 = jax.lax.fori_loop(0, KPAD, emit_j, (out_id, out_d2))
        base = base + jnp.sum(sel_t.astype(jnp.int32), axis=1, keepdims=True)
    count = base
    idx_ref[0, :, :] = out_id
    d2_ref[0, :, :] = out_d2
    cnt_ref[0, :, :] = jnp.minimum(count, KPAD).astype(jnp.float32)
    flag_ref[0, 0, 0] = overflow.astype(jnp.int32)
    # queries whose selection overflowed KPAD (bisection resolution ties) are
    # re-answered exactly by the caller, like under-filled ones
    flag_ref[0, 0, 1] = jnp.sum((count > KPAD).astype(jnp.int32))


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _run(qp, photons, cs2, k: int, grid_static, n_photons: int,
         interpret: bool):
    B, K, _ = qp.shape
    NZPAD = cs2.shape[1]
    nx, ny, nz, bbx, bby, bbz, inv_cell, cell2 = grid_static
    kern = functools.partial(
        _kernel, k=k, nx=nx, ny=ny, nz=nz, bbx=bbx, bby=bby, bbz=bbz,
        inv_cell=inv_cell, cell2=cell2, n_photons=n_photons, K=K)
    idxf, d2, cntf, flags = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, 8), lambda b: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, K, KPAD), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, K, KPAD), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, K, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, 2), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, K, KPAD), jnp.float32),
            jax.ShapeDtypeStruct((B, K, KPAD), jnp.float32),
            jax.ShapeDtypeStruct((B, K, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 2), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((STAGE, 8), jnp.float32),
            pltpu.SMEM((1, NZPAD), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(qp, photons, cs2)
    return idxf, d2, cntf, flags


def knn_pallas(grid, arrays, points, k: int, mask=None, interpret: bool = False):
    """Pallas-accelerated exact one-ring k-NN. Same contract as
    photon_grid.knn(..., exact=False) plus a per-query `needs_exact` flag the
    caller must resolve via the brute fallback (overflowed blocks, under-filled
    rings, KPAD ties). Returns (d2 (Q,k), idx (Q,k) int32, valid, w, needs_exact).
    """
    dtype = points.dtype
    Q = points.shape[0]
    K = 128
    nx, ny, nz = grid.dims
    n_cells = nx * ny * nz
    N = grid.n_photons

    # Photon table (N, 8): pos3 | row id | zero pad. Pad rows so any clamped
    # RUNCAP window stays in bounds; their id -1 marks them invalid.
    Np = max(N + RUNCAP, RUNCAP + 8)
    ph = jnp.zeros((Np, 8), jnp.float32)
    ph = ph.at[:, 3].set(-1.0)
    ph = ph.at[:N, 0:3].set(arrays.pos[:N].astype(jnp.float32))
    ph = ph.at[:N, 3].set(jnp.arange(N, dtype=jnp.float32))
    # cell_start re-laid-out one row per (x, y) column: row r = starts of that
    # column's nz cells plus the end sentinel (start of the next column's first
    # cell == this column's end, by CSR contiguity).
    NZPAD = max(128, -(-(nz + 1) // 128) * 128)  # row DMA lane alignment
    nxy = nx * ny
    cs_lin = arrays.cell_start[: n_cells + 1]
    rows = cs_lin[:n_cells].reshape(nxy, nz)
    endcol = jnp.concatenate([rows[1:, 0:1], cs_lin[n_cells:n_cells + 1][None, :]], axis=0)
    cs2 = jnp.concatenate(
        [rows, endcol,
         jnp.zeros((nxy, NZPAD - nz - 1), jnp.int32) + cs_lin[n_cells]],
        axis=1)

    bb = jnp.asarray(grid.bb_min, jnp.float32)
    inv_cell = 1.0 / grid.cell_size
    valid_q = jnp.ones((Q,), bool) if mask is None else mask
    # Sort queries by cell id so blocks are spatially tight; invalid queries
    # sort to the tail (cell id max -> their blocks flag overflow -> fallback,
    # but their results are masked out anyway).
    p32 = points.astype(jnp.float32)
    ci = jnp.clip(jnp.floor((p32 - bb[None, :]) * inv_cell).astype(jnp.int32),
                  0, jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32)[None, :])
    cell_id = (ci[:, 0] * ny + ci[:, 1]) * nz + ci[:, 2]
    cell_id = jnp.where(valid_q, cell_id, jnp.int32(2**30))
    perm = jnp.argsort(cell_id)
    qp = jnp.concatenate(
        [p32, valid_q.astype(jnp.float32)[:, None],
         jnp.zeros((Q, 4), jnp.float32)], axis=1)[perm]
    pad = (-Q) % K
    if pad:
        qp = jnp.concatenate([qp, jnp.zeros((pad, 8), jnp.float32)], axis=0)
    B = qp.shape[0] // K

    grid_static = (nx, ny, nz, float(grid.bb_min[0]), float(grid.bb_min[1]),
                   float(grid.bb_min[2]), float(inv_cell),
                   float(grid.cell_size * grid.cell_size))
    idxf, d2s, cnts, flags = _run(
        qp.reshape(B, K, 8), ph, cs2, int(min(k, KPAD)), grid_static, Np, interpret)

    # Unsort with ONE wide gather of the packed outputs.
    packed = jnp.concatenate(
        [idxf.reshape(B * K, KPAD), d2s.reshape(B * K, KPAD),
         cnts.reshape(B * K, 1),
         jnp.broadcast_to(flags[:, :, 0:1], (B, K, 1)).reshape(B * K, 1)],
        axis=1)[:Q]
    inv = jnp.argsort(perm)
    packed = packed[inv]
    idx = (packed[:, 0:KPAD] + 0.5).astype(jnp.int32)
    d2 = packed[:, KPAD:2 * KPAD].astype(dtype)
    count = (packed[:, 2 * KPAD] + 0.5).astype(jnp.int32)
    blk_overflow = packed[:, 2 * KPAD + 1] > 0.5

    slots = jnp.arange(KPAD, dtype=jnp.int32)[None, :]
    valid = slots < count[:, None]
    d2 = jnp.where(valid, d2, jnp.inf)
    kk = min(k, KPAD)
    d2 = d2[:, :kk]
    idx = jnp.where(valid, idx, 0)[:, :kk]
    valid = valid[:, :kk]
    w = jnp.ones_like(d2)
    want = min(k, N) if N else 0
    needs_exact = blk_overflow | (jnp.sum(valid, axis=1) < want)
    if mask is not None:
        needs_exact = needs_exact & mask
    return d2, idx, valid, w, needs_exact
