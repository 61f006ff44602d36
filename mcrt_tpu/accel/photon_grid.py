"""Uniform-grid k-NN for photon maps: the TPU-shaped replacement for the
reference's Octree/LinearOctree best-first search
(/root/reference/source/octree/linear-octree.cpp:25-117).

A pointer-chasing best-first k-NN is hostile to a vector machine, so instead:
photons are sorted by grid cell (host, numpy) into a CSR layout, and a query
gathers up to M photons from each of the 27 cells around the query point, then
takes the k nearest with one `lax.top_k`. Dense fixed-shape gathers + one sort-free
top-k — no per-lane trees, no data-dependent loops.

Exactness (matches the reference's best-first search, which is exact at any
density): the one-ring gather alone is exact only when (a) no gathered cell holds
more than the per-cell read cap M and (b) the found k-th distance is < cell_size
(so the 27-cell block provably contains every photon within r_k). Both conditions
are CHECKED per query; queries failing either run an exact brute-force top-k over
the whole photon array (chunked `lax.scan`, gated by `lax.cond` so renders with no
flagged queries never pay for it). Caustic maps are the adversarial case: cell
occupancy varies by orders of magnitude, so a fixed M necessarily truncates the
densest cells — round 2 shipped truncation silently, which inflated r_k ~10x and
dimmed caustics ~100x (the pi*r_k^2 estimate). Round 3 makes it exact.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PhotonGridArrays(NamedTuple):
    """Device pytree: photon SoA sorted by cell + CSR starts."""
    pos: jnp.ndarray         # (N,3)
    direction: jnp.ndarray   # (N,3) incoming photon direction (points away from hit)
    flux: jnp.ndarray        # (N,3)
    cell_start: jnp.ndarray  # (n_cells+1,) int32


@dataclasses.dataclass(frozen=True)
class PhotonGrid:
    """Static grid geometry + device arrays. Kept split so the static fields can be
    closed over in jitted code while the arrays pass through as pytree args."""
    arrays: PhotonGridArrays
    bb_min: tuple
    cell_size: float
    dims: tuple          # (nx, ny, nz)
    m_per_cell: int      # candidate read cap per cell
    n_photons: int

    @property
    def empty(self) -> bool:
        return self.n_photons == 0


def _cell_ids(pos, bb_min, cell, dims):
    ij = np.floor((pos - bb_min) / cell).astype(np.int64)
    ij = np.clip(ij, 0, np.asarray(dims) - 1)
    return (ij[:, 0] * dims[1] + ij[:, 1]) * dims[2] + ij[:, 2]


def build_photon_grid(
    pos: np.ndarray,
    direction: np.ndarray,
    flux: np.ndarray,
    k: int,
    dtype=np.float32,
    target_occupancy: float | None = None,
    max_cells: int = 1 << 22,
) -> PhotonGrid:
    """Host-side build: choose cell size from measured occupancy, sort, CSR."""
    n = len(pos)
    if n == 0:
        arrays = PhotonGridArrays(
            pos=jnp.zeros((1, 3), dtype),
            direction=jnp.zeros((1, 3), dtype),
            flux=jnp.zeros((1, 3), dtype),
            cell_start=jnp.zeros(2, jnp.int32),
        )
        return PhotonGrid(arrays, (0.0, 0.0, 0.0), 1.0, (1, 1, 1), 1, 0)

    pos = np.asarray(pos, np.float64)
    bb_min = pos.min(axis=0) - 1e-6
    bb_max = pos.max(axis=0) + 1e-6
    extent = np.maximum(bb_max - bb_min, 1e-9)
    target = float(target_occupancy if target_occupancy is not None else 2.0 * k)

    # Iterate cell-size: photons lie on surfaces, occupancy ~ cell^2.
    cell = float(extent.max() / 32.0)
    for _ in range(3):
        dims = tuple(int(x) for x in np.maximum(np.ceil(extent / cell), 1).astype(int))
        if dims[0] * dims[1] * dims[2] > max_cells:
            scale = (dims[0] * dims[1] * dims[2] / max_cells) ** (1.0 / 3.0)
            cell *= scale * 1.01
            continue
        ids = _cell_ids(pos, bb_min, cell, dims)
        occ = np.bincount(ids)
        occ = occ[occ > 0]
        # Target a HIGH percentile, not the median: caustic maps concentrate most
        # photons in few cells, and a median-sized grid leaves those cells far over
        # the read cap M (query-time fallback then kicks in for most queries).
        med = float(np.percentile(occ, 90))
        if 0.7 * target <= med <= 1.5 * target:
            break
        cell *= float(np.sqrt(target / med)) if med > 0 else 2.0
        cell = min(cell, float(extent.max()))
    dims = tuple(int(x) for x in np.maximum(np.ceil(extent / cell), 1).astype(int))
    n_cells = dims[0] * dims[1] * dims[2]
    if n_cells > max_cells:  # final safety: coarser grid
        while n_cells > max_cells:
            cell *= 1.26
            dims = tuple(int(x) for x in np.maximum(np.ceil(extent / cell), 1).astype(int))
            n_cells = dims[0] * dims[1] * dims[2]

    ids = _cell_ids(pos, bb_min, cell, dims)
    order = np.argsort(ids, kind="stable")
    counts = np.bincount(ids, minlength=n_cells)
    cell_start = np.zeros(n_cells + 1, np.int64)
    np.cumsum(counts, out=cell_start[1:])

    occ_nonzero = counts[counts > 0]
    m = int(min(occ_nonzero.max(), max(4 * k, 8))) if len(occ_nonzero) else 8
    m = int(np.ceil(m / 8) * 8)

    arrays = PhotonGridArrays(
        pos=jnp.asarray(pos[order], dtype),
        direction=jnp.asarray(np.asarray(direction, np.float64)[order], dtype),
        flux=jnp.asarray(np.asarray(flux, np.float64)[order], dtype),
        cell_start=jnp.asarray(cell_start, jnp.int32),
    )
    return PhotonGrid(
        arrays=arrays,
        bb_min=tuple(float(x) for x in bb_min),
        cell_size=float(cell),
        dims=dims,
        m_per_cell=m,
        n_photons=n,
    )


def _knn_brute(arrays: PhotonGridArrays, points, k: int, n_photons: int,
               chunk: int = 1024):
    """Exact k-NN over ALL photons: chunked scan carrying a per-query top-k.

    O(Q*N) — this is the correctness fallback for queries the grid gather cannot
    serve exactly; it mirrors the reference's always-exact best-first search
    (/root/reference/source/octree/linear-octree.cpp:25-117) at TPU-friendly
    shapes (dense (Q, chunk) distance blocks + top_k merges)."""
    dtype = points.dtype
    Q = points.shape[0]
    N = arrays.pos.shape[0]
    pad = (-N) % chunk
    pos = jnp.pad(arrays.pos, ((0, pad), (0, 0))) if pad else arrays.pos
    n_chunks = pos.shape[0] // chunk
    pos_c = pos.reshape(n_chunks, chunk, 3)
    base = jnp.arange(n_chunks, dtype=jnp.int32) * chunk

    init_d2 = jnp.full((Q, k), jnp.inf, dtype)
    init_ix = jnp.zeros((Q, k), jnp.int32)

    def step(carry, xs):
        best_d2, best_ix = carry
        p, b = xs
        d = p[None, :, :] - points[:, None, :]
        d2 = jnp.sum(d * d, axis=-1)                       # (Q, chunk)
        ix = b + jnp.arange(chunk, dtype=jnp.int32)
        d2 = jnp.where((ix < n_photons)[None, :], d2, jnp.inf)
        cat_d2 = jnp.concatenate([best_d2, d2], axis=1)
        cat_ix = jnp.concatenate([best_ix, jnp.broadcast_to(ix, (Q, chunk))], axis=1)
        neg, sel = jax.lax.top_k(-cat_d2, k)
        return (-neg, jnp.take_along_axis(cat_ix, sel, axis=1)), None

    (d2k, idxk), _ = jax.lax.scan(step, (init_d2, init_ix), (pos_c, base))
    return d2k, idxk, jnp.isfinite(d2k)


def knn(grid: PhotonGrid, arrays: PhotonGridArrays, points, k: int, mask=None):
    """Exact k-nearest photons of each query point (Q,3).

    `mask` (Q,) bool marks queries whose result matters; masked-off queries (dead /
    parked wavefront lanes with garbage positions) never trigger the brute-force
    fallback.

    Fast path: gather up to M photons from the 27 cells around each query +
    `lax.top_k`. A query is provably served exactly iff no gathered cell was
    truncated at M and the found k-th distance is < cell_size (the 3x3x3 block
    extends >= cell_size from the query in every direction, so it contains every
    photon within that distance). Queries failing either check are re-answered by
    an exact brute-force scan — gated by `lax.cond`, so batches with no flagged
    query skip it entirely.

    Returns (d2 (Q,k), idx (Q,k) int32 into the sorted photon arrays, valid (Q,k)).
    Invalid slots have d2 = +inf. `arrays` is passed explicitly (not taken from
    `grid`) so callers can route it through jit as a pytree argument.
    """
    dtype = points.dtype
    Q = points.shape[0]
    M = grid.m_per_cell
    nx, ny, nz = grid.dims
    N = grid.n_photons
    bb_min = jnp.asarray(grid.bb_min, dtype)
    inv_cell = jnp.asarray(1.0 / grid.cell_size, dtype)
    dimv = jnp.asarray(grid.dims, jnp.int32)

    ci = jnp.floor((points - bb_min) * inv_cell).astype(jnp.int32)
    ci = jnp.clip(ci, 0, dimv - 1)

    arange_m = jnp.arange(M, dtype=jnp.int32)
    d2_parts = []
    ix_parts = []
    truncated = jnp.zeros((Q,), bool)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                off = jnp.asarray([dx, dy, dz], jnp.int32)
                cc = ci + off
                in_grid = jnp.all((cc >= 0) & (cc < dimv), axis=-1)
                cs = jnp.clip(cc, 0, dimv - 1)
                lin = (cs[:, 0] * ny + cs[:, 1]) * nz + cs[:, 2]
                s = arrays.cell_start[lin]
                e = arrays.cell_start[lin + 1]
                truncated = truncated | (in_grid & (e - s > M))
                idx = s[:, None] + arange_m[None, :]
                ok = in_grid[:, None] & (idx < e[:, None])
                idx_safe = jnp.minimum(idx, N - 1)
                p = arrays.pos[idx_safe]                      # (Q, M, 3)
                d = p - points[:, None, :]
                d2 = jnp.sum(d * d, axis=-1)
                d2_parts.append(jnp.where(ok, d2, jnp.inf))
                ix_parts.append(idx_safe)
    D2 = jnp.concatenate(d2_parts, axis=1)    # (Q, 27M)
    IX = jnp.concatenate(ix_parts, axis=1)

    kk = min(k, D2.shape[1])
    neg_d2, sel = jax.lax.top_k(-D2, kk)
    d2k = -neg_d2
    idxk = jnp.take_along_axis(IX, sel, axis=1).astype(jnp.int32)
    valid = jnp.isfinite(d2k)
    if kk < k:  # degenerate tiny grids: pad to the requested k
        pad = k - kk
        d2k = jnp.pad(d2k, ((0, 0), (0, pad)), constant_values=jnp.inf)
        idxk = jnp.pad(idxk, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))

    if N <= k:
        # Everything is already gathered from cell 0..N; one-ring == exhaustive.
        return d2k, idxk, valid

    # ---- exactness check + gated brute-force fallback ----
    want = min(k, N)
    n_found = jnp.sum(valid, axis=1)
    rk2 = jnp.max(jnp.where(valid, d2k, 0.0), axis=1)
    cell2 = jnp.asarray(grid.cell_size * grid.cell_size, dtype)
    inexact = truncated | (n_found < want) | (rk2 >= cell2)
    if mask is not None:
        inexact = inexact & mask

    def fallback(_):
        bd2, bix, bval = _knn_brute(arrays, points, k, N)
        m = inexact[:, None]
        return (
            jnp.where(m, bd2, d2k),
            jnp.where(m, bix, idxk),
            jnp.where(m, bval, valid),
        )

    return jax.lax.cond(
        jnp.any(inexact), fallback, lambda _: (d2k, idxk, valid), operand=None
    )
