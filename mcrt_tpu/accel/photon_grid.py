"""Uniform-grid k-NN for photon maps: the TPU-shaped replacement for the
reference's Octree/LinearOctree best-first search
(/root/reference/source/octree/linear-octree.cpp:25-117).

A pointer-chasing best-first k-NN is hostile to a vector machine, so instead:
photons are sorted by grid cell (host, numpy) into a CSR layout, and a query
gathers up to M photons from each of the 27 cells around the query point, then
takes the k nearest with one `lax.top_k`. Dense fixed-shape gathers + one sort-free
top-k — no per-lane trees, no data-dependent loops.

Exactness contract (vs the reference's always-exact best-first search):

* The builder shrinks the cell until NO cell exceeds the read cap M (M tracks the
  actual max occupancy), so the one-ring gather never truncates — round 2 silently
  truncated dense cells to an arbitrary M-subset, which inflated r_k ~10x in
  caustic hot spots and dimmed the pi*r_k^2 radiance estimate ~100x.
* Default semantics = "k nearest within one cell_size" (a radius-capped k-NN).
  Wherever the local photon density is high enough that r_k < cell_size — i.e.
  everywhere the radiance estimate carries energy, by construction of the cell
  size — this equals the exact k-NN. Sparse-region queries return the (< k)
  photons within the cap; the flux/(pi r_found^2) estimate remains a consistent
  density estimate there and the absolute radiance is negligible.
* knn(..., exact=True) upgrades flagged queries (r_k >= cell_size, or fewer than
  k found) with an exact brute-force top-k over the whole map (chunked lax.scan,
  gated by lax.cond) — full parity with the reference at any density; used by the
  adversarial parity tests and available to callers that need it.
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
    # Target MAX occupancy ~ 4k: dense cells must never exceed the read cap M
    # (truncation breaks the k-NN exactly where the caustic energy is), and with
    # every cell <= M the one-ring gather is exact within the cell_size radius.
    target = float(target_occupancy if target_occupancy is not None else 4.0 * k)

    cell = float(extent.max() / 8.0)
    dims = (1, 1, 1)
    for _ in range(24):
        dims = tuple(int(x) for x in np.maximum(np.ceil(extent / cell), 1).astype(int))
        if dims[0] * dims[1] * dims[2] > max_cells:
            cell *= 1.3
            continue
        ids = _cell_ids(pos, bb_min, cell, dims)
        occ_max = int(np.bincount(ids).max())
        if occ_max <= target:
            break
        # photons lie on 2D surfaces: occupancy ~ cell^2
        cell *= max(float(np.sqrt(target / occ_max)), 0.25)
    dims = tuple(int(x) for x in np.maximum(np.ceil(extent / cell), 1).astype(int))
    n_cells = dims[0] * dims[1] * dims[2]
    while n_cells > max_cells:  # final safety: coarser grid
        cell *= 1.26
        dims = tuple(int(x) for x in np.maximum(np.ceil(extent / cell), 1).astype(int))
        n_cells = dims[0] * dims[1] * dims[2]

    ids = _cell_ids(pos, bb_min, cell, dims)
    order = np.argsort(ids, kind="stable")
    counts = np.bincount(ids, minlength=n_cells)
    cell_start = np.zeros(n_cells + 1, np.int64)
    np.cumsum(counts, out=cell_start[1:])

    # M = max occupancy, HARD-capped at max(8k, 256): point-like concentrations
    # (a focused caustic) can exceed any cell resolution, and an uncapped M blows
    # gather memory up with it. Cells over the cap are read as a uniform random
    # M-subsample (photon order within a cell is shuffled below) whose flux the
    # query path rescales by occ/M — the flux-density estimate stays unbiased.
    occ_nonzero = counts[counts > 0]
    occ_max = int(occ_nonzero.max()) if len(occ_nonzero) else 8
    m = min(occ_max, max(8 * k, 256))
    m = int(np.ceil(m / 8) * 8)
    if occ_max > m:
        # Shuffle within each cell so the first-M read is a uniform subsample,
        # not emission-order-correlated.
        rng = np.random.RandomState(0x9E3779B9)
        perm = rng.permutation(n)
        order = perm[np.argsort(ids[perm], kind="stable")]

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


def save_photon_grid(path, grid: PhotonGrid) -> None:
    """Serialize a built grid (photon SoA + CSR + geometry) to an .npz.

    The reference rebuilds its photon maps every run (photon-mapper.cpp ctor —
    at its published 347M-photon scale that is minutes of lost work per
    preemption); persisted grids make photon renders resumable."""
    import pathlib

    path = pathlib.Path(path)
    tmp = path.with_suffix(".tmp.npz")
    np.savez(
        tmp,
        pos=np.asarray(grid.arrays.pos),
        direction=np.asarray(grid.arrays.direction),
        flux=np.asarray(grid.arrays.flux),
        cell_start=np.asarray(grid.arrays.cell_start),
        bb_min=np.asarray(grid.bb_min),
        cell_size=grid.cell_size,
        dims=np.asarray(grid.dims),
        m_per_cell=grid.m_per_cell,
        n_photons=grid.n_photons,
    )
    tmp.replace(path)  # atomic on POSIX


def load_photon_grid(path) -> PhotonGrid:
    z = np.load(path)
    arrays = PhotonGridArrays(
        pos=jnp.asarray(z["pos"]),
        direction=jnp.asarray(z["direction"]),
        flux=jnp.asarray(z["flux"]),
        cell_start=jnp.asarray(z["cell_start"]),
    )
    return PhotonGrid(
        arrays=arrays,
        bb_min=tuple(float(x) for x in z["bb_min"]),
        cell_size=float(z["cell_size"]),
        dims=tuple(int(x) for x in z["dims"]),
        m_per_cell=int(z["m_per_cell"]),
        n_photons=int(z["n_photons"]),
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


def _knn_pallas_ok(grid: PhotonGrid, dtype, k: int) -> bool:
    """True when the Pallas one-ring k-NN kernel can serve this query
    (TPU backend, f32, k within the kernel's output width)."""
    import os

    from .knn_kernel import KPAD

    if os.environ.get("MCRT_NO_PALLAS") or grid.n_photons == 0:
        return False
    if jnp.dtype(dtype).itemsize != 4 or k > KPAD:
        return False
    try:
        import jax

        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _knn_with_pallas(grid: PhotonGrid, arrays: PhotonGridArrays, points, k, mask):
    """Pallas kernel + the same brute-force exact fallback for flagged queries
    (overflowed blocks / under-filled rings) — identical semantics to the XLA
    exact path, ~100x less data movement (contiguous CSR DMA vs per-query
    gathers; see knn_kernel.py)."""
    import jax

    from .knn_kernel import knn_pallas

    N = grid.n_photons
    d2k, idxk, valid, wk, needs = knn_pallas(grid, arrays, points, k, mask=mask)

    def fallback(_):
        bd2, bix, bval = _knn_brute(arrays, points, k, N)
        m = needs[:, None]
        return (
            jnp.where(m, bd2, d2k),
            jnp.where(m, bix, idxk),
            jnp.where(m, bval, valid),
            jnp.where(m, jnp.ones_like(wk), wk),
        )

    return jax.lax.cond(
        jnp.any(needs), fallback, lambda _: (d2k, idxk, valid, wk), operand=None)


def knn(grid: PhotonGrid, arrays: PhotonGridArrays, points, k: int, mask=None,
        exact: bool = False):
    """k nearest photons of each query point (Q,3), within radius cell_size.

    Default semantics: one-ring (27-cell) gather merged cell-by-cell through a
    running `lax.top_k` (peak memory (Q, k+M), never (Q, 27M)), results farther
    than cell_size discarded. Cells holding more than M photons contribute a
    uniform random M-subsample whose photons carry weight occ/M — the flux-sum
    radiance estimate stays an unbiased density estimate at ANY concentration
    while memory stays bounded. Wherever occupancy <= M and the k-th distance is
    < cell_size (everywhere photon energy is dense enough to matter), this is
    the exact reference k-NN with unit weights.

    exact=True re-answers flagged queries (a truncated cell touched, or fewer
    than k found) with a brute-force scan over the whole map — exact at ANY
    density, gated by `lax.cond` so clean batches don't pay. `mask` (Q,) bool
    marks queries whose result matters; masked-off lanes (dead / parked
    wavefront lanes with garbage positions) never trigger the fallback.

    Returns (d2 (Q,k), idx (Q,k) int32, valid (Q,k), w (Q,k) flux weights).
    Invalid slots have d2 = +inf. `arrays` is passed explicitly (not taken from
    `grid`) so callers can route it through jit as a pytree argument.
    """
    dtype = points.dtype
    Q = points.shape[0]
    if exact and _knn_pallas_ok(grid, dtype, k):
        return _knn_with_pallas(grid, arrays, points, k, mask)
    M = grid.m_per_cell
    nx, ny, nz = grid.dims
    N = grid.n_photons
    bb_min = jnp.asarray(grid.bb_min, dtype)
    inv_cell = jnp.asarray(1.0 / grid.cell_size, dtype)
    dimv = jnp.asarray(grid.dims, jnp.int32)

    ci = jnp.floor((points - bb_min) * inv_cell).astype(jnp.int32)
    ci = jnp.clip(ci, 0, dimv - 1)

    arange_m = jnp.arange(M, dtype=jnp.int32)
    # The one-ring can contribute up to 27*M candidates in total, so the running
    # top-k width must be bounded by that — not by the single-cell cap M, which
    # silently under-filled results when max cell occupancy < k (advisor r3).
    kk = min(k, 27 * M)
    best_d2 = jnp.full((Q, kk), jnp.inf, dtype)
    best_ix = jnp.zeros((Q, kk), jnp.int32)
    best_w = jnp.ones((Q, kk), dtype)
    touched_trunc = jnp.zeros((Q,), bool)
    # Merge in groups of cells: one top_k per group over (Q, k + G*M). A small
    # G bounds memory when M is large; with the default M cap (<= max(8k,256))
    # all 27 cells fit one merge (27 top_k calls measured ~20x slower on CPU).
    max_cols = 16384
    group_cells = max(1, min(27, max_cols // max(M, 1)))
    offsets = [
        (dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
    ]
    for gstart in range(0, 27, group_cells):
        d2_parts, ix_parts, w_parts = [], [], []
        for dx, dy, dz in offsets[gstart : gstart + group_cells]:
            off = jnp.asarray([dx, dy, dz], jnp.int32)
            cc = ci + off
            in_grid = jnp.all((cc >= 0) & (cc < dimv), axis=-1)
            cs = jnp.clip(cc, 0, dimv - 1)
            lin = (cs[:, 0] * ny + cs[:, 1]) * nz + cs[:, 2]
            s = arrays.cell_start[lin]
            e = arrays.cell_start[lin + 1]
            occ = e - s
            truncated = in_grid & (occ > M)
            touched_trunc = touched_trunc | truncated
            w_cell = jnp.where(
                truncated, occ.astype(dtype) / jnp.asarray(M, dtype), 1.0
            )
            idx = s[:, None] + arange_m[None, :]
            ok = in_grid[:, None] & (idx < e[:, None])
            idx_safe = jnp.minimum(idx, N - 1)
            p = arrays.pos[idx_safe]                      # (Q, M, 3)
            d = p - points[:, None, :]
            d2_parts.append(jnp.where(ok, jnp.sum(d * d, axis=-1), jnp.inf))
            ix_parts.append(idx_safe)
            w_parts.append(jnp.broadcast_to(w_cell[:, None], (Q, M)))
        cat_d2 = jnp.concatenate([best_d2] + d2_parts, axis=1)
        cat_ix = jnp.concatenate([best_ix] + ix_parts, axis=1)
        cat_w = jnp.concatenate([best_w] + w_parts, axis=1)
        neg, sel = jax.lax.top_k(-cat_d2, kk)
        best_d2 = -neg
        best_ix = jnp.take_along_axis(cat_ix, sel, axis=1)
        best_w = jnp.take_along_axis(cat_w, sel, axis=1)

    # Radius cap: beyond cell_size the one-ring is not guaranteed complete, so
    # results there are discarded (capped-k-NN semantics; see module docstring).
    cell2 = jnp.asarray(grid.cell_size * grid.cell_size, dtype)
    d2k = jnp.where(best_d2 < cell2, best_d2, jnp.inf)
    idxk = best_ix
    wk = best_w
    valid = jnp.isfinite(d2k)
    if kk < k:  # pad to the requested k
        pad = k - kk
        d2k = jnp.pad(d2k, ((0, 0), (0, pad)), constant_values=jnp.inf)
        idxk = jnp.pad(idxk, ((0, 0), (0, pad)))
        wk = jnp.pad(wk, ((0, 0), (0, pad)), constant_values=1.0)
        valid = jnp.pad(valid, ((0, 0), (0, pad)))

    if not exact or N <= k:
        return d2k, idxk, valid, wk

    # ---- exact mode: brute-force upgrade for flagged queries ----
    want = min(k, N)
    n_found = jnp.sum(valid, axis=1)
    inexact = touched_trunc | (n_found < want)
    if mask is not None:
        inexact = inexact & mask

    def fallback(_):
        bd2, bix, bval = _knn_brute(arrays, points, k, N)
        m = inexact[:, None]
        return (
            jnp.where(m, bd2, d2k),
            jnp.where(m, bix, idxk),
            jnp.where(m, bval, valid),
            jnp.where(m, jnp.ones_like(wk), wk),
        )

    return jax.lax.cond(
        jnp.any(inexact), fallback, lambda _: (d2k, idxk, valid, wk), operand=None
    )
