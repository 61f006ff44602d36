"""Parity of the Pallas one-ring k-NN kernel (interpret mode) vs the exact XLA
k-NN of photon_grid. The kernel is the production TPU path for the photon-map
radiance estimates (accel/knn_kernel.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mcrt_tpu.accel import photon_grid as pg
from mcrt_tpu.accel.knn_kernel import knn_pallas


def _mk_grid(rng, n, k, surface=False):
    if surface:
        pos = np.stack([rng.rand(n) * 4, 0.02 * rng.rand(n), rng.rand(n) * 4], 1)
    else:
        pos = rng.rand(n, 3) * np.array([4, 1, 4])
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    flux = rng.rand(n, 3)
    return pg.build_photon_grid(pos, dirs, flux, k, np.float32)


def _check(grid, qp, k, mask=None):
    d2r, idxr, validr, _ = pg.knn(grid, grid.arrays, qp, k, mask=mask, exact=True)
    d2p, idxp, validp, wp, needs = knn_pallas(
        grid, grid.arrays, qp, k, mask=mask, interpret=True)
    d2r, idxr, validr = map(np.asarray, (d2r, idxr, validr))
    d2p, idxp, validp, needs = map(np.asarray, (d2p, idxp, validp, needs))
    ok = ~needs if mask is None else (np.asarray(mask) & ~needs)
    assert np.all(np.asarray(wp) == 1.0)
    for qi in np.nonzero(ok)[0]:
        a = set(idxr[qi][validr[qi]].tolist())
        b = set(idxp[qi][validp[qi]].tolist())
        assert a == b, (qi, sorted(a ^ b))
    r2r = np.max(np.where(validr, d2r, 0), axis=1)
    r2p = np.max(np.where(validp, d2p, 0), axis=1)
    if ok.any():
        np.testing.assert_allclose(r2p[ok], r2r[ok], rtol=1e-5)
    return needs, ok


def test_knn_pallas_volume_queries():
    rng = np.random.RandomState(0)
    grid = _mk_grid(rng, 5000, 20)
    qp = jnp.asarray((rng.rand(500, 3) * np.array([4, 1, 4])).astype(np.float32))
    mask = jnp.asarray(rng.rand(500) < 0.9)
    needs, ok = _check(grid, qp, 20, mask)
    assert ok.sum() > 300  # the kernel must answer most queries itself


def test_knn_pallas_surface_queries_dense_map():
    rng = np.random.RandomState(1)
    grid = _mk_grid(rng, 100000, 50, surface=True)
    t = np.sort(rng.rand(1024))
    qp = jnp.asarray(np.stack(
        [t * 4, 0.01 * np.ones_like(t), (np.sin(t * 20) * 0.5 + 0.5) * 4],
        1).astype(np.float32))
    needs, ok = _check(grid, qp, 50)
    assert needs.mean() < 0.05
