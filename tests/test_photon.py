"""Photon mapping tests: grid k-NN parity with brute force + estimator
cross-validation against the path tracer (the reference's de-facto integration
test: two independent estimators of the same integral must agree;
SURVEY.md section 4)."""
import json
import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

from mcrt_tpu.accel import photon_grid as pgrid

REF_SCENES = pathlib.Path("/root/reference/scenes")


def test_knn_matches_brute_force():
    rng = np.random.RandomState(0)
    # photons on a 2D-ish manifold (surface-like), as in real photon maps
    n = 20_000
    pos = rng.rand(n, 3) * np.array([10.0, 10.0, 0.3])
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    flux = rng.rand(n, 3)

    k = 32
    grid = pgrid.build_photon_grid(pos, d, flux, k, np.float64)

    q = rng.rand(256, 3) * np.array([10.0, 10.0, 0.3])
    d2, idx, valid, w = pgrid.knn(grid, grid.arrays, jnp.asarray(q), k)
    assert np.all(np.asarray(w) == 1.0), "uniform density must not be subsampled"
    d2 = np.asarray(d2)
    valid = np.asarray(valid)
    assert valid.all()

    # brute force distances
    gp = np.asarray(grid.arrays.pos)
    for i in range(0, 256, 17):
        dist2 = np.sum((gp - q[i]) ** 2, axis=-1)
        ref = np.sort(dist2)[:k]
        got = np.sort(d2[i])
        np.testing.assert_allclose(got, ref, rtol=1e-9)


def test_knn_exact_on_caustic_density():
    """Adversarial skewed density (VERDICT r2 #4): a tight gaussian cluster (the
    caustic hot spot) over a sparse background. Round 2's fixed read cap silently
    truncated the dense cells and inflated r_k ~10x. exact=True must match brute
    force at EVERY density — hot-spot queries (truncated cells -> brute upgrade)
    and sparse queries (r_k > cell_size -> brute upgrade) alike."""
    rng = np.random.RandomState(7)
    cluster = rng.randn(50_000, 3) * np.array([0.01, 0.01, 0.001])  # hot spot
    background = rng.rand(2_000, 3) * np.array([10.0, 10.0, 0.3]) - 5.0
    pos = np.concatenate([cluster, background])
    d = rng.randn(len(pos), 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    flux = rng.rand(len(pos), 3)

    k = 32
    grid = pgrid.build_photon_grid(pos, d, flux, k, np.float64)
    gp = np.asarray(grid.arrays.pos)

    q_dense = rng.randn(64, 3) * np.array([0.012, 0.012, 0.002])
    q_sparse = rng.rand(16, 3) * np.array([10.0, 10.0, 0.3]) - 5.0
    for q in (q_dense, q_sparse):
        d2e, idxe, valide, we = pgrid.knn(grid, grid.arrays, jnp.asarray(q), k, exact=True)
        d2e, valide = np.asarray(d2e), np.asarray(valide)
        assert valide.all()
        for i in range(0, len(q), 5):
            ref = np.sort(np.sum((gp - q[i]) ** 2, axis=-1))[:k]
            np.testing.assert_allclose(np.sort(d2e[i]), ref, rtol=1e-9)


def test_knn_subsample_reweighting_is_unbiased():
    """Cells over the read cap M contribute a random M-subsample with flux weight
    occ/M. The flux-density estimate sum(flux*w)/(pi r_k^2) over the capped
    result must agree with the exact-k-NN estimate on a uniform density (where
    ground truth = flux_density) within sampling noise."""
    rng = np.random.RandomState(11)
    n = 120_000
    side = 1.0
    pos = rng.rand(n, 3) * np.array([side, side, 1e-4])  # ~point-plane: huge occupancy
    flux = np.ones((n, 3)) * 2.0
    k = 32
    grid = pgrid.build_photon_grid(pos, pos, flux, k, np.float64)
    assert grid.m_per_cell < 100_000  # the cap must actually bite somewhere
    q = np.column_stack([
        rng.rand(64) * side * 0.8 + side * 0.1,
        rng.rand(64) * side * 0.8 + side * 0.1,
        np.zeros(64),
    ])
    d2, idx, valid, w = pgrid.knn(grid, grid.arrays, jnp.asarray(q), k)
    d2, valid, w = np.asarray(d2), np.asarray(valid), np.asarray(w)
    assert valid.all()
    fl = np.asarray(grid.arrays.flux)[np.asarray(idx)][..., 0]
    r2k = np.max(np.where(valid, d2, 0.0), axis=1)
    est = (fl * w * valid).sum(axis=1) / (np.pi * r2k)
    true_density = 2.0 * n / (side * side)  # flux per unit area
    rel = abs(est.mean() - true_density) / true_density
    assert rel < 0.12, (est.mean(), true_density, rel)


def test_knn_sparse_returns_fewer():
    rng = np.random.RandomState(1)
    pos = rng.rand(5, 3)
    grid = pgrid.build_photon_grid(pos, pos, pos, 50, np.float64)
    d2, idx, valid, w = pgrid.knn(grid, grid.arrays, jnp.asarray(rng.rand(4, 3)), 50)
    assert np.asarray(valid).sum(axis=1).max() <= 5


def test_empty_grid():
    grid = pgrid.build_photon_grid(
        np.zeros((0, 3)), np.zeros((0, 3)), np.zeros((0, 3)), 10
    )
    assert grid.empty


@pytest.mark.slow
def test_photon_map_cross_validates_path_tracer():
    """Photon-mapped and path-traced renders of the same diffuse scene agree.

    Mirrors the reference's only correctness strategy: two independent estimators
    (option.cpp:96-109). Tolerances account for photon-map bias + MC noise."""
    from mcrt_tpu import Scene, RenderConfig, render

    ref = REF_SCENES / "hexagon_room_diffuse.json"
    j = json.loads(ref.read_text())
    j["cameras"][0]["image"] = {"width": 48, "height": 48, "plain": True}
    j["cameras"][0]["sqrtspp"] = 6
    j["photon_map"]["emissions"] = 3e5
    j["photon_map"]["caustic_factor"] = 1.0

    scene = Scene(j, scene_dir=REF_SCENES)
    img_pm = render(scene, 0, RenderConfig(
        dtype="float32", rays_per_chunk=1 << 13, integrator="photon_mapper"))
    img_pt = render(scene, 0, RenderConfig(
        dtype="float32", rays_per_chunk=1 << 13))

    assert np.isfinite(img_pm).all()
    assert (img_pm >= 0).all()
    # Mean image brightness within 10%, smoothed per-region agreement
    m_pm, m_pt = img_pm.mean(), img_pt.mean()
    assert abs(m_pm - m_pt) / m_pt < 0.10, (m_pm, m_pt)
    # 6x6 block means agree within 25% where lit
    blocks_pm = img_pm.reshape(8, 6, 8, 6, 3).mean(axis=(1, 3, 4))
    blocks_pt = img_pt.reshape(8, 6, 8, 6, 3).mean(axis=(1, 3, 4))
    lit = blocks_pt > 0.1 * m_pt
    rel = np.abs(blocks_pm - blocks_pt)[lit] / blocks_pt[lit]
    assert np.percentile(rel, 90) < 0.25, np.percentile(rel, 90)


def test_photon_grid_checkpoint_roundtrip(tmp_path):
    """Built photon grids persist and reload bit-identically (resume support —
    the reference re-emits every run, photon-mapper.cpp:24-232)."""
    rng = np.random.RandomState(3)
    pos = rng.rand(5000, 3)
    d = rng.randn(5000, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    flux = rng.rand(5000, 3)
    grid = pgrid.build_photon_grid(pos, d, flux, 16, np.float32)
    p = tmp_path / "grid.npz"
    pgrid.save_photon_grid(p, grid)
    loaded = pgrid.load_photon_grid(p)
    assert loaded.n_photons == grid.n_photons
    assert loaded.dims == grid.dims
    assert loaded.m_per_cell == grid.m_per_cell
    np.testing.assert_array_equal(np.asarray(loaded.arrays.pos), np.asarray(grid.arrays.pos))
    np.testing.assert_array_equal(np.asarray(loaded.arrays.cell_start), np.asarray(grid.arrays.cell_start))
    q = jnp.asarray(rng.rand(32, 3))
    a = pgrid.knn(grid, grid.arrays, q, 16)
    b = pgrid.knn(loaded, loaded.arrays, q, 16)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_photon_render_resumes_from_checkpoint(tmp_path):
    """render(checkpoint_dir=...) persists photon maps; a second run reuses them
    (and produces the same image)."""
    from mcrt_tpu import Scene, RenderConfig, render

    j = json.loads((REF_SCENES / "hexagon_room_diffuse.json").read_text())
    j["cameras"][0]["image"] = {"width": 16, "height": 16, "plain": True}
    j["cameras"][0]["sqrtspp"] = 1
    j["photon_map"] = {"emissions": 2e4, "caustic_factor": 1.0, "k_nearest_photons": 20}

    scene = Scene(j, scene_dir=REF_SCENES)
    cfg = RenderConfig(dtype="float32", rays_per_chunk=1 << 10, integrator="photon_mapper")
    img1 = render(scene, 0, cfg, checkpoint_dir=tmp_path)
    pm_files = sorted(tmp_path.glob("photons_*.npz"))
    assert len(pm_files) == 2, pm_files
    # Remove the film checkpoint so the image is recomputed from loaded maps
    for f in tmp_path.glob("film_*.npz"):
        f.unlink()
    img2 = render(scene, 0, cfg, checkpoint_dir=tmp_path)
    np.testing.assert_allclose(img1, img2, rtol=1e-6, atol=1e-7)


def test_knn_merge_width_not_bounded_by_cell_cap():
    """Low-occupancy map with per-cell read cap M < k: the one-ring union still
    holds >= k photons within the radius, and the running merge must return all
    k of them — the pre-round-4 code capped the result width at min(k, M) and
    silently under-filled (advisor r3)."""
    rng = np.random.RandomState(5)
    n = 4000
    pos = rng.rand(n, 3) * 10.0
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    flux = rng.rand(n, 3)

    k = 16
    # Force tiny cells: max occupancy (and so M) lands well below k.
    grid = pgrid.build_photon_grid(pos, d, flux, k, np.float64, target_occupancy=2.0)
    assert grid.m_per_cell < k, "setup must produce M < k to exercise the bug"

    q = jnp.asarray(rng.rand(64, 3) * 8.0 + 1.0)
    d2, idx, valid, w = pgrid.knn(grid, grid.arrays, q, k)
    d2 = np.asarray(d2)
    valid = np.asarray(valid)

    gp = np.asarray(grid.arrays.pos)
    r = grid.cell_size
    for i in range(0, 64, 7):
        dist2 = np.sort(np.sum((gp - np.asarray(q)[i]) ** 2, axis=-1))
        n_in_radius = int(np.sum(dist2 < r * r))
        want = dist2[: min(k, n_in_radius)]
        got = np.sort(d2[i][valid[i]])
        assert len(got) == len(want), (len(got), len(want), grid.m_per_cell)
        np.testing.assert_allclose(got, want, rtol=1e-9)
