"""Parity of the Pallas traversal kernel (interpret mode) vs the XLA best-first
traversal. The kernel is the production TPU path (ops/traverse_kernel.py); on
CPU it runs interpreted, so keep the workload small."""
import json
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from mcrt_tpu.camera import camera as cam_mod
from mcrt_tpu.ops import cluster_bvh
from mcrt_tpu.ops.traverse_kernel import traverse_pallas
from mcrt_tpu.render import build_device_bvh
from mcrt_tpu.scene.loader import Scene

SCENES = pathlib.Path("/root/reference/scenes")


@pytest.fixture(scope="module")
def spaceship_small():
    j = json.loads((SCENES / "spaceship.json").read_text())
    j["cameras"][0]["image"] = {"width": 32, "height": 32, "plain": True}
    j["cameras"][0]["sqrtspp"] = 1
    scene = Scene(j, scene_dir=SCENES)
    tables = scene.tables(jnp.float32)
    dbvh = build_device_bvh(scene, tables, "float32")
    return scene, tables, dbvh


def _camera_rays(scene, tables, n_side):
    cam = scene.cameras[0]
    pix = np.arange(n_side * n_side)
    px = jnp.asarray((pix % n_side).astype(np.uint32))
    py = jnp.asarray((pix // n_side).astype(np.uint32))
    si = jnp.asarray(np.zeros(len(pix), np.uint32))
    rays = cam_mod.generate_rays(cam, px, py, si, tables.ior, 0, jnp.float32)
    return rays.origin, rays.direction


def test_pallas_matches_bestfirst_camera_rays(spaceship_small):
    scene, tables, dbvh = spaceship_small
    o, d = _camera_rays(scene, tables, 32)
    t0, id0, u0, v0, _ = cluster_bvh.traverse_bestfirst(dbvh, o, d)
    t1, id1, u1, v1, _ = traverse_pallas(dbvh, o, d, interpret=True)
    id0, id1 = np.asarray(id0), np.asarray(id1)
    assert (id0 == id1).all()
    hit = id0 >= 0
    assert hit.sum() > 200  # the spaceship fills most of the 32x32 frame
    t0, t1 = np.asarray(t0), np.asarray(t1)
    np.testing.assert_allclose(t1[hit], t0[hit], rtol=5e-6)
    # u/v pick up global-frame rounding; they only seed refine_tri_hit
    np.testing.assert_allclose(np.asarray(u1)[hit], np.asarray(u0)[hit], atol=5e-3)
    np.testing.assert_allclose(np.asarray(v1)[hit], np.asarray(v0)[hit], atol=5e-3)


def test_pallas_parked_rays_cost_nothing_and_miss(spaceship_small):
    scene, tables, dbvh = spaceship_small
    n = 256
    o = jnp.full((n, 3), 2e30, jnp.float32)
    d = jnp.broadcast_to(jnp.asarray([0.577, 0.577, 0.577], jnp.float32), (n, 3))
    t, tid, u, v, steps = traverse_pallas(dbvh, o, d, interpret=True)
    assert (np.asarray(tid) == -1).all()
    assert int(steps[1]) == 0  # a block of parked lanes runs zero rounds


def test_pallas_mixed_live_dead_block(spaceship_small):
    """Dead lanes inside a live block must not stop the live lanes from hitting."""
    scene, tables, dbvh = spaceship_small
    o, d = _camera_rays(scene, tables, 32)
    o = np.asarray(o).copy()
    d = np.asarray(d).copy()
    o[::2] = 2e30
    d[::2] = 0.577
    t1, id1, u1, v1, _ = traverse_pallas(
        dbvh, jnp.asarray(o), jnp.asarray(d), interpret=True)
    t0, id0, u0, v0, _ = cluster_bvh.traverse_bestfirst(
        dbvh, jnp.asarray(o), jnp.asarray(d))
    assert (np.asarray(id1)[::2] == -1).all()
    assert (np.asarray(id1) == np.asarray(id0)).all()
