"""BVH tests: builder invariants + traversal parity with brute force."""
import numpy as np
import jax.numpy as jnp
import pytest

from mcrt_tpu.accel.bvh_build import build_bvh
from mcrt_tpu.ops import intersect as isect


def _random_tris(n, seed=0, spread=10.0):
    rng = np.random.RandomState(seed)
    v0 = rng.randn(n, 3) * spread
    e1 = rng.randn(n, 3)
    e2 = rng.randn(n, 3)
    return v0, e1, e2


def _bounds(v0, e1, e2):
    v1, v2 = v0 + e1, v0 + e2
    return np.minimum(np.minimum(v0, v1), v2), np.maximum(np.maximum(v0, v1), v2)


@pytest.mark.parametrize("kind", ["binary_sah", "quaternary_sah", "octree"])
def test_builder_invariants(kind):
    v0, e1, e2 = _random_tris(500, 1)
    mins, maxs = _bounds(v0, e1, e2)
    flat = build_bvh(mins, maxs, kind=kind, dtype=np.float64)
    n = len(flat.skip)
    # Every primitive appears exactly once
    assert sorted(flat.prim_order.tolist()) == list(range(500))
    # Skip links point strictly forward (DFS order) and stay in range
    assert np.all(flat.skip > np.arange(n))
    assert np.all(flat.skip <= n)
    # Leaf prim ranges are within bounds and disjoint-covering
    leaves = flat.count > 0
    total = int(flat.count[leaves].sum())
    assert total == 500
    # Child AABBs inside parent AABB: check root covers everything
    np.testing.assert_allclose(flat.bb_min[0], mins.min(axis=0), rtol=1e-6)
    np.testing.assert_allclose(flat.bb_max[0], maxs.max(axis=0), rtol=1e-6)


def test_render_with_bvh_matches_without(tmp_path):
    """Full-scene check: hexagon room rendered with and without BVH must agree."""
    import json, pathlib
    from mcrt_tpu import Scene, RenderConfig, render

    ref = pathlib.Path("/root/reference/scenes/hexagon_room_diffuse.json")
    j = json.loads(ref.read_text())
    j["cameras"][0]["image"] = {"width": 32, "height": 32, "plain": True}
    j["cameras"][0]["sqrtspp"] = 2

    s_bvh = Scene(j, scene_dir=ref.parent)
    assert s_bvh.bvh_config is not None
    j2 = dict(j)
    j2.pop("bvh")
    s_brute = Scene(j2, scene_dir=ref.parent)

    cfg = RenderConfig(dtype="float32", rays_per_chunk=1 << 12)
    img_bvh = render(s_bvh, 0, cfg)
    img_brute = render(s_brute, 0, cfg)
    # Same sampler decisions + same geometry -> identical paths (up to fp assoc.)
    np.testing.assert_allclose(img_bvh, img_brute, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kind", ["binary_sah", "quaternary_sah", "octree"])
@pytest.mark.parametrize("method", ["walk", "bestfirst"])
def test_cluster_bvh_matches_brute_force(kind, method):
    """MXU-dense cluster intersection parity with brute-force Moller-Trumbore,
    for each of the three builders (reference bvh.cpp:24-56 variants)."""
    import jax.numpy as jnp
    from mcrt_tpu.accel.bvh_build import build_bvh
    from mcrt_tpu.ops import cluster_bvh

    n_tris, n_rays = 700, 512
    v0, e1, e2 = _random_tris(n_tris, 7)
    mins, maxs = _bounds(v0, e1, e2)
    flat = build_bvh(mins, maxs, kind=kind, max_leaf=32, strict_leaf=True, dtype=np.float64)

    class _S:
        pass

    sc = _S()
    sc.tri_v0, sc.tri_e1, sc.tri_e2 = v0, e1, e2
    cbvh = cluster_bvh.upload_cluster_bvh(flat, sc, np.float64)

    rng = np.random.RandomState(8)
    origin = jnp.asarray(rng.randn(n_rays, 3) * 20)
    d = rng.randn(n_rays, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    direction = jnp.asarray(d)

    bt, bid, bu, bv, steps = cluster_bvh.traverse(cbvh, origin, direction, block=64, method=method)
    assert int(steps[0]) > 0 and int(steps[1]) > 0

    tt, u, v, valid = isect.intersect_tris_block(
        origin, direction, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(1e-9)
    )
    tt = np.asarray(jnp.where(valid, tt, jnp.inf))
    ref_idx = tt.argmin(axis=-1)
    ref_t = tt.min(axis=-1)
    ref_hit = np.isfinite(ref_t)

    got_hit = np.asarray(bid) >= 0
    np.testing.assert_array_equal(got_hit, ref_hit)
    np.testing.assert_allclose(np.asarray(bt)[got_hit], ref_t[ref_hit], rtol=1e-7)
    np.testing.assert_array_equal(np.asarray(bid)[got_hit], ref_idx[ref_hit])


def test_render_with_cluster_bvh_matches_brute(tmp_path):
    import json, pathlib
    from mcrt_tpu import Scene, RenderConfig, render

    ref = pathlib.Path("/root/reference/scenes/veach_mis.json")
    j = json.loads(ref.read_text())
    j["cameras"][0]["image"] = {"width": 32, "height": 32, "plain": True}
    j["cameras"][0]["sqrtspp"] = 2
    j["bvh"] = {"type": "binary_sah"}

    s_bvh = Scene(j, scene_dir=ref.parent)
    j2 = dict(j)
    j2.pop("bvh")
    s_brute = Scene(j2, scene_dir=ref.parent)

    cfg = RenderConfig(dtype="float32", rays_per_chunk=1 << 12)
    img_bvh = render(s_bvh, 0, cfg)
    img_brute = render(s_brute, 0, cfg)
    np.testing.assert_allclose(img_bvh, img_brute, rtol=2e-3, atol=2e-3)


def test_bestfirst_onehot_gather_path_f32():
    """The f32 upload carries the 3-way bf16 split tables (val0/1/2) and the
    best-first traversal gathers clusters through exact one-hot matmuls; this
    pins that path (incl. the bf16 reconstruction) against the walk traversal
    and the plain-gather path."""
    import jax.numpy as jnp
    from mcrt_tpu.accel.bvh_build import build_bvh
    from mcrt_tpu.ops import cluster_bvh

    v0, e1, e2 = _random_tris(900, 11)
    mins, maxs = _bounds(v0, e1, e2)
    flat = build_bvh(mins, maxs, kind="binary_sah", max_leaf=32, strict_leaf=True)

    class _S:
        pass

    sc = _S()
    sc.tri_v0, sc.tri_e1, sc.tri_e2 = v0, e1, e2
    cbvh = cluster_bvh.upload_cluster_bvh(flat, sc, np.float32)
    assert cbvh.val0 is not None and cbvh.val0.dtype == jnp.bfloat16
    # Exact reconstruction: val0+val1+val2 == combined f32 table
    C, S = cbvh.tri_id.shape
    rec = (cbvh.val0.astype(np.float32) + cbvh.val1.astype(np.float32)
           + cbvh.val2.astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(rec[:, : 40 * S]), np.asarray(cbvh.feat.reshape(C, 40 * S)))
    np.testing.assert_array_equal(
        np.asarray(jnp.round(rec[:, 40 * S : 40 * S + S]).astype(np.int32)),
        np.asarray(cbvh.tri_id))

    rng = np.random.RandomState(3)
    origin = jnp.asarray(rng.randn(512, 3).astype(np.float32) * 20)
    d = rng.randn(512, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    direction = jnp.asarray(d)
    bf = cluster_bvh.traverse(cbvh, origin, direction, block=64, method="bestfirst")
    wk = cluster_bvh.traverse(cbvh, origin, direction, block=64, method="walk")
    np.testing.assert_array_equal(np.asarray(bf[1]), np.asarray(wk[1]))
    hit = np.asarray(bf[1]) >= 0
    np.testing.assert_allclose(np.asarray(bf[0])[hit], np.asarray(wk[0])[hit], rtol=1e-6)
