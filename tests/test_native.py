"""Native (C++) host runtime vs Python fallback parity tests."""
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

from mcrt_tpu import native
from mcrt_tpu.accel import bvh_build
from mcrt_tpu.scene import obj as obj_mod

REF_SCENES = pathlib.Path("/root/reference/scenes")


def _python_parse_obj(path):
    """Run the pure-Python parser regardless of native availability."""
    env = dict(os.environ, MCRT_NO_NATIVE="1")
    # Easier: call the fallback body by monkeypatching — but the native check is
    # inside parse_obj, so spawn-free approach: temporarily disable via env is not
    # read at call time. Instead reimplement the gate:
    import importlib

    import mcrt_tpu.native as nat

    old = nat._lib, nat._load_error
    nat._lib, nat._load_error = None, "forced off"
    try:
        return obj_mod.parse_obj(path)
    finally:
        nat._lib, nat._load_error = old


@pytest.fixture(scope="module")
def native_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_obj_parse_matches_python(native_ok):
    objs = sorted((REF_SCENES / "data").rglob("*.obj"))[:4]
    assert objs, "no reference OBJ assets found"
    for path in objs:
        v_n, n_n, tv_n, tn_n = native.parse_obj_native(path)
        v_p, n_p, tv_p, tn_p = _python_parse_obj(path)
        np.testing.assert_array_equal(tv_n, tv_p, err_msg=str(path))
        np.testing.assert_allclose(v_n, v_p, rtol=0, atol=0, err_msg=str(path))
        np.testing.assert_allclose(n_n, n_p, rtol=0, atol=0, err_msg=str(path))
        if tn_p is None:
            assert tn_n is None or len(tn_n) == len(tv_n)
        else:
            np.testing.assert_array_equal(tn_n, tn_p)


def _check_flat_bvh(flat, tri_min, tri_max):
    """Structural invariants: every primitive in exactly one leaf; leaf bounds
    contain their primitives; skip links are forward and in range."""
    P = len(tri_min)
    assert sorted(flat.prim_order.tolist()) == list(range(P))
    N = len(flat.skip)
    assert np.all(flat.skip > np.arange(N)) and np.all(flat.skip <= N)
    leaves = np.nonzero(flat.count > 0)[0]
    for li in leaves:
        f, c = flat.first[li], flat.count[li]
        prims = flat.prim_order[f : f + c]
        eps = 1e-4
        assert np.all(tri_min[prims] >= flat.bb_min[li] - eps)
        assert np.all(tri_max[prims] <= flat.bb_max[li] + eps)


@pytest.mark.parametrize("kind", ["binary_sah", "quaternary_sah", "octree"])
def test_native_bvh_structure(native_ok, kind):
    rng = np.random.default_rng(0)
    P = 3000
    c = rng.uniform(-10, 10, (P, 3))
    e = rng.uniform(0.01, 0.5, (P, 3))
    tri_min, tri_max = c - e, c + e
    flat = native.build_bvh_native(tri_min, tri_max, kind=kind, max_leaf=8)
    assert flat is not None
    _check_flat_bvh(flat, tri_min, tri_max)


def test_native_bvh_strict_leaf(native_ok):
    rng = np.random.default_rng(1)
    P = 2000
    c = rng.uniform(-5, 5, (P, 3))
    tri_min, tri_max = c - 0.1, c + 0.1
    flat = native.build_bvh_native(tri_min, tri_max, max_leaf=16, strict_leaf=True)
    assert flat.count.max() <= 16
    assert flat.max_leaf <= 16


def test_bvh_build_speed_smoke(native_ok):
    """Native build of 200k primitives should complete well under a second."""
    import time

    rng = np.random.default_rng(3)
    P = 200_000
    cc = rng.uniform(-100, 100, (P, 3))
    tri_min, tri_max = cc - 0.2, cc + 0.2
    t0 = time.perf_counter()
    flat = native.build_bvh_native(tri_min, tri_max, kind="binary_sah", max_leaf=8)
    dt = time.perf_counter() - t0
    assert flat is not None and len(flat.skip) > P / 8
    assert dt < 5.0, f"native BVH build too slow: {dt:.2f}s"
