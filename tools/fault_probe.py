"""Attribute the 2^18-chunk TPU kernel fault to a pipeline stage.

Usage: python tools/fault_probe.py <mode> <log2_chunk>
  mode: full        whole path-tracing step (same as tpu_probe walk)
        nosort      full step with make_intersect_fn(sort_rays=False)
        traverse    cluster-BVH traversal only (primary rays, no bounce loop)
        sortonly    argsort+gather of a PathState-sized pytree only (the round-3
                    whole-carry permute design, kept as the fault repro)
"""
from __future__ import annotations

import json
import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SCENE = pathlib.Path("/root/reference/scenes/spaceship.json")
SIZE = 512
SQRTSPP = 4


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mcrt_tpu.scene.loader import Scene
    from mcrt_tpu.integrator import path_tracer as pt
    from mcrt_tpu.camera import camera as cam_mod
    from mcrt_tpu.render import build_device_bvh
    from mcrt_tpu.ops import cluster_bvh

    mode = sys.argv[1]
    lg = int(sys.argv[2])
    chunk = 1 << lg

    j = json.loads(SCENE.read_text())
    j["cameras"][0]["image"] = {"width": SIZE, "height": SIZE, "plain": True}
    j["cameras"][0]["sqrtspp"] = SQRTSPP
    scene = Scene(j, scene_dir=SCENE.parent)
    dtype = jnp.float32
    tables = scene.tables(dtype)
    meta = scene.meta()
    cam = scene.cameras[0]
    dbvh = build_device_bvh(scene, tables, "float32")
    spp = SQRTSPP * SQRTSPP
    n_pix = SIZE * SIZE

    lin = (np.arange(chunk, dtype=np.int64) * 2654435761) % (n_pix * spp)
    idx = lin // spp
    px = jnp.asarray((idx % SIZE).astype(np.uint32))
    py = jnp.asarray(((idx // SIZE) % SIZE).astype(np.uint32))
    si = jnp.asarray((lin % spp).astype(np.uint32))

    cfg = pt.PTConfig()
    rays = cam_mod.generate_rays(cam, px, py, si, tables.ior, cfg.global_seed, dtype)

    if mode in ("full", "nosort"):
        @jax.jit
        def run(o, d, pix, sidx):
            intersect_fn = cluster_bvh.make_intersect_fn(
                tables, meta, dbvh, sort_rays=(mode != "nosort")
            )
            rad, stats = pt.trace(
                tables, meta, cfg, o, d, pix, sidx,
                return_stats=True, intersect_fn=intersect_fn,
            )
            return jnp.sum(rad), stats["rays"]

        t0 = time.time()
        s, rc = run(rays.origin, rays.direction, rays.pixel_index, rays.sample_index)
        s.block_until_ready()
        print(f"{mode} 2^{lg}: ok sum={float(s):.3f} rays={int(rc)} t={time.time()-t0:.1f}s", flush=True)
    elif mode == "traverse":
        @jax.jit
        def run(o, d):
            t, tid, u, v, steps = cluster_bvh.traverse(dbvh, o, d)
            return jnp.sum(jnp.where(tid >= 0, t, 0.0)), jnp.sum(tid >= 0)

        t0 = time.time()
        s, n = run(rays.origin, rays.direction)
        s.block_until_ready()
        print(f"traverse 2^{lg}: ok sum={float(s):.3f} hits={int(n)} t={time.time()-t0:.1f}s", flush=True)
    elif mode == "sortonly":
        R = chunk
        K = 8
        state = {
            "origin": rays.origin,
            "direction": rays.direction,
            "iors": jnp.ones((R, K), dtype),
            "f1": jnp.zeros((R,), dtype), "f2": jnp.zeros((R,), dtype),
            "f3": jnp.zeros((R,), dtype), "f4": jnp.zeros((R,), dtype),
            "i1": jnp.zeros((R,), jnp.int32), "i2": jnp.zeros((R,), jnp.int32),
            "i3": jnp.zeros((R,), jnp.int32), "i4": jnp.zeros((R,), jnp.int32),
            "b1": jnp.zeros((R,), bool), "b2": jnp.zeros((R,), bool),
            "tp": jnp.ones((R, 3), dtype), "rad": jnp.zeros((R, 3), dtype),
            "u1": px, "u2": si,
        }

        @jax.jit
        def run(state):
            def body(i, st):
                key = pt.coherence_key(
                    st["origin"], st["direction"],
                    jnp.zeros(3, dtype), jnp.ones(3, dtype),
                )
                perm = jnp.argsort(key)
                st = jax.tree_util.tree_map(lambda x: x[perm], st)
                st["origin"] = st["origin"] + 1e-6
                return st
            st = jax.lax.fori_loop(0, 32, body, state)
            return jnp.sum(st["origin"])

        t0 = time.time()
        s = run(state)
        s.block_until_ready()
        print(f"sortonly 2^{lg}: ok sum={float(s):.3f} t={time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
