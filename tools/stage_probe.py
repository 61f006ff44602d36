"""Stage-level TPU timing: which part of a bounce costs what.

Times, with forced value fetches (axon block_until_ready is a no-op):
  traverse    traverse_bestfirst alone on camera rays (sorted)
  cull        the dense slab cull + lax.sort only
  sortkey     coherence argsort + gather of (o, d)
  intersect   full make_intersect_fn call (sort + traverse + refine + quadrics)
  bounce1     one full bounce step (intersect + NEE shadow intersect + BSDF)
  raygen      camera ray generation only
Usage: python tools/stage_probe.py [lg_chunk=16]
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


def timed(fn, *args, reps=5, label=""):
    import jax.numpy as jnp
    out = fn(*args)
    force = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(force.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    force = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(force.astype(jnp.float32)))
    dt = (time.time() - t0) / reps
    print(f"{label:12s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mcrt_tpu.scene.loader import Scene
    from mcrt_tpu.integrator import path_tracer as pt
    from mcrt_tpu.camera import camera as cam_mod
    from mcrt_tpu.render import build_device_bvh
    from mcrt_tpu.ops import cluster_bvh

    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    chunk = 1 << lg
    print("devices:", jax.devices(), "chunk=2^%d" % lg, flush=True)

    j = json.loads(SCENE.read_text())
    j["cameras"][0]["image"] = {"width": SIZE, "height": SIZE, "plain": True}
    j["cameras"][0]["sqrtspp"] = SQRTSPP
    scene = Scene(j, scene_dir=SCENE.parent)
    dtype = jnp.float32
    tables = scene.tables(dtype)
    meta = scene.meta()
    cam = scene.cameras[0]
    cfg = pt.PTConfig()
    dbvh = build_device_bvh(scene, tables, "float32")
    spp = SQRTSPP * SQRTSPP

    lin = np.arange(chunk, dtype=np.int64)
    idx = lin // spp
    px = jnp.asarray((idx % SIZE).astype(np.uint32))
    py = jnp.asarray(((idx // SIZE) % SIZE).astype(np.uint32))
    si = jnp.asarray((lin % spp).astype(np.uint32))

    @jax.jit
    def raygen(tables):
        rays = cam_mod.generate_rays(cam, px, py, si, tables.ior, 0, dtype)
        return rays.origin, rays.direction

    o, d = raygen(tables)
    o.block_until_ready()

    @jax.jit
    def sortkey(dbvh, o, d):
        key = cluster_bvh.coherence_key(o, d, dbvh.bb_min[0], dbvh.bb_max[0])
        perm = jnp.argsort(key)
        return o[perm], d[perm]

    os_, ds_ = sortkey(dbvh, o, d)

    @jax.jit
    def trav(dbvh, o, d):
        t, tid, u, v, steps = cluster_bvh.traverse_bestfirst(dbvh, o, d)
        return t, tid

    @jax.jit
    def cull_only(dbvh, o, d):
        # replicate cull+sort from traverse_bestfirst, return sorted keys
        K = 256
        B = o.shape[0] // K
        ob = o.reshape(B, K, 3)
        db = d.reshape(B, K, 3)
        inv_d = 1.0 / db
        big = jnp.asarray(np.finfo(np.float32).max, dtype)
        C = dbvh.cl_bb_min.shape[0]
        CT = min(128, C)
        n_tiles = -(-C // CT)
        Cpad = n_tiles * CT
        cl_lo = jnp.concatenate([dbvh.cl_bb_min, jnp.full((Cpad - C, 3), np.inf, dtype)], 0) if Cpad > C else dbvh.cl_bb_min
        cl_hi = jnp.concatenate([dbvh.cl_bb_max, jnp.full((Cpad - C, 3), np.inf, dtype)], 0) if Cpad > C else dbvh.cl_bb_max

        def cull_tile(i, carry):
            hit_acc, tmin_acc = carry
            lo = jax.lax.dynamic_slice_in_dim(cl_lo, i * CT, CT, 0)
            hi = jax.lax.dynamic_slice_in_dim(cl_hi, i * CT, CT, 0)
            t1 = (lo[None, None, :, :] - ob[:, :, None, :]) * inv_d[:, :, None, :]
            t2 = (hi[None, None, :, :] - ob[:, :, None, :]) * inv_d[:, :, None, :]
            tn = jnp.max(jnp.minimum(t1, t2), axis=-1)
            tf = jnp.min(jnp.maximum(t1, t2), axis=-1)
            h = (tn <= tf) & (tf >= 0.0)
            any_h = jnp.any(h, axis=1)
            tn_min = jnp.min(jnp.where(h, tn, big), axis=1)
            hit_acc = jax.lax.dynamic_update_slice_in_dim(hit_acc, any_h, i * CT, 1)
            tmin_acc = jax.lax.dynamic_update_slice_in_dim(tmin_acc, tn_min, i * CT, 1)
            return hit_acc, tmin_acc

        hit, tlb = jax.lax.fori_loop(
            0, n_tiles, cull_tile,
            (jnp.zeros((B, Cpad), bool), jnp.full((B, Cpad), big, dtype)))
        key = jnp.where(hit[:, :C], tlb[:, :C], big)
        ids = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None, :], (B, C))
        key_s, ids_s = jax.lax.sort((key, ids), dimension=1, num_keys=1)
        return key_s, ids_s

    isect_fn = cluster_bvh.make_intersect_fn(tables, meta, dbvh)

    @jax.jit
    def isect(o, d):
        h = isect_fn(o, d)
        return h.t, h.surf_id

    @jax.jit
    def bounce1(tables, dbvh, o, d):
        ifn = cluster_bvh.make_intersect_fn(tables, meta, dbvh)
        step = pt.make_bounce_step(tables, meta, cfg, ifn)
        R = o.shape[0]
        f0 = o[:, 0] * 0.0
        i0 = jnp.zeros((R,), jnp.int32)
        st = pt.PathState(
            bounce=i0, ray_count=jnp.sum(i0), trav_steps=jnp.zeros(2, jnp.int32),
            path_id=i0 + jnp.arange(R, dtype=jnp.int32), next_path=jnp.sum(i0) + R,
            gen=i0, out_rad=jnp.zeros((1, 1, 3), dtype),
            out_pid=jnp.full((1, 1), -1, jnp.int32),
            pixel_index=px, sample_index=si,
            origin=o, direction=d, medium_ior=f0 + 1.0, refraction_scale=f0 + 1.0,
            ray_dirac=i0 != 0, ray_refraction=i0 != 0, diffuse_depth=i0,
            refraction_level=i0, iors=(f0 + 1.0)[:, None] * jnp.ones((1, 8), dtype),
            ior_count=i0 + 1, throughput=o * 0.0 + 1.0, radiance=o * 0.0,
            alive=i0 == 0, prev_light=i0 - 1, prev_bsdf_pdf=f0,
            prev_select_prob=f0 + 1.0,
        )
        nxt = step(st)
        return nxt.radiance, nxt.origin

    timed(raygen, tables, label="raygen")
    timed(sortkey, dbvh, o, d, label="sortkey")
    timed(cull_only, dbvh, os_, ds_, label="cull+sort")
    timed(trav, dbvh, os_, ds_, label="traverse")
    timed(isect, o, d, label="intersect")
    timed(bounce1, tables, dbvh, o, d, label="bounce1")


if __name__ == "__main__":
    main()
