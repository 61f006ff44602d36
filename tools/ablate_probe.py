"""Ablation timing of one bounce step on TPU: which sub-stage costs what.

Slope timing: T(reps_hi) - T(reps_lo) over (reps_hi - reps_lo) calls removes the
~25 ms per-fetch constant of the axon tunnel that polluted stage_probe.

Usage: python tools/ablate_probe.py [lg_chunk=16]
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


def timed(fn, *args, label=""):
    import jax.numpy as jnp

    def run(reps):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        force = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(force.astype(jnp.float32)))
        return time.time() - t0

    run(2)  # warm
    lo, hi = 3, 23
    t_lo = run(lo)
    t_hi = run(hi)
    dt = (t_hi - t_lo) / (hi - lo)
    print(f"{label:20s} {dt*1e3:8.2f} ms/call", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mcrt_tpu.scene.loader import Scene
    from mcrt_tpu.integrator import path_tracer as pt
    from mcrt_tpu.integrator import common
    from mcrt_tpu.camera import camera as cam_mod
    from mcrt_tpu.materials import bsdf
    from mcrt_tpu.ops import intersect as isect_mod
    from mcrt_tpu.render import build_device_bvh
    from mcrt_tpu.ops import cluster_bvh
    from mcrt_tpu.sampling import sobol

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

    def mk_state(o, d):
        R = o.shape[0]
        f0 = o[:, 0] * 0.0
        i0 = jnp.zeros((R,), jnp.int32)
        return pt.PathState(
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

    def dummy_isect(o, d):
        R = o.shape[0]
        t = jnp.full((R,), 50.0, dtype)
        sid = (jnp.arange(R, dtype=jnp.int32) % max(meta.n_tris, 1))
        uv = jnp.full((R, 2), 0.3, dtype)
        return isect_mod.Hit(t=t, surf_id=sid, uv=uv, steps=jnp.zeros(2, jnp.int32))

    real_isect = cluster_bvh.make_intersect_fn(tables, meta, dbvh)

    @jax.jit
    def bounce_full(tables, dbvh, o, d):
        ifn = cluster_bvh.make_intersect_fn(tables, meta, dbvh)
        nxt = pt.make_bounce_step(tables, meta, cfg, ifn)(mk_state(o, d))
        return nxt.radiance, nxt.origin

    @jax.jit
    def bounce_dummy(tables, o, d):
        nxt = pt.make_bounce_step(tables, meta, cfg, dummy_isect)(mk_state(o, d))
        return nxt.radiance, nxt.origin

    @jax.jit
    def isect_only(tables, dbvh, o, d):
        ifn = cluster_bvh.make_intersect_fn(tables, meta, dbvh)
        h = ifn(o, d)
        return h.t, h.surf_id

    @jax.jit
    def setup_only(tables, o, d):
        hit = dummy_isect(o, d)
        R = o.shape[0]
        f0 = o[:, 0] * 0.0
        i0 = jnp.zeros((R,), jnp.int32)
        ix = common.interaction_setup(
            tables, meta, o, d, hit,
            (f0 + 1.0)[:, None] * jnp.ones((1, 8), dtype), i0 + 1, i0, f0 + 1.0)
        return ix.position, ix.R_cl

    @jax.jit
    def gather_mats(tables, o):
        R = o.shape[0]
        mat_id = jnp.arange(R, dtype=jnp.int32) % max(meta.n_tris, 1)
        mid = tables.surf_mat[mat_id]
        m = bsdf.gather_materials(tables, mid)
        return m.reflectance, m.ior

    @jax.jit
    def sobol_only(o):
        R = o.shape[0]
        pix = jnp.arange(R, dtype=jnp.uint32)
        ctx = sobol.make_ctx(0, pix, pix, dtype)
        ctx = sobol.shuffled(ctx, pix % 7 + 1)
        acc = 0.0
        for dim in range(7):
            acc = acc + sobol.sample(ctx, dim)
        return acc

    @jax.jit
    def bsdf_bounce_only(tables, o, d):
        hit = dummy_isect(o, d)
        f0 = o[:, 0] * 0.0
        i0 = jnp.zeros((o.shape[0],), jnp.int32)
        ix = common.interaction_setup(
            tables, meta, o, d, hit,
            (f0 + 1.0)[:, None] * jnp.ones((1, 8), dtype), i0 + 1, i0, f0 + 1.0)
        pix = jnp.arange(o.shape[0], dtype=jnp.uint32)
        ctx = sobol.make_ctx(0, pix, pix, dtype)
        b = common.bsdf_bounce(ix, d, ctx, jnp.asarray(1e-4, dtype), flux=False)
        return b.new_dir, b.weight

    timed(isect_only, tables, dbvh, o, d, label="intersect(real)")
    timed(bounce_full, tables, dbvh, o, d, label="bounce(real isect)")
    timed(bounce_dummy, tables, o, d, label="bounce(dummy isect)")
    timed(setup_only, tables, o, d, label="interaction_setup")
    timed(gather_mats, tables, o, label="gather_materials")
    timed(sobol_only, o, label="sobol x7")
    timed(bsdf_bounce_only, tables, o, d, label="bsdf_bounce")


if __name__ == "__main__":
    main()
