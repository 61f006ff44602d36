"""TPU probe: time one path-tracing chunk for each traversal method / chunk size.

Usage: python tools/tpu_probe.py [log2_chunk ...]

Pixels are laid out CONTIGUOUSLY (pixel-major, like the production render loop):
round 4 established that strided sampling destroys block coherence for pinhole
cameras (every block frustum spans the whole view) and probes a workload the
renderer never runs. Timing forces a value fetch — block_until_ready does not
block through the axon tunnel.
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
    from mcrt_tpu.camera import film as film_mod
    from mcrt_tpu.render import build_device_bvh
    from mcrt_tpu.ops import cluster_bvh

    args = sys.argv[1:]
    if "--method" in args:  # legacy flag (sweep was deleted round 3); ignore value
        i = args.index("--method")
        args = args[:i] + args[i + 2:]
    bvh_type = None
    if "--bvh" in args:
        i = args.index("--bvh")
        bvh_type = args[i + 1]
        args = args[:i] + args[i + 2:]
    sizes = [int(a) for a in args] or [16, 17]

    print("devices:", jax.devices(), flush=True)

    j = json.loads(SCENE.read_text())
    j["cameras"][0]["image"] = {"width": SIZE, "height": SIZE, "plain": True}
    j["cameras"][0]["sqrtspp"] = SQRTSPP
    if bvh_type is not None:
        j["bvh"] = {"type": bvh_type}
    scene = Scene(j, scene_dir=SCENE.parent)
    dtype = jnp.float32
    tables = scene.tables(dtype)
    meta = scene.meta()
    cam = scene.cameras[0]
    cfg = pt.PTConfig()
    film_cfg = film_mod.FilmConfig.from_json(cam.width, cam.height, cam.film)
    dbvh = build_device_bvh(scene, tables, "float32")
    print(
        "bvh: nodes=%d clusters=%d S=%d" % (
            dbvh.skip.shape[0], dbvh.tri_id.shape[0], dbvh.tri_id.shape[1]
        ),
        flush=True,
    )

    spp = SQRTSPP * SQRTSPP
    n_pix = SIZE * SIZE

    def make_run(c):
        @jax.jit
        def run_impl(tables, dbvh, px, py, si, film_acc):
            intersect_fn = cluster_bvh.make_intersect_fn(tables, meta, dbvh)
            rays = cam_mod.generate_rays(cam, px, py, si, tables.ior, c.global_seed, dtype)
            radiance, stats = pt.trace(
                tables, meta, c, rays.origin, rays.direction, rays.pixel_index,
                rays.sample_index, return_stats=True, intersect_fn=intersect_fn,
            )
            return (film_acc + film_mod.splat(film_cfg, rays.px, radiance),
                    stats["rays"],
                    stats.get("traversal_steps", jnp.zeros(2, jnp.int32)))
        return run_impl

    S = dbvh.tri_id.shape[1]
    run_impl = make_run(cfg)
    # Stats-collecting variant: accumulating the walk counters through the
    # bounce carry slows TPU codegen 10,000x at chunks >= 2^16 (round-3 bisect;
    # PTConfig.collect_traversal_stats), so counters come from a separate 2^15
    # dispatch and MFU at larger sizes scales rounds by the measured rays ratio.
    import dataclasses as _dc
    run_diag = make_run(_dc.replace(cfg, collect_traversal_stats=True))
    dchunk = 1 << 15
    lin = np.arange(dchunk, dtype=np.int64)
    idx = lin // spp
    pxd = jnp.asarray((idx % SIZE).astype(np.uint32))
    pyd = jnp.asarray(((idx // SIZE) % SIZE).astype(np.uint32))
    sid = jnp.asarray((lin % spp).astype(np.uint32))
    import os as _os
    if _os.environ.get("PROBE_NO_DIAG"):
        diag_rays, diag_steps, diag_rounds = 1, 0, 0
    else:
        _, rc_d, ts_d = run_diag(tables, dbvh, pxd, pyd, sid, jnp.zeros((SIZE, SIZE, 4), dtype))
        diag_rays, diag_steps, diag_rounds = int(rc_d), int(ts_d[0]), int(ts_d[1])
    print(f"diag chunk=2^15: rays={diag_rays} walk_steps={diag_steps} leaf_rounds={diag_rounds}", flush=True)
    for lg in sizes:
        chunk = 1 << lg
        film = jnp.zeros((SIZE, SIZE, 4), dtype)
        lin = np.arange(chunk, dtype=np.int64)
        idx = lin // spp
        px = (idx % SIZE).astype(np.uint32)
        py = ((idx // SIZE) % SIZE).astype(np.uint32)
        si = (lin % spp).astype(np.uint32)
        t0 = time.time()
        f, rc, ts = run_impl(tables, dbvh, jnp.asarray(px), jnp.asarray(py), jnp.asarray(si), film)
        float(jnp.sum(f))
        compile_s = time.time() - t0
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            f, rc, ts = run_impl(tables, dbvh, jnp.asarray(px), jnp.asarray(py), jnp.asarray(si), film)
        float(jnp.sum(f))  # force completion (axon block_until_ready is a no-op)
        dt = (time.time() - t0) / reps
        rays = int(rc)
        # Scale the diagnostic counters by the measured ray ratio.
        walk_steps = int(diag_steps * rays / max(diag_rays, 1))
        leaf_rounds = int(diag_rounds * rays / max(diag_rays, 1))
        # Dense-intersector FLOPs: every outer traversal round runs one
        # (B,K,10)@(B,10,4S) einsum over ALL blocks (masked lanes included).
        B = (chunk + 255) // 256
        # rounds scale ~log-ish with B, not linearly; the ray-ratio scaling is an
        # upper-bound-ish estimate — treat MFU as indicative.
        flops = leaf_rounds * ((dchunk + 255) // 256) * (256 * 10 * 4 * S * 2) * (chunk / dchunk)
        v5e_peak_bf16 = 197e12
        # The intersector runs at Precision.HIGHEST = 6 bf16 passes per f32 matmul.
        mfu_nominal = flops / dt / v5e_peak_bf16
        mxu_busy = 6 * flops / dt / v5e_peak_bf16
        print(
            f"walk{'/' + bvh_type if bvh_type else ''} chunk=2^{lg} compile={compile_s:.1f}s "
            f"time={dt*1e3:.1f}ms rays={rays} rays/path={rays/chunk:.2f} "
            f"rays/s={rays/dt/1e6:.2f}M walk_steps={walk_steps} leaf_rounds={leaf_rounds} "
            f"mfu={mfu_nominal*100:.2f}% mxu_busy={mxu_busy*100:.1f}%",
            flush=True,
        )


if __name__ == "__main__":
    main()
