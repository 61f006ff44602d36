"""Photon pipeline on the real chip (VERDICT r3 #5): time a >=10^7-emission
map build (photons/s) and the caustic_sphere 256^2 eye pass (rays/s) on TPU.

Writes tools/photon_tpu.json. Timing forces value fetches (axon
block_until_ready is a no-op — round-4 finding).

Usage: python tools/photon_probe.py [emissions] [size]
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

SCENE = REPO / "tests" / "scenes" / "caustic_sphere.json"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mcrt_tpu.scene.loader import Scene
    from mcrt_tpu.integrator import photon_mapper as pm
    from mcrt_tpu.camera import camera as cam_mod
    from mcrt_tpu.render import build_device_bvh
    from mcrt_tpu.ops import cluster_bvh

    emissions = float(sys.argv[1]) if len(sys.argv) > 1 else 1e7
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    j = json.loads(SCENE.read_text())
    j["cameras"][0]["image"] = {"width": size, "height": size, "plain": True}
    j["cameras"][0]["sqrtspp"] = 4
    j["photon_map"]["emissions"] = emissions
    scene = Scene(j, scene_dir=SCENE.parent)
    dtype = jnp.float32
    tables = scene.tables(dtype)
    meta = scene.meta()
    cam = scene.cameras[0]
    pmcfg = pm.PMConfig.from_json(scene.photon_map_config, max_eye_bounces=64, global_seed=0,
                                  emission_chunk=1 << 18)
    cbvh = build_device_bvh(scene, tables, "float32")
    ifn = cluster_bvh.make_intersect_fn(tables, meta, cbvh) if cbvh is not None else None

    # ---- pass 1: emission + map build ----
    t0 = time.time()
    maps = pm.build_photon_maps(tables, meta, pmcfg, scene, ifn, verbose=True)
    t_build = time.time() - t0
    n_caustic = int(maps.caustic.n_photons)
    n_global = int(maps.global_.n_photons)
    print(f"build: {t_build:.1f}s for {emissions:.0f} emissions -> "
          f"{emissions/t_build/1e6:.2f} M photons/s (caustic={n_caustic} global={n_global})",
          flush=True)

    # ---- pass 2: eye trace, chunked ----
    from mcrt_tpu.camera import film as film_mod

    film_cfg = film_mod.FilmConfig.from_json(cam.width, cam.height, cam.film)

    @jax.jit
    def run(tables, cbvh, ca, ga, px, py, si, film_acc):
        ifn2 = cluster_bvh.make_intersect_fn(tables, meta, cbvh) if cbvh is not None else None
        rays = cam_mod.generate_rays(cam, px, py, si, tables.ior, 0, dtype)
        rad = pm.trace(tables, meta, pmcfg, maps, ca, ga,
                       rays.origin, rays.direction, rays.pixel_index, rays.sample_index,
                       intersect_fn=ifn2)
        return film_acc + film_mod.splat(film_cfg, rays.px, rad)

    spp = 16
    n_pix = size * size
    total = n_pix * spp
    chunk = 1 << 12  # dense eye: keep each dispatch well under the axon watchdog
    film = jnp.zeros((size, size, 4), dtype)
    lin0 = np.arange(chunk)
    idx0 = lin0 // spp
    args0 = (jnp.asarray((idx0 % size).astype(np.uint32)),
             jnp.asarray(((idx0 // size) % size).astype(np.uint32)),
             jnp.asarray((lin0 % spp).astype(np.uint32)))
    t0 = time.time()
    f = run(tables, cbvh, maps.caustic.arrays, maps.global_.arrays, *args0, film)
    float(jnp.sum(f))
    compile_s = time.time() - t0

    t0 = time.time()
    done = 0
    film = jnp.zeros((size, size, 4), dtype)
    while done + chunk <= min(total, chunk * 4):
        lin = np.arange(done, done + chunk)
        idx = lin // spp
        px = jnp.asarray((idx % size).astype(np.uint32))
        py = jnp.asarray(((idx // size) % size).astype(np.uint32))
        si = jnp.asarray((lin % spp).astype(np.uint32))
        film = run(tables, cbvh, maps.caustic.arrays, maps.global_.arrays, px, py, si, film)
        done += chunk
    float(jnp.sum(film))
    dt = time.time() - t0
    eye_rays_per_s = done / dt
    print(f"eye pass: {done} camera rays in {dt:.2f}s -> {eye_rays_per_s/1e6:.2f} M rays/s "
          f"(compile {compile_s:.0f}s)", flush=True)

    # ---- pass 2 (streamed): persistent-wavefront eye pass ----
    import functools

    LANES = 1 << 13

    @functools.partial(jax.jit, static_argnums=(4,))
    def run_s(tables, cbvh, ca, ga, n, start, film_acc):
        ifn2 = cluster_bvh.make_intersect_fn(tables, meta, cbvh) if cbvh is not None else None
        rad = pm.trace_streamed(tables, meta, pmcfg, maps, ca, ga,
                                cam, spp, start, n, LANES, intersect_fn=ifn2)
        n_px = n // spp
        sums = rad.reshape(n_px, spp, 3).sum(axis=1)
        upd = jnp.concatenate([sums, jnp.full((n_px, 1), float(spp), dtype)], axis=1)
        pix0 = start // spp
        zero = jnp.zeros((), pix0.dtype)
        flat = film_acc.reshape(-1, 4)
        cur = jax.lax.dynamic_slice(flat, (pix0, zero), (n_px, 4))
        return jax.lax.dynamic_update_slice(flat, cur + upd, (pix0, zero)).reshape(film_acc.shape)

    schunk = 1 << 15
    film = jnp.zeros((size, size, 4), dtype)
    f = run_s(tables, cbvh, maps.caustic.arrays, maps.global_.arrays, schunk,
              jnp.int32(0), film)
    float(jnp.sum(f))
    t0 = time.time()
    done_s = 0
    film = jnp.zeros((size, size, 4), dtype)
    while done_s + schunk <= min(total, schunk * 3):
        film = run_s(tables, cbvh, maps.caustic.arrays, maps.global_.arrays,
                     schunk, jnp.int32(done_s), film)
        done_s += schunk
    float(jnp.sum(film))
    dts = time.time() - t0
    eye_streamed = done_s / dts
    print(f"eye pass (streamed): {done_s} camera rays in {dts:.2f}s -> "
          f"{eye_streamed/1e6:.2f} M rays/s", flush=True)

    out = {
        "emissions": emissions,
        "build_s": t_build,
        "photons_per_s": emissions / t_build,
        "caustic_photons": n_caustic,
        "global_photons": n_global,
        "eye_rays_per_s": eye_rays_per_s,
        "eye_rays_per_s_streamed": eye_streamed,
        "eye_size": size,
    }
    (REPO / "tools" / "photon_tpu.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
