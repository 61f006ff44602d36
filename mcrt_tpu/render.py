"""Top-level render API: scene file -> image, single-device or sharded.

This is the equivalent of the reference's Camera::capture() driver
(/root/reference/source/camera/camera.cpp:101-181), re-shaped for TPU: instead of
threads pulling 32x32 buckets from a mutex queue, the whole (pixel, sample) space is
a megabatch split into fixed-size ray chunks; each chunk runs the jitted wavefront
integrator and splats into a film accumulator carried across chunks on device.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .camera import camera as cam_mod
from .camera import film as film_mod
from .camera import image as image_mod
from .integrator import path_tracer as pt
from .scene.loader import CameraDef, Scene


# Largest per-dispatch ray count validated on real TPU hardware (v5e). The
# round-3 whole-carry coherence sort faulted the chip at 2^18; round 4 replaced
# that design (sort lives in the intersect wrapper, traversal is the dense
# best-first formulation) and re-validated 2^18 dispatches on v5e (see
# tools/fault_probe.py). render() refuses to dispatch beyond this envelope on
# TPU backends only (CPU/GPU are unaffected — advisor r3); set
# MCRT_UNVALIDATED_CHUNKS=1 to override on unvalidated hardware.
MAX_VALIDATED_RAYS_PER_CHUNK = 1 << 18


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    dtype: str = "float32"
    max_bounces: int = 64
    global_seed: int = 0
    rays_per_chunk: int = 1 << 17     # paths per device dispatch
    sqrtspp: int | None = None        # override scene camera spp
    integrator: str = "path_tracer"   # or "photon_mapper"
    profile_dir: str | None = None    # write a jax.profiler trace of the render loop
    # Persistent-wavefront streaming (path_tracer only): rays_per_chunk paths are
    # streamed through `lanes` device lanes; a lane whose path dies immediately
    # loads the next one, so per-bounce dense work is never spent on idle lanes.
    streamed: bool = True
    lanes: int = 1 << 14  # best measured on v5e (round-5 sweep: 3.3 M rays/s full render)


def _chunk_render_pm_fn(meta, pmcfg, cam: CameraDef, film_cfg, maps, dtype):
    """Photon-mapping analogue of _chunk_render_fn: pass-2 eye trace per chunk."""
    from .integrator import photon_mapper as pm
    from .ops import cluster_bvh

    @functools.partial(jax.jit, static_argnums=())
    def run(tables, cbvh, caustic_arrays, global_arrays, px, py, si, film_acc):
        if cbvh is not None:
            intersect_fn = cluster_bvh.make_intersect_fn(tables, meta, cbvh)
        else:
            intersect_fn = None
        rays = cam_mod.generate_rays(cam, px, py, si, tables.ior, pmcfg.global_seed, dtype)
        radiance = pm.trace(
            tables, meta, pmcfg, maps, caustic_arrays, global_arrays,
            rays.origin, rays.direction, rays.pixel_index, rays.sample_index,
            intersect_fn=intersect_fn,
        )
        return film_acc + film_mod.splat(film_cfg, rays.px, radiance)

    return run


def _chunk_render_pm_streamed_fn(meta, pmcfg, cam: CameraDef, film_cfg, maps, dtype,
                                 spp: int, lanes: int):
    """Persistent-wavefront photon eye pass (mirrors _chunk_render_streamed_fn):
    dead lanes immediately load the next path, so the dense per-bounce k-NN
    estimate work is never spent on idle lanes."""
    from .integrator import photon_mapper as pm
    from .ops import cluster_bvh

    fastbox = film_cfg.filter_name == "box" and film_cfg.radius == 0.5

    @functools.partial(jax.jit, static_argnums=(4,))
    def run(tables, cbvh, caustic_arrays, global_arrays, n, start, film_acc):
        if cbvh is not None:
            intersect_fn = cluster_bvh.make_intersect_fn(tables, meta, cbvh)
        else:
            intersect_fn = None
        radiance = pm.trace_streamed(
            tables, meta, pmcfg, maps, caustic_arrays, global_arrays,
            cam, spp, start, n, min(lanes, n), intersect_fn=intersect_fn,
        )
        if fastbox and n % spp == 0:
            n_px = n // spp
            sums = radiance.reshape(n_px, spp, 3).sum(axis=1)
            upd = jnp.concatenate(
                [sums, jnp.full((n_px, 1), spp, dtype)], axis=1)
            pix0 = start // spp
            zero = jnp.zeros((), pix0.dtype)
            flat = film_acc.reshape(-1, 4)
            cur = jax.lax.dynamic_slice(flat, (pix0, zero), (n_px, 4))
            flat = jax.lax.dynamic_update_slice(flat, cur + upd, (pix0, zero))
            return flat.reshape(film_acc.shape)
        lin = start + jnp.arange(n, dtype=jnp.int32)
        pix = (lin // spp).astype(jnp.uint32)
        px = pix % jnp.uint32(cam.width)
        py = pix // jnp.uint32(cam.width)
        si = (lin % spp).astype(jnp.uint32)
        rays = cam_mod.generate_rays(cam, px, py, si, tables.ior, pmcfg.global_seed, dtype)
        return film_acc + film_mod.splat(film_cfg, rays.px, radiance)

    return run


def _chunk_render_fn(meta, cfg: pt.PTConfig, cam: CameraDef, film_cfg, dtype):
    """Builds the jitted (tables, cbvh, pixel_x, pixel_y, sample_index, film) -> film
    step. Scene tables and the BVH are ARGUMENTS (pytrees), never closures — closing
    over them would bake megabytes of geometry into the HLO as literal constants and
    make tracing take minutes on large scenes."""
    from .ops import cluster_bvh

    @functools.partial(jax.jit, static_argnums=())
    def run(tables, cbvh, px, py, si, film_acc):
        if cbvh is not None:
            intersect_fn = cluster_bvh.make_intersect_fn(tables, meta, cbvh)
        else:
            intersect_fn = None
        rays = cam_mod.generate_rays(
            cam, px, py, si, tables.ior, cfg.global_seed, dtype
        )
        radiance = pt.trace(
            tables, meta, cfg, rays.origin, rays.direction, rays.pixel_index, rays.sample_index,
            intersect_fn=intersect_fn,
        )
        return film_acc + film_mod.splat(film_cfg, rays.px, radiance)

    return run


def _chunk_render_streamed_fn(meta, cfg: pt.PTConfig, cam: CameraDef, film_cfg, dtype,
                              spp: int, lanes: int):
    """Persistent-wavefront chunk step: paths [start, start+n) streamed through
    `lanes` lanes (pt.trace_streamed), then splatted. The only per-dispatch
    inputs are the static chunk size and the scalar `start` — all coordinates
    derive on-device."""
    from .ops import cluster_bvh

    # Box filter at the default radius 0.5 deposits every sample into exactly
    # its own pixel (x0 = x1 = floor(px), film.cpp:61-79 semantics), and the
    # streamed path layout is pixel-major — so the splat of an spp-aligned chunk
    # is a dense reshape-sum + contiguous row update, no scatter. (Scatter-adds
    # cost ~5x the whole trace on the current TPU runtime.)
    fastbox = film_cfg.filter_name == "box" and film_cfg.radius == 0.5

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(tables, cbvh, n, start, film_acc):
        # Everything per-chunk derives on-device from the scalar `start`: a
        # host->device transfer of the (n,) coordinate arrays per dispatch costs
        # more than the whole trace through the axon tunnel (round-4 bisect).
        if cbvh is not None:
            intersect_fn = cluster_bvh.make_intersect_fn(tables, meta, cbvh)
        else:
            intersect_fn = None
        use_px_sums = fastbox and n % spp == 0
        radiance, _ = pt.trace_streamed(
            tables, meta, cfg, cam, spp, start, n, min(lanes, n),
            intersect_fn=intersect_fn, pixel_sums=use_px_sums,
        )
        if use_px_sums:
            n_px = n // spp
            sums = radiance  # already per-pixel sums (16x smaller scatter buffer)
            upd = jnp.concatenate(
                [sums, jnp.full((n_px, 1), spp, dtype)], axis=1
            )
            pix0 = start // spp
            # Both indices must share a dtype: under jax_enable_x64 the literal 0
            # would promote to int64 while pix0 stays int32 (round-4 red suite).
            zero = jnp.zeros((), pix0.dtype)
            flat = film_acc.reshape(-1, 4)
            cur = jax.lax.dynamic_slice(flat, (pix0, zero), (n_px, 4))
            flat = jax.lax.dynamic_update_slice(flat, cur + upd, (pix0, zero))
            return flat.reshape(film_acc.shape)
        lin = start + jnp.arange(n, dtype=jnp.int32)
        pix = (lin // spp).astype(jnp.uint32)
        px = pix % jnp.uint32(cam.width)
        py = pix // jnp.uint32(cam.width)
        si = (lin % spp).astype(jnp.uint32)
        rays = cam_mod.generate_rays(cam, px, py, si, tables.ior, cfg.global_seed, dtype)
        return film_acc + film_mod.splat(film_cfg, rays.px, radiance)

    return run


def build_device_bvh(scene: Scene, tables, dtype):
    """ClusterBVH when the scene requests a BVH, else None."""
    return scene.build_cluster_bvh(np.dtype(dtype))


def _ckpt_key(cfg: RenderConfig, cam, spp: int, scene_hash: str) -> str:
    """Fingerprint of everything that must match for a checkpoint to be resumable.
    scene_hash covers the scene JSON + loaded geometry: editing a scene (move a
    light, change a material) invalidates old checkpoints instead of silently
    resuming them (advisor r3)."""
    return (
        f"{cam.width}x{cam.height}_spp{spp}_b{cfg.max_bounces}_s{cfg.global_seed}"
        f"_c{cfg.rays_per_chunk}_{cfg.integrator}_{cfg.dtype}_{scene_hash}"
    )


def render(
    scene: Scene,
    camera_idx: int = 0,
    cfg: RenderConfig = RenderConfig(),
    verbose: bool = False,
    checkpoint_dir=None,
    checkpoint_every_s: float = 30.0,
):
    """Render one camera of a scene. Returns linear HDR image (H, W, 3) numpy.

    checkpoint_dir: if set, the film accumulator + progress counter are persisted
    there periodically (preemption-safe; the reference has no equivalent — a killed
    render loses everything, camera.cpp:170-181). A matching checkpoint is resumed
    automatically; a mismatched one (different resolution/spp/seed/...) is ignored.
    """
    import os as _os

    if (
        cfg.rays_per_chunk > MAX_VALIDATED_RAYS_PER_CHUNK
        and any(d.platform in ("tpu", "axon") for d in jax.devices())
        and not _os.environ.get("MCRT_UNVALIDATED_CHUNKS")
    ):
        raise ValueError(
            f"rays_per_chunk={cfg.rays_per_chunk} exceeds the TPU-validated envelope "
            f"({MAX_VALIDATED_RAYS_PER_CHUNK}); larger dispatches are unvalidated on "
            "this chip generation (render.MAX_VALIDATED_RAYS_PER_CHUNK; set "
            "MCRT_UNVALIDATED_CHUNKS=1 to override)."
        )
    dtype = jnp.dtype(cfg.dtype).type
    cam = scene.cameras[camera_idx]
    sqrtspp = cfg.sqrtspp if cfg.sqrtspp is not None else cam.sqrtspp
    spp = sqrtspp * sqrtspp

    tables = scene.tables(dtype)
    meta = scene.meta()
    ptcfg = pt.PTConfig(max_bounces=cfg.max_bounces, global_seed=cfg.global_seed)
    film_cfg = film_mod.FilmConfig.from_json(cam.width, cam.height, cam.film)

    cbvh = build_device_bvh(scene, tables, cfg.dtype)
    if cfg.integrator == "photon_mapper":
        from .integrator import photon_mapper as pm
        from .ops import cluster_bvh as cb

        pmcfg = pm.PMConfig.from_json(
            scene.photon_map_config,
            max_eye_bounces=cfg.max_bounces,
            global_seed=cfg.global_seed,
        )
        isect_fn = cb.make_intersect_fn(tables, meta, cbvh) if cbvh is not None else None
        # Photon-map checkpoint: built grids persist beside the film checkpoint so
        # a preempted photon render resumes without re-emitting (the reference
        # rebuilds its maps every run, photon-mapper.cpp:24-232).
        maps = None
        pm_ckpt = None
        if checkpoint_dir is not None:
            import hashlib
            import pathlib as _pl

            from .accel import photon_grid as _pg

            key = hashlib.sha1(
                repr((pmcfg, cam.width, cam.height, meta, cfg.dtype,
                      scene.content_hash())).encode()
            ).hexdigest()[:16]
            pm_dir = _pl.Path(checkpoint_dir)
            pm_dir.mkdir(parents=True, exist_ok=True)
            pm_ckpt = (pm_dir / f"photons_caustic_{key}.npz",
                       pm_dir / f"photons_global_{key}.npz")
            if all(p.exists() for p in pm_ckpt):
                try:
                    maps = pm.PhotonMaps(
                        caustic=_pg.load_photon_grid(pm_ckpt[0]),
                        global_=_pg.load_photon_grid(pm_ckpt[1]),
                    )
                    if verbose:
                        print("Resumed photon maps from checkpoint")
                except Exception:
                    maps = None  # corrupt/foreign checkpoint: rebuild
        if maps is None:
            maps = pm.build_photon_maps(tables, meta, pmcfg, scene, isect_fn, verbose=verbose)
            if pm_ckpt is not None:
                from .accel import photon_grid as _pg

                _pg.save_photon_grid(pm_ckpt[0], maps.caustic)
                _pg.save_photon_grid(pm_ckpt[1], maps.global_)
        if cfg.streamed:
            run0 = _chunk_render_pm_streamed_fn(
                meta, pmcfg, cam, film_cfg, maps, dtype, spp, cfg.lanes)
            run = lambda px, py, si, film_acc, start: run0(
                tables, cbvh, maps.caustic.arrays, maps.global_.arrays,
                len(px), jnp.asarray(start, jnp.int32), film_acc)
        else:
            run0 = _chunk_render_pm_fn(meta, pmcfg, cam, film_cfg, maps, dtype)
            run = lambda px, py, si, film_acc, start: run0(
                tables, cbvh, maps.caustic.arrays, maps.global_.arrays, px, py, si, film_acc
            )
    elif cfg.streamed:
        run0 = _chunk_render_streamed_fn(meta, ptcfg, cam, film_cfg, dtype, spp, cfg.lanes)
        run = lambda px, py, si, film_acc, start: run0(
            tables, cbvh, len(px), jnp.asarray(start, jnp.int32), film_acc
        )
    else:
        run0 = _chunk_render_fn(meta, ptcfg, cam, film_cfg, dtype)
        run = lambda px, py, si, film_acc, start: run0(tables, cbvh, px, py, si, film_acc)

    # Build the (pixel, sample) megabatch lazily in chunks.
    n_pix = cam.width * cam.height
    total = n_pix * spp
    chunk = min(cfg.rays_per_chunk, total)
    # Order: all samples of pixel 0..n, sample-major within chunk for locality.
    film_acc = jnp.zeros((cam.height, cam.width, 4), dtype)
    xs_all = np.arange(n_pix, dtype=np.uint32) % cam.width
    ys_all = np.arange(n_pix, dtype=np.uint32) // cam.width

    done = 0
    ckpt_path = None
    if checkpoint_dir is not None:
        import pathlib

        ckpt_dir = pathlib.Path(checkpoint_dir)
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        ckpt_path = ckpt_dir / f"film_{cam.savename}_{camera_idx}.npz"
        if ckpt_path.exists():
            try:
                z = np.load(ckpt_path)
                if str(z["key"]) == _ckpt_key(cfg, cam, spp, scene.content_hash()) and int(z["done"]) <= total:
                    film_acc = jnp.asarray(z["film"], dtype)
                    done = int(z["done"])
                    if verbose:
                        print(f"Resumed checkpoint at {done}/{total} rays")
            except Exception:
                pass  # corrupt/foreign checkpoint: start fresh

    import time as _time

    last_ckpt = _time.monotonic()

    def save_ckpt():
        if ckpt_path is None:
            return
        tmp = ckpt_path.with_suffix(".tmp.npz")
        np.savez(tmp, film=np.asarray(jax.device_get(film_acc)), done=done,
                 key=_ckpt_key(cfg, cam, spp, scene.content_hash()))
        tmp.replace(ckpt_path)  # atomic on POSIX

    # Live throughput telemetry (reference progress thread, camera.cpp:183-226):
    # moving average of camera-rays/s -> ETA, printed per chunk.
    profile_ctx = None
    if cfg.profile_dir is not None:
        profile_ctx = jax.profiler.trace(cfg.profile_dir)
        profile_ctx.__enter__()
    t_start = _time.monotonic()
    recent: list[tuple[float, int]] = [(t_start, 0)]  # (time, rays done)
    try:
        while done < total:
            n = min(chunk, total - done)
            idx = (np.arange(done, done + n)) // spp
            si = (np.arange(done, done + n) % spp).astype(np.uint32)
            px = xs_all[idx]
            py = ys_all[idx]
            # A short tail chunk triggers one extra compile; fine for the last dispatch.
            film_acc = run(jnp.asarray(px), jnp.asarray(py), jnp.asarray(si), film_acc, done)
            done += n
            if ckpt_path is not None and _time.monotonic() - last_ckpt > checkpoint_every_s:
                save_ckpt()
                last_ckpt = _time.monotonic()
            if verbose:
                film_acc.block_until_ready()
                now = _time.monotonic()
                recent.append((now, done))
                if len(recent) > 32:
                    recent.pop(0)
                dt = now - recent[0][0]
                rate = (done - recent[0][1]) / dt if dt > 0 else 0.0
                eta = (total - done) / rate if rate > 0 else float("inf")
                print(
                    f"\r{done}/{total} camera rays | {rate / 1e6:.2f} M rays/s | "
                    f"ETA {eta:.0f}s   ",
                    end="", flush=True,
                )
    finally:
        if profile_ctx is not None:
            film_acc.block_until_ready()
            profile_ctx.__exit__(None, None, None)
    if verbose:
        print()
    save_ckpt()

    img = film_mod.scan(film_acc)
    return np.asarray(jax.device_get(img), dtype=np.float64)


def render_to_file(scene: Scene, out_path, camera_idx: int = 0, cfg: RenderConfig = RenderConfig()):
    hdr = render(scene, camera_idx, cfg)
    cam = scene.cameras[camera_idx]
    srgb = image_mod.finalize(hdr, cam.image)
    image_mod.write_tga(out_path, srgb)
    return hdr
