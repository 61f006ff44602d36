"""Benchmark: path-tracing throughput on the real TPU chip vs the C++ reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

`value` is rays traced per second (primary + shadow rays, counted inside the device
loop) on the benchmark scene. `vs_baseline` is the ratio against the compiled
reference renderer's paths/s * (rays/path) measured on this machine's CPU (the
reference is CPU-only; see BASELINE.md — it publishes no numbers, so the local
build is the baseline).

Run with the default env (TPU via axon). Requires no other TPU-holding process.
"""
from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

# Persistent XLA compile cache: the axon compile RPC is intermittently very slow
# (85-120 s for even trivial programs, measured round 3); caching the serialized
# executable makes every bench run after the first immune to that.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

REPO = pathlib.Path(__file__).resolve().parent
SCENE_NAME = "spaceship"  # headline benchmark scene (BASELINE.json)
SCENE = pathlib.Path(f"/root/reference/scenes/{SCENE_NAME}.json")
SIZE = 512
SQRTSPP = 4
BASELINE_CACHE = REPO / "tools" / "ref_bench.json"


def bench_ours():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mcrt_tpu.scene.loader import Scene
    from mcrt_tpu.integrator import path_tracer as pt
    from mcrt_tpu.camera import camera as cam_mod
    from mcrt_tpu.camera import film as film_mod

    j = json.loads(SCENE.read_text())
    j["cameras"][0]["image"] = {"width": SIZE, "height": SIZE, "plain": True}
    j["cameras"][0]["sqrtspp"] = SQRTSPP
    scene = Scene(j, scene_dir=SCENE.parent)
    dtype = jnp.float32
    tables = scene.tables(dtype)
    meta = scene.meta()
    cam = scene.cameras[0]
    cfg = pt.PTConfig()
    # Traversal stats accumulate through the bounce carry, which slows TPU
    # codegen 10,000x at chunks >= 2^16 (see PTConfig.collect_traversal_stats) —
    # so the timed loop runs stats-OFF and one small diagnostic dispatch
    # (chunk 2^15, unaffected) reports the counters.
    cfg_diag = pt.PTConfig(collect_traversal_stats=True)
    film_cfg = film_mod.FilmConfig.from_json(cam.width, cam.height, cam.film)
    from mcrt_tpu.render import build_device_bvh
    from mcrt_tpu.ops import cluster_bvh
    dbvh = build_device_bvh(scene, tables, "float32")

    def make_run(c):
        @jax.jit
        def run_impl(tables, dbvh, px, py, si, film_acc):
            intersect_fn = (
                cluster_bvh.make_intersect_fn(tables, meta, dbvh)
                if dbvh is not None else None
            )
            rays = cam_mod.generate_rays(cam, px, py, si, tables.ior, c.global_seed, dtype)
            radiance, stats = pt.trace(
                tables, meta, c, rays.origin, rays.direction, rays.pixel_index,
                rays.sample_index, return_stats=True, intersect_fn=intersect_fn,
            )
            return (
                film_acc + film_mod.splat(film_cfg, rays.px, radiance),
                stats["rays"],
                stats.get("traversal_steps", jnp.zeros(2, jnp.int32)),
            )
        return run_impl

    run_diag = make_run(cfg_diag)

    LANES = 1 << 14   # best measured lane count on v5e (round-5 sweep: 2^14 = 3.30 M)
    spp_ = SQRTSPP * SQRTSPP

    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def run_streamed(tables, dbvh, n, start, film_acc):
        intersect_fn = (
            cluster_bvh.make_intersect_fn(tables, meta, dbvh)
            if dbvh is not None else None
        )
        radiance, rays_n = pt.trace_streamed(
            tables, meta, cfg, cam, spp_, start, n, LANES, intersect_fn=intersect_fn,
            pixel_sums=True,
        )
        # Box filter at radius 0.5: trace_streamed already accumulated per-pixel
        # sums (16x smaller scatter buffer; see RegenCfg.pixel_sums).
        n_px_ = n // spp_
        sums = radiance
        upd = jnp.concatenate([sums, jnp.full((n_px_, 1), spp_, dtype)], axis=1)
        pix0 = start // spp_
        flat = film_acc.reshape(-1, 4)
        cur = jax.lax.dynamic_slice(flat, (pix0, 0), (n_px_, 4))
        flat = jax.lax.dynamic_update_slice(flat, cur + upd, (pix0, 0))
        return flat.reshape(film_acc.shape), rays_n, jnp.zeros(2, jnp.int32)

    run = lambda px, py, si, film_acc, start: run_streamed(
        tables, dbvh, len(px), jnp.asarray(start, jnp.int32), film_acc)

    spp = SQRTSPP * SQRTSPP
    n_pix = SIZE * SIZE
    total = n_pix * spp
    # Fault boundary on v5e, bisected with tools/tpu_probe.py + tools/fault_probe.py
    # (round 3): walk@2^16 = 267 M rays/s OK, walk@2^17 = 420 M rays/s OK,
    # walk@2^18 = TPU kernel fault on the FIRST dispatch. Attribution: traversal
    # alone at 2^18 is fine, the argsort+permute alone at 2^18 is fine, and the
    # full bounce step with cfg.sort_rays=False at 2^18 is fine — only the fused
    # combination (per-bounce coherence sort of the whole PathState inside the
    # bounce while_loop + cluster traversal temporaries) faults at R=2^18.
    # 2^17 is the validated envelope; render.py enforces the same bound.
    # (Round 5: the round-4 fault shape is gone — the coherence sort now
    # permutes only (o, d) and the traversal is the Pallas kernel; 2^18
    # re-validated on v5e and measures ~35% faster than 2^17.)
    chunk = 1 << 18
    import numpy as np

    film = jnp.zeros((SIZE, SIZE, 4), dtype)
    # Warmup / compile on the first chunk shape
    idx0 = np.arange(chunk) // spp
    px0 = (idx0 % SIZE).astype(np.uint32)
    py0 = (idx0 // SIZE).astype(np.uint32)
    si0 = (np.arange(chunk) % spp).astype(np.uint32)
    f, rc, ts = run(jnp.asarray(px0), jnp.asarray(py0), jnp.asarray(si0), film, 0)
    float(jnp.sum(f))  # force real completion: block_until_ready does not block
    # through the axon tunnel (round-4 finding — the round-3 headline numbers
    # were enqueue rates, not execution rates)

    t0 = time.time()
    done = 0
    film = jnp.zeros((SIZE, SIZE, 4), dtype)
    ray_counts = []
    while done + chunk <= total:
        lin = np.arange(done, done + chunk)
        idx = lin // spp
        px = (idx % SIZE).astype(np.uint32)
        py = (idx // SIZE).astype(np.uint32)
        si = (lin % spp).astype(np.uint32)
        film, rc, ts = run(jnp.asarray(px), jnp.asarray(py), jnp.asarray(si), film, done)
        # keep rc on device — int() here would force a sync per dispatch and
        # serialize the pipeline being timed (round-1 verdict, weak #9)
        ray_counts.append(rc)
        done += chunk
    float(jnp.sum(film))  # force completion of the whole pipeline inside the timer
    dt = time.time() - t0
    total_rays = int(sum(int(r) for r in ray_counts))
    # Diagnostic pass (stats on, small chunk): walk steps + dense-MXU rounds for
    # this workload's first 2^15 rays (VERDICT r2 #10 observability).
    dchunk = 1 << 15
    idxd = np.arange(dchunk) // spp
    pxd = (idxd % SIZE).astype(np.uint32)
    pyd = (idxd // SIZE).astype(np.uint32)
    sid = (np.arange(dchunk) % spp).astype(np.uint32)
    _, _, ts = run_diag(tables, dbvh, jnp.asarray(pxd), jnp.asarray(pyd),
                        jnp.asarray(sid), jnp.zeros((SIZE, SIZE, 4), dtype))
    walk_steps = int(ts[0])
    leaf_rounds = int(ts[1])
    paths = done
    return {
        "paths": paths,
        "rays": total_rays,
        "time_s": dt,
        "rays_per_s": total_rays / dt,
        "paths_per_s": paths / dt,
        "rays_per_path": total_rays / max(paths, 1),
        "walk_steps": walk_steps,      # from the 2^15 diagnostic dispatch
        "leaf_rounds": leaf_rounds,
    }


def bench_bwd(chunk_lg: int = 17, reps: int = 4):
    """Forward+backward rays/s: value_and_grad of a pixel loss on spaceship 512^2
    with material-parameter gradients (reflectance, specular_roughness, ior,
    transparency), sample indices drawn at 1024 spp — the BASELINE.md north-star
    operating point. The bounce scan is rematerialized (jax.checkpoint) so the
    64-bounce backward fits HBM at the production chunk size."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mcrt_tpu.scene.loader import Scene
    from mcrt_tpu.integrator import path_tracer as pt
    from mcrt_tpu.camera import camera as cam_mod
    from mcrt_tpu.camera import film as film_mod
    from mcrt_tpu.render import build_device_bvh
    from mcrt_tpu.ops import cluster_bvh

    SQRTSPP_BWD = 32  # 1024 spp
    j = json.loads(SCENE.read_text())
    j["cameras"][0]["image"] = {"width": SIZE, "height": SIZE, "plain": True}
    j["cameras"][0]["sqrtspp"] = SQRTSPP_BWD
    scene = Scene(j, scene_dir=SCENE.parent)
    dtype = jnp.float32
    tables = scene.tables(dtype)
    meta = scene.meta()
    cam = scene.cameras[0]
    cfg = pt.PTConfig()
    film_cfg = film_mod.FilmConfig.from_json(cam.width, cam.height, cam.film)
    dbvh = build_device_bvh(scene, tables, "float32")

    PARAM_KEYS = ("mat_reflectance", "mat_specular_roughness", "mat_ior", "mat_transparency")
    params0 = {k: getattr(tables, k) for k in PARAM_KEYS}

    # Differentiable REGENERATING wavefront: a 64-trip lax.scan where dead lanes
    # immediately load the next (pixel, sample) path, so backward-pass trips do
    # ~trips/mean-path-length paths of useful work per lane instead of one.
    # This is what closes the 10-20x fwd/bwd gap of the non-regenerating scan
    # (round-4 weak #4). n_paths per dispatch = chunk; lanes sized so the trip
    # budget comfortably drains them (paths average ~2 bounces on spaceship).
    n_paths = 1 << chunk_lg
    TRIPS = 64
    lanes = max(1024, n_paths // 16)

    def loss_fn(params, tables, dbvh, start):
        t = tables._replace(**params)
        ifn = cluster_bvh.make_intersect_fn(t, meta, dbvh)
        out, rays = pt.trace_streamed(
            t, meta, cfg, cam, 1024, start, n_paths, lanes,
            intersect_fn=ifn, fixed_trips=TRIPS,
        )
        # Box-filter pixel loss: paths are pixel-major at 1024 spp, so the splat
        # is a dense reshape-mean (see render.py fastbox path).
        n_px = n_paths // 1024
        sums = out.reshape(n_px, 1024, 3).sum(axis=1) * (1.0 / 1024.0)
        return jnp.mean(sums ** 2), rays

    vag = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    import numpy as np
    chunk = 1 << chunk_lg

    (loss, rays0), grads = vag(params0, tables, dbvh, jnp.asarray(0, jnp.int32))
    assert np.isfinite(float(loss)), "bwd loss not finite"
    for k, gv in grads.items():
        assert np.all(np.isfinite(np.asarray(gv))), f"non-finite grad for {k}"

    t0 = time.time()
    total_rays = 0
    rays_list = []
    for i in range(reps):
        start = (i * chunk) % (SIZE * SIZE * 1024 - chunk)
        (loss, rays), grads = vag(params0, tables, dbvh, jnp.asarray(start, jnp.int32))
        rays_list.append(rays)
    # Force real completion inside the timer (axon block_until_ready is a no-op).
    float(jnp.sum(grads["mat_reflectance"]))
    dt = time.time() - t0
    total_rays = int(sum(int(r) for r in rays_list))
    return {
        "rays_per_s": total_rays / dt,
        "chunk": chunk,
        "reps": reps,
        "time_s": dt,
        "rays": total_rays,
        "loss": float(loss),
    }


def bench_reference():
    """Reference renderer paths/s on this machine (committed cache; re-measure by
    deleting tools/ref_bench.json with the reference binary built)."""
    if BASELINE_CACHE.exists():
        cache = json.loads(BASELINE_CACHE.read_text())
        if SCENE_NAME in cache:
            return cache[SCENE_NAME]
    binary = REPO / ".refbuild" / "monte-carlo-ray-tracer"
    if not binary.exists():
        return {"paths_per_s": None}
    sys.path.insert(0, str(REPO / "tools"))
    from render_reference import render_reference

    t0 = time.time()
    render_reference(
        SCENE, REPO / "goldens" / "bench_ref.tga", sqrtspp=SQRTSPP,
        size=(SIZE, SIZE), plain=True,
    )
    dt = time.time() - t0
    paths = SIZE * SIZE * SQRTSPP * SQRTSPP
    result = {"paths_per_s": paths / dt, "time_s": dt, "paths": paths}
    cache = json.loads(BASELINE_CACHE.read_text()) if BASELINE_CACHE.exists() else {}
    cache[SCENE_NAME] = result
    BASELINE_CACHE.write_text(json.dumps(cache))
    return result


def bench_bwd_subprocess():
    """Run the fwd+bwd benchmark in a child process (a TPU kernel fault there must
    not kill the headline bench), falling back through chunk sizes. Child stderr
    is surfaced on failure instead of swallowed (the round-4 silent null)."""
    for lg in (19, 17, 15):
        try:
            out = subprocess.run(
                [sys.executable, __file__, "--bwd-only", str(lg)],
                capture_output=True, text=True, timeout=1800, cwd=str(REPO),
            )
            for line in reversed(out.stdout.strip().splitlines()):
                if line.startswith("{"):
                    return json.loads(line)
            print(f"bwd lg={lg} produced no result; stderr tail:\n"
                  + "\n".join(out.stderr.strip().splitlines()[-15:]), file=sys.stderr)
        except Exception as e:
            print(f"bwd lg={lg} failed: {e!r}", file=sys.stderr)
    return None


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--bwd-only":
        lg = int(sys.argv[2]) if len(sys.argv) > 2 else 17
        print(json.dumps(bench_bwd(chunk_lg=lg)), flush=True)
        return
    ours = bench_ours()
    bwd = bench_bwd_subprocess()
    ref = bench_reference()
    vs = None
    if ref.get("paths_per_s"):
        # Compare like with like: rays/s assuming the same rays-per-path.
        ref_rays_per_s = ref["paths_per_s"] * ours["rays_per_path"]
        vs = ours["rays_per_s"] / ref_rays_per_s
    print(
        json.dumps(
            {
                "metric": f"pt_rays_per_s_{SCENE_NAME}512_{SQRTSPP*SQRTSPP}spp",
                "value": round(ours["rays_per_s"], 1),
                "unit": "rays/s",
                "vs_baseline": round(vs, 3) if vs is not None else None,
                "fwd_bwd_rays_per_s_1024spp": round(bwd["rays_per_s"], 1) if bwd else None,
                "fwd_bwd_chunk": bwd["chunk"] if bwd else None,
                "diag_walk_steps_32k": ours["walk_steps"],
                "diag_leaf_rounds_32k": ours["leaf_rounds"],
            }
        )
    )


if __name__ == "__main__":
    main()
