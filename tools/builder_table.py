"""Builder-variant benchmark table (VERDICT r3 #8): rays/s, host build time,
cluster stats, traversal rounds, and an MXU-utilization estimate per BVH builder
(the reference's builder-quality tradeoff, /root/reference/README.md:100-102).

Runs the PRODUCTION streamed render loop per builder on the real chip and
writes tools/builder_table.json + a markdown table to stdout.

Usage: python tools/builder_table.py [lanes_lg paths_lg]
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
    from mcrt_tpu.render import build_device_bvh
    from mcrt_tpu.ops import cluster_bvh

    lanes_lg = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    paths_lg = int(sys.argv[2]) if len(sys.argv) > 2 else 17
    LANES, NP_ = 1 << lanes_lg, 1 << paths_lg
    spp = SQRTSPP * SQRTSPP

    rows = {}
    for bvh_type in ("binary_sah", "quaternary_sah", "octree"):
        j = json.loads(SCENE.read_text())
        j["cameras"][0]["image"] = {"width": SIZE, "height": SIZE, "plain": True}
        j["cameras"][0]["sqrtspp"] = SQRTSPP
        j["bvh"] = {"type": bvh_type, "bins_per_axis": j.get("bvh", {}).get("bins_per_axis", 8)}
        scene = Scene(j, scene_dir=SCENE.parent)
        dtype = jnp.float32
        tables = scene.tables(dtype)
        meta = scene.meta()
        cam = scene.cameras[0]
        t0 = time.perf_counter()
        dbvh = build_device_bvh(scene, tables, "float32")
        build_s = time.perf_counter() - t0
        C, S = dbvh.tri_id.shape

        cfg = pt.PTConfig()

        @jax.jit
        def run(tables, dbvh, start):
            ifn = cluster_bvh.make_intersect_fn(tables, meta, dbvh)
            rad, rays_n = pt.trace_streamed(
                tables, meta, cfg, cam, spp, start, NP_, LANES, intersect_fn=ifn
            )
            return jnp.sum(rad), rays_n

        s, rc = run(tables, dbvh, jnp.asarray(0, jnp.int32))
        float(s)  # force completion (axon block_until_ready is a no-op)
        t0 = time.time()
        REPS = 3
        for i in range(REPS):
            s, rc = run(tables, dbvh, jnp.asarray(i * NP_, jnp.int32))
        float(s)
        dt = (time.time() - t0) / REPS
        rays = int(rc)

        # Diagnostic: primary-traversal candidate/round counters (stats carry).
        cfg_d = pt.PTConfig(collect_traversal_stats=True)

        @jax.jit
        def run_d(tables, dbvh, start):
            ifn = cluster_bvh.make_intersect_fn(tables, meta, dbvh)
            def tr(o, d):
                h = ifn(o, d)
                return h
            rad, stats = pt.trace(
                tables, meta, cfg_d,
                *_first_rays(cam, tables, dtype, LANES, spp),
                return_stats=True, intersect_fn=ifn,
            )
            return stats["traversal_steps"], stats["rays"]

        ts, rays_d = run_d(tables, dbvh, 0)
        cands, rounds = int(ts[0]), int(ts[1])
        # Scale primary rounds to the streamed dispatch by ray count, x2 for the
        # shadow traversals (same machinery): einsum + one-hot gather FLOPs.
        B = LANES // 256
        scale = 2.0 * rays / max(int(rays_d), 1)
        einsum_flops = rounds * scale * (B * 256 * 10 * 4 * S * 2) * 6  # bf16x6
        gather_flops = (
            rounds * scale * (B * C * (40 * S + S + 3) * 2) * 3 if dbvh.val0 is not None else 0.0
        )
        v5e_peak_bf16 = 197e12
        mxu_busy = (einsum_flops + gather_flops) / dt / v5e_peak_bf16

        rows[bvh_type] = {
            "rays_per_s": rays / dt,
            "dispatch_ms": dt * 1e3,
            "build_s": build_s,
            "clusters": C,
            "cluster_size": S,
            "primary_rounds_per_dispatch": rounds,
            "primary_candidates": cands,
            "mxu_busy_est": mxu_busy,
        }
        print(f"{bvh_type}: {rays/dt/1e6:.2f} M rays/s build={build_s:.2f}s "
              f"C={C} S={S} rounds={rounds} mxu_busy~{mxu_busy*100:.1f}%", flush=True)

    out = {"scene": "spaceship 512^2 16spp", "lanes": LANES, "paths_per_dispatch": NP_, "rows": rows}
    (REPO / "tools" / "builder_table.json").write_text(json.dumps(out, indent=1))
    print("\n| builder | M rays/s | build s | clusters | rounds/dispatch | MXU-busy est |")
    print("|---|---|---|---|---|---|")
    for k, r in rows.items():
        print(f"| {k} | {r['rays_per_s']/1e6:.2f} | {r['build_s']:.2f} | "
              f"{r['clusters']} | {r['primary_rounds_per_dispatch']} | {r['mxu_busy_est']*100:.1f}% |")


def _first_rays(cam, tables, dtype, n, spp):
    import numpy as np
    import jax.numpy as jnp
    from mcrt_tpu.camera import camera as cam_mod

    lin = np.arange(n, dtype=np.int64)
    idx = lin // spp
    px = jnp.asarray((idx % cam.width).astype(np.uint32))
    py = jnp.asarray(((idx // cam.width) % cam.height).astype(np.uint32))
    si = jnp.asarray((lin % spp).astype(np.uint32))
    r = cam_mod.generate_rays(cam, px, py, si, tables.ior, 0, dtype)
    return r.origin, r.direction, r.pixel_index, r.sample_index


if __name__ == "__main__":
    main()
