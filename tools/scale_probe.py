"""Large-scene path tracing on the real chip (VERDICT r4 #8): pipes (~357k
faces, ~2.8k clusters — Pallas traversal) and a 2M-triangle synthetic height
field (~16k clusters — XLA row-gather fallback), fetch-forced timing.

Writes tools/scale_tpu.json.

Usage: python tools/scale_probe.py [paths_lg=17]
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

SIZE = 512
SQRTSPP = 4


def heightfield_scene(n_side=1000):
    """2x n_side^2 triangles over a rippled height field + area light (the same
    synthetic mesh tests/test_scale.py uses on CPU)."""
    import numpy as np
    from mcrt_tpu.scene.loader import Scene

    xs = np.linspace(-10, 10, n_side + 1)
    zs = np.linspace(-10, 10, n_side + 1)
    X, Z = np.meshgrid(xs, zs, indexing="ij")
    Y = np.sin(X * 1.3) * np.cos(Z * 0.9) * 0.8
    verts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    i = np.arange(n_side)
    jj = np.arange(n_side)
    I, J = np.meshgrid(i, jj, indexing="ij")
    v00 = (I * (n_side + 1) + J).ravel()
    v10 = ((I + 1) * (n_side + 1) + J).ravel()
    v01 = (I * (n_side + 1) + J + 1).ravel()
    v11 = ((I + 1) * (n_side + 1) + J + 1).ravel()
    tris = np.concatenate(
        [np.stack([v00, v10, v11], axis=1), np.stack([v00, v11, v01], axis=1)]
    )
    j = {
        "materials": {
            "default": {"reflectance": [0.6, 0.55, 0.5]},
            "light": {"emittance": [2000, 2000, 2000]},
        },
        "bvh": {"type": "binary_sah"},
        "vertices": {
            "ground": verts.tolist(),
        },
        "surfaces": [
            {"type": "object", "vertex_set": "ground", "material": "default",
             "triangles": tris.tolist()},
            {"type": "triangle", "material": "light",
             "vertices": [[-2, 6, -2], [2, 6, -2], [0, 6, 2]]},
        ],
        "cameras": [{
            "focal_length": 35, "sensor_width": 35,
            "eye": [0, 8, -14], "look_at": [0, 0, 0],
            "image": {"width": SIZE, "height": SIZE, "plain": True},
            "sqrtspp": SQRTSPP,
        }],
    }
    return Scene(j, scene_dir=REPO)


def time_scene(name, scene, paths_lg):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mcrt_tpu.integrator import path_tracer as pt
    from mcrt_tpu.render import build_device_bvh
    from mcrt_tpu.ops import cluster_bvh

    dtype = jnp.float32
    tables = scene.tables(dtype)
    meta = scene.meta()
    cam = scene.cameras[0]
    cfg = pt.PTConfig()
    t0 = time.perf_counter()
    dbvh = build_device_bvh(scene, tables, "float32")
    build_s = time.perf_counter() - t0
    C, S = dbvh.tri_id.shape
    pallas = cluster_bvh._pallas_available(dbvh)
    spp = SQRTSPP * SQRTSPP
    LANES = 1 << 13
    NP_ = 1 << paths_lg

    @jax.jit
    def run(tables, dbvh, start):
        ifn = cluster_bvh.make_intersect_fn(tables, meta, dbvh)
        rad, rays_n = pt.trace_streamed(
            tables, meta, cfg, cam, spp, start, NP_, LANES, intersect_fn=ifn)
        return jnp.sum(rad), rays_n

    t0 = time.time()
    s, rc = run(tables, dbvh, jnp.asarray(0, jnp.int32))
    float(s)
    compile_s = time.time() - t0
    t0 = time.time()
    REPS = 3
    for i in range(REPS):
        s, rc = run(tables, dbvh, jnp.asarray(i * NP_, jnp.int32))
    float(s)
    dt = (time.time() - t0) / REPS
    rays = int(rc)
    row = {
        "tris": int(meta.n_tris),
        "clusters": int(C),
        "cluster_size": int(S),
        "pallas_traversal": bool(pallas),
        "build_s": build_s,
        "compile_s": compile_s,
        "dispatch_ms": dt * 1e3,
        "rays_per_dispatch": rays,
        "rays_per_s": rays / dt,
    }
    print(f"{name}: {meta.n_tris} tris, C={C} S={S} pallas={pallas} "
          f"build={build_s:.1f}s -> {rays/dt/1e6:.2f} M rays/s", flush=True)
    return row


def main():
    import jax
    from mcrt_tpu.scene.loader import Scene

    paths_lg = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    print("devices:", jax.devices(), flush=True)
    out = {}

    pipes = pathlib.Path("/root/reference/scenes/pipes.json")
    j = json.loads(pipes.read_text())
    j["cameras"][0]["image"] = {"width": SIZE, "height": SIZE, "plain": True}
    j["cameras"][0]["sqrtspp"] = SQRTSPP
    out["pipes"] = time_scene("pipes", Scene(j, scene_dir=pipes.parent), paths_lg)

    out["heightfield_2M"] = time_scene("heightfield_2M", heightfield_scene(), paths_lg)

    (REPO / "tools" / "scale_tpu.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
