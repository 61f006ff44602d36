"""Debug: render hexagon room with/without BVH, with/without ray sorting."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import json, pathlib, sys
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
from mcrt_tpu.scene.loader import Scene
from mcrt_tpu.integrator import path_tracer as pt
from mcrt_tpu.camera import camera as cam_mod
from mcrt_tpu.ops import cluster_bvh, intersect as isect
from mcrt_tpu.render import build_device_bvh
import jax

ref = pathlib.Path("/root/reference/scenes/hexagon_room_diffuse.json")
j = json.loads(ref.read_text())
j["cameras"][0]["image"] = {"width": 32, "height": 32, "plain": True}
j["cameras"][0]["sqrtspp"] = 1

scene = Scene(j, scene_dir=ref.parent)
dtype = jnp.float32
tables = scene.tables(dtype)
meta = scene.meta()
cam = scene.cameras[0]
dbvh = build_device_bvh(scene, tables, "float32")

R = 32 * 32
lin = np.arange(R)
px = (lin % 32).astype(np.uint32)
py = (lin // 32).astype(np.uint32)
si = (lin * 0).astype(np.uint32)
rays = cam_mod.generate_rays(cam, jnp.asarray(px), jnp.asarray(py), jnp.asarray(si),
                             tables.ior, 0, dtype)

def run(intersect_fn):
    cfg = pt.PTConfig()
    rad = pt.trace(tables, meta, cfg, rays.origin, rays.direction,
                   rays.pixel_index, rays.sample_index, intersect_fn=intersect_fn)
    return np.asarray(rad)

brute = None
variants = {}
for name, ifn in [
    ("brute", None),
    ("walk_nosort", cluster_bvh.make_intersect_fn(tables, meta, dbvh, sort_rays=False)),
    ("walk_sort", cluster_bvh.make_intersect_fn(tables, meta, dbvh, sort_rays=True)),
]:
    r = run(ifn)
    variants[name] = r
    print(name, "mean", r.mean(), flush=True)

base = variants["brute"]
for k, r in variants.items():
    d = np.abs(r - base)
    print(k, "maxdiff", d.max(), "meandiff", d.mean())
