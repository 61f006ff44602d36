"""Multi-process (multi-host) execution: jax.distributed + global-mesh rendering.

The reference is a single shared-memory process (its whole "backend" is a mutexed
work queue, /root/reference/source/common/work-queue.hpp); scaling past one host is
out of its reach. The TPU-native design (SURVEY §5): every host runs this same
program, `jax.distributed.initialize` wires them into one XLA runtime over DCN,
the mesh spans all chips of all hosts, each host feeds the ray shards that live on
its local chips, and the film accumulator is `psum`-reduced over ICI so every host
(and the checkpointer on host 0) holds the full image.

On a real TPU pod `initialize()` needs no arguments (coordinator/process count are
auto-detected from the TPU metadata); on CPU/GPU fleets pass them explicitly or via
MCRT_COORDINATOR / MCRT_NUM_PROCESSES / MCRT_PROCESS_ID. A 2-process CPU version of
this path runs in CI (tests/test_distributed.py) using Gloo collectives.
"""
from __future__ import annotations

import os

import numpy as np


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Wire this process into the multi-host runtime. No-op if already initialized
    or if running single-process with no coordinator configured."""
    import jax

    coordinator_address = coordinator_address or os.environ.get("MCRT_COORDINATOR")
    if num_processes is None and "MCRT_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["MCRT_NUM_PROCESSES"])
    if process_id is None and "MCRT_PROCESS_ID" in os.environ:
        process_id = int(os.environ["MCRT_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # TPU pod: jax auto-detects; elsewhere single-process, nothing to do.
        if os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
            jax.distributed.initialize()
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_name: str = "rays"):
    """1-D mesh over every chip of every host."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis_name,))


def process_shard(total: int, n_chunks_hint: int = 1):
    """This process's contiguous slice of a length-`total` global ray batch.

    The global batch is laid out so that slice i of `num_processes` lands on
    process i's local devices (matching a 1-D mesh over jax.devices(), which
    orders devices by process)."""
    import jax

    p = jax.process_count()
    i = jax.process_index()
    per = total // p
    assert total % p == 0, f"global batch {total} not divisible by {p} processes"
    return i * per, per


def render_distributed(
    scene,
    camera_idx: int = 0,
    cfg=None,
    verbose: bool = False,
):
    """Multi-host render of one camera. Every process must call this with the same
    arguments; returns the full linear HDR image (H, W, 3) numpy on every host.

    Single-process (p=1) this degrades to the virtual-mesh sharded render used by
    the sharding tests and the driver's dryrun.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from ..camera import film as film_mod
    from ..integrator import path_tracer as pt
    from ..render import RenderConfig
    from . import sharding

    cfg = cfg or RenderConfig()
    dtype = jnp.dtype(cfg.dtype).type
    cam = scene.cameras[camera_idx]
    sqrtspp = cfg.sqrtspp if cfg.sqrtspp is not None else cam.sqrtspp
    spp = sqrtspp * sqrtspp

    tables = scene.tables(dtype)
    meta = scene.meta()
    ptcfg = pt.PTConfig(max_bounces=cfg.max_bounces, global_seed=cfg.global_seed)
    film_cfg = film_mod.FilmConfig.from_json(cam.width, cam.height, cam.film)

    mesh = global_mesh()
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    # One intersect path everywhere (reference scene.cpp:151-176): when the
    # scene requests a BVH, the distributed render routes through the same
    # ClusterBVH as the single-device path (replicated across the mesh).
    cbvh = scene.build_cluster_bvh(np.dtype(cfg.dtype))
    step = sharding.sharded_render_step(
        meta, ptcfg, cam, film_cfg, mesh, dtype, with_bvh=cbvh is not None)

    n_pix = cam.width * cam.height
    total = n_pix * spp
    # Global chunk: divisible by device count, within the validated envelope.
    from ..render import MAX_VALIDATED_RAYS_PER_CHUNK

    chunk = min(cfg.rays_per_chunk, MAX_VALIDATED_RAYS_PER_CHUNK) * n_dev
    chunk = min(chunk, ((total // n_dev) or 1) * n_dev)

    film = jnp.zeros((cam.height, cam.width, 4), dtype)
    done = 0
    with mesh:
        while done < total:
            n = min(chunk, total - done)
            # Pad the tail up to a multiple of the device count with masked lanes
            # (out-of-frame pixel coords -> zero splat weight) instead of rounding
            # down, which silently dropped the last < n_dev samples (advisor r3).
            n_pad = ((n + n_dev - 1) // n_dev) * n_dev
            # This process's slice of the global [done, done+n_pad) range
            start, per = process_shard(n_pad)
            lin = np.arange(done + start, done + start + per, dtype=np.int64)
            pad_lane = lin >= total
            lin = np.minimum(lin, total - 1)
            idx = lin // spp
            px_l = (idx % cam.width).astype(np.uint32)
            py_l = ((idx // cam.width) % cam.height).astype(np.uint32)
            # Out-of-frame x puts every filter tap outside the film => weight 0.
            px_l = np.where(pad_lane, np.uint32(cam.width + 8), px_l)
            si_l = (lin % spp).astype(np.uint32)
            to_global = lambda a: multihost_utils.host_local_array_to_global_array(
                jnp.asarray(a), mesh, P(axis)
            )
            args = (tables, cbvh) if cbvh is not None else (tables,)
            film = step(*args, to_global(px_l), to_global(py_l), to_global(si_l), film)
            done += n
            if verbose and jax.process_index() == 0:
                print(f"\r{done}/{total} rays", end="", flush=True)
    if verbose and jax.process_index() == 0:
        print()
    # out_specs P() => replicated: every device (hence every process) holds the
    # full psum'd film; read the first addressable copy.
    film_local = np.asarray(jax.device_get(film.addressable_data(0)))
    return np.asarray(film_mod.scan(jnp.asarray(film_local, dtype)))
