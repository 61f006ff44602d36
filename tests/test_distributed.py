"""Real multi-process execution test: two OS processes, Gloo CPU collectives.

This is the CI stand-in for the multi-host TPU path (SURVEY §5): each process owns
2 virtual CPU devices, `jax.distributed.initialize` joins them into one 4-device
runtime, and `render_distributed` shards the ray megabatch over the global mesh
with the film psum-reduced across processes. The result must match a plain
single-process render of the same scene bit-for-bit up to float association.
"""
import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
WORKER = pathlib.Path(__file__).parent / "_dist_worker.py"


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_render_matches_single(tmp_path):
    port = _free_port()
    env_base = dict(os.environ)
    env_base["PALLAS_AXON_POOL_IPS"] = ""
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env_base["MCRT_COORDINATOR"] = f"127.0.0.1:{port}"
    env_base["MCRT_NUM_PROCESSES"] = "2"
    env_base.pop("JAX_PLATFORMS", None)

    procs = []
    for pid in range(2):
        env = dict(env_base)
        env["MCRT_PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(WORKER), str(tmp_path / f"film_{pid}.npy")],
                env=env, cwd=str(REPO),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    img0 = np.load(tmp_path / "film_0.npy")
    img1 = np.load(tmp_path / "film_1.npy")
    # Both processes hold the same psum'd film
    np.testing.assert_allclose(img0, img1, rtol=1e-6, atol=1e-7)

    # Single-process render of the identical batch (this process: 8 CPU devices)
    from mcrt_tpu import Scene, RenderConfig, render
    from _dist_worker import make_scene_json

    scene = Scene(make_scene_json(), scene_dir=pathlib.Path("/root/reference/scenes"))
    single = render(scene, 0, RenderConfig(dtype="float32", rays_per_chunk=1 << 12))
    np.testing.assert_allclose(img0, single, rtol=2e-4, atol=2e-5)
