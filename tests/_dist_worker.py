"""Worker for tests/test_distributed.py: one process of a 2-process CPU fleet.

Run with env: MCRT_COORDINATOR, MCRT_NUM_PROCESSES, MCRT_PROCESS_ID,
XLA_FLAGS=--xla_force_host_platform_device_count=2. Renders the shared tiny scene
over the global 4-device mesh and writes the HDR film to argv[1].
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

REF_SCENES = pathlib.Path("/root/reference/scenes")


def make_scene_json():
    j = json.loads((REF_SCENES / "hexagon_room_diffuse.json").read_text())
    j["cameras"][0]["image"] = {"width": 16, "height": 16, "plain": True}
    j["cameras"][0]["sqrtspp"] = 2
    return j


def main():
    out_path = pathlib.Path(sys.argv[1])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from mcrt_tpu.parallel import distributed

    distributed.initialize()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    from mcrt_tpu import Scene, RenderConfig

    scene = Scene(make_scene_json(), scene_dir=REF_SCENES)
    img = distributed.render_distributed(
        scene, 0, RenderConfig(dtype="float32", rays_per_chunk=1 << 12)
    )
    import numpy as np

    np.save(out_path, img)
    print(f"process {jax.process_index()}: wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
