"""End-to-end golden test: our renderer vs the compiled C++ reference.

The golden TGA in tests/goldens/ was produced by the reference renderer
(linusmossberg/monte-carlo-ray-tracer, built from /root/reference) in `plain`
(linear, no exposure/tonemap) mode at 64x64, sqrtspp=16 (256 spp). Both renders are
noisy Monte Carlo estimates with different RNG streams, so the comparison tolerance
accounts for residual noise: per-pixel agreement is loose, image-mean agreement tight.
"""
import json
import pathlib

import numpy as np
import pytest

from mcrt_tpu import Scene, RenderConfig, render
from mcrt_tpu.camera import image as image_mod

REF_SCENES = pathlib.Path("/root/reference/scenes")
GOLDENS = pathlib.Path(__file__).parent / "goldens"


@pytest.mark.slow
def test_hexagon_room_matches_reference():
    j = json.loads((REF_SCENES / "hexagon_room_diffuse.json").read_text())
    j["cameras"][0]["image"] = {"width": 64, "height": 64, "plain": True}
    j["cameras"][0]["sqrtspp"] = 16
    scene = Scene(j, scene_dir=REF_SCENES)

    hdr = render(scene, 0, RenderConfig(dtype="float32", rays_per_chunk=1 << 16))
    ours = image_mod.finalize(hdr, scene.cameras[0].image)  # plain -> gamma only

    ref = image_mod.read_tga(GOLDENS / "hexagon_room_diffuse_64_s16.tga").astype(np.float64) / 255.0
    ours = np.clip(ours, 0.0, 1.0)

    diff = np.abs(ours - ref)
    # Mean image agreement: both estimators target the same integral.
    assert abs(ours.mean() - ref.mean()) < 0.015, (ours.mean(), ref.mean())
    per_channel = np.abs(ours.mean(axis=(0, 1)) - ref.mean(axis=(0, 1)))
    assert np.all(per_channel < 0.02), per_channel
    # Per-pixel: allow noise but catch structural errors.
    assert np.percentile(diff, 95) < 0.25, np.percentile(diff, 95)
    assert diff.mean() < 0.05, diff.mean()
