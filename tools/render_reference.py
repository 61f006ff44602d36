"""Drive the compiled reference renderer to produce golden images.

Creates a scratch scene dir containing ONE modified scene json (plain-mode linear
output, optional resolution/spp override, assets symlinked), runs the interactive
binary with piped stdin, and collects the .tga output.

Usage: python tools/render_reference.py <scene.json> [--spp N] [--size WxH]
       [--camera I] [--photon-map] [--out PATH]
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import shutil
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
BIN = REPO / ".refbuild" / "monte-carlo-ray-tracer"
REF_SCENES = pathlib.Path("/root/reference/scenes")


def render_reference(
    scene_json: pathlib.Path,
    out_tga: pathlib.Path,
    sqrtspp: int | None = None,
    size: tuple[int, int] | None = None,
    camera_idx: int = 0,
    photon_map: bool = False,
    plain: bool = True,
    emissions: int | None = None,
    workdir: pathlib.Path | None = None,
    timeout: int = 3600,
    bvh_off: bool = False,
):
    workdir = workdir or (REPO / "goldens" / "work")
    scene_dir = workdir / "scenes"
    if scene_dir.exists():
        shutil.rmtree(scene_dir)
    scene_dir.mkdir(parents=True)

    j = json.loads(pathlib.Path(scene_json).read_text())
    for ci, cam in enumerate(j["cameras"]):
        img = cam.setdefault("image", {})
        if plain:
            img["plain"] = True
        if size is not None:
            img["width"], img["height"] = size
        if sqrtspp is not None:
            cam["sqrtspp"] = sqrtspp
        cam["savename"] = f"golden_c{ci}"
    if not photon_map:
        j.pop("photon_map", None)
    elif emissions is not None and "photon_map" in j:
        j["photon_map"]["emissions"] = emissions
    if bvh_off:
        j.pop("bvh", None)

    (scene_dir / "scene.json").write_text(json.dumps(j))
    # Symlink asset dir
    if (REF_SCENES / "data").exists():
        os.symlink(REF_SCENES / "data", scene_dir / "data")

    # Interactive prompts: scene number (1), then "use photon mapping? (y/n)" only if
    # the scene has a photon_map block; then waitForInput at the end wants Enter.
    stdin_lines = ["0"]
    if "photon_map" in j:
        stdin_lines.append("y" if photon_map else "n")
    stdin_lines += ["", ""]
    proc = subprocess.run(
        [str(BIN), "scenes"],
        cwd=str(workdir),
        input="\n".join(stdin_lines) + "\n",
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    tga = workdir / f"golden_c{camera_idx}.tga"
    if not tga.exists():
        sys.stderr.write(proc.stdout[-3000:] + "\n" + proc.stderr[-2000:] + "\n")
        raise RuntimeError(f"reference render failed for {scene_json}")
    out_tga.parent.mkdir(parents=True, exist_ok=True)
    shutil.copy(tga, out_tga)
    return out_tga


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--spp", type=int, default=None, help="sqrtspp override")
    ap.add_argument("--size", type=str, default=None)
    ap.add_argument("--camera", type=int, default=0)
    ap.add_argument("--photon-map", action="store_true")
    ap.add_argument("--emissions", type=int, default=None)
    ap.add_argument("--no-plain", action="store_true")
    ap.add_argument("--bvh-off", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    scene = pathlib.Path(args.scene)
    if not scene.exists():
        scene = REF_SCENES / args.scene
    size = tuple(int(x) for x in args.size.split("x")) if args.size else None
    out = pathlib.Path(args.out) if args.out else REPO / "goldens" / (scene.stem + ".tga")
    p = render_reference(
        scene, out, sqrtspp=args.spp, size=size, camera_idx=args.camera,
        photon_map=args.photon_map, plain=not args.no_plain,
        emissions=args.emissions, bvh_off=args.bvh_off,
    )
    print("wrote", p)
