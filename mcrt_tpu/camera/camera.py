"""Camera ray generation: pinhole + thin-lens, vectorized over (pixel, sample) batches.

Parity with the reference's per-pixel loop (/root/reference/source/camera/camera.cpp:66-99):
pixel jitter from Sobol dims PIXEL=0,1 at sequence 0; thin-lens aperture sample from
LENS=2,3; focus distance along `forward`. The whole image is a megabatch: rays for all
(pixel, sample) pairs are generated in one shot, sharded over devices upstream.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import geometry as g
from ..sampling import sobol
from ..scene.loader import CameraDef


class CameraRays(NamedTuple):
    origin: jnp.ndarray       # (R,3)
    direction: jnp.ndarray    # (R,3)
    px: jnp.ndarray           # (R,2) continuous film coordinates of the sample
    pixel_index: jnp.ndarray  # (R,) uint32 linear pixel index
    sample_index: jnp.ndarray # (R,) uint32 sample index within the pixel


def generate_rays(
    cam: CameraDef,
    pixel_x,
    pixel_y,
    sample_index,
    scene_ior,
    global_seed: int = 0,
    dtype=jnp.float32,
) -> CameraRays:
    """Rays for given integer pixel coords (R,) and per-pixel sample indices (R,)."""
    pixel_x = jnp.asarray(pixel_x, jnp.uint32)
    pixel_y = jnp.asarray(pixel_y, jnp.uint32)
    sample_index = jnp.asarray(sample_index, jnp.uint32)
    pixel_index = pixel_y * jnp.uint32(cam.width) + pixel_x

    ctx = sobol.make_ctx(global_seed, pixel_index, sample_index, dtype)
    u0 = sobol.sample(ctx, 0)
    u1 = sobol.sample(ctx, 1)

    sc = lambda v: jnp.asarray(v, dtype)
    pixel_size = sc(cam.sensor_width / cam.width)
    half_w = sc(cam.width * 0.5)
    half_h = sc(cam.height * 0.5)
    px = pixel_x.astype(dtype) + u0
    py = pixel_y.astype(dtype) + u1
    local_x = pixel_size * (half_w - px)
    local_y = pixel_size * (half_h - py)

    forward = jnp.asarray(cam.forward, dtype)
    left = jnp.asarray(cam.left, dtype)
    up = jnp.asarray(cam.up, dtype)
    eye = jnp.asarray(cam.eye, dtype)

    direction = g.normalize(
        forward * sc(cam.focal_length) + left * local_x[:, None] + up * local_y[:, None]
    )
    origin = jnp.broadcast_to(eye, direction.shape)

    if cam.thin_lens:
        u2 = sobol.sample(ctx, 2)
        u3 = sobol.sample(ctx, 3)
        ap = g.uniform_disk(u2, u3) * sc(cam.aperture_radius)
        t_focus = sc(cam.focus_distance) / g.dot(direction, forward)
        focus_point = origin + direction * t_focus[:, None]
        origin = eye + left * ap[:, 0:1] + up * ap[:, 1:2]
        direction = g.normalize(focus_point - origin)

    del scene_ior  # medium ior handled by the integrator's initial state
    return CameraRays(
        origin=origin,
        direction=direction,
        px=jnp.stack([px, py], axis=-1),
        pixel_index=pixel_index,
        sample_index=sample_index,
    )
