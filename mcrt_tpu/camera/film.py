"""Film reconstruction: filtered sample splatting as scatter-adds.

Parity with the reference film (/root/reference/source/camera/{film,filter}.*): each
radiance sample deposits into every pixel within the filter radius with weight
filter_x * filter_y; pixels divide by total weight at scan time. The reference's
lock-free atomic splats (film.hpp:33-38) become deterministic `.at[].add` scatter-adds
over a static KxK footprint — functional purity instead of atomics.

Filters (filter.hpp:10-65): box, Mitchell-Netravali (B,C), Catmull-Rom, B-spline,
Hermite, Gaussian, Lanczos — evaluated on the normalized argument x = 2|t|/radius.
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


def _mitchell_netravali(x, B, C):
    k = 6.0 / (6.0 - 2.0 * B)
    a1 = k * (12.0 - 9.0 * B - 6.0 * C) / 6.0
    b1 = k * (-18.0 + 12.0 * B + 6.0 * C) / 6.0
    d1 = k * (6.0 - 2.0 * B) / 6.0
    a2 = k * (-B - 6.0 * C) / 6.0
    b2 = k * (6.0 * B + 30.0 * C) / 6.0
    c2 = k * (-12.0 * B - 48.0 * C) / 6.0
    d2 = k * (8.0 * B + 24.0 * C) / 6.0
    near = d1 + (b1 + a1 * x) * x * x
    far = d2 + (c2 + (b2 + a2 * x) * x) * x
    return jnp.where(x < 1.0, near, far)


def filter_eval(name: str, x):
    """Filter value at normalized x in [0, 2]."""
    if name == "box":
        return jnp.ones_like(x)
    if name == "mitchell-netravali":
        return _mitchell_netravali(x, 1.0 / 3.0, 1.0 / 3.0)
    if name == "catmull-rom":
        return _mitchell_netravali(x, 0.0, 0.5)
    if name == "b-spline":
        return _mitchell_netravali(x, 1.0, 0.0)
    if name == "hermite":
        return _mitchell_netravali(x * 0.5, 0.0, 0.0)
    if name == "gaussian":
        alpha = 2.0
        return jnp.exp(-alpha * x * x) - math.exp(-alpha * 4.0)
    if name == "lanczos":
        pi_x = jnp.pi * x
        safe = jnp.where(x == 0.0, jnp.ones_like(x), x)
        val = 2.0 * jnp.sin(jnp.pi * safe) * jnp.sin(jnp.pi * safe / 2.0) / (jnp.pi * jnp.pi * safe * safe)
        return jnp.where(x == 0.0, jnp.ones_like(x), val)
    raise ValueError(f"unknown filter {name!r}")


DEFAULT_RADII = {
    "box": 0.5,
    "mitchell-netravali": 2.0,
    "catmull-rom": 2.0,
    "b-spline": 1.39,
    "hermite": 1.0,
    "gaussian": 1.71,
    "lanczos": 2.0,
}


@dataclasses.dataclass(frozen=True)
class FilmConfig:
    width: int
    height: int
    filter_name: str = "box"
    radius: float = 0.5

    @staticmethod
    def from_json(width: int, height: int, j: dict | None) -> "FilmConfig":
        if not j:
            return FilmConfig(width, height)
        name = str(j.get("filter", "box")).lower()
        if name not in DEFAULT_RADII:
            name = "box"
        radius = float(j.get("radius", DEFAULT_RADII[name]))
        return FilmConfig(width, height, name, radius)


def splat(cfg: FilmConfig, px, value):
    """Deposit (R,) samples at continuous coords px (R,2) with values (R,3).

    Returns (H, W, 4): rgb weighted sums + weight sum. The footprint window is the
    static K x K pixel block that can be within `radius` of any sample position.
    """
    dtype = value.dtype
    radius = cfg.radius
    K = int(math.floor(2.0 * radius + 1.0))  # max pixels per axis within radius
    two_inv_radius = jnp.asarray(2.0 / radius, dtype)

    x, y = px[:, 0], px[:, 1]
    # First candidate pixel: ceil(p - 0.5 - radius) == floor(p + 0.5 - radius) for
    # non-lattice p; the reference uses int-trunc of (p + 0.5 - radius) with clamping.
    x0 = jnp.floor(x + 0.5 - radius).astype(jnp.int32)
    y0 = jnp.floor(y + 0.5 - radius).astype(jnp.int32)
    x1 = jnp.floor(x - 0.5 + radius).astype(jnp.int32)
    y1 = jnp.floor(y - 0.5 + radius).astype(jnp.int32)

    acc = jnp.zeros((cfg.height * cfg.width, 4), dtype)
    ones = jnp.ones_like(x)

    for dy in range(K):
        yy = y0 + dy
        wy = filter_eval(cfg.filter_name, two_inv_radius * jnp.abs(yy.astype(dtype) + 0.5 - y))
        in_y = (yy >= 0) & (yy < cfg.height) & (yy <= y1)
        for dx in range(K):
            xx = x0 + dx
            wx = filter_eval(cfg.filter_name, two_inv_radius * jnp.abs(xx.astype(dtype) + 0.5 - x))
            in_x = (xx >= 0) & (xx < cfg.width) & (xx <= x1)
            w = jnp.where(in_x & in_y, wx * wy, 0.0)
            idx = jnp.clip(yy, 0, cfg.height - 1) * cfg.width + jnp.clip(xx, 0, cfg.width - 1)
            payload = jnp.concatenate([value * w[:, None], (w * ones)[:, None]], axis=-1)
            acc = acc.at[idx].add(payload)
    return acc.reshape(cfg.height, cfg.width, 4)


def scan(acc):
    """(H, W, 4) accumulator -> (H, W, 3) image: weighted mean, clamped at 0."""
    w = acc[..., 3:4]
    safe_w = jnp.where(w == 0.0, jnp.ones_like(w), w)
    return jnp.maximum(acc[..., :3] / safe_w, 0.0)
