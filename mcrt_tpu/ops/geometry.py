"""Vector math helpers for batched rays (jnp, dtype-polymorphic).

Everything operates on (..., 3) arrays; no scalars, no Python branching — designed to
live inside jit/scan/while_loop bodies on TPU.
"""
from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def dot3(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def length(v):
    # Double-where: sqrt'(0) = inf on zero-length vectors poisons reverse mode.
    d2 = dot(v, v)
    return jnp.sqrt(jnp.where(d2 > 0.0, d2, 1.0)) * (d2 > 0.0)


def normalize(v, eps=1e-9):
    """Unit vector; |v| floored at eps. The floor is NOT dtype-tiny: normalize of
    a near-zero difference (e.g. light sample - shadow origin when the hit IS the
    light) has reverse-mode partials ~ 1/|v|^3, which overflow to inf under a
    tiny-only guard and turn masked-lane zero cotangents into NaN."""
    return v / jnp.sqrt(jnp.maximum(dot3(v, v), jnp.asarray(eps, v.dtype) ** 2))


def reflect(d, n):
    """GLM-style reflect: d - 2*dot(d,n)*n."""
    return d - 2.0 * dot3(d, n) * n


def orthonormal_basis(n):
    """Duff et al. branchless ONB (reference coordinate-system.cpp:7-18).

    Returns (t, b) tangent/bitangent with [t, b, n] right-handed orthonormal.
    """
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0).astype(n.dtype)
    a = -1.0 / (sign + n[..., 2])
    bval = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * bval, -sign * n[..., 0]], axis=-1
    )
    b = jnp.stack([bval, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, b


def to_local(v, t, b, n):
    """World -> shading-local (z = normal)."""
    return jnp.stack([dot(v, t), dot(v, b), dot(v, n)], axis=-1)


def from_local(v, t, b, n):
    """Shading-local -> world."""
    return v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n


def cos_weighted_hemi(u, v, dtype=None):
    """Cosine-weighted hemisphere sample in local frame (reference sampling.hpp:35-44)."""
    r = jnp.sqrt(u)
    azimuth = v * (2.0 * jnp.pi)
    return jnp.stack(
        [r * jnp.cos(azimuth), r * jnp.sin(azimuth), jnp.sqrt(jnp.maximum(1.0 - u, 0.0))],
        axis=-1,
    )


def uniform_disk(u, v):
    """Uniform unit-disk sample (reference sampling.hpp:29-33). Returns (..., 2)."""
    azimuth = v * (2.0 * jnp.pi)
    r = jnp.sqrt(u)
    return jnp.stack([r * jnp.cos(azimuth), r * jnp.sin(azimuth)], axis=-1)


def power_heuristic(a_pdf, b_pdf):
    a2 = a_pdf * a_pdf
    return a2 / (a2 + b_pdf * b_pdf)


def solve_quadratic(a, b, c):
    """Numerically stable quadratic roots, vectorized (reference util.hpp:60-83).

    Returns (valid, t_min, t_max). Handles the linear (a==0) case; when invalid,
    t_min/t_max are garbage and must be gated by `valid`.
    """
    d = b * b - 4.0 * a * c
    # Double-where: sqrt'(0) = inf on no-root lanes (d < 0 clamped to 0) poisons
    # reverse-mode gradients through masked lanes.
    sqrt_d = jnp.sqrt(jnp.where(d >= 0.0, jnp.maximum(d, 1e-30), 1.0))
    q = -0.5 * (b + jnp.where(b < 0.0, -sqrt_d, sqrt_d))
    safe = lambda x: jnp.where(x == 0.0, jnp.asarray(1.0, x.dtype), x)
    t0 = q / safe(a)
    t1 = c / safe(q)
    quad_valid = (a != 0.0) & (d >= 0.0)
    lin_t = -c / safe(b)
    lin_valid = (a == 0.0) & (b != 0.0)
    t_min = jnp.where(quad_valid, jnp.minimum(t0, t1), lin_t)
    t_max = jnp.where(quad_valid, jnp.maximum(t0, t1), lin_t)
    return quad_valid | lin_valid, t_min, t_max


def cdf_index(cdf, u, tile: int = 4096):
    """searchsorted(cdf, u, side='left') as dense broadcast-compares.

    jnp.searchsorted lowers to a vmapped while-loop of per-lane gathers on TPU —
    measured 4 ms per bounce at chunk 2^16 (40% of the whole shading step,
    round-5 trace). The count of cdf entries below u is the same index computed
    as a (R, n) VPU compare-reduce, tiled to at most R x tile lanes."""
    import jax

    n = cdf.shape[0]
    if n <= tile:
        return jnp.sum((cdf[None, :] < u[:, None]).astype(jnp.int32), axis=1)
    pad = (-n) % tile
    cdf_p = jnp.concatenate([cdf, jnp.full((pad,), jnp.inf, cdf.dtype)]) if pad else cdf
    n_tiles = cdf_p.shape[0] // tile

    def body(i, acc):
        seg = jax.lax.dynamic_slice_in_dim(cdf_p, i * tile, tile, 0)
        return acc + jnp.sum((seg[None, :] < u[:, None]).astype(jnp.int32), axis=1)

    return jax.lax.fori_loop(0, n_tiles, body, jnp.zeros(u.shape, jnp.int32))


def onehot_row_take(x, idx):
    """x[arange(R), idx] for (R, K) x with small K, without per-lane gathers.

    take_along_axis lowers to a serialized gather on TPU; a one-hot masked sum
    over the K columns is pure VPU work for K up to a few hundred."""
    K = x.shape[-1]
    cols = jnp.arange(K)
    mask = cols[None, :] == idx[..., None]
    return jnp.sum(jnp.where(mask, x, 0), axis=-1)
