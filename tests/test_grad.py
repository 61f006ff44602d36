"""Differentiability tests: reverse-mode pixel gradients vs finite differences.

The reference is not differentiable; gradients are a new capability of this
framework (SURVEY.md §7 step 7). Material-parameter gradients need no
discontinuity treatment (the integrand is continuous in reflectance/emittance),
so reverse-mode through the detached-sampling path replay must match finite
differences of the same estimator at the same Sobol seeds.
"""
import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcrt_tpu import Scene
from mcrt_tpu.camera import camera as cam_mod
from mcrt_tpu.integrator import path_tracer as pt

REF_SCENES = pathlib.Path("/root/reference/scenes")


@pytest.fixture(scope="module")
def tiny_scene():
    j = json.loads((REF_SCENES / "hexagon_room_diffuse.json").read_text())
    j["cameras"][0]["image"] = {"width": 8, "height": 8, "plain": True}
    j["cameras"][0]["sqrtspp"] = 2
    return Scene(j, scene_dir=REF_SCENES)


def _render_sum(scene, tables, param_name, value):
    """Total image radiance as a scalar function of one material table."""
    t = tables._replace(**{param_name: value})
    cam = scene.cameras[0]
    n = cam.width * cam.height
    px = jnp.asarray(np.arange(n, dtype=np.uint32) % cam.width)
    py = jnp.asarray(np.arange(n, dtype=np.uint32) // cam.width)
    si = jnp.zeros(n, jnp.uint32)
    cfg = pt.PTConfig(max_bounces=4)
    rays = cam_mod.generate_rays(cam, px, py, si, t.ior, cfg.global_seed, jnp.float64)
    radiance = pt.trace(
        t, meta_g, cfg, rays.origin, rays.direction, rays.pixel_index,
        rays.sample_index, differentiable=True,
    )
    return jnp.sum(radiance)


meta_g = None


def test_reflectance_grad_matches_fd(tiny_scene):
    global meta_g
    scene = tiny_scene
    meta_g = scene.meta()
    tables = scene.tables(jnp.float64)

    f = jax.jit(lambda refl: _render_sum(scene, tables, "mat_reflectance", refl))
    refl0 = tables.mat_reflectance
    g = jax.grad(f)(refl0)

    # FD along the single largest-|g| coordinate (cheap but meaningful).
    flat = np.asarray(g).ravel()
    k = int(np.argmax(np.abs(flat)))
    assert np.abs(flat[k]) > 0, "gradient identically zero — replay not differentiable"
    eps = 1e-4
    e = np.zeros_like(flat)
    e[k] = eps
    e = e.reshape(np.asarray(refl0).shape)
    f_plus = float(f(refl0 + e))
    f_minus = float(f(refl0 - e))
    fd = (f_plus - f_minus) / (2 * eps)
    rel = abs(fd - flat[k]) / max(abs(fd), 1e-12)
    assert rel < 1e-3, (fd, flat[k], rel)


def test_emittance_grad_matches_fd(tiny_scene):
    global meta_g
    scene = tiny_scene
    meta_g = scene.meta()
    tables = scene.tables(jnp.float64)

    # Emission enters via surf_radiosity (BSDF-sampled hits) AND light_radiosity
    # (the NEE gather copy); differentiate w.r.t. a shared intensity scale.
    def f(scale):
        cam = scene.cameras[0]
        t = tables._replace(
            surf_radiosity=tables.surf_radiosity * scale,
            light_radiosity=tables.light_radiosity * scale,
        )
        n = cam.width * cam.height
        px = jnp.asarray(np.arange(n, dtype=np.uint32) % cam.width)
        py = jnp.asarray(np.arange(n, dtype=np.uint32) // cam.width)
        si = jnp.zeros(n, jnp.uint32)
        cfg = pt.PTConfig(max_bounces=4)
        rays = cam_mod.generate_rays(cam, px, py, si, t.ior, cfg.global_seed, jnp.float64)
        radiance = pt.trace(
            t, meta_g, cfg, rays.origin, rays.direction, rays.pixel_index,
            rays.sample_index, differentiable=True,
        )
        return jnp.sum(radiance)

    f = jax.jit(f)
    g = float(jax.grad(f)(jnp.asarray(1.0, jnp.float64)))
    assert g > 0, "brighter light must brighten the image"
    eps = 1e-4
    fd = (float(f(1.0 + eps)) - float(f(1.0 - eps))) / (2 * eps)
    # Radiance is LINEAR in emission: grad must equal f(1) and match FD tightly.
    rel = abs(fd - g) / max(abs(fd), 1e-12)
    assert rel < 1e-6, (fd, g, rel)
    np.testing.assert_allclose(g, float(f(jnp.asarray(1.0, jnp.float64))), rtol=1e-9)


def test_grad_is_deterministic(tiny_scene):
    global meta_g
    scene = tiny_scene
    meta_g = scene.meta()
    tables = scene.tables(jnp.float64)
    f = jax.jit(lambda refl: _render_sum(scene, tables, "mat_reflectance", refl))
    g1 = jax.grad(f)(tables.mat_reflectance)
    g2 = jax.grad(f)(tables.mat_reflectance)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


# ---------------------------------------------------------------------------------
# Fresnel-coupled parameters (SURVEY §7 hard part 3): specular_roughness, ior,
# transparency route through event probabilities (R_cl, T). Detach policy: the
# Sobol decisions u are parameter-free integers -> the SELECTED event is constant
# under infinitesimal parameter change almost surely; the weight f/pdf (including
# the event-selection probability inside pdf) is evaluated differentiably, so
# reverse mode through the replay equals the derivative of the piecewise-smooth
# estimator. FD agrees wherever no event flips inside the stencil, so we use a
# two-eps Richardson consistency check to reject flipped-decision stencils.
# ---------------------------------------------------------------------------------

def _fd_check(f, x0, g, eps_list=(1e-5, 5e-6), rtol=5e-3):
    """Require AD grad `g` to match central FD at the largest |g| coordinate,
    with FD itself stable across two stencil widths (no event flip)."""
    flat = np.asarray(g).ravel()
    order = np.argsort(-np.abs(flat))
    x0 = np.asarray(x0, np.float64)
    for k in order[:4]:
        if abs(flat[k]) == 0:
            continue
        fds = []
        for eps in eps_list:
            e = np.zeros_like(flat)
            e[k] = eps
            e = e.reshape(x0.shape)
            fds.append((float(f(jnp.asarray(x0 + e))) - float(f(jnp.asarray(x0 - e)))) / (2 * eps))
        if abs(fds[0] - fds[1]) > 0.05 * max(abs(fds[0]), 1e-9):
            continue  # decision flipped inside the stencil; try next coordinate
        rel = abs(fds[0] - flat[k]) / max(abs(fds[0]), 1e-12)
        assert rel < rtol, (k, fds, flat[k], rel)
        return
    pytest.fail("no stable FD coordinate found (all stencils flip events)")


def _scene_8x8(name, sqrtspp=2):
    j = json.loads((REF_SCENES / f"{name}.json").read_text())
    j["cameras"][0]["image"] = {"width": 8, "height": 8, "plain": True}
    j["cameras"][0]["sqrtspp"] = sqrtspp
    j.pop("bvh", None)  # brute-force intersect: exact + differentiable-shape-free
    return Scene(j, scene_dir=REF_SCENES)


@pytest.mark.parametrize("scene_name,param", [
    ("ggx_test", "mat_specular_roughness"),
    ("ior_test", "mat_ior"),
    ("ior_test", "mat_transparency"),
])
def test_fresnel_coupled_grads_match_fd(scene_name, param):
    global meta_g
    scene = _scene_8x8(scene_name)
    meta_g = scene.meta()
    tables = scene.tables(jnp.float64)

    f = jax.jit(lambda v: _render_sum(scene, tables, param, v))
    x0 = getattr(tables, param)
    if param == "mat_transparency":
        # T = 1 is a stationary point of the layered mix on these scenes (and the
        # static mat_opaque flag already froze T = 0 materials); probe T = 0.5.
        x0 = jnp.where(x0 > 0, 0.5, x0)
    g = jax.grad(f)(x0)
    assert np.all(np.isfinite(np.asarray(g))), "non-finite gradient"
    assert np.any(np.asarray(g) != 0), f"gradient identically zero for {param}"
    _fd_check(f, x0, g)
