"""Wavefront path tracer: NEE + MIS + Russian roulette as a fixed-shape device loop.

TPU-native re-architecture of the reference's recursive per-ray integrator
(/root/reference/source/integrator/path-tracer/path-tracer.cpp:14-51 and
source/integrator/integrator.cpp:31-129): a megabatch of rays advances one bounce per
`lax.while_loop` iteration; every per-ray decision (event selection, NEE visibility,
RR) is a masked lane; the loop exits when all lanes die or MAX_BOUNCES is reached.
Two scene intersections per bounce (primary + shadow), exactly like the reference.

The sampler is the pure-function Owen-Sobol of mcrt_tpu.sampling.sobol with the
reference's dimension allocation, so sample decorrelation behavior matches.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..materials import bsdf
from ..ops import geometry as g
from ..ops import intersect as isect
from ..sampling import sobol
from ..scene.loader import SceneMeta, SceneTables
from . import common


@dataclasses.dataclass(frozen=True)
class PTConfig:
    max_bounces: int = 64
    min_ray_depth: int = 3            # RR kicks in past this many diffuse bounces
    min_priority_ray_depth: int = 16  # ... or this many total bounces
    ior_stack_size: int = 8
    sky: bool = True                  # add sky gradient on miss (photon pass 2: False)
    global_seed: int = 0
    # Ray coherence sorting lives INSIDE the BVH intersect wrapper now
    # (ops/cluster_bvh.make_intersect_fn(sort_rays=...)): the round-3 design that
    # permuted the whole ~22-array bounce carry per bounce faulted the v5e chip
    # at 2^18-ray dispatches. The carry stays in lane order permanently.
    collect_traversal_stats: bool = False  # accumulate BVH walk/round counters.
    # OFF by default: joining the traversal's internal loop counters into the
    # bounce-loop carry makes XLA generate catastrophically slow TPU code for
    # chunks >= 2^16 (11.7 s/dispatch vs 0.9 ms measured on v5e, round 3 bisect)
    # while <= 2^15 is unaffected. Enable on a small diagnostic dispatch only.


def ray_offset_eps(dtype) -> float:
    """Shadow-acne offset. The reference uses 1e-9 with f64 (constants.hpp:9); f32
    needs a bigger nudge to survive rounding of position = o + t*d."""
    return 1e-9 if jnp.dtype(dtype).itemsize == 8 else 1e-4


def sky_color(direction):
    """Orange/blue gradient on miss (reference scene.cpp:219-223)."""
    dy = jnp.clip(direction[..., 1], -1.0, 1.0)
    fy = (1.0 + jnp.arcsin(dy) / jnp.pi) / 2.0
    orange = jnp.asarray([1.0, 0.5, 0.0], direction.dtype)
    blue = jnp.asarray([0.0, 0.5, 1.0], direction.dtype)
    return orange * (1.0 - fy[..., None]) + blue * fy[..., None]


# Parked-ray constants: dead lanes are rewritten to a ray far outside any scene,
# pointing away, so the block-synchronous traversal never descends for them (a
# block of all-dead lanes skips the whole tree in one step). See traverse() in
# ops/cluster_bvh.py. The coherence sort inside make_intersect_fn pushes parked
# rays to the tail blocks (their Morton key clips to the far corner).
PARK_DISTANCE = 2e30

# Re-export: the Morton/octant sort key lives with the traversal it serves.
from ..ops.cluster_bvh import coherence_key  # noqa: E402,F401


def scene_bounds(tables: SceneTables, meta: SceneMeta):
    """Conservative scene AABB from the device tables (for ray sort keys)."""
    pts = [tables.tri_v0, tables.tri_v0 + tables.tri_e1, tables.tri_v0 + tables.tri_e2]
    los = [jnp.min(p, axis=0) for p in pts]
    his = [jnp.max(p, axis=0) for p in pts]
    if meta.n_sphs:
        los.append(jnp.min(tables.sph_origin - tables.sph_radius[:, None], axis=0))
        his.append(jnp.max(tables.sph_origin + tables.sph_radius[:, None], axis=0))
    if meta.n_quads:
        los.append(jnp.min(tables.quad_bb_min, axis=0))
        his.append(jnp.max(tables.quad_bb_max, axis=0))
    return jnp.min(jnp.stack(los), axis=0), jnp.max(jnp.stack(his), axis=0)


class PathState(NamedTuple):
    bounce: jnp.ndarray            # (R,) int32 — per-lane: under regeneration each
                                   # lane streams several paths at different depths
    ray_count: jnp.ndarray         # scalar int32: total rays traced (primary+shadow)
    trav_steps: jnp.ndarray        # (2,) int32 [walk_steps, leaf_rounds] (primary rays)
    path_id: jnp.ndarray           # (R,) int32 local path index (regen; else iota)
    next_path: jnp.ndarray         # scalar int32: next unassigned path (regen)
    gen: jnp.ndarray               # (R,) int32 paths completed by this lane (regen)
    out_rad: jnp.ndarray           # (Gcap,R,3) finished-path radiance (regen; else (1,1,3))
    out_pid: jnp.ndarray           # (Gcap,R) int32 finished-path local ids, -1 empty
    pixel_index: jnp.ndarray       # (R,) uint32
    sample_index: jnp.ndarray      # (R,) uint32
    origin: jnp.ndarray            # (R,3)
    direction: jnp.ndarray         # (R,3)
    medium_ior: jnp.ndarray        # (R,)
    refraction_scale: jnp.ndarray  # (R,)
    ray_dirac: jnp.ndarray         # (R,) bool — current ray spawned by dirac event
    ray_refraction: jnp.ndarray    # (R,) bool — current ray is a refraction
    diffuse_depth: jnp.ndarray     # (R,) int32
    refraction_level: jnp.ndarray  # (R,) int32
    iors: jnp.ndarray              # (R,K) RefractionHistory stack
    ior_count: jnp.ndarray         # (R,) int32
    throughput: jnp.ndarray        # (R,3)
    radiance: jnp.ndarray          # (R,3)
    alive: jnp.ndarray             # (R,) bool
    prev_light: jnp.ndarray        # (R,) int32 global surf id of last NEE light (-1)
    prev_bsdf_pdf: jnp.ndarray     # (R,)
    prev_select_prob: jnp.ndarray  # (R,)


def _gather_surface(tables: SceneTables, meta: SceneMeta, sid):
    """Per-hit surface row gathers (area, material id, emission)."""
    s = jnp.maximum(sid, 0)
    return (
        tables.surf_area[s],
        tables.surf_mat[s],
        tables.surf_radiosity[s],
        tables.surf_emissive_idx[s],
    )


def _sample_light_position_from(kind, p0, p1, p2, tri_n, u, v):
    """Uniform area sample + normal on an already-gathered light (tri: sqrt-warp
    triangle.cpp:93-97; sphere: uniform sphere.cpp:37-44). `kind` is f32 0/1
    (from the packed light-table gather in common.sample_direct)."""
    # Triangle
    su = jnp.sqrt(u)[..., None]
    tri_pos = (1.0 - su) * p0 + ((1.0 - v)[..., None] * su) * p1 + (v[..., None] * su) * p2
    # Sphere
    radius = p2[..., 0]
    z = 1.0 - 2.0 * u
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * v
    sph_dir = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    sph_pos = p0 + radius[..., None] * sph_dir
    is_sph = (kind > 0.5)[..., None]
    pos = jnp.where(is_sph, sph_pos, tri_pos)
    normal = jnp.where(is_sph, sph_dir, tri_n)
    return pos, normal


def _sample_light_position(tables: SceneTables, light_idx, u, v):
    """Back-compat wrapper: gather the light row, then sample (photon mapper)."""
    li = jnp.maximum(light_idx, 0)
    return _sample_light_position_from(
        tables.light_kind[li].astype(u.dtype), tables.light_p0[li],
        tables.light_p1[li], tables.light_p2[li], tables.light_normal[li], u, v)


class RegenCfg(NamedTuple):
    """Path-regeneration parameters (persistent wavefront): a dead lane loads
    its own next path instead of idling until the whole dispatch drains — the
    TPU analogue of persistent-threads path regeneration. Without it, dense
    per-bounce work is paid for every lane while the live fraction decays
    (~18% average lane utilization at 16 spp measured round 4).

    Two assignment modes (all three variants were measured on v5e, round 5):

    strided=False (DYNAMIC): a dead lane pulls the globally-next path — lanes
    stay load-balanced, radiance scatter-adds into out_rad[0, path_id]. Best
    for the forward while_loop, whose trip count tracks the slowest lane (a
    lane-strided forward paid its per-lane tail imbalance, -17%).

    strided=True (LANE-STRIDED): lane l owns paths l, l+L, l+2L, ...; radiance
    lands at out_rad[g, l] by masked dense update — no scatter at all, and
    reshape(G*L, 3) is already pixel-major. Best for the fixed-trips
    differentiable scan (+14% fwd+bwd): the trip budget is spent either way,
    and the scatter (and its transpose in reverse mode) disappears. (A third
    variant — dynamic assignment + dense writes + one sort-by-path-id at the
    end — measured worse than both: the (Gcap, L) mask updates cost more per
    trip than the scatter they replaced.)"""
    cam: object          # CameraDef (static)
    width: int           # image width (static)
    spp: int             # samples per pixel (static)
    start: jnp.ndarray   # scalar int32: global path index of local path 0
    n_paths: int         # static: paths this dispatch streams
    lanes: int           # static: L; generations G = ceil(n_paths / L)
    strided: bool        # static: assignment mode (see above)
    pixel_sums: bool     # static (dynamic mode only): accumulate per-PIXEL sums
                         # instead of per-path radiance — the scatter-add's cost
                         # scales with the OUTPUT BUFFER size on this runtime
                         # (measured 4x between 2^15 and 2^18 rows), and the box
                         # filter only ever consumes the per-pixel sums anyway


def make_bounce_step(
    tables: SceneTables,
    meta: SceneMeta,
    cfg: PTConfig,
    intersect_fn: Callable,
    regen: RegenCfg | None = None,
):
    """Builds the single-bounce transition function over PathState."""
    dtype = tables.tri_v0.dtype
    eps = jnp.asarray(ray_offset_eps(dtype), dtype)
    K = cfg.ior_stack_size
    # Loop-invariant packed tables, built ONCE here so they sit outside the
    # bounce while_loop (built inside the step they re-concat every iteration).
    packs = common.build_packs(tables, meta)

    def step(st: PathState) -> PathState:
        base_ctx = sobol.make_ctx(cfg.global_seed, st.pixel_index, st.sample_index, dtype)
        ctx = sobol.shuffled(base_ctx, st.bounce.astype(jnp.uint32) + 1)
        R = st.origin.shape[0]

        hit = intersect_fn(st.origin, st.direction)
        ray_count = st.ray_count + jnp.sum(st.alive.astype(jnp.int32))
        if cfg.collect_traversal_stats and hit.steps is not None:
            trav_steps = st.trav_steps + hit.steps
        else:
            trav_steps = st.trav_steps
        missed = hit.surf_id < 0
        radiance = st.radiance
        if cfg.sky:
            radiance = radiance + jnp.where(
                (st.alive & missed)[:, None], st.throughput * sky_color(st.direction), 0.0
            )
        alive = st.alive & ~missed

        ix = common.interaction_setup(
            tables, meta, st.origin, st.direction, hit,
            st.iors, st.ior_count, st.refraction_level, st.medium_ior,
            packs=packs,
        )

        # ---- sampleEmissive (integrator.cpp:93-110) ----
        radiance = radiance + st.throughput * common.sample_emissive(
            ix, st.direction, st.bounce, st.ray_dirac, st.prev_light,
            st.prev_bsdf_pdf, st.prev_select_prob, hit.surf_id, alive,
        )

        # ---- sampleDirect / NEE (integrator.cpp:31-87) ----
        if meta.has_lights:
            nee, prev_light, prev_select_prob, shadow_rays = common.sample_direct(
                tables, ix, ctx, intersect_fn, eps, alive, packs=packs
            )
            radiance = radiance + st.throughput * nee
            ray_count = ray_count + shadow_rays
        else:
            prev_light = jnp.full((R,), -1, jnp.int32)
            prev_select_prob = jnp.ones((R,), dtype)

        # ---- event selection + new ray + BSDF throughput ----
        b = common.bsdf_bounce(ix, st.direction, ctx, eps, flux=False)
        diffuse_depth = st.diffuse_depth + b.is_diffuse.astype(jnp.int32)
        new_refr_scale = st.refraction_scale * b.refr_scale_mult
        throughput = st.throughput * b.weight
        alive = alive & b.valid

        # ---- Russian roulette (integrator.cpp:112-129); new ray depth = bounce+1 ----
        u_abs = sobol.sample(ctx, 6)
        survive = jnp.max(throughput, axis=-1) * new_refr_scale
        new_depth = st.bounce + 1
        apply_rr = (diffuse_depth > cfg.min_ray_depth) | (new_depth > cfg.min_priority_ray_depth)
        survive_c = jnp.minimum(jnp.asarray(0.95, dtype), survive)
        rr_kill = apply_rr & (survive_c <= u_abs)
        rr_boost = apply_rr & ~rr_kill
        # Double-where the divisor: on untaken lanes survive_c can be ~0 and the
        # untaken branch's 1/s partial overflows to inf, turning those lanes'
        # zero cotangents into NaN for every upstream parameter (bisected round
        # 4 — this was the mb>=10 NaN in spaceship material gradients).
        rr_div = jnp.where(rr_boost, survive_c, 1.0)
        throughput = jnp.where(
            rr_boost[:, None], throughput / rr_div[:, None], throughput
        )
        alive = alive & (survive > 0.0) & ~rr_kill

        # ---- RefractionHistory update (ray.cpp:80-98) with the new ray ----
        iors, ior_count, new_level = common.update_ior_stack(
            st.iors, st.ior_count, st.refraction_level, b.level_delta, b.new_medium, K
        )

        # ---- park dead lanes: send them far outside every scene so traversal
        # blocks full of dead rays exit in one step instead of walking the tree ----
        park_o = jnp.asarray([PARK_DISTANCE] * 3, dtype)
        park_d = jnp.asarray([0.57735026, 0.57735026, 0.57735026], dtype)

        bounce = st.bounce + 1
        pixel_index = st.pixel_index
        sample_index = st.sample_index
        path_id = st.path_id
        next_path = st.next_path
        gen = st.gen
        out_rad = st.out_rad
        out_pid = st.out_pid
        medium_ior = b.new_medium
        ray_dirac = b.dirac_next
        ray_refraction = b.did_refract

        if regen is not None:
            # ---- path regeneration (persistent wavefront) ----
            # Lanes at the depth cap die here so their radiance is finalized.
            alive = alive & (bounce < cfg.max_bounces)
            died_now = st.alive & ~alive
            L = regen.lanes
            if regen.strided:
                # 1. finalize: masked dense write into this lane's own row
                # (path_id carries the lane's generation g; path = g*L + lane).
                G = out_rad.shape[0]
                lane = jnp.arange(L, dtype=jnp.int32)
                gen_rows = jax.lax.broadcasted_iota(jnp.int32, (G, L), 0)
                write = died_now[None, :] & (gen_rows == path_id[None, :])
                out_rad = out_rad + jnp.where(write[..., None], radiance[None, :, :], 0.0)
                # 2. reload: the lane's own next stride.
                g_next = path_id + 1
                new_local = g_next * L + lane
                has_new = died_now & (new_local < regen.n_paths)
                next_id = g_next
            else:
                # 1. finalize: scatter dead paths' radiance to their row — the
                # path's own row, or its PIXEL's row (see RegenCfg.pixel_sums).
                dump = out_rad.shape[1] - 1
                tgt = path_id // regen.spp if regen.pixel_sums else path_id
                slot = jnp.where(died_now, tgt, dump)
                out_rad = out_rad.at[0, slot].add(
                    jnp.where(died_now[:, None], radiance, 0.0), mode="drop")
                # 2. reload: dead lanes pull the next unassigned paths in order.
                rank = jnp.cumsum(died_now.astype(jnp.int32)) - died_now.astype(jnp.int32)
                new_local = (next_path + rank).astype(jnp.int32)
                has_new = died_now & (new_local < regen.n_paths)
                next_path = next_path + jnp.sum(died_now.astype(jnp.int32))
                next_id = new_local
            gen = st.gen
            lin = regen.start + jnp.minimum(new_local, regen.n_paths - 1)
            pix = (lin // regen.spp).astype(jnp.uint32)
            npx = pix % jnp.uint32(regen.width)
            npy = pix // jnp.uint32(regen.width)
            nsi = (lin % regen.spp).astype(jnp.uint32)
            from ..camera import camera as cam_mod

            fresh = cam_mod.generate_rays(
                regen.cam, npx, npy, nsi, None, cfg.global_seed, dtype
            )
            sel = has_new[:, None]
            alive = alive | has_new
            new_origin = jnp.where(sel, fresh.origin,
                                   jnp.where(alive[:, None], b.new_origin, park_o))
            new_dir = jnp.where(sel, fresh.direction,
                                jnp.where(alive[:, None], b.new_dir, park_d))
            scene_ior = tables.ior.astype(dtype)
            bounce = jnp.where(has_new, 0, bounce)
            pixel_index = jnp.where(has_new, fresh.pixel_index, pixel_index)
            sample_index = jnp.where(has_new, fresh.sample_index, sample_index)
            path_id = jnp.where(has_new, next_id, path_id)
            medium_ior = jnp.where(has_new, scene_ior, medium_ior)
            new_refr_scale = jnp.where(has_new, 1.0, new_refr_scale)
            ray_dirac = jnp.where(has_new, False, ray_dirac)
            ray_refraction = jnp.where(has_new, False, ray_refraction)
            diffuse_depth = jnp.where(has_new, 0, diffuse_depth)
            new_level = jnp.where(has_new, 0, new_level)
            iors = jnp.where(sel, scene_ior, iors)
            ior_count = jnp.where(has_new, 1, ior_count)
            throughput = jnp.where(sel, 1.0, throughput)
            radiance = jnp.where(sel, 0.0, radiance)
            prev_light = jnp.where(has_new, -1, prev_light)
            b_pdf = jnp.where(has_new, 0.0, b.pdf)
            prev_select_prob = jnp.where(has_new, 1.0, prev_select_prob)
        else:
            new_origin = jnp.where(alive[:, None], b.new_origin, park_o)
            new_dir = jnp.where(alive[:, None], b.new_dir, park_d)
            b_pdf = b.pdf

        nxt = PathState(
            bounce=bounce,
            ray_count=ray_count,
            trav_steps=trav_steps,
            path_id=path_id,
            next_path=next_path,
            gen=gen,
            out_rad=out_rad,
            out_pid=out_pid,
            pixel_index=pixel_index,
            sample_index=sample_index,
            origin=new_origin,
            direction=new_dir,
            medium_ior=medium_ior,
            refraction_scale=new_refr_scale,
            ray_dirac=ray_dirac,
            ray_refraction=ray_refraction,
            diffuse_depth=diffuse_depth,
            refraction_level=new_level,
            iors=iors,
            ior_count=ior_count,
            throughput=throughput,
            radiance=radiance,
            alive=alive,
            prev_light=prev_light,
            prev_bsdf_pdf=b_pdf,
            prev_select_prob=prev_select_prob,
        )
        return nxt

    return step


def trace(
    tables: SceneTables,
    meta: SceneMeta,
    cfg: PTConfig,
    origin,
    direction,
    pixel_index,
    sample_index,
    intersect_fn: Callable | None = None,
    differentiable: bool = False,
    return_stats: bool = False,
    vary_axes: tuple = (),
    remat: bool = True,
):
    """Trace a batch of camera rays to radiance. Returns (R,3) radiance.

    `differentiable=True` switches the bounce loop from `lax.while_loop` (early
    exit when all lanes die — fastest forward) to a fixed-trip `lax.scan`, which
    JAX can reverse-differentiate. This is the detached-sampling path replay: the
    Sobol decisions are functions of integer indices only (zero gradient), so
    reverse mode flows through the continuous BSDF/pdf/throughput chain.

    `remat=True` wraps the bounce body in `jax.checkpoint`, so the backward pass
    stores only the PathState carry per bounce (~130 B/ray) and recomputes the
    bounce internals (traversal, BSDF eval, NEE) on the way back. Without it the
    64-bounce scan must keep every intermediate live and OOMs at production chunk
    sizes; with it, chunk 2^17 x 64 bounces fits v5e HBM.
    """
    dtype = origin.dtype
    R = origin.shape[0]
    if intersect_fn is None:
        intersect_fn = lambda o, d: isect.intersect_brute(tables, meta, o, d)

    step = make_bounce_step(tables, meta, cfg, intersect_fn)

    # Derive every init value from the (per-ray) inputs so that under shard_map the
    # whole carry has consistent device-varying types (see jax shard_map scan-vma).
    f0 = origin[:, 0] * 0.0                    # (R,) zeros, varying
    i0 = (pixel_index * 0).astype(jnp.int32)   # (R,) int zeros, varying
    b_false = i0 != 0                          # (R,) False, varying
    init = PathState(
        bounce=i0,
        ray_count=jnp.sum(i0),
        trav_steps=jnp.zeros(2, jnp.int32) + jnp.sum(i0),
        path_id=i0 + jnp.arange(R, dtype=jnp.int32),
        next_path=jnp.sum(i0) + R,
        gen=i0,
        out_rad=jnp.zeros((1, 1, 3), dtype) + jnp.sum(f0),
        out_pid=jnp.full((1, 1), -1, jnp.int32) + jnp.sum(i0),
        pixel_index=pixel_index,
        sample_index=sample_index,
        origin=origin,
        direction=direction,
        medium_ior=f0 + tables.ior.astype(dtype),
        refraction_scale=f0 + 1.0,
        ray_dirac=b_false,
        ray_refraction=b_false,
        diffuse_depth=i0,
        refraction_level=i0,
        iors=(f0 + tables.ior.astype(dtype))[:, None] * jnp.ones((1, cfg.ior_stack_size), dtype),
        ior_count=i0 + 1,
        throughput=origin * 0.0 + 1.0,
        radiance=origin * 0.0,
        alive=i0 == 0,
        prev_light=i0 - 1,
        prev_bsdf_pdf=f0,
        prev_select_prob=f0 + 1.0,
    )
    if vary_axes:
        # Under shard_map the loop body mixes in device-varying data (the sharded
        # pixel/sample indices), so the whole carry must start device-varying.
        def _pvary(x):
            have = getattr(jax.typeof(x), "vma", frozenset())
            need = tuple(a for a in vary_axes if a not in have)
            return jax.lax.pcast(x, need, to="varying") if need else x

        init = jax.tree_util.tree_map(_pvary, init)

    if differentiable:
        body = jax.checkpoint(step) if remat else step
        final, _ = jax.lax.scan(lambda st, _: (body(st), None), init, None, length=cfg.max_bounces)
    else:
        def cond(st: PathState):
            return jnp.any(st.alive) & (jnp.min(st.bounce) < cfg.max_bounces)

        final = jax.lax.while_loop(cond, step, init)
    radiance = final.radiance
    if return_stats:
        stats = {"rays": final.ray_count}
        if cfg.collect_traversal_stats:
            # Only expose counters that were actually accumulated: with stats off
            # the carry holds untouched zeros, which a consumer could mistake for
            # a measured count (advisor r3).
            stats["traversal_steps"] = final.trav_steps
        return radiance, stats
    return radiance


def trace_streamed(
    tables: SceneTables,
    meta: SceneMeta,
    cfg: PTConfig,
    cam,
    spp: int,
    start,
    n_paths: int,
    lanes: int,
    intersect_fn: Callable | None = None,
    fixed_trips: int | None = None,
    remat: bool = True,
    strided: bool | None = None,
    pixel_sums: bool = False,
):
    """Persistent-wavefront trace: `lanes` device lanes stream `n_paths` camera
    paths (global indices [start, start+n_paths), pixel-major x sample-minor as
    in render()). A lane whose path terminates writes its radiance to the output
    buffer and immediately loads the next unassigned path, so lane utilization
    stays near 100% instead of decaying with the live fraction (the reference
    gets the same effect from threads pulling buckets off the work queue,
    camera.cpp:101-136). Returns (radiance (n_paths, 3), rays traced).

    fixed_trips: None (default) runs a while_loop until every path drains —
    fastest forward. An int runs exactly that many bounce steps as a `lax.scan`,
    which JAX can reverse-differentiate: THE differentiable wavefront. Because
    dead lanes immediately reload the next path, a 64-trip scan does ~64/mean-
    path-length paths of useful work per lane instead of one — this is what
    closes the 10-20x forward/backward gap of the non-regenerating scan
    (round-4 weak #4). Paths still in flight when the trips run out contribute
    their partial radiance (same truncation semantics as max_bounces); size
    n_paths ~ lanes * trips / (expected path length + margin) to keep that rare.
    """
    from ..camera import camera as cam_mod

    dtype = tables.tri_v0.dtype
    if intersect_fn is None:
        intersect_fn = lambda o, d: isect.intersect_brute(tables, meta, o, d)

    start = jnp.asarray(start, jnp.int32)
    L = lanes
    if strided is None:
        # Measured defaults (see RegenCfg): strided wins for the fixed-trips
        # differentiable scan, dynamic for the drain-everything while_loop.
        strided = fixed_trips is not None
    G = -(-n_paths // L)
    if pixel_sums:
        assert not strided and n_paths % spp == 0, \
            "pixel_sums needs dynamic mode and an spp-aligned path count"
    n_out = (n_paths // spp) if pixel_sums else n_paths
    regen = RegenCfg(cam=cam, width=cam.width, spp=spp, start=start,
                     n_paths=n_paths, lanes=L, strided=strided,
                     pixel_sums=pixel_sums)
    step = make_bounce_step(tables, meta, cfg, intersect_fn, regen=regen)

    local0 = jnp.arange(L, dtype=jnp.int32)
    live0 = local0 < n_paths
    lin0 = start + jnp.minimum(local0, n_paths - 1)
    pix0 = (lin0 // spp).astype(jnp.uint32)
    first = cam_mod.generate_rays(
        cam, pix0 % jnp.uint32(cam.width), pix0 // jnp.uint32(cam.width),
        (lin0 % spp).astype(jnp.uint32), None, cfg.global_seed, dtype,
    )
    park_o = jnp.asarray([PARK_DISTANCE] * 3, dtype)
    f0 = jnp.zeros((L,), dtype)
    i0 = jnp.zeros((L,), jnp.int32)
    init = PathState(
        bounce=i0,
        # jnp.sum(int32) follows numpy promotion (int64 under x64-enabled CPU
        # tests), and the step adds sums into these — init through the same op
        # so carry dtypes match on every platform.
        ray_count=jnp.sum(i0),
        trav_steps=jnp.zeros(2, jnp.int32) + jnp.sum(i0),
        path_id=i0 if strided else local0,   # strided: per-lane generation g
        next_path=jnp.sum(i0) + min(L, n_paths),
        gen=i0,
        out_rad=jnp.zeros((G, L, 3), dtype) if strided
        else jnp.zeros((1, n_out + 1, 3), dtype),
        out_pid=jnp.full((1, 1), -1, jnp.int32),
        pixel_index=first.pixel_index,
        sample_index=first.sample_index,
        origin=jnp.where(live0[:, None], first.origin, park_o),
        direction=first.direction,
        medium_ior=f0 + tables.ior.astype(dtype),
        refraction_scale=f0 + 1.0,
        ray_dirac=i0 != 0,
        ray_refraction=i0 != 0,
        diffuse_depth=i0,
        refraction_level=i0,
        iors=(f0 + tables.ior.astype(dtype))[:, None] * jnp.ones((1, cfg.ior_stack_size), dtype),
        ior_count=i0 + 1,
        throughput=jnp.ones((L, 3), dtype),
        radiance=jnp.zeros((L, 3), dtype),
        alive=live0,
        prev_light=i0 - 1,
        prev_bsdf_pdf=f0,
        prev_select_prob=f0 + 1.0,
    )

    def finalize(final: PathState):
        # Flush still-alive lanes' partial radiance to their output rows
        # (truncation at the trip budget, like max_bounces in the reference;
        # a drained while_loop has no alive lanes so this is a no-op there).
        if strided:
            gen_rows = jax.lax.broadcasted_iota(jnp.int32, (G, L), 0)
            write = final.alive[None, :] & (gen_rows == final.path_id[None, :])
            out = final.out_rad + jnp.where(
                write[..., None], final.radiance[None, :, :], 0.0)
            # (G, L) lane-strided -> pixel-major path order by construction
            return out.reshape(G * L, 3)[:n_paths], final.ray_count
        tgt = final.path_id // spp if pixel_sums else final.path_id
        slot = jnp.where(final.alive, tgt, n_out)
        out = final.out_rad.at[0, slot].add(
            jnp.where(final.alive[:, None], final.radiance, 0.0), mode="drop")
        return out[0, :n_out], final.ray_count

    if fixed_trips is not None:
        body = jax.checkpoint(step) if remat else step
        final, _ = jax.lax.scan(
            lambda st, _: (body(st), None), init, None, length=fixed_trips)
        return finalize(final)

    def cond(st: PathState):
        return jnp.any(st.alive)

    final = jax.lax.while_loop(cond, step, init)
    return finalize(final)
