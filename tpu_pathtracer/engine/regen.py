"""Wavefront renderer with ray regeneration (persistent lane pool).

The plain wavefront (`engine/wavefront.py`) advances a fixed (pixel,
sample) batch until *every* lane dies — but path lifetimes are heavy-
tailed: with Russian roulette most paths die within ~4 bounces while a
handful survive to ``max_depth``, so late iterations do full-width work
for a nearly empty batch (the dead-ray fractions the reference measured
are 40–76%, Optimization.txt per SURVEY §7; here it's worse because the
loop runs to the *maximum* lifetime).

This engine fixes utilization the TPU-idiomatic way — fixed shapes, no
compaction shuffle: a persistent pool of M lanes, each owning one path.
The moment a lane's path terminates, its radiance is scatter-added into
the framebuffer and the lane is *reloaded* with the next (pixel, sample)
task from a global counter. Every iteration therefore does ~100% useful
work; total iterations ≈ total-path-bounces / M instead of
chunks × spp × max_depth.

Correctness is unchanged: the counter-based RNG is keyed by
(pixel, sample, bounce), independent of lane assignment, so each path's
radiance is bit-identical to the plain engine's; only the per-pixel
summation order differs (float associativity ~1e-7).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.camera import Camera
from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.engine import wavefront as wf
from tpu_pathtracer.models import scene as sc
from tpu_pathtracer.models.scene import Scene
from tpu_pathtracer.ops import materials as _m
from tpu_pathtracer.ops import rng as _rng
from tpu_pathtracer.ops import vec as _v


def _pool_size(config: RenderConfig, total_tasks: int) -> int:
    m = config.rays_per_chunk or (1 << 17)
    return int(min(m, total_tasks))


def render_regen(scene: Scene, camera: Camera, config: RenderConfig,
                 ns=None, pixel_offset: int = 0,
                 num_pixels: int | None = None) -> jnp.ndarray:
    """Render ``[num_pixels, 3]`` mean radiance with a regenerating pool.

    ``pixel_offset``/``num_pixels`` select a contiguous pixel range (the
    tile of this device). Flat pixel ids remain global for RNG parity.
    ``ns`` may be a traced scalar (dynamic spp — one compile serves any
    sample count); defaults to ``config.ns``.
    """
    n = num_pixels if num_pixels is not None else config.num_pixels
    ns = jnp.asarray(config.ns if ns is None else ns, jnp.uint32)
    total = jnp.uint32(n) * ns
    m = _pool_size(config, n * config.ns)
    inv_ns = 1.0 / ns.astype(jnp.float32)

    def fresh_rays(pixel, sample):
        return camera.generate_rays(pixel, sample, config.nx, config.ny)

    def body(carry):
        (fb, next_task, pixel, sample, bounce, origin, direction, color,
         att, specular, inside, alive) = carry

        # ---- flush + regenerate dead lanes -------------------------------
        dead = ~alive
        # scatter completed radiance (lanes that never ran carry color=0)
        fb = fb.at[pixel - pixel_offset].add(
            jnp.where(dead[:, None], color, 0.0) * inv_ns,
            mode="drop", indices_are_sorted=False, unique_indices=False)
        # zero every flushed lane so an idle lane can't flush twice
        color = _v.where3(dead, jnp.zeros_like(color), color)
        rank = jnp.cumsum(dead.astype(jnp.uint32)) - dead.astype(jnp.uint32)
        task = next_task + rank
        has_work = dead & (task < total)
        # pixel-major task order → consecutive lanes trace adjacent pixels
        new_sample = (task // n).astype(jnp.uint32)
        new_pixel = (task % n).astype(jnp.uint32) + jnp.uint32(pixel_offset)
        pixel = jnp.where(has_work, new_pixel, pixel)
        sample = jnp.where(has_work, new_sample, sample)
        o2, d2 = fresh_rays(pixel, sample)
        origin = _v.where3(has_work, o2, origin)
        direction = _v.where3(has_work, d2, direction)
        color = _v.where3(has_work, jnp.zeros_like(color), color)
        att = _v.where3(has_work, jnp.ones_like(att), att)
        specular = jnp.where(has_work, False, specular)
        inside = jnp.where(has_work, False, inside)
        bounce = jnp.where(has_work, 0, bounce)
        alive = alive | has_work
        next_task = next_task + jnp.sum(dead, dtype=jnp.uint32)

        # ---- one wavefront bounce (same semantics as wavefront.trace) ----
        us = _rng.bounce_uniforms(pixel, sample, bounce.astype(jnp.uint32))
        inters = wf.intersect_scene(scene, config, origin, direction, specular)

        miss = alive & (inters.obj == sc.OBJ_NONE)
        color = color + jnp.where(
            miss[:, None], att * sc.sky_radiance(scene, direction), 0.0)
        light_hit = alive & (inters.obj == sc.OBJ_LIGHT)
        if not config.shadow:
            color = color + jnp.where(light_hit[:, None],
                                      att * scene.light_color, 0.0)
        surf = alive & ~miss & ~light_hit
        alive = surf

        mats = scene.materials
        mid = jnp.where(surf, inters.mat_id, 0)
        albedo = wf._resolve_albedo(scene, config, mid, inters.tex_u,
                                    inters.tex_v, inters.obj == sc.OBJ_TRIMESH)
        hit_p = origin + inters.t[:, None] * direction
        out = _m.scatter(
            wo=direction, normal=inters.normal, hit_t=inters.t, hit_p=hit_p,
            inside=inside, mtype=mats.mtype[mid], albedo=albedo,
            color2=mats.color2[mid], param=mats.param[mid],
            param2=mats.param2[mid], absorption=mats.absorption[mid],
            scatter_dist=mats.scatter_dist[mid], us=us)

        origin = _v.where3(surf, origin + out.t[:, None] * direction, origin)
        direction = _v.where3(surf, _v.unit_vector(out.wi), direction)
        att = _v.where3(surf, att * out.throughput, att)
        specular = jnp.where(surf, out.specular, specular)
        inside = jnp.where(surf, inside ^ out.refracted, inside)

        if config.shadow and scene.use_nee:
            nee_mask = surf & ~specular
            valid, sdir, contrib, ldist = wf.generate_shadow_rays(
                scene, origin, inters.normal, att,
                us[..., _rng.S_NEE0], us[..., _rng.S_NEE1])
            nee_mask = nee_mask & valid
            occ = wf.occluded(scene, config, origin, sdir,
                              jnp.where(nee_mask, ldist, config.epsilon))
            lit = nee_mask & ~occ
            color = color + jnp.where(lit[:, None], contrib, 0.0)

        if config.russian_roulette:
            rr = alive & (bounce > config.rr_start_bounce)
            mx = _v.max3(att)
            kill = rr & (us[..., _rng.S_ROULETTE] > mx)
            alive = alive & ~kill
            scale = jnp.where(rr & ~kill, 1.0 / jnp.maximum(mx, 1e-30), 1.0)
            att = att * scale[:, None]

        bounce = bounce + 1
        alive = alive & (bounce < config.max_depth)

        return (fb, next_task, pixel, sample, bounce, origin, direction,
                color, att, specular, inside, alive)

    def cond(carry):
        fb, next_task, *_, alive = carry
        return (next_task < total) | jnp.any(alive)

    zero3 = jnp.zeros((m, 3), jnp.float32)
    carry = (
        jnp.zeros((n, 3), jnp.float32),        # fb
        jnp.uint32(0),                          # next_task
        jnp.full((m,), pixel_offset, jnp.uint32),  # pixel
        jnp.zeros((m,), jnp.uint32),            # sample
        jnp.zeros((m,), jnp.int32),             # bounce
        zero3, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (m, 3)),
        zero3,                                  # color
        zero3,                                  # att (dead lanes: flushed 0)
        jnp.zeros((m,), bool), jnp.zeros((m,), bool),
        jnp.zeros((m,), bool),                  # alive (all dead → regen)
    )
    carry = jax.lax.while_loop(cond, body, carry)
    fb = carry[0]
    # final flush: tail lanes died in the last iteration without reclaim
    pixel, color, alive = carry[2], carry[7], carry[11]
    fb = fb.at[pixel - pixel_offset].add(
        jnp.where((~alive)[:, None], color, 0.0) * inv_ns, mode="drop")
    return fb


@functools.partial(jax.jit, static_argnames=("config",))
def _render_regen_jit(scene: Scene, camera: Camera, config: RenderConfig,
                      ns: jnp.ndarray) -> jnp.ndarray:
    return render_regen(scene, camera, config, ns=ns)


def render_image_regen(scene: Scene, camera: Camera, config: RenderConfig,
                       ns: int | None = None) -> np.ndarray:
    """Full-frame render via the regeneration engine; returns
    [ny, nx, 3] linear mean radiance. ``ns`` overrides config.ns without
    recompiling (the sample count is a dynamic scalar)."""
    fb = _render_regen_jit(scene, camera, config,
                           jnp.uint32(ns if ns is not None else config.ns))
    return np.asarray(fb).reshape(config.ny, config.nx, 3)
