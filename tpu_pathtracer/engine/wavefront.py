"""Wavefront path-tracing core.

The reference renders with one megakernel: one CUDA thread owns one pixel
and serially loops samples × bounces (kernels.cu:535–569, :396–533). A
megakernel maps badly onto TPU (data-dependent scalar control flow
serializes the VPU), so this engine inverts it into a *wavefront*: a batch
of N paths advances one bounce per iteration of a single
``lax.while_loop``; each stage (intersect, scatter, NEE, roulette) is a
fixed-shape masked vector op. The loop exits as soon as every lane is dead
— with Russian roulette that is typically far before ``max_depth``.

Radiance accumulation reproduces the reference exactly (SURVEY §3.3):
  * miss  → ``color += attenuation * sky`` then the path ends
    (kernels.cu:424);
  * specular light hit → path ends contributing NOTHING when NEE is on
    (the as-built quirk, kernels.cu:440–446), or adds
    ``attenuation * lightColor`` when NEE is off (kernels.cu:444);
  * NEE contribution uses the attenuation *after* the scatter update
    (kernels.cu:487 before :493);
  * roulette starts at bounce 4 with survival prob max(attenuation)
    (kernels.cu:512–527).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.camera import Camera
from tpu_pathtracer.models import scene as sc
from tpu_pathtracer.models.scene import Scene
from tpu_pathtracer.ops import bvh as _bvh
from tpu_pathtracer.ops import intersect as _i
from tpu_pathtracer.ops import materials as _m
from tpu_pathtracer.ops import rng as _rng
from tpu_pathtracer.ops import texture as _tex
from tpu_pathtracer.ops import vec as _v
from tpu_pathtracer.ops.vec import FLT_MAX


class Intersection(NamedTuple):
    """SoA `intersection` (helper_structs.h:16–36)."""
    obj: jnp.ndarray      # [N] int32 OBJ_* id
    t: jnp.ndarray        # [N]
    normal: jnp.ndarray   # [N,3] flipped to face the ray (kernels.cu:354)
    mat_id: jnp.ndarray   # [N] int32
    tex_u: jnp.ndarray    # [N]
    tex_v: jnp.ndarray    # [N]


class Stats(NamedTuple):
    """Ray-accounting counters (kernels.cu:48–66) as masked sums."""
    primary: jnp.ndarray
    primary_nohit: jnp.ndarray
    secondary: jnp.ndarray
    secondary_nohit: jnp.ndarray
    shadows: jnp.ndarray
    shadows_nohit: jnp.ndarray
    roulette_kill: jnp.ndarray
    exceed_max_bounce: jnp.ndarray
    nans: jnp.ndarray

    @staticmethod
    def zeros() -> "Stats":
        z = jnp.zeros((), jnp.int32)
        return Stats(z, z, z, z, z, z, z, z, z)


def _spheres_nearest(config: RenderConfig, origin, direction, centers, radii,
                     t_min: float, t_max):
    """Dispatch brute-force sphere intersection: Pallas kernel on TPU
    (VMEM-resident, no [N,S] HBM traffic), chunked jnp elsewhere. Both
    compute the identical direct-form quadratic."""
    if jax.default_backend() == "tpu" and not config.interpret:
        from tpu_pathtracer.ops.pallas_spheres import spheres_hit_pallas
        return spheres_hit_pallas(origin, direction, centers, radii,
                                  t_min, t_max)
    return _i.spheres_hit(origin, direction, centers, radii, t_min, t_max)


def intersect_scene(scene: Scene, config: RenderConfig,
                    origin: jnp.ndarray, direction: jnp.ndarray,
                    specular: jnp.ndarray) -> Intersection:
    """Top-level `hit()` (kernels.cu:325–360) over a ray batch.

    Surface geometry (mesh / spheres / plane) competes by nearest t; the
    light sphere is only tested for specular lanes and only when no
    surface was hit (the reference's else-branch ordering,
    kernels.cu:339–349).
    """
    N = origin.shape[0]
    eps = config.epsilon
    t = jnp.full((N,), FLT_MAX)
    obj = jnp.full((N,), sc.OBJ_NONE, jnp.int32)
    normal = jnp.zeros((N, 3))
    mat_id = jnp.zeros((N,), jnp.int32)
    tex_u = jnp.zeros((N,))
    tex_v = jnp.zeros((N,))

    if scene.has_mesh:
        mesh = scene.mesh
        # global-bbox early-out (hitMesh, kernels.cu:296–303)
        inv_dir = 1.0 / direction
        in_bounds = _i.bbox_hit(mesh.bounds_min, mesh.bounds_max,
                                origin, inv_dir, FLT_MAX)
        if config.use_bvh:
            res = _bvh.traverse(mesh, origin, direction, eps,
                                jnp.where(in_bounds, FLT_MAX, eps))
        else:
            res = _bvh.brute_force(mesh, origin, direction, eps,
                                   jnp.where(in_bounds, FLT_MAX, eps))
        hit = res.tri_id >= 0
        tri = jnp.maximum(res.tri_id, 0)
        v0 = mesh.v0[tri]
        v1 = mesh.v1[tri]
        v2 = mesh.v2[tri]
        n = _v.unit_vector(_v.cross(v1 - v0, v2 - v0))  # kernels.cu:336
        tc = mesh.tex_coords[tri]
        u, vv = res.u, res.v
        w0 = 1.0 - u - vv
        # barycentric texcoord interpolation, kernels.cu:337–338
        tu = u * tc[:, 2] + vv * tc[:, 4] + w0 * tc[:, 0]
        tv = u * tc[:, 3] + vv * tc[:, 5] + w0 * tc[:, 1]
        win = hit & (res.t < t)
        t = jnp.where(win, res.t, t)
        obj = jnp.where(win, sc.OBJ_TRIMESH, obj)
        normal = _v.where3(win, n, normal)
        mat_id = jnp.where(win, mesh.mesh_id[tri], mat_id)
        tex_u = jnp.where(win, tu, tex_u)
        tex_v = jnp.where(win, tv, tex_v)

    if scene.has_spheres:
        st, sidx = _spheres_nearest(config, origin, direction,
                                    scene.sphere_center, scene.sphere_radius,
                                    eps, FLT_MAX)
        sidx = jnp.maximum(sidx, 0)
        win = st < t
        p = origin + st[:, None] * direction
        n = (p - scene.sphere_center[sidx]) / scene.sphere_radius[sidx, None]
        t = jnp.where(win, st, t)
        obj = jnp.where(win, sc.OBJ_SPHERE, obj)
        normal = _v.where3(win, n, normal)
        mat_id = jnp.where(win, scene.sphere_mat[sidx], mat_id)

    if scene.has_plane:
        pt = _i.plane_hit(scene.plane_point, scene.plane_norm,
                          origin, direction, eps, FLT_MAX)
        win = pt < t
        t = jnp.where(win, pt, t)
        obj = jnp.where(win, sc.OBJ_PLANE, obj)
        normal = _v.where3(win, jnp.broadcast_to(scene.plane_norm, normal.shape),
                           normal)
        mat_id = jnp.where(win, scene.plane_mat, mat_id)

    if scene.use_nee:
        # light sphere only for specular rays with no surface hit
        # (kernels.cu:346–349)
        lt = _i.sphere_hit_one(origin, direction, scene.light_center,
                               scene.light_radius, eps, FLT_MAX)
        win = specular & (obj == sc.OBJ_NONE) & (lt < FLT_MAX)
        t = jnp.where(win, lt, t)
        obj = jnp.where(win, sc.OBJ_LIGHT, obj)

    # flip normal to face the ray (kernels.cu:354–355)
    flip = _v.dot(direction, normal) > 0.0
    normal = _v.where3(flip, -normal, normal)
    return Intersection(obj=obj, t=t, normal=normal, mat_id=mat_id,
                        tex_u=tex_u, tex_v=tex_v)


def occluded(scene: Scene, config: RenderConfig, origin: jnp.ndarray,
             direction: jnp.ndarray, t_max: jnp.ndarray) -> jnp.ndarray:
    """Shadow-ray occlusion (any-hit). The reference occludes only against
    the triangle mesh (kernels.cu:340); analytic scenes use their spheres
    as the occluder set."""
    N = origin.shape[0]
    occ = jnp.zeros((N,), bool)
    if scene.has_mesh:
        mesh = scene.mesh
        inv_dir = 1.0 / direction
        in_bounds = _i.bbox_hit(mesh.bounds_min, mesh.bounds_max,
                                origin, inv_dir, t_max)
        tm = jnp.where(in_bounds, t_max, config.epsilon)
        if config.use_bvh:
            res = _bvh.traverse(mesh, origin, direction, config.epsilon, tm,
                                is_shadow=True)
        else:
            res = _bvh.brute_force(mesh, origin, direction, config.epsilon, tm)
        occ = occ | (res.tri_id >= 0)
    if scene.has_spheres:
        st, _ = _spheres_nearest(config, origin, direction,
                                 scene.sphere_center, scene.sphere_radius,
                                 config.epsilon, t_max)
        occ = occ | (st < t_max)
    return occ


def _resolve_albedo(scene: Scene, config: RenderConfig, mat_id: jnp.ndarray,
                    tex_u: jnp.ndarray, tex_v: jnp.ndarray,
                    use_tex: jnp.ndarray) -> jnp.ndarray:
    """Texture-or-color albedo (kernels.cu:456–476)."""
    mats = scene.materials
    base = mats.color[mat_id]
    if not (scene.has_textures and config.textures):
        return base
    tid = mats.tex_id[mat_id]
    texel = _tex.fetch(scene.tex_atlas, scene.tex_width, scene.tex_height,
                       tid, tex_u, tex_v)
    return _v.where3(use_tex & (tid >= 0), texel, base)


def generate_shadow_rays(scene: Scene, origin: jnp.ndarray,
                         normal: jnp.ndarray, attenuation: jnp.ndarray,
                         eps1: jnp.ndarray, eps2: jnp.ndarray):
    """Solid-angle sphere-light sampling (generateShadowRay,
    kernels.cu:363–393). Returns (valid, shadow_dir, contribution,
    light_dist)."""
    to_light = scene.light_center - origin
    sw = _v.unit_vector(to_light)
    up = _v.where3(jnp.abs(sw[..., 0]) > 0.01,
                   jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), sw.shape),
                   jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), sw.shape))
    su = _v.unit_vector(_v.cross(up, sw))
    sv = _v.cross(sw, su)

    d2 = _v.squared_length(to_light)
    ratio = 1.0 - scene.light_radius * scene.light_radius / d2
    valid = ratio >= 0.0  # isnan(cosAMax) guard, kernels.cu:372
    cos_a_max = jnp.sqrt(jnp.maximum(ratio, 0.0))
    cos_a = 1.0 - eps1 + eps1 * cos_a_max
    sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))
    phi = 2.0 * jnp.pi * eps2
    l = (su * (jnp.cos(phi) * sin_a)[..., None]
         + sv * (jnp.sin(phi) * sin_a)[..., None]
         + sw * cos_a[..., None])
    dotl = _v.dot(l, normal)
    valid = valid & (dotl > 0.0)
    shadow_dir = _v.unit_vector(l)
    omega = 2.0 * jnp.pi * (1.0 - cos_a_max)
    contribution = (attenuation * scene.light_color
                    * (dotl * omega / jnp.pi)[..., None])
    light_dist = jnp.sqrt(d2) - scene.light_radius  # kernels.cu:390
    return valid, shadow_dir, contribution, light_dist


class PathState(NamedTuple):
    """SoA `path` (helper_structs.h:48–71)."""
    origin: jnp.ndarray       # [N,3]
    direction: jnp.ndarray    # [N,3] unit
    color: jnp.ndarray        # [N,3]
    attenuation: jnp.ndarray  # [N,3]
    specular: jnp.ndarray     # [N] bool
    inside: jnp.ndarray       # [N] bool
    alive: jnp.ndarray        # [N] bool


def trace(scene: Scene, camera: Camera, config: RenderConfig,
          pixel_id: jnp.ndarray, sample: jnp.ndarray
          ) -> Tuple[jnp.ndarray, Stats]:
    """Trace one sample for each pixel lane; returns ([N,3] radiance, Stats).

    This is `color()` (kernels.cu:396–533) as a wavefront loop.
    """
    N = pixel_id.shape[0]
    origin, direction = camera.generate_rays(pixel_id, sample,
                                             config.nx, config.ny)
    state = PathState(
        origin=origin, direction=direction,
        color=jnp.zeros((N, 3)), attenuation=jnp.ones((N, 3)),
        specular=jnp.zeros((N,), bool), inside=jnp.zeros((N,), bool),
        alive=jnp.ones((N,), bool),
    )

    def count(stat, mask):
        return (stat + jnp.sum(mask, dtype=jnp.int32)) if config.stats else stat

    def cond(carry):
        state, bounce, _ = carry
        return (bounce < config.max_depth) & jnp.any(state.alive)

    def body(carry):
        state, bounce, stats = carry
        us = _rng.bounce_uniforms(pixel_id, sample, bounce.astype(jnp.uint32))

        inters = intersect_scene(scene, config, state.origin, state.direction,
                                 state.specular)
        alive = state.alive
        if config.stats:
            stats = stats._replace(
                primary=count(stats.primary, alive & (bounce == 0)),
                secondary=count(stats.secondary, alive & (bounce > 0)))

        # ---- miss → sky (kernels.cu:424)
        miss = alive & (inters.obj == sc.OBJ_NONE)
        color = state.color + jnp.where(
            miss[:, None], state.attenuation * sc.sky_radiance(scene, state.direction),
            0.0)
        if config.stats:
            stats = stats._replace(
                primary_nohit=count(stats.primary_nohit, miss & (bounce == 0)),
                secondary_nohit=count(stats.secondary_nohit, miss & (bounce > 0)))

        # ---- light hit by specular path (kernels.cu:433–447)
        light_hit = alive & (inters.obj == sc.OBJ_LIGHT)
        if not config.shadow:
            color = color + jnp.where(light_hit[:, None],
                                      state.attenuation * scene.light_color, 0.0)

        surf = alive & ~miss & ~light_hit
        alive = surf

        # ---- scatter (kernels.cu:452–489)
        mats = scene.materials
        mid = jnp.where(surf, inters.mat_id, 0)
        albedo = _resolve_albedo(scene, config, mid, inters.tex_u,
                                 inters.tex_v, inters.obj == sc.OBJ_TRIMESH)
        hit_p = state.origin + inters.t[:, None] * state.direction
        out = _m.scatter(
            wo=state.direction, normal=inters.normal, hit_t=inters.t,
            hit_p=hit_p, inside=state.inside,
            mtype=mats.mtype[mid], albedo=albedo, color2=mats.color2[mid],
            param=mats.param[mid], param2=mats.param2[mid],
            absorption=mats.absorption[mid],
            scatter_dist=mats.scatter_dist[mid], us=us)

        new_origin = _v.where3(surf, state.origin + out.t[:, None] * state.direction,
                               state.origin)
        # NOTE: the reference stores possibly non-unit SSS directions and
        # re-normalizes in the next ray ctor (ray.h:9) but then advances the
        # origin with the non-unit vector (kernels.cu:485) — a scale
        # inconsistency on SSS paths. We normalize at store time instead.
        new_dir = _v.where3(surf, _v.unit_vector(out.wi), state.direction)
        new_att = _v.where3(surf, state.attenuation * out.throughput,
                            state.attenuation)
        new_specular = jnp.where(surf, out.specular, state.specular)
        new_inside = jnp.where(surf, state.inside ^ out.refracted, state.inside)

        # ---- NEE shadow pass (kernels.cu:491–510)
        if config.shadow and scene.use_nee:
            nee_mask = surf & ~new_specular
            valid, sdir, contrib, ldist = generate_shadow_rays(
                scene, new_origin, inters.normal, new_att,
                us[..., _rng.S_NEE0], us[..., _rng.S_NEE1])
            nee_mask = nee_mask & valid
            occ = occluded(scene, config, new_origin, sdir,
                           jnp.where(nee_mask, ldist, config.epsilon))
            lit = nee_mask & ~occ
            color = color + jnp.where(lit[:, None], contrib, 0.0)
            if config.stats:
                stats = stats._replace(
                    shadows=count(stats.shadows, nee_mask),
                    shadows_nohit=count(stats.shadows_nohit, lit))

        # ---- Russian roulette (kernels.cu:512–527)
        if config.russian_roulette:
            rr = alive & (bounce > config.rr_start_bounce)
            m = _v.max3(new_att)
            kill = rr & (us[..., _rng.S_ROULETTE] > m)
            alive = alive & ~kill
            scale = jnp.where(rr & ~kill, 1.0 / jnp.maximum(m, 1e-30), 1.0)
            new_att = new_att * scale[:, None]
            if config.stats:
                stats = stats._replace(
                    roulette_kill=count(stats.roulette_kill, kill))

        new_state = PathState(origin=new_origin, direction=new_dir,
                              color=color, attenuation=new_att,
                              specular=new_specular, inside=new_inside,
                              alive=alive)
        return new_state, bounce + 1, stats

    carry = (state, jnp.int32(0), Stats.zeros())
    state, bounce, stats = jax.lax.while_loop(cond, body, carry)
    if config.stats:
        stats = stats._replace(
            exceed_max_bounce=stats.exceed_max_bounce
            + jnp.sum(state.alive, dtype=jnp.int32))
    if config.check_nans:
        stats = stats._replace(
            nans=stats.nans + jnp.sum(jnp.any(jnp.isnan(state.color), axis=-1),
                                      dtype=jnp.int32))
    return state.color, stats
