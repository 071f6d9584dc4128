"""Procedural mesh shapes + the "model zoo" scene family.

The reference benchmarked teapot / bunny / dragon meshes with four
material setups (coat, diffuse, glass, subsurface — TODO.txt model-zoo
tables, SURVEY §6). Those assets aren't shipped, so this module provides
procedural stand-ins at comparable triangle counts and the same scene
recipe: one model on a floor plane under the NEE sphere light.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from tpu_pathtracer.camera import Camera, make_camera
from tpu_pathtracer.models import presets
from tpu_pathtracer.models.scene import (SKY_CONST, Scene,
                                         make_materials, make_scene)
from tpu_pathtracer.ops.bvh import build_bvh


def torus_mesh(nu: int = 96, nv: int = 64, big_r: float = 3.0,
               small_r: float = 1.2):
    """Torus triangle mesh with wrap-around UVs: 2·nu·nv triangles."""
    us = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    vs = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    uu, vv = np.meshgrid(us, vs, indexing="ij")
    x = (big_r + small_r * np.cos(vv)) * np.cos(uu)
    y = small_r * np.sin(vv) + small_r + 0.01
    z = (big_r + small_r * np.cos(vv)) * np.sin(uu)
    p = np.stack([x, y, z], -1).astype(np.float32)
    uvs = np.stack([uu / (2 * np.pi), vv / (2 * np.pi)], -1).astype(np.float32)

    v0, v1, v2, tc = [], [], [], []
    for i in range(nu):
        for j in range(nv):
            i2, j2 = (i + 1) % nu, (j + 1) % nv
            quad = [(i, j), (i2, j), (i2, j2), (i, j2)]
            for tri in ((0, 1, 2), (0, 2, 3)):
                v0.append(p[quad[tri[0]]])
                v1.append(p[quad[tri[1]]])
                v2.append(p[quad[tri[2]]])
                tc.append(np.concatenate([uvs[quad[k]] for k in tri]))
    return (np.asarray(v0, np.float32), np.asarray(v1, np.float32),
            np.asarray(v2, np.float32), np.asarray(tc, np.float32))


MODEL_ZOO_MATERIALS = {
    # the four model-zoo material setups (TODO.txt:293–298)
    "coat": presets.model_coat,
    "diffuse": presets.model_diffuse,
    "glass": presets.model_glass,
    "sss": presets.model_sss,
}


def model_zoo_scene(nx: int, ny: int, material: str = "coat",
                    nu: int = 96, nv: int = 64,
                    prims_per_leaf: int = 32) -> Tuple[Scene, Camera]:
    """A ~12k-triangle torus (teapot-class) on a diffuse floor plane under
    the NEE sphere light — the reference's model-zoo benchmark recipe."""
    v0, v1, v2, tc = torus_mesh(nu, nv)
    mesh = build_bvh(v0, v1, v2, tc, np.ones((v0.shape[0],), np.int32),
                     prims_per_leaf=prims_per_leaf)
    mats = make_materials([presets.floor_diffuse(),
                           MODEL_ZOO_MATERIALS[material]()])
    scene = make_scene(
        mats, mesh=mesh,
        plane_point=(0.0, 0.0, 0.0), plane_norm=(0.0, 1.0, 0.0), plane_mat=0,
        light_center=(10.0, 25.0, 15.0), light_radius=4.0,
        light_color=(20.0, 20.0, 20.0),
        use_nee=True, sky_mode=SKY_CONST)
    cam = make_camera((9.0, 6.5, 9.0), (0.0, 1.0, 0.0), (0.0, 1.0, 0.0),
                      40.0, nx / ny)
    return scene, cam


def torus_knot_mesh(nu: int = 512, nv: int = 100, p: int = 2, q: int = 3,
                    big_r: float = 3.0, mid_r: float = 1.1,
                    tube: float = 0.42):
    """(p,q) torus-knot tube mesh, fully vectorized: 2·nu·nv triangles.

    The dragon/bunny-class stand-in for the reference's model zoo
    (TODO.txt:283–298 benchmarks up to the 871k-triangle dragon): dense,
    curved, self-shadowing geometry at arbitrary triangle counts —
    nu=512,nv=100 → ~102k tris; nu=1664,nv=262 → ~872k tris.
    """
    t = np.linspace(0, 2 * np.pi, nu, endpoint=False)[:, None]
    # centerline on a torus + analytic tangent
    ct, st = np.cos(t), np.sin(t)
    cq, sq = np.cos(q * t), np.sin(q * t)
    w = big_r + mid_r * cq
    c = np.concatenate([w * np.cos(p * t), mid_r * sq,
                        w * np.sin(p * t)], axis=1)
    dw = -mid_r * q * sq
    dc = np.concatenate(
        [dw * np.cos(p * t) - w * p * np.sin(p * t),
         mid_r * q * cq,
         dw * np.sin(p * t) + w * p * np.cos(p * t)], axis=1)
    tan = dc / np.linalg.norm(dc, axis=1, keepdims=True)
    # stable frame: project a reference up-vector out of the tangent
    ref = np.broadcast_to(np.array([0.0, 1.0, 0.0]), tan.shape)
    n1 = ref - tan * (tan * ref).sum(1, keepdims=True)
    small = np.linalg.norm(n1, axis=1) < 1e-6
    alt = np.broadcast_to(np.array([1.0, 0.0, 0.0]), tan.shape)
    n1 = np.where(small[:, None],
                  alt - tan * (tan * alt).sum(1, keepdims=True), n1)
    n1 /= np.linalg.norm(n1, axis=1, keepdims=True)
    n2 = np.cross(tan, n1)

    phi = np.linspace(0, 2 * np.pi, nv, endpoint=False)[None, :, None]
    ring = (n1[:, None, :] * np.cos(phi) + n2[:, None, :] * np.sin(phi))
    pts = (c[:, None, :] + tube * ring).astype(np.float32)  # [nu, nv, 3]
    pts[..., 1] += big_r + mid_r + tube + 0.01  # rest on the floor plane

    uu = np.broadcast_to(t / (2 * np.pi), (nu, nv))
    vv = np.broadcast_to(phi[0, :, 0] / (2 * np.pi), (nu, nv))
    uv = np.stack([uu, vv], axis=-1).astype(np.float32)  # [nu, nv, 2]

    # quad (i,j)-(i+1,j)-(i+1,j+1)-(i,j+1), both wraps, two tris per quad
    pr = np.roll(pts, -1, axis=0)   # i+1
    pd = np.roll(pts, -1, axis=1)   # j+1
    prd = np.roll(pr, -1, axis=1)   # i+1, j+1
    ur = np.roll(uv, -1, axis=0)
    ud = np.roll(uv, -1, axis=1)
    urd = np.roll(ur, -1, axis=1)

    def flat(a):
        return a.reshape(-1, a.shape[-1])

    v0 = np.concatenate([flat(pts), flat(pts)])
    v1 = np.concatenate([flat(pr), flat(prd)])
    v2 = np.concatenate([flat(prd), flat(pd)])
    tc = np.concatenate(
        [np.concatenate([flat(uv), flat(ur), flat(urd)], axis=1),
         np.concatenate([flat(uv), flat(urd), flat(ud)], axis=1)])
    return (np.ascontiguousarray(v0), np.ascontiguousarray(v1),
            np.ascontiguousarray(v2), np.ascontiguousarray(tc))


def knot_zoo_scene(nx: int, ny: int, material: str = "coat",
                   nu: int = 512, nv: int = 100,
                   prims_per_leaf: int = 32) -> Tuple[Scene, Camera]:
    """Large-mesh model-zoo scene: a torus-knot tube (default ~102k tris,
    dragon-class at nu=1664, nv=262) on a diffuse floor under the NEE
    light — the workload for the packet-BVH TPU path. ``prims_per_leaf``
    defaults to 32-triangle clusters (width sweep: finer leaf culling
    shrinks the visit union; PERFORMANCE.md).

    Builder is the SAH default: at 128-wide clusters the median order's
    contiguous tube runs won (0.585 vs 0.70 s/spp), but at width 32 the
    preference flips — SAH 280 vs median 307 ms/spp — because narrow
    leaves make tree quality dominate over leaf-run contiguity.
    """
    v0, v1, v2, tc = torus_knot_mesh(nu, nv)
    mesh = build_bvh(v0, v1, v2, tc, np.ones((v0.shape[0],), np.int32),
                     prims_per_leaf=prims_per_leaf)
    mats = make_materials([presets.floor_diffuse(),
                           MODEL_ZOO_MATERIALS[material]()])
    scene = make_scene(
        mats, mesh=mesh,
        plane_point=(0.0, 0.0, 0.0), plane_norm=(0.0, 1.0, 0.0), plane_mat=0,
        light_center=(10.0, 25.0, 15.0), light_radius=4.0,
        light_color=(20.0, 20.0, 20.0),
        use_nee=True, sky_mode=SKY_CONST)
    cam = make_camera((11.0, 8.0, 11.0), (0.0, 4.5, 0.0), (0.0, 1.0, 0.0),
                      42.0, nx / ny)
    return scene, cam
