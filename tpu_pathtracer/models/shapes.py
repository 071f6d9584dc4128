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
                    nu: int = 96, nv: int = 64) -> Tuple[Scene, Camera]:
    """A ~12k-triangle torus (teapot-class) on a diffuse floor plane under
    the NEE sphere light — the reference's model-zoo benchmark recipe."""
    v0, v1, v2, tc = torus_mesh(nu, nv)
    mesh = build_bvh(v0, v1, v2, tc, np.ones((v0.shape[0],), np.int32))
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
