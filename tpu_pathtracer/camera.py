"""Thin-lens camera.

Host-side precompute mirrors the reference camera ctor
(helper_structs.h:191–215); batched ray generation mirrors ``get_ray``
(camera.h:8–12) including lens-disk aperture sampling, but over whole SoA
pixel batches at once.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from tpu_pathtracer.ops import rng as _rng
from tpu_pathtracer.ops import vec as _v


@jax.tree_util.register_pytree_node_class
class Camera:
    """Precomputed camera basis. All fields are jnp scalars/[3]-vectors so a
    Camera can flow through jit as a pytree."""

    def __init__(self, origin, lower_left_corner, horizontal, vertical, u, v, w,
                 lens_radius):
        self.origin = origin
        self.lower_left_corner = lower_left_corner
        self.horizontal = horizontal
        self.vertical = vertical
        self.u = u
        self.v = v
        self.w = w
        self.lens_radius = lens_radius

    def tree_flatten(self):
        leaves = (self.origin, self.lower_left_corner, self.horizontal,
                  self.vertical, self.u, self.v, self.w, self.lens_radius)
        return leaves, None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    def generate_rays(self, pixel_id: jnp.ndarray, sample: jnp.ndarray,
                      nx: int, ny: int):
        """Primary-ray batch for flat pixel ids (pixel_id = j*nx + i,
        kernels.cu:541) with sub-pixel jitter (kernels.cu:549–550) and lens
        sampling (camera.h:9–11). Returns (origin, unit direction) as
        component-SoA :class:`~tpu_pathtracer.ops.v3.V3` batches."""
        from tpu_pathtracer.ops.v3 import V3

        base = _rng.camera_base(pixel_id, sample)
        i = (pixel_id % nx).astype(jnp.float32)
        j = (pixel_id // nx).astype(jnp.float32)
        s = (i + _rng.slot_uniform(base, _rng.S_JITTER_U)) / jnp.float32(nx)
        t = (j + _rng.slot_uniform(base, _rng.S_JITTER_V)) / jnp.float32(ny)

        rdx, rdy = _rng.in_unit_disk_xy(
            _rng.slot_uniform(base, _rng.S_LENS0),
            _rng.slot_uniform(base, _rng.S_LENS1))
        rdx = self.lens_radius * rdx
        rdy = self.lens_radius * rdy
        cu, cv = self.u, self.v
        offset = V3(rdx * cu[0] + rdy * cv[0],
                    rdx * cu[1] + rdy * cv[1],
                    rdx * cu[2] + rdy * cv[2])
        o = self.origin
        origin = V3(o[0] + offset.x, o[1] + offset.y, o[2] + offset.z)
        llc, h, v = self.lower_left_corner, self.horizontal, self.vertical
        direction = V3(llc[0] + s * h[0] + t * v[0] - origin.x,
                       llc[1] + s * h[1] + t * v[1] - origin.y,
                       llc[2] + s * h[2] + t * v[2] - origin.z)
        # ray ctor normalizes direction (ray.h:9)
        return origin, direction.normalized()


def make_camera(lookfrom, lookat, vup, vfov_deg: float, aspect: float,
                aperture: float = 0.0, focus_dist: float | None = None) -> Camera:
    """Build a camera exactly as helper_structs.h:194–206 (vfov is the full
    vertical field of view in degrees, top to bottom)."""
    lookfrom = jnp.asarray(lookfrom, dtype=jnp.float32)
    lookat = jnp.asarray(lookat, dtype=jnp.float32)
    vup = jnp.asarray(vup, dtype=jnp.float32)
    if focus_dist is None:
        focus_dist = float(jnp.linalg.norm(lookfrom - lookat))
    theta = vfov_deg * math.pi / 180.0
    half_height = math.tan(theta / 2.0)
    half_width = aspect * half_height
    w = _v.unit_vector(lookfrom - lookat)
    u = _v.unit_vector(jnp.cross(vup, w))
    v = jnp.cross(w, u)
    origin = lookfrom
    lower_left_corner = (origin - half_width * focus_dist * u
                         - half_height * focus_dist * v - focus_dist * w)
    horizontal = 2.0 * half_width * focus_dist * u
    vertical = 2.0 * half_height * focus_dist * v
    return Camera(origin, lower_left_corner, horizontal, vertical, u, v, w,
                  jnp.float32(aperture / 2.0))


def staircase_camera(nx: int, ny: int) -> Camera:
    """The staircase scene's camera (staircase_scene.h:62–73)."""
    lookfrom = (5.555139, 173.679901, 494.515045)
    lookat = (5.555139, 173.679901, 493.515045)
    return make_camera(lookfrom, lookat, (0.0, 1.0, 0.0), 42.0,
                       float(nx) / float(ny), aperture=0.0, focus_dist=1.0)
