"""Intersection math vs hand-computed cases (the per-stage unit tests the
reference lacks, SURVEY §4 rebuild plan item d)."""

import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.ops import intersect as I
from tpu_pathtracer.ops.vec import FLT_MAX


def _rays(rows):
    o = jnp.asarray([r[0] for r in rows], jnp.float32)
    d = jnp.asarray([r[1] for r in rows], jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_sphere_hit_basic():
    o, d = _rays([
        ((0, 0, 0), (0, 0, -1)),   # straight at sphere
        ((0, 0, 0), (0, 0, 1)),    # away
        ((0, 5, 0), (0, 0, -1)),   # parallel above
        ((0, 0, -2), (0, 0, -1)),  # from inside-ish behind
    ])
    centers = jnp.asarray([[0.0, 0.0, -3.0]])
    radii = jnp.asarray([1.0])
    t, idx = I.spheres_hit(o, d, centers, radii, 1e-3, FLT_MAX)
    np.testing.assert_allclose(t[0], 2.0, rtol=1e-5)
    assert t[1] == FLT_MAX
    assert t[2] == FLT_MAX
    # ray starting inside hits far wall at t=2 (near root negative)
    np.testing.assert_allclose(t[3], 2.0, rtol=1e-5)


def test_sphere_hit_nearest_of_many():
    o, d = _rays([((0, 0, 0), (0, 0, -1))])
    centers = jnp.asarray([[0.0, 0.0, -10.0], [0.0, 0.0, -3.0], [0.0, 0.0, -6.0]])
    radii = jnp.asarray([1.0, 1.0, 1.0])
    t, idx = I.spheres_hit(o, d, centers, radii, 1e-3, FLT_MAX)
    np.testing.assert_allclose(t[0], 2.0, rtol=1e-5)
    assert int(idx[0]) == 1


def test_sphere_padding_ignored():
    o, d = _rays([((0, 0, 0), (0, 0, -1))])
    centers = jnp.asarray([[0.0, 0.0, -3.0], [0.0, 0.0, -1.0]])
    radii = jnp.asarray([1.0, 0.0])  # radius 0 = padding
    t, idx = I.spheres_hit(o, d, centers, radii, 1e-3, FLT_MAX)
    assert int(idx[0]) == 0


def test_plane_hit():
    o, d = _rays([
        ((0, 1, 0), (0, -1, 0)),  # down onto y=0 plane
        ((0, 1, 0), (0, 1, 0)),   # away
        ((0, 1, 0), (1, 0, 0)),   # parallel
        ((0, -1, 0), (0, 1, 0)),  # from below (single-sided: denom>0 → miss)
    ])
    t = I.plane_hit(jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0]), o, d,
                    1e-3, FLT_MAX)
    np.testing.assert_allclose(t[0], 1.0, rtol=1e-6)
    assert t[1] == FLT_MAX and t[2] == FLT_MAX and t[3] == FLT_MAX


def test_triangle_hit_and_barycentrics():
    v0 = jnp.asarray([[0.0, 0.0, -2.0]])
    v1 = jnp.asarray([[2.0, 0.0, -2.0]])
    v2 = jnp.asarray([[0.0, 2.0, -2.0]])
    o, d = _rays([
        ((0.5, 0.5, 0.0), (0, 0, -1)),  # inside
        ((1.5, 1.5, 0.0), (0, 0, -1)),  # outside (u+v>1)
        ((0.5, 0.5, 0.0), (0, 0, 1)),   # behind
    ])
    t, u, v = I.triangles_hit(v0, v1, v2, o, d, 1e-3, FLT_MAX)
    np.testing.assert_allclose(t[0], 2.0, rtol=1e-6)
    np.testing.assert_allclose(u[0], 0.25, rtol=1e-5)  # u along v1 edge
    np.testing.assert_allclose(v[0], 0.25, rtol=1e-5)
    assert t[1] == FLT_MAX and t[2] == FLT_MAX


def test_triangle_sentinel_padding_misses():
    v0 = jnp.asarray([[jnp.inf, jnp.inf, jnp.inf]])
    v1 = jnp.asarray([[jnp.inf, jnp.inf, jnp.inf]])
    v2 = jnp.asarray([[jnp.inf, jnp.inf, jnp.inf]])
    o, d = _rays([((0, 0, 0), (0, 0, -1))])
    t, _, _ = I.triangles_hit(v0, v1, v2, o, d, 1e-3, FLT_MAX)
    assert not bool(jnp.isnan(t[0]))
    assert t[0] == FLT_MAX


def test_bbox_hit_dist():
    o = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    bmin = jnp.asarray([-1.0, -1.0, -5.0])
    bmax = jnp.asarray([1.0, 1.0, -3.0])
    t = I.bbox_hit_dist(bmin, bmax, o, 1.0 / d, FLT_MAX)
    np.testing.assert_allclose(t[0], 3.0, rtol=1e-6)
    assert t[1] == FLT_MAX

    # ray starting inside a box: entry dist clamps to BBOX_T_MIN
    t2 = I.bbox_hit_dist(jnp.zeros(3), jnp.ones(3),
                         o[2:], 1.0 / d[2:], FLT_MAX)
    np.testing.assert_allclose(t2[0], I.BBOX_T_MIN, rtol=1e-6)


def test_bbox_axis_aligned_ray_no_nan():
    # direction component 0 → inv inf; 0*inf NaN lanes must behave like the
    # C ternaries (comparison false keeps accumulator).
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    bmin = jnp.asarray([0.0, -1.0, -5.0])  # bmin.x == o.x → 0 * inf
    bmax = jnp.asarray([1.0, 1.0, -3.0])
    t = I.bbox_hit_dist(bmin, bmax, o, 1.0 / d, FLT_MAX)
    assert not bool(jnp.isnan(t[0]))
