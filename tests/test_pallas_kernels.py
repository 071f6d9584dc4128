"""Pallas kernels (interpret mode on CPU) vs the jnp reference paths."""

import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.ops import bvh as B
from tpu_pathtracer.ops.intersect import spheres_hit
from tpu_pathtracer.ops.pallas_spheres import spheres_hit_pallas
from tpu_pathtracer.ops.pallas_tris import tris_hit_pallas
from tpu_pathtracer.ops.vec import FLT_MAX


def _rays(n, seed=1):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-12, 12, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_pallas_spheres_matches_jnp():
    rng = np.random.RandomState(0)
    s = 40
    c = jnp.asarray(rng.uniform(-10, 10, (s, 3)), jnp.float32)
    r = jnp.asarray(rng.uniform(0.3, 2.0, s), jnp.float32)
    o, d = _rays(300)
    t1, i1 = spheres_hit(o, d, c, r, 0.01, FLT_MAX)
    t2, i2 = spheres_hit_pallas(o, d, c, r, 0.01, FLT_MAX, interpret=True)
    h1 = np.asarray(t1) < 1e30
    h2 = np.asarray(t2) < 1e30
    # grazing rays may flip hit/miss between the two fp evaluation orders
    assert (h1 != h2).mean() < 0.05
    both = h1 & h2
    assert both.sum() > 40
    agree = np.asarray(i1)[both] == np.asarray(i2)[both]
    np.testing.assert_allclose(np.asarray(t1)[both][agree],
                               np.asarray(t2)[both][agree], rtol=1e-5)
    assert agree.mean() > 0.95


def test_pallas_spheres_per_ray_tmax():
    rng = np.random.RandomState(2)
    c = jnp.asarray(rng.uniform(-5, 5, (16, 3)), jnp.float32)
    r = jnp.asarray(np.full(16, 1.0), jnp.float32)
    o, d = _rays(128, seed=3)
    t1, _ = spheres_hit_pallas(o, d, c, r, 0.01, FLT_MAX, interpret=True)
    hit = np.asarray(t1) < 1e30
    tm = jnp.asarray(np.where(hit, np.asarray(t1) * 0.5, 1e38), jnp.float32)
    t2, _ = spheres_hit_pallas(o, d, c, r, 0.01, tm, interpret=True)
    assert not np.any(np.asarray(t2)[hit] < 1e30)


def test_pallas_tris_matches_traversal():
    rng = np.random.RandomState(0)
    base = rng.uniform(-10, 10, (150, 3)).astype(np.float32)
    v1 = base + rng.uniform(-1, 1, (150, 3)).astype(np.float32)
    v2 = base + rng.uniform(-1, 1, (150, 3)).astype(np.float32)
    mesh = B.build_bvh(base, v1, v2)
    o, d = _rays(256)
    a = B.traverse(mesh, o, d, 1e-3, FLT_MAX)
    t, i, u, v = tris_hit_pallas(o, d, mesh.v0, mesh.v1, mesh.v2,
                                 1e-3, FLT_MAX, interpret=True)
    hit_a = np.asarray(a.tri_id) >= 0
    hit_b = np.asarray(i) >= 0
    np.testing.assert_array_equal(hit_a, hit_b)
    assert hit_a.sum() > 15
    np.testing.assert_array_equal(np.asarray(a.tri_id)[hit_a],
                                  np.asarray(i)[hit_a])
    np.testing.assert_allclose(np.asarray(a.t)[hit_a], np.asarray(t)[hit_a],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a.u)[hit_a], np.asarray(u)[hit_a],
                               atol=1e-5)


def test_pallas_tris_sentinel_padding():
    # mesh with sentinel triangles (inf verts) must never hit
    v0 = jnp.asarray([[0.0, 0.0, -2.0], [np.inf] * 3], jnp.float32)
    v1 = jnp.asarray([[2.0, 0.0, -2.0], [np.inf] * 3], jnp.float32)
    v2 = jnp.asarray([[0.0, 2.0, -2.0], [np.inf] * 3], jnp.float32)
    o = jnp.asarray([[0.5, 0.5, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    t, i, u, v = tris_hit_pallas(o, d, v0, v1, v2, 1e-3, FLT_MAX,
                                 interpret=True)
    assert int(i[0]) == 0
    np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-6)


def test_presets_table():
    from tpu_pathtracer.models.presets import ALL_PRESETS
    from tpu_pathtracer.models.scene import make_materials

    rows = [fn() for fn in ALL_PRESETS.values()]
    mats = make_materials(rows)
    assert mats.count == 9
    # tinted glass absorption = -log(color)/10 (scene_materials.h:79)
    import math
    tg = rows[list(ALL_PRESETS).index("model_tinted_glass")]
    np.testing.assert_allclose(tg["absorption"][0],
                               -math.log(0.0972942) / 10.0, rtol=1e-6)
