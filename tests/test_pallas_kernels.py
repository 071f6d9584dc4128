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
    # The kernel evaluates the quadratic in oc-form while the jnp path
    # normalizes differently, so discriminants near 0 (grazing rays) can
    # flip sign between the two fp evaluation orders. With random rays vs
    # random spheres the graze band |disc| < ~ulp·|b|² covers a few percent
    # of rays at these scene scales (measured ~2–3%); 5% is a loose ceiling
    # on that band, not a correctness tolerance — non-grazing rays must
    # agree exactly (asserted below).
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


def test_feat_kernels_match_gather_paths():
    """The TPU hot path's fused feature fetch (spheres_hit_feat /
    tris_hit_feat) in interpret mode: hit results must equal the non-feat
    kernels, and fetched features must equal an exact table gather — a
    regression here would otherwise only surface on hardware."""
    from tpu_pathtracer.ops.pallas_spheres import spheres_hit_feat
    from tpu_pathtracer.ops.pallas_tris import tris_hit_feat
    from tpu_pathtracer.ops.v3 import V3

    rng = np.random.RandomState(7)
    o, d = _rays(128, seed=8)
    ov = V3(o[:, 0], o[:, 1], o[:, 2])
    dv = V3(d[:, 0], d[:, 1], d[:, 2])

    # --- spheres
    s = 24
    c = rng.uniform(-10, 10, (s, 3)).astype(np.float32)
    r = rng.uniform(0.4, 2.0, s).astype(np.float32)
    feat_s = rng.uniform(-3, 3, (s, 18)).astype(np.float32)
    cv = V3(jnp.asarray(c[:, 0]), jnp.asarray(c[:, 1]), jnp.asarray(c[:, 2]))
    t0, i0 = spheres_hit_pallas(o, d, jnp.asarray(c), jnp.asarray(r),
                                0.01, FLT_MAX, interpret=True)
    t1, i1, f1 = spheres_hit_feat(ov, dv, cv, jnp.asarray(r),
                                  jnp.asarray(feat_s), 0.01, FLT_MAX,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    # t: the two kernels compile as separate graphs and FMA contraction
    # choices may differ by ~1 ulp on CPU
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), rtol=1e-5)
    hit = np.asarray(i1) >= 0
    got = np.stack([np.asarray(x) for x in f1], axis=1)  # [N, 18]
    want = feat_s[np.maximum(np.asarray(i1), 0)]
    # the 3-term bf16 one-hot contraction must be bit-exact
    np.testing.assert_array_equal(got[hit], want[hit])

    # --- triangles
    base = rng.uniform(-10, 10, (90, 3)).astype(np.float32)
    w1 = base + rng.uniform(-1.5, 1.5, (90, 3)).astype(np.float32)
    w2 = base + rng.uniform(-1.5, 1.5, (90, 3)).astype(np.float32)
    feat_t = rng.uniform(-3, 3, (90, 26)).astype(np.float32)
    v0 = V3(jnp.asarray(base[:, 0]), jnp.asarray(base[:, 1]),
            jnp.asarray(base[:, 2]))
    e1 = V3(*(jnp.asarray((w1 - base)[:, k]) for k in range(3)))
    e2 = V3(*(jnp.asarray((w2 - base)[:, k]) for k in range(3)))
    ta, ia, ua, va = tris_hit_pallas(o, d, jnp.asarray(base),
                                     jnp.asarray(w1), jnp.asarray(w2),
                                     1e-3, FLT_MAX, interpret=True)
    tb, ib, ub, vb, fb = tris_hit_feat(ov, dv, v0, e1, e2, e1.cross(e2),
                                       jnp.asarray(feat_t), 1e-3, FLT_MAX,
                                       interpret=True)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
    np.testing.assert_allclose(np.asarray(ta), np.asarray(tb), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ua), np.asarray(ub), atol=1e-5)
    hit = np.asarray(ib) >= 0
    got = np.stack([np.asarray(x) for x in fb], axis=1)
    want = feat_t[np.maximum(np.asarray(ib), 0)]
    np.testing.assert_array_equal(got[hit], want[hit])


def test_force_feat_kernels_end_to_end():
    """force_feat_kernels routes the CPU render through the exact TPU
    dispatch (feat kernels + _cols_from_feats decode + feat-based texcoord
    interpolation); the image must match the gather-path render."""
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.engine.render import render_image
    from tpu_pathtracer.models.mesh import procedural_staircase_scene
    from tpu_pathtracer.models.spheres import three_sphere_scene
    from tpu_pathtracer.utils.golden import rmse

    cfg = RenderConfig(nx=32, ny=20, ns=2, max_depth=5, rays_per_chunk=256)
    scene, cam = three_sphere_scene(cfg.nx, cfg.ny)
    a = render_image(scene, cam, cfg)
    b = render_image(scene, cam, cfg.replace(force_feat_kernels=True))
    # grazing-ray hit/miss flips (see 5% note above) bound the difference
    assert rmse(a, b) < 5e-3

    cfg2 = RenderConfig(nx=24, ny=16, ns=2, max_depth=4, rays_per_chunk=128)
    scene2, cam2 = procedural_staircase_scene(cfg2.nx, cfg2.ny)
    a2 = render_image(scene2, cam2, cfg2)
    b2 = render_image(scene2, cam2, cfg2.replace(force_feat_kernels=True))
    assert rmse(a2, b2) < 5e-3


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
