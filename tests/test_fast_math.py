"""Gates for the MXU sphere b/c experiment and ``config.fast_math``.

The MXU sphere b/c-term variant (``spheres_hit_feat(mx=True)``) was the
VERDICT r2 item-9 A/B: on hardware it measured 1.034x at SSIM 0.9934 vs
the exact path — fails the >=0.999 contract for a ~3% win, so it is NOT
wired to ``config.fast_math`` (the flag only switches the packet-MT
approximate reciprocal, which is hardware-only — pl.reciprocal has no
CPU lowering — and gated on-TPU by bench.py's image gates). These tests
pin the kernel-level agreement contract of the mx experiment and that
fast_math leaves sphere renders bit-identical.

In interpret mode the b/c matmuls run at f32 HIGHEST precision (XLA CPU
accumulates both bf16 and default-precision f32 dots at bf16 — measured
2^-9 relative, useless for validation); the bf16 3-pass split itself is
an MXU-only concern, measured on hardware (PERFORMANCE.md round 3).
"""

import numpy as np
import pytest

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.engine.render import render_image
from tpu_pathtracer.models.spheres import random_spheres_scene, \
    three_sphere_scene
from tpu_pathtracer.ops.v3 import V3
from tpu_pathtracer.utils import golden


def _random_rays_spheres(n=2048, s=490, seed=0):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    o = V3(*(jnp.asarray(rng.normal(0, 5, n), jnp.float32)
             for _ in range(3)))
    d3 = rng.normal(size=(n, 3))
    d3 /= np.linalg.norm(d3, axis=1, keepdims=True)
    d = V3(*(jnp.asarray(d3[:, i], jnp.float32) for i in range(3)))
    c = V3(*(jnp.asarray(rng.normal(0, 8, s), jnp.float32)
             for _ in range(3)))
    r = jnp.asarray(rng.uniform(0.3, 1.5, s), jnp.float32)
    feat = jnp.asarray(rng.normal(size=(s, 18)), jnp.float32)
    return o, d, c, r, feat


def test_mx_spheres_match_exact():
    """The mx winner set must match the exact kernel except for rare
    grazing flips; features of agreeing winners are bit-exact (the
    one-hot fetch is untouched)."""
    from tpu_pathtracer.ops.pallas_spheres import spheres_hit_feat
    o, d, c, r, feat = _random_rays_spheres()
    te, ie, fe = spheres_hit_feat(o, d, c, r, feat, 1e-3, 3.4e38,
                                  interpret=True)
    tm, im, fm = spheres_hit_feat(o, d, c, r, feat, 1e-3, 3.4e38,
                                  interpret=True, mx=True)
    ie, im = np.asarray(ie), np.asarray(im)
    assert (ie == im).mean() > 0.999
    same = (ie >= 0) & (ie == im)
    te, tm = np.asarray(te), np.asarray(tm)
    rel = np.abs(te - tm)[same] / np.maximum(te[same], 1e-9)
    assert rel.max() < 5e-3  # f32 cancellation in the expanded |oc|^2
    fe = np.stack([np.asarray(x) for x in fe], 1)
    fm = np.stack([np.asarray(x) for x in fm], 1)
    np.testing.assert_array_equal(fe[same], fm[same])


def test_mx_anyhit_matches_exact():
    from tpu_pathtracer.ops.pallas_spheres import spheres_anyhit_soa
    o, d, c, r, _ = _random_rays_spheres(seed=3)
    oe = spheres_anyhit_soa(o, d, c, r, 1e-3, 20.0, interpret=True)
    om = spheres_anyhit_soa(o, d, c, r, 1e-3, 20.0, interpret=True,
                            mx=True)
    assert (np.asarray(oe) == np.asarray(om)).mean() > 0.999


@pytest.mark.parametrize("scene_fn", [three_sphere_scene,
                                      random_spheres_scene])
def test_fast_math_leaves_sphere_scenes_exact(scene_fn):
    """config.fast_math must NOT change sphere-scene renders: the MXU
    sphere variant failed its hardware gate and is unwired; the packet
    approx-reciprocal only applies to mesh traversal."""
    cfg = RenderConfig(nx=48, ny=32, ns=4, max_depth=8,
                       force_feat_kernels=True, interpret=True)
    scene, cam = scene_fn(cfg.nx, cfg.ny)
    a = render_image(scene, cam, cfg)
    b = render_image(scene, cam, cfg.replace(fast_math=True))
    np.testing.assert_array_equal(a, b)
