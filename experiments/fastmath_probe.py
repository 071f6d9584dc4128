"""Hardware A/B: approximate-reciprocal MT (config.fast_math).

Times the knot and staircase-hires workloads end-to-end with exact vs
approximate reciprocal in the packet-kernel MT, and gates the fast image
against the exact one (SSIM >= 0.999, the reference's own statistical
acceptance — main.cpp:117-126).

Usage: python experiments/fastmath_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.engine.regen import _render_regen_jit
from tpu_pathtracer.models.mesh import procedural_staircase_scene
from tpu_pathtracer.models.shapes import knot_zoo_scene
from tpu_pathtracer.utils.golden import rmse, ssim

print("devices:", jax.devices(), flush=True)


def run(name, scene, cam, cfg, ns):  # noqa: D103 — cfg gives ny/nx
    imgs = {}
    for fm in (False, True):
        c = cfg.replace(fast_math=fm)
        fb = _render_regen_jit(scene, cam, c, jnp.uint32(1), jnp.uint32(0),
                               normalize=False)
        fb.block_until_ready()
        t0 = time.perf_counter()
        fb = _render_regen_jit(scene, cam, c, jnp.uint32(ns), jnp.uint32(1),
                               normalize=False)
        fb.block_until_ready()
        per = (time.perf_counter() - t0) / ns
        imgs[fm] = np.asarray(fb).reshape(cfg.ny, cfg.nx, 3) / (ns + 1)
        print(f"{name} fast_math={fm}: {per * 1e3:7.1f} ms/spp "
              f"(mean={imgs[fm].mean():.5f})", flush=True)
    r = rmse(imgs[True], imgs[False])
    s = ssim(imgs[True], imgs[False])
    print(f"{name}: rmse={r:.2e} ssim={s:.5f} "
          f"{'OK' if s >= 0.999 else 'FAIL'}", flush=True)


cfg = RenderConfig(nx=512, ny=512, ns=16, max_depth=50)
scene, cam = knot_zoo_scene(512, 512)
run("knot-131k", scene, cam, cfg, 8)

cfg = RenderConfig(nx=1200, ny=800, ns=4, max_depth=64)
scene, cam = procedural_staircase_scene(1200, 800, prims_per_leaf=64,
                                        sub=20)
run("stairs-154k", scene, cam, cfg, 2)
