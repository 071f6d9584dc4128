"""End-to-end A/B of the sibling-pair prefetch on the knot render (TPU).

The traversal-only A/B shows -17% on bounce packets; this measures the
frame-level effect through the regen engine (sorted mixed pools, NEE
shadow kernel, scatter stages) to locate any dilution.

Usage: python experiments/pf_e2e_ab.py [spp]
"""

import sys
import time

import jax

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.engine.regen import render_image_regen
from tpu_pathtracer.models.shapes import knot_zoo_scene

ns = int(sys.argv[1]) if len(sys.argv) > 1 else 16

print("devices:", jax.devices())
cfg0 = RenderConfig(nx=512, ny=512, ns=ns, max_depth=50, textures=False)
scene, cam = knot_zoo_scene(cfg0.nx, cfg0.ny)

for name, cfg in (("prefetch ON ", cfg0),
                  ("prefetch OFF", cfg0.replace(prefetch=False))):
    m = float(render_image_regen(scene, cam, cfg).mean())   # compile
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        m = float(render_image_regen(scene, cam, cfg).mean())
        best = min(best, time.perf_counter() - t0)
    print(f"  {name}: {best:.3f} s ({best / ns * 1e3:.1f} ms/spp) "
          f"mean={m:.4f}", flush=True)
