"""Hardware A/B: dragon-class (872k-tri knot) e2e — quantized SAH BVH4
explicit-stack kernel vs the quantized-heap packet kernel.

The dragon's BVH4 table misses the 400 KB f32 SMEM budget (862 KB) but
fits quantized (492 KB, experiments/dragon_bvh4_size.py), so the new
uint16 tier makes the BVH4 kernel available to this mesh class for the
first time.  Topology sim says the dragon is already topology-optimal
(predicted ~1.05x), but the explicit-stack kernel also differs from the
heap kernel in step mechanics, so measure e2e.  Same scene object (q4
tables attached; config.bvh4 toggles the kernel), interleaved ABAB
dispatches — only within-run deltas are meaningful (knot run-to-run
variance is +-4%).
"""

import time

import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.engine.regen import _render_regen_jit
from tpu_pathtracer.models.shapes import knot_zoo_scene
from tpu_pathtracer.ops.bvh4 import attach_bvh4

t0 = time.time()
cfg = RenderConfig(nx=512, ny=512, ns=4, max_depth=50, textures=False)
scene, cam = knot_zoo_scene(cfg.nx, cfg.ny, nu=1664, nv=262)
print("scene built", round(time.time() - t0, 1), flush=True)

t1 = time.time()
import dataclasses  # noqa: E402

mesh_q4 = attach_bvh4(scene.mesh)
assert mesh_q4.bvh4 is not None and mesh_q4.bvh4.quant, "expected quant tier"
scene = dataclasses.replace(scene, mesh=mesh_q4)
print(f"bvh4 attached (quant, {mesh_q4.bvh4.n_nodes} nodes, "
      f"{mesh_q4.bvh4.n_clusters} clusters) in "
      f"{time.time() - t1:.1f} s", flush=True)

cfg_a = cfg.replace(bvh4=False)   # quantized heap kernel (production)
cfg_b = cfg.replace(bvh4=True)    # quantized BVH4 explicit-stack kernel


def frame(c, s0):
    fb = _render_regen_jit(scene, cam, c, jnp.uint32(4),
                           jnp.uint32(s0), normalize=False)
    fb.block_until_ready()
    return np.asarray(fb)


for name, c in (("heap", cfg_a), ("bvh4q", cfg_b)):
    t1 = time.time()
    img = frame(c, 0)
    print(f"{name} compile+warm {time.time() - t1:.1f} s "
          f"mean={img.mean():.5f}", flush=True)

imgs = {}
times = {"heap": [], "bvh4q": []}
for rep in range(3):
    for name, c in (("heap", cfg_a), ("bvh4q", cfg_b)):
        t1 = time.perf_counter()
        img = frame(c, 4)
        dt = time.perf_counter() - t1
        times[name].append(dt)
        imgs[name] = img
        print(f"rep{rep} {name}: {dt:.3f} s ({dt / 4 * 1e3:.1f} ms/spp)",
              flush=True)

d = np.abs(imgs["heap"] - imgs["bvh4q"]).max()
print(f"max |heap - bvh4q| (same samples) = {d:.3e}", flush=True)
a = min(times["heap"]) / 4 * 1e3
b = min(times["bvh4q"]) / 4 * 1e3
print(f"BEST heap {a:.1f} ms/spp  bvh4q {b:.1f} ms/spp  "
      f"ratio {a / b:.3f}x", flush=True)
