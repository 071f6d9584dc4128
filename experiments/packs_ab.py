"""E2E A/B of packet_packs (multi-packet kernel interleave) on TPU.

Usage: python experiments/packs_ab.py [--dragon|--terrain|--stairs] [packs ...]

A packs token with an ``s`` suffix (e.g. ``2s``) runs the split-trip
multi-packet kernels (config.packet_split: leaf DMAs + MT consumption
phase-split across packs, see _kernel_nearest_mps).
"""

import sys
import time

import jax
import jax.numpy as jnp

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.engine.regen import _render_regen_jit

argv = sys.argv[1:]
scene_name = "knot"
if argv and argv[0].startswith("--"):
    scene_name = argv[0][2:]
    argv = argv[1:]
packs_list = argv or ["1", "2", "4"]
print("devices:", jax.devices(), flush=True)

if scene_name == "stairs":
    from tpu_pathtracer.models.mesh import procedural_staircase_scene
    scene, cam = procedural_staircase_scene(1200, 800, prims_per_leaf=64,
                                            sub=20)
    base = RenderConfig(nx=1200, ny=800, max_depth=64)
    ns = 2
elif scene_name == "terrain":
    from tpu_pathtracer.models.shapes import terrain_zoo_scene
    scene, cam = terrain_zoo_scene(512, 512)
    base = RenderConfig(nx=512, ny=512, max_depth=50, textures=False)
    ns = 8
else:
    from tpu_pathtracer.models.shapes import knot_zoo_scene
    kw = {"nu": 1664, "nv": 262} if scene_name == "dragon" else {}
    scene, cam = knot_zoo_scene(512, 512, **kw)
    base = RenderConfig(nx=512, ny=512, max_depth=50, textures=False)
    ns = 4 if scene_name == "dragon" else 16

for tok in packs_list:
    split = str(tok).endswith("s")
    packs = int(str(tok).rstrip("s"))
    cfg = base.replace(packet_packs=packs, packet_split=split)
    fb = _render_regen_jit(scene, cam, cfg, jnp.uint32(1), jnp.uint32(0),
                           normalize=False)
    fb.block_until_ready()
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        fb = _render_regen_jit(scene, cam, cfg, jnp.uint32(ns),
                               jnp.uint32(0), normalize=False)
        fb.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    import numpy as np
    print(f"packs={tok}: {best / ns * 1e3:7.1f} ms/spp "
          f"(mean={np.asarray(fb).mean() / ns:.5f})", flush=True)
