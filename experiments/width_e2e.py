"""End-to-end width A/B for the packet path (TPU).

The phase probe (primary rays only) reads width 64 as 1.23x faster than
the width-32 default on the knot — but bounce rays are less coherent,
and wider leaves amplify the per-visit MT cost for incoherent packets.
This renders each packet workload at widths 32/64 through the regen
engine (the production path, same helper discipline as bench.py) to
decide the default.

Usage: python experiments/width_e2e.py [knot|stairs|dragon|terrain ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.engine.regen import _render_regen_jit
from tpu_pathtracer.models.mesh import procedural_staircase_scene
from tpu_pathtracer.models.shapes import knot_zoo_scene, terrain_zoo_scene

print("devices:", jax.devices(), flush=True)

which = sys.argv[1:] or ["knot", "stairs", "dragon"]
WIDTHS = [32, 64]


def run(name, make_scene, cfg, ns):
    for w in WIDTHS:
        cfgw = cfg.replace(packet_width=w)
        t0 = time.perf_counter()
        scene, cam = make_scene(w)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        fb = _render_regen_jit(scene, cam, cfgw, jnp.uint32(1),
                               jnp.uint32(0), normalize=False)
        fb.block_until_ready()
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        fb = _render_regen_jit(scene, cam, cfgw, jnp.uint32(ns),
                               jnp.uint32(1), normalize=False)
        fb.block_until_ready()
        per = (time.perf_counter() - t0) / ns
        print(f"{name} w={w}: {per * 1e3:7.1f} ms/spp "
              f"(build {t_build:.1f}s, warm+compile {t_compile:.1f}s, "
              f"mean={float(jnp.mean(fb)) / (ns + 1):.4f})", flush=True)


if "knot" in which:
    run("knot-131k", lambda w: knot_zoo_scene(512, 512, prims_per_leaf=w),
        RenderConfig(nx=512, ny=512, ns=16, max_depth=50,
                     rays_per_chunk=0), 8)
if "stairs" in which:
    run("stairs-154k",
        lambda w: procedural_staircase_scene(1200, 800, prims_per_leaf=w,
                                             sub=20),
        RenderConfig(nx=1200, ny=800, ns=4, max_depth=64,
                     rays_per_chunk=0), 2)
if "dragon" in which:
    run("dragon-872k",
        lambda w: knot_zoo_scene(512, 512, prims_per_leaf=w, nu=1664,
                                 nv=262),
        RenderConfig(nx=512, ny=512, ns=4, max_depth=50,
                     rays_per_chunk=0), 2)
if "terrain" in which:
    run("terrain-168k",
        lambda w: terrain_zoo_scene(512, 512, prims_per_leaf=w),
        RenderConfig(nx=512, ny=512, ns=8, max_depth=50,
                     rays_per_chunk=0), 4)
