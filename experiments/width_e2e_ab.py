"""End-to-end A/B of packet_width 64 vs 128 on knot and dragon (TPU).

The pf-era width sweep (experiments/pf_width_sweep.py) flipped the
optimum: w=128 wins the bounce trace by 15% (halved node steps + trip
overhead amortized over 2x triangles). Validates at the frame level.

Usage: python experiments/width_e2e_ab.py [spp] [--dragon-only|--knot-only]
"""

import sys
import time

import jax

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.engine.regen import render_image_regen
from tpu_pathtracer.models.shapes import knot_zoo_scene

args = sys.argv[1:]
ns = int(args[0]) if args and args[0].isdigit() else 8
flags = [a for a in args if not a.isdigit()]

print("devices:", jax.devices())
scenes = []
if "--dragon-only" not in flags:
    scenes.append(("knot", {}))
if "--knot-only" not in flags:
    scenes.append(("dragon", {"nu": 1664, "nv": 262}))

for sname, skw in scenes:
    cfg0 = RenderConfig(nx=512, ny=512, ns=ns, max_depth=50,
                        textures=False)
    scene, cam = knot_zoo_scene(cfg0.nx, cfg0.ny, **skw)
    print(f"{sname}:", flush=True)
    for w in (64, 128):
        cfg = cfg0.replace(packet_width=w)
        m = float(render_image_regen(scene, cam, cfg).mean())  # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            m = float(render_image_regen(scene, cam, cfg).mean())
            best = min(best, time.perf_counter() - t0)
        print(f"  w={w:3d}: {best:.3f} s ({best / ns * 1e3:.1f} ms/spp) "
              f"mean={m:.4f}", flush=True)
