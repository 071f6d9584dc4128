"""Run the tiled (shard_map) render path on REAL TPU hardware with a
1-device mesh — VERDICT r4 item 4.

The multi-chip layer (parallel/tiles.py) is correctness-tested on 8
virtual CPU devices, where pallas_call runs in interpret mode. The
shard_map + *compiled* Pallas composition (check_vma=False path) had
never executed on hardware. This script closes that hole at the only
scale this environment allows: a Mesh over the one physical chip.

Checks (each asserts equality with the plain single-chip render):
  1. brute-kernel scene (random-spheres small) — sphere Pallas kernel
     under shard_map,
  2. packet-BVH mesh scene (small knot) — the packet traversal kernel
     (heap path) + any-hit shadows under shard_map,
  3. BVH4 tier (terrain slice) — explicit-stack kernel under shard_map.

Run:  timeout 1800 python experiments/tiled_hw.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import jax  # noqa: E402


def check(name, scene, cam, cfg):
    from tpu_pathtracer.engine.regen import render_regen
    from tpu_pathtracer.parallel.tiles import render_image_tiled_regen

    t0 = time.time()
    plain = np.asarray(render_regen(scene, cam, cfg)
                       ).reshape(cfg.ny, cfg.nx, 3)
    t1 = time.time()
    tiled = render_image_tiled_regen(scene, cam, cfg,
                                     devices=jax.devices()[:1])
    t2 = time.time()
    same = np.array_equal(plain, tiled)
    print(f"{name}: plain {t1-t0:.2f}s tiled {t2-t1:.2f}s "
          f"bit-identical={same} "
          f"maxdiff={np.abs(plain-tiled).max():.3e}")
    assert same, f"{name}: tiled render differs from plain"


def main():
    print("devices:", jax.devices())
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.shapes import knot_zoo_scene, terrain_zoo_scene
    from tpu_pathtracer.models.spheres import random_spheres_scene

    cfg = RenderConfig(nx=160, ny=100, ns=4, max_depth=8)
    scene, cam = random_spheres_scene(cfg.nx, cfg.ny)
    check("spheres-brute", scene, cam, cfg)

    kcfg = RenderConfig(nx=128, ny=128, ns=2, max_depth=8, textures=False)
    kscene, kcam = knot_zoo_scene(kcfg.nx, kcfg.ny, nu=416, nv=131,
                                  prims_per_leaf=64)  # ~109k tris, packet
    check("knot-packet", kscene, kcam, kcfg)

    tcfg = RenderConfig(nx=128, ny=128, ns=2, max_depth=8, textures=False)
    tscene, tcam = terrain_zoo_scene(tcfg.nx, tcfg.ny)  # BVH4 tier
    check("terrain-bvh4", tscene, tcam, tcfg)
    print("ALL OK — shard_map + compiled Pallas verified on hardware")


if __name__ == "__main__":
    main()
