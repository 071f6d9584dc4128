"""End-to-end A/B of the 8-ary great-grandchild node step (TPU).

The heap kernel's node step is vote-latency-bound (~300 ns/trip); the
levers that landed all round buy more tree levels per trip (4-ary
grandchild step, BVH4 explicit stack).  oct=True extends the heap path
to 3 levels/trip.  Dragon-class meshes are the target: they skip BVH4
(table > SMEM budget) and ride the quantized-SMEM heap kernel, where
the node phase is ~38% of traversal (690 steps x 300 ns vs 284 visits
x 1179 ns per packet, PERFORMANCE.md phase split).

NOTE: oct disables the sibling-pair prefetch (pf) scheme, so the fair
production comparison is oct(pf off, forced by kernel) vs quad(pf on).
A quad(pf off) leg isolates the step-shape effect.

Usage: python experiments/oct_e2e_ab.py [dragon knot ...]
"""

import sys
import time

import jax

from bench import _render_batched
from tpu_pathtracer.config import RenderConfig


def _scene(name):
    from tpu_pathtracer.models.shapes import knot_zoo_scene
    if name == "dragon":
        cfg = RenderConfig(nx=512, ny=512, ns=4, max_depth=50,
                           textures=False, bvh4=False)
        scene, cam = knot_zoo_scene(cfg.nx, cfg.ny, nu=1664, nv=262)
    elif name == "knot":
        # force the heap kernel (bvh4 off) to read the step shape on a
        # second topology; production knot runs BVH4
        cfg = RenderConfig(nx=512, ny=512, ns=8, max_depth=50,
                           textures=False, bvh4=False)
        scene, cam = knot_zoo_scene(cfg.nx, cfg.ny)
    else:
        raise SystemExit(f"unknown scene {name}")
    return scene, cam, cfg


def main():
    which = sys.argv[1:] or ["dragon"]
    print("devices:", jax.devices(), flush=True)
    for name in which:
        scene, cam, cfg = _scene(name)
        legs = (("quad+pf", cfg),
                ("quad-pf", cfg.replace(prefetch=False)),
                ("oct    ", cfg.replace(oct=True)),
                ("quad+pf2", cfg))
        for tag, c in legs:
            best, mean = 1e9, 0.0
            for _ in range(2):
                t0 = time.perf_counter()
                el, img = _render_batched(scene, cam, c, c.ns, c.ns)
                best, mean = min(best, el), img.mean()
            print(f"  {name} {tag}: {best:.3f} s "
                  f"({best / c.ns * 1e3:.1f} ms/spp) mean={mean:.5f}",
                  flush=True)


if __name__ == "__main__":
    main()
