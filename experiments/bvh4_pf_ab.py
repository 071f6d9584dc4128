"""e2e A/B of the BVH4 double-buffered leaf DMA (config.bvh4_pf, TPU).

The explicit ref stack makes the prefetch NON-speculative: after a leaf
pop, a leaf stack-top IS the next visit, so its cluster DMA starts
before this visit's MT loop and completes under it (sync consume
~388 ns vs double-buffered ~140 ns, experiments/dma_probe.py). Unlike
the heap kernel's sibling-pair scheme there is no misprediction or
drain traffic; the cost is a per-visit hoisted row base in the MT loop
(16 scalar adds) plus two predicated DMA branches.

Within-run off/on/off per scene (run-to-run variance is +/-4%).

Usage: PYTHONPATH=. python experiments/bvh4_pf_ab.py [terrain stairs knot]
"""

import dataclasses
import sys
import time

import jax

from bench import _render_batched
from experiments.bvh4_e2e_ab import _scene
from tpu_pathtracer.ops.bvh4 import attach_bvh4


def main():
    which = sys.argv[1:] or ["terrain", "stairs", "knot"]
    print("devices:", jax.devices(), flush=True)
    for name in which:
        scene, cam, cfg = _scene(name)
        if scene.mesh.bvh4 is None:
            scene = dataclasses.replace(
                scene, mesh=attach_bvh4(scene.mesh, width=64))
        cfg_pf = dataclasses.replace(cfg, bvh4_pf=True)
        print(f"{name}:", flush=True)
        for tag, c in (("off", cfg), ("pf", cfg_pf), ("off2", cfg)):
            best, mean = 1e9, 0.0
            for _ in range(2):
                el, img = _render_batched(scene, cam, c, cfg.ns, cfg.ns)
                best, mean = min(best, el), img.mean()
            print(f"  {tag:5s}: {best:.3f} s "
                  f"({best / cfg.ns * 1e3:.1f} ms/spp) mean={mean:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
