"""e2e A/B of the packed-layout next-leaf prefetch (pf1) in the heap
packet kernels.

Since the packed 4 KB blocks landed (r4), the heap kernels' pair
prefetch was ineligible (stride<128) — every leaf visit paid the
~388 ns sync DMA. pf1 exploits that the pop target after a leaf visit
is a pure scalar function of (idx, bs): when it is itself a leaf, its
block copy starts BEFORE this visit's MT loop and completes under it —
non-speculative, zero mispredict (the BVH4 kernel's proven pattern,
which measured -5.7/-8/-2.5% there).

Heap-path workloads (dragon-class 872k knot + rocks-845k pile, both
quant+packed on the heap kernel). Within-run off/pf1/off2 bracketing.

Usage: timeout 3600 python experiments/pf1_ab.py [dragon rocks]
"""

import dataclasses
import sys

sys.path.insert(0, "/root/repo")

import jax

from bench import _render_batched
from tpu_pathtracer.config import RenderConfig


def _scene(name):
    if name == "dragon":
        from tpu_pathtracer.models.shapes import knot_zoo_scene
        cfg = RenderConfig(nx=512, ny=512, ns=4, max_depth=50,
                           textures=False, prefetch=False)
        scene, cam = knot_zoo_scene(cfg.nx, cfg.ny, nu=1664, nv=262)
    elif name == "rocks":
        from tpu_pathtracer.models.shapes import rocks_zoo_scene
        cfg = RenderConfig(nx=512, ny=512, ns=4, max_depth=50,
                           textures=False, prefetch=False)
        scene, cam = rocks_zoo_scene(cfg.nx, cfg.ny)
    else:
        raise SystemExit(f"unknown scene {name}")
    return scene, cam, cfg


def main():
    which = sys.argv[1:] or ["dragon", "rocks"]
    print("devices:", jax.devices(), flush=True)
    for name in which:
        scene, cam, cfg = _scene(name)
        assert scene.mesh.bvh4 is None, "expected the heap path"
        variants = (
            ("off", cfg),
            ("pf1", dataclasses.replace(cfg, prefetch=True)),
            ("pair", dataclasses.replace(cfg, prefetch=False,
                                         pair_pf=True)),
            ("off2", cfg),
        )
        print(f"{name}:", flush=True)
        means = {}
        for tag, c in variants:
            best, mean = 1e9, 0.0
            for _ in range(2):
                el, img = _render_batched(scene, cam, c, cfg.ns, cfg.ns)
                best, mean = min(best, el), img.mean()
            means[tag] = mean
            print(f"  {tag:5s}: {best:.3f} s "
                  f"({best / cfg.ns * 1e3:.1f} ms/spp) mean={mean:.5f}",
                  flush=True)
        assert len(set(means.values())) == 1, f"radiance drift: {means}"


if __name__ == "__main__":
    main()
