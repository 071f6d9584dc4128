"""Tier re-check after pf1: knot-102k on the BVH4 f32 tier (attached
because it measured >= neutral in r3) vs the heap kernel — which since
r5's prefetch-threading fix has working next-leaf prefetch (pf1) on
the packed layout. If the r3 neutrality came from the heap arm
silently running sync-DMA-only, the tier choice may flip.

Also re-checks dragon-class staying on the heap (its quant-BVH4 arm
measured 0.97x in r3; pf1 only helps the heap arm, so no re-run
needed there — this is knot-only).

Usage: timeout 3000 python experiments/knot_tier_ab.py
"""

import dataclasses
import sys

sys.path.insert(0, "/root/repo")

import jax

from bench import _render_batched
from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.models.shapes import knot_zoo_scene


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = RenderConfig(nx=512, ny=512, ns=8, max_depth=50,
                       textures=False)
    scene, cam = knot_zoo_scene(cfg.nx, cfg.ny)
    assert scene.mesh.bvh4 is not None
    heap_scene = dataclasses.replace(
        scene, mesh=dataclasses.replace(scene.mesh, bvh4=None))
    variants = (
        ("bvh4", scene, cfg),
        ("heap+pf1", heap_scene, cfg),
        ("bvh4_2", scene, cfg),
    )
    means = {}
    for tag, sc, c in variants:
        best, mean = 1e9, 0.0
        for _ in range(2):
            el, img = _render_batched(sc, cam, c, cfg.ns, cfg.ns)
            best, mean = min(best, el), img.mean()
        means[tag] = mean
        print(f"  {tag:9s}: {best:.3f} s "
              f"({best / cfg.ns * 1e3:.1f} ms/spp) mean={mean:.5f}",
              flush=True)
    assert len(set(round(v, 6) for v in means.values())) == 1, means


if __name__ == "__main__":
    main()
