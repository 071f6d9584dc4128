"""BVH4 leaf-width A/B (TPU, within-run).

The leaf-phase decomposition (leafmt_probe, r4) says a 64-tri visit is
~700 ns of MT + ~200 ns (double-buffered) / ~480 ns (sync) of DMA.
Halving the cluster width halves the MT term while the DMA term stays
~fixed; the demand analysis (r3) says bounce-demand per visit is
sparse, so finer clusters cut union waste — IF the visit count doesn't
grow too much (the SAH builder re-optimizes topology per width).

Usage: python experiments/bvh4_width_ab.py [scene ...] (knot terrain dragon)
"""

import dataclasses
import sys
import time

import jax

from bench import _render_batched
from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.ops.bvh4 import attach_bvh4


def _scene(name):
    if name == "terrain":
        from tpu_pathtracer.models.shapes import terrain_zoo_scene
        cfg = RenderConfig(nx=512, ny=512, ns=8, max_depth=50,
                           textures=False)
        scene, cam = terrain_zoo_scene(cfg.nx, cfg.ny)
    elif name == "knot":
        from tpu_pathtracer.models.shapes import knot_zoo_scene
        cfg = RenderConfig(nx=512, ny=512, ns=8, max_depth=50,
                           textures=False)
        scene, cam = knot_zoo_scene(cfg.nx, cfg.ny)
    elif name == "dragon":
        from tpu_pathtracer.models.shapes import knot_zoo_scene
        cfg = RenderConfig(nx=512, ny=512, ns=4, max_depth=50,
                           textures=False)
        scene, cam = knot_zoo_scene(cfg.nx, cfg.ny, nu=1664, nv=262)
    else:
        raise SystemExit(f"unknown scene {name}")
    return scene, cam, cfg


def main():
    which = sys.argv[1:] or ["knot", "terrain"]
    print("devices:", jax.devices(), flush=True)
    for name in which:
        base, cam, cfg = _scene(name)
        variants = []
        for w in (64, 32):
            t0 = time.time()
            m = attach_bvh4(base.mesh, width=w, silent=True,
                            quant=("auto" if name == "dragon"
                                   else False))
            b4 = m.bvh4
            if b4 is None:
                print(f"  {name} w={w}: table too big, skipped",
                      flush=True)
                continue
            print(f"  {name} w={w}: {b4.n_nodes} nodes "
                  f"({(b4.bounds.size + b4.refs.size) * 4 >> 10} KB"
                  f"{', quant' if b4.quant else ''}), "
                  f"{b4.n_clusters} clusters ({time.time()-t0:.0f}s)",
                  flush=True)
            variants.append((w, dataclasses.replace(base, mesh=m)))
        variants.append((variants[0][0], variants[0][1]))  # re-run first
        for w, sc in variants:
            best, mean = 1e9, 0.0
            for _ in range(2):
                el, img = _render_batched(sc, cam, cfg, cfg.ns, cfg.ns)
                best, mean = min(best, el), img.mean()
            print(f"  {name} w={w}: {best:.3f} s "
                  f"({best / cfg.ns * 1e3:.1f} ms/spp) mean={mean:.6f}",
                  flush=True)


if __name__ == "__main__":
    main()
