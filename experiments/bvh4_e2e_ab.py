"""End-to-end A/B of the SAH BVH4 explicit-stack kernel (TPU).

The topology simulation (experiments/topo_sim.py) predicts the win of
true-SAH topology over the complete-heap constraint: terrain 1.25-1.7x,
staircase 1.28-1.7x, knot ~1.05x (visit-weighted cost model). This
measures the frame-level effect of the real kernel (explicit SMEM stack
vs bitstack, whole-table SMEM DMA, no prefetch) through the regen
engine, within-run per scene (run-to-run variance is +/-4%, CLAUDE.md).

Usage: python experiments/bvh4_e2e_ab.py [terrain stairs knot ...]
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
    elif name == "stairs":
        from tpu_pathtracer.models.mesh import procedural_staircase_scene
        cfg = RenderConfig(nx=1200, ny=800, ns=2, max_depth=64)
        scene, cam = procedural_staircase_scene(1200, 800,
                                                prims_per_leaf=64, sub=20)
    elif name == "knot":
        from tpu_pathtracer.models.shapes import knot_zoo_scene
        cfg = RenderConfig(nx=512, ny=512, ns=8, max_depth=50,
                           textures=False)
        scene, cam = knot_zoo_scene(cfg.nx, cfg.ny)
    else:
        raise SystemExit(f"unknown scene {name}")
    return scene, cam, cfg


def main():
    which = sys.argv[1:] or ["terrain", "stairs", "knot"]
    print("devices:", jax.devices(), flush=True)
    for name in which:
        scene, cam, cfg = _scene(name)
        t0 = time.perf_counter()
        scene4 = dataclasses.replace(
            scene, mesh=attach_bvh4(scene.mesh, width=64))
        build_s = time.perf_counter() - t0
        b4 = scene4.mesh.bvh4
        print(f"{name}: sah build {build_s:.1f}s, {b4.n_nodes} nodes "
              f"({(b4.bounds.size + b4.refs.size) * 4 >> 10} KB), "
              f"{b4.n_clusters} clusters, stack_cap={b4.stack_cap}",
              flush=True)
        for tag, sc, c in (("heap", scene, cfg),
                           ("bvh4", scene4, cfg),
                           ("heap2", scene, cfg)):
            best, mean = 1e9, 0.0
            for _ in range(2):
                el, img = _render_batched(sc, cam, c, cfg.ns, cfg.ns)
                best, mean = min(best, el), img.mean()
            print(f"  {tag:6s}: {best:.3f} s "
                  f"({best / cfg.ns * 1e3:.1f} ms/spp) mean={mean:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
