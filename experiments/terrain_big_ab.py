"""Terrain-big (668k tris) quant-BVH4 tier A/B on hardware (TPU).

The per-mesh tier selection (ops/bvh4.QUANT_AUTO_RATIO) predicts the
SAH topology at expected-cost ratio ~0.74 for this mesh (vs ~0.95 for
the dragon knot, which measured 0.97x and stays on the heap). This
validates the prediction end-to-end, within-run: auto (quant BVH4
tables) vs bvh4=False (heap kernel, quantized-SMEM node path).

Usage: python experiments/terrain_big_ab.py [ns]
"""

import sys
import time

import jax

from bench import _render_batched
from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.models.shapes import terrain_big_zoo_scene


def main():
    ns = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print("devices:", jax.devices(), flush=True)
    cfg = RenderConfig(nx=512, ny=512, ns=ns, max_depth=50,
                       textures=False)
    t0 = time.perf_counter()
    scene, cam = terrain_big_zoo_scene(cfg.nx, cfg.ny)
    b4 = scene.mesh.bvh4
    print(f"build {time.perf_counter() - t0:.1f}s; bvh4 attached: "
          f"{b4 is not None}", flush=True)
    if b4 is not None:
        print(f"  quant={b4.quant} nodes={b4.n_nodes} "
              f"({(b4.bounds.size + b4.refs.size) * 4 >> 10} KB) "
              f"clusters={b4.n_clusters} stack_cap={b4.stack_cap}",
              flush=True)
    for tag, c in (("bvh4q", cfg), ("heap", cfg.replace(bvh4=False)),
                   ("bvh4q2", cfg)):
        best, mean = 1e9, 0.0
        for _ in range(2):
            el, img = _render_batched(scene, cam, c, ns, ns)
            best, mean = min(best, el), img.mean()
        print(f"  {tag:6s}: {best:.3f} s ({best / ns * 1e3:.1f} ms/spp) "
              f"mean={mean:.6f}", flush=True)


if __name__ == "__main__":
    main()
