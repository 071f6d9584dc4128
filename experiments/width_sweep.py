"""Leaf-cluster width sweep for the packet BVH (TPU).

The staircase-hires analysis (PERFORMANCE.md) shows each packet visits
~110 leaf clusters — the *union* of lane needs, so leaf work, not node
work, is the wall. Narrower clusters cull finer (fewer triangles tested)
at the price of more node steps and half-empty 8 KB DMA blocks. This
sweeps prims_per_leaf/packet_width together on one scene.

Usage: python experiments/width_sweep.py [spp] [width ...]
"""

import sys
import time

import jax.numpy as jnp
import numpy as np


def run(width, spp):
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.engine.regen import _render_regen_jit
    from tpu_pathtracer.models.mesh import procedural_staircase_scene

    cfg = RenderConfig(nx=1200, ny=800, ns=spp, max_depth=64,
                       rays_per_chunk=65536, packet_width=width)
    scene, cam = procedural_staircase_scene(1200, 800,
                                            prims_per_leaf=width, sub=20)
    np.asarray(_render_regen_jit(scene, cam, cfg, jnp.uint32(1),
                                 jnp.uint32(0), normalize=False))
    t0 = time.perf_counter()
    fb = _render_regen_jit(scene, cam, cfg, jnp.uint32(spp),
                           jnp.uint32(0), normalize=False)
    fb.block_until_ready()
    a = np.asarray(fb)
    el = time.perf_counter() - t0
    print(f"width={width:4d}: {el:7.3f} s ({el/spp*1e3:5.0f} ms/spp) "
          f"mean={a.mean()/spp:.6f}", flush=True)


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    widths = [int(w) for w in sys.argv[2:]] or [128, 64, 32]
    for w in widths:
        run(w, spp)


if __name__ == "__main__":
    main()
