"""Quick wall-clock check of the two packet-path scenes (TPU).

Usage: python experiments/packet_scenes_bench.py [stairs_spp] [knot_spp]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(scene, cam, cfg, spp):
    from tpu_pathtracer.engine.regen import _render_regen_jit
    np.asarray(_render_regen_jit(scene, cam, cfg, jnp.uint32(1),
                                 jnp.uint32(0), normalize=False))
    t0 = time.perf_counter()
    fb = _render_regen_jit(scene, cam, cfg, jnp.uint32(spp),
                           jnp.uint32(0), normalize=False)
    fb.block_until_ready()
    a = np.asarray(fb)
    return time.perf_counter() - t0, a.mean() / spp


def main():
    s_spp = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    k_spp = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.mesh import procedural_staircase_scene
    from tpu_pathtracer.models.shapes import knot_zoo_scene

    print("device:", jax.devices()[0])
    if s_spp:
        cfg = RenderConfig(nx=1200, ny=800, ns=s_spp, max_depth=64,
                           rays_per_chunk=65536)
        scene, cam = procedural_staircase_scene(1200, 800,
                                                prims_per_leaf=128, sub=20)
        el, mean = timed(scene, cam, cfg, s_spp)
        print(f"staircase-hires 1200x800@{s_spp}spp: {el:.3f} s "
              f"({el/s_spp*1e3:.0f} ms/spp) mean={mean:.5f}")
    if k_spp:
        cfg = RenderConfig(nx=512, ny=512, ns=k_spp, max_depth=50,
                           textures=False, rays_per_chunk=65536)
        scene, cam = knot_zoo_scene(512, 512)
        el, mean = timed(scene, cam, cfg, k_spp)
        print(f"knot-131k 512x512@{k_spp}spp: {el:.3f} s "
              f"({el/k_spp*1e3:.0f} ms/spp) mean={mean:.5f}")


if __name__ == "__main__":
    main()
