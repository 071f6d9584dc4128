"""Brute-VMEM vs packet-BVH crossover re-check (TPU).

The packet path got 1.4-1.8x faster late round 2 (width 32 + full leaf
unroll), so the dispatch threshold measured earlier (packet loses below
~16k tris) may have moved. Renders the 12k-tri model-zoo torus both
ways.

Usage: python experiments/crossover.py [spp]
"""

import sys
import time

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
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.shapes import model_zoo_scene

    # Both arms share ONE mesh (ppl=32 -> 16384 padded slots, exactly
    # the VMEM brute kernel's capacity). packet_threshold=0 resolves to
    # TRI_BRUTE_MAX=16384 and 16384 > 16384 is False -> true brute;
    # packet_threshold=1 forces the packet kernel. (An earlier version
    # of this script left the default threshold in place, so its "brute"
    # arm silently ran the width-80 packet path — see the review note in
    # PERFORMANCE.md.)
    scene, cam = model_zoo_scene(512, 512, nu=96, nv=64,
                                 prims_per_leaf=32)  # 12288 real tris
    base = RenderConfig(nx=512, ny=512, ns=spp, max_depth=50,
                        textures=False, rays_per_chunk=65536,
                        packet_threshold=0)
    el, mean = timed(scene, cam, base, spp)
    print(f"zoo-12k brute    : {el:7.3f} s ({el/spp*1e3:5.0f} ms/spp) "
          f"mean={mean:.6f}", flush=True)

    forced = base.replace(packet_threshold=1)
    el, mean = timed(scene, cam, forced, spp)
    print(f"zoo-12k packet-32: {el:7.3f} s ({el/spp*1e3:5.0f} ms/spp) "
          f"mean={mean:.6f}", flush=True)


if __name__ == "__main__":
    main()
