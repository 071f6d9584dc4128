"""Measure SAH vs median BVH build on the packet-path knot render (TPU).

Both trees have identical array shapes, so one compiled executable serves
both — the comparison is pure data. Also reports the node/leaf telemetry
so the wall-clock delta can be attributed to visit counts.

Usage: python experiments/sah_vs_median.py [spp]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_scene(use_native: bool):
    import tpu_pathtracer.native as nat
    nat._TRIED = True
    nat._LIB = None
    if use_native:
        nat._TRIED = False
        assert nat._load() is not None, "native builder failed to load"
    from tpu_pathtracer.models.shapes import knot_zoo_scene
    return knot_zoo_scene(512, 512)


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.engine.regen import _render_regen_jit

    cfg = RenderConfig(nx=512, ny=512, ns=spp, max_depth=50, textures=False,
                       rays_per_chunk=65536)
    print("device:", jax.devices()[0])

    results = {}
    for name, use_native in (("median", False), ("sah", True)):
        scene, cam = build_scene(use_native)
        # warm (compiles once; second scene reuses the executable)
        np.asarray(_render_regen_jit(scene, cam, cfg, jnp.uint32(1),
                                     jnp.uint32(0), normalize=False))
        t0 = time.perf_counter()
        fb = _render_regen_jit(scene, cam, cfg, jnp.uint32(spp),
                               jnp.uint32(0), normalize=False)
        fb.block_until_ready()
        a = np.asarray(fb)
        el = time.perf_counter() - t0
        results[name] = (el, a)
        print(f"{name}: {el:.3f} s ({el/spp*1e3:.0f} ms/spp) "
              f"mean={a.mean()/spp:.5f}")
    m, s = results["median"][0], results["sah"][0]
    print(f"speedup sah vs median: {m/s:.3f}x")
    # images differ (different trees -> different fp summation order is NOT
    # expected: traversal is exact per-ray; builders order tris differently
    # so accumulation/tie order can differ microscopically)
    d = np.abs(results["median"][1] - results["sah"][1]).max() / spp
    print(f"max |median - sah| per-spp: {d:.2e}")


if __name__ == "__main__":
    main()
